"""csvplus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of maxim2266/csvplus (see SURVEY.md).

Layers:
  * compat  — the reference's fluent surface (Frame/Index/Reader) with
    string-collation semantics, compiled to DataFrame plans;
  * native  — the same operators over typed columns plus Spark-only
    extensions (aggregation, windows, set ops, scalar catalog,
    structured streaming);
  * pipeline — LLM-data-pipeline operators (dedup, similarity search,
    text analysis, multimodal plumbing) built scale-first.
"""

from .errors import (
    ColumnNotFoundError,
    CsvPlusError,
    DataSourceError,
    DuplicateKeyError,
    HeaderError,
)
from .frame import Frame
from .functions.casts import safe_get_value, value_as_double, value_as_int
from .functions.predicates import all_, any_, like_, not_
from .index import Index
from .session import get_spark
from .sources import (Reader, from_avro, from_csv_text, from_file, from_jsonl,
                      from_orc, from_parquet, from_text, load_table, read_bucketed,
                      take_rows, write_bucketed)

def take(source) -> Frame:
    """API-parity adapter (Take, /root/reference/csvplus.go:252-256):
    lift a Reader, Index, or Frame into a Frame. On Spark everything is
    already a lazy DataFrame, so this just normalizes the type."""
    if isinstance(source, Frame):
        return source
    if isinstance(source, Index):
        return source.to_frame()
    if isinstance(source, Reader):
        return source.to_frame()
    raise TypeError(f"cannot adapt {type(source).__name__} to a Frame")


__all__ = [
    "take",
    "Frame",
    "Index",
    "Reader",
    "get_spark",
    "from_file",
    "from_csv_text",
    "from_parquet",
    "from_avro",
    "from_jsonl",
    "from_orc",
    "from_text",
    "load_table",
    "take_rows",
    "read_bucketed",
    "write_bucketed",
    "like_",
    "all_",
    "any_",
    "not_",
    "value_as_int",
    "value_as_double",
    "safe_get_value",
    "CsvPlusError",
    "DataSourceError",
    "ColumnNotFoundError",
    "DuplicateKeyError",
    "HeaderError",
]

__version__ = "0.1.0"
