"""Sources: CSV (the reference's only source), parquet + in-memory rows
(driver tables / TakeRows), JSONL/raw-text corpora, bucketed tables."""

from .bucketed import read_bucketed, write_bucketed
from .csv import Reader, from_file
from .jsonl import from_avro, from_jsonl, from_orc, from_text
from .memory import from_csv_text, take_rows
from .parquet import from_parquet, load_table

__all__ = ["Reader", "from_file", "from_csv_text", "take_rows",
           "from_parquet", "load_table", "from_avro", "from_jsonl", "from_orc", "from_text",
           "read_bucketed", "write_bucketed"]
