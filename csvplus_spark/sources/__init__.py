"""Sources: CSV (the reference's only source), parquet + in-memory rows
(driver tables / TakeRows)."""

from .csv import Reader, from_file
from .memory import from_csv_text, take_rows
from .parquet import from_parquet, load_table

__all__ = ["Reader", "from_file", "from_csv_text", "take_rows",
           "from_parquet", "load_table"]
