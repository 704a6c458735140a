"""Engine error types, mirroring the reference's error model.

Reference: ``DataSourceError{Line, Err}`` with message ``row %d: %s``
(/root/reference/csvplus.go:1229-1238). Exact message parity is a
non-goal (SURVEY.md §7 H5); the contract kept here is: the same class
of misuse raises, and row lineage is carried when the engine has it.
"""

from __future__ import annotations


class CsvPlusError(Exception):
    """Base class for engine errors."""


class DataSourceError(CsvPlusError):
    """Runtime error in a pipeline, optionally with row lineage.

    Reference: /root/reference/csvplus.go:1229-1238.
    """

    def __init__(self, message: str, line: int | None = None):
        self.line = line
        super().__init__(f"row {line}: {message}" if line is not None else message)


class ColumnNotFoundError(CsvPlusError):
    """A named column is absent (strict select / index build / probe).

    Reference: ``column not found: %s`` (/root/reference/csvplus.go:1185-1202),
    ``missing column %q while creating an index`` (csvplus.go:728-731).
    """

    def __init__(self, columns, context: str = ""):
        cols = ", ".join(columns) if not isinstance(columns, str) else columns
        msg = f"column(s) not found: {cols}"
        if context:
            msg += f" ({context})"
        super().__init__(msg)


class DuplicateKeyError(CsvPlusError):
    """Unique-index build found duplicate key values.

    Reference: ``duplicate value while creating unique index: {...}``
    (/root/reference/csvplus.go:747-753).
    """

    def __init__(self, key_render: str):
        super().__init__(f"duplicate value while creating unique index: {key_render}")


class HeaderError(CsvPlusError):
    """Header contract violation (ExpectHeader / malformed header).

    Reference: ``misplaced column %q`` (/root/reference/csvplus.go:1170-1206).
    """
