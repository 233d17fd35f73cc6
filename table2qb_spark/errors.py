"""Error types with reference-parity messages.

Message shapes mirror Swirrl/table2qb exactly so the ported error-path tests
assert the same strings:
- cell errors:      src/table2qb/csv.clj:166-177
- header errors:    src/table2qb/csv.clj:77-109
- cube-config:      src/table2qb/configuration/cube.clj:24-120
"""

from __future__ import annotations


class Table2QBError(Exception):
    """Base for all engine errors."""

    def __init__(self, message: str, data: dict | None = None):
        super().__init__(message)
        self.data = data or {}


class CellValidationError(Table2QBError):
    pass


class HeaderValidationError(Table2QBError):
    pass


class CubeConfigError(Table2QBError):
    pass


def cell_validation_message(row_number: int | None, column_title: str, msg: str) -> str:
    if row_number is None:
        return f'Invalid cell in column "{column_title}": {msg}'
    return f'Invalid cell in column "{column_title}", row {row_number}: {msg}'


def throw_cell_validation_error(
    row_number: int | None, column_title: str, msg: str, data: dict | None = None
):
    raise CellValidationError(cell_validation_message(row_number, column_title, msg), data)


def cell_enum_validation_message(
    row_number: int | None, column_title: str, options
) -> str:
    return cell_validation_message(
        row_number, column_title, "Expected one of: " + ", ".join(options)
    )
