"""polars-parity exception namespace (``pl.exceptions``).

The reference surfaces its error taxonomy to Python as
``polars.exceptions`` (py-polars/src/polars/exceptions.py); users catch
``pl.exceptions.ColumnNotFoundError`` etc.  This module re-exports the
engine errors from :mod:`polaroid_tpu.errors` under both our names and
the polars-compatible aliases.
"""

from __future__ import annotations

from .errors import (
    ColumnNotFoundError,
    ComputeError,
    DuplicateError,
    InvalidOperationError,
    NoDataError,
    OutOfBoundsError,
    PolaroidError,
    SchemaError,
    ShapeError,
    SQLInterfaceError,
    SQLSyntaxError,
)

# polars-compatible aliases
PolarsError = PolaroidError
SchemaFieldNotFoundError = ColumnNotFoundError
StructFieldNotFoundError = ColumnNotFoundError

__all__ = [
    "ColumnNotFoundError",
    "ComputeError",
    "DuplicateError",
    "InvalidOperationError",
    "NoDataError",
    "OutOfBoundsError",
    "PolaroidError",
    "PolarsError",
    "SchemaError",
    "SchemaFieldNotFoundError",
    "ShapeError",
    "SQLInterfaceError",
    "SQLSyntaxError",
    "StructFieldNotFoundError",
]
