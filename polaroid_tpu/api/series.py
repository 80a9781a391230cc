"""Series: a named single column (thin eager wrapper).

Parity target: `py-polars/src/polars/series/`. The heavy lifting happens
in expressions over single-column frames; Series is mostly a view/
conversion type here.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

from ..batch import Column, Table
from ..dtypes import DataType


class Series:
    def __init__(self, name="", values=None, dtype: Optional[DataType] = None):
        if values is None and not isinstance(name, str):
            name, values = "", name
        if isinstance(values, Column):
            self._col = values
            self._len = None  # filled by caller
        else:
            self._col = Column.from_numpy(values if values is not None else [],
                                          dtype=dtype)
            self._len = len(values) if values is not None else 0
        self.name = name

    @classmethod
    def _from_column(cls, name: str, col: Column, length: int) -> "Series":
        s = cls.__new__(cls)
        s._col = col
        s._len = length
        s.name = name
        return s

    def __len__(self) -> int:
        return self._len or 0

    @property
    def dtype(self) -> DataType:
        return self._col.dtype

    @property
    def shape(self):
        return (len(self),)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self._col.to_numpy(len(self)))

    def to_list(self) -> List[Any]:
        out = self._col.to_numpy(len(self))
        return [None if v is None else _pyify(v) for v in list(out)]

    def to_frame(self):
        from .frame import DataFrame
        t = Table([self.name or ""], {self.name or "": self._col},
                  self._col.capacity, len(self), None)
        return DataFrame._from_table(t)

    def item(self, index: int = 0):
        return self.to_list()[index]

    def __repr__(self) -> str:
        vals = self.to_list()
        return f"Series({self.name!r}, {vals[:10]}{'...' if len(vals) > 10 else ''})"

    def __eq__(self, other):
        if isinstance(other, Series):
            return self.to_list() == other.to_list()
        return NotImplemented

    # reductions via the expression engine
    def _agg(self, agg: str, **kw):
        from ..expr.expr import col
        from ..expr.expr import Expr
        df = self.to_frame()
        e = Expr("agg", (col(self.name or ""),), agg=agg, **kw)
        return df.select(e.alias("v")).item()

    def sum(self): return self._agg("sum")
    def mean(self): return self._agg("mean")
    def min(self): return self._agg("min")
    def max(self): return self._agg("max")
    def median(self): return self._agg("median")
    def std(self, ddof: int = 1): return self._agg("std", ddof=ddof)
    def var(self, ddof: int = 1): return self._agg("var", ddof=ddof)
    def n_unique(self): return self._agg("n_unique")
    def null_count(self): return self._agg("null_count")


def _pyify(v):
    if isinstance(v, np.generic):
        return v.item()
    return v
