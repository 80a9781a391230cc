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

    @property
    def cat(self) -> "SeriesCatNamespace":
        return SeriesCatNamespace(self)

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
    def count(self): return self._agg("count")
    def first(self): return self._agg("first")
    def last(self): return self._agg("last")
    def quantile(self, q, interpolation="nearest"):
        return self._agg("quantile", q=q, interpolation=interpolation)

    # --- expression application -----------------------------------------
    def _apply(self, make_expr) -> "Series":
        from ..expr.expr import col
        df = self.to_frame()
        out = df.select(make_expr(col(self.name or "")).alias(self.name or ""))
        return out.get_column(self.name or "")

    def _bin(self, other, op) -> "Series":
        from ..expr.expr import col, lit
        rhs = lit(None)
        if isinstance(other, Series):
            df = self.to_frame().hstack(
                other.rename("__rhs").to_frame())
            from ..expr.expr import Expr
            e = Expr("binary", (col(self.name or ""), col("__rhs")), op=op)
            return df.select(e.alias(self.name or "")) \
                .get_column(self.name or "")
        return self._apply(lambda c: getattr(c, f"_bin")(op, other))

    def __add__(self, o): return self._bin(o, "add")
    def __sub__(self, o): return self._bin(o, "sub")
    def __mul__(self, o): return self._bin(o, "mul")
    def __truediv__(self, o): return self._bin(o, "truediv")
    def __floordiv__(self, o): return self._bin(o, "floordiv")
    def __mod__(self, o): return self._bin(o, "mod")
    def __lt__(self, o): return self._bin(o, "lt")
    def __le__(self, o): return self._bin(o, "le")
    def __gt__(self, o): return self._bin(o, "gt")
    def __ge__(self, o): return self._bin(o, "ge")
    def __neg__(self): return self._apply(lambda c: -c)
    def abs(self): return self._apply(lambda c: c.abs())
    def cast(self, dtype): return self._apply(lambda c: c.cast(dtype))
    def is_null(self): return self._apply(lambda c: c.is_null())
    def is_not_null(self): return self._apply(lambda c: c.is_not_null())
    def fill_null(self, value=None, strategy=None):
        return self._apply(lambda c: c.fill_null(value, strategy=strategy))
    def round(self, d=0): return self._apply(lambda c: c.round(d))
    def shift(self, n=1): return self._apply(lambda c: c.shift(n))
    def cum_sum(self): return self._apply(lambda c: c.cum_sum())

    def rename(self, name: str) -> "Series":
        return Series._from_column(name, self._col, len(self))

    alias = rename

    def filter(self, mask) -> "Series":
        from ..expr.expr import col
        if isinstance(mask, Series):
            df = self.to_frame().hstack(mask.rename("__m").to_frame())
            out = df.filter(col("__m")).select(col(self.name or ""))
            return out.get_column(self.name or "")
        raise TypeError("filter expects a boolean Series")

    def sort(self, descending: bool = False) -> "Series":
        return self.to_frame().sort(self.name or "", descending=descending) \
            .get_column(self.name or "")

    def head(self, n: int = 10) -> "Series":
        return self.to_frame().head(n).get_column(self.name or "")

    def tail(self, n: int = 10) -> "Series":
        return self.to_frame().tail(n).get_column(self.name or "")

    def unique(self, maintain_order: bool = False) -> "Series":
        return self.to_frame().unique(maintain_order=maintain_order) \
            .get_column(self.name or "")

    def value_counts(self, sort: bool = False):
        from ..expr.expr import Expr, col
        name = self.name or ""
        out = self.to_frame().group_by(name).agg(
            Expr("table_len").alias("count"))
        if sort:
            out = out.sort("count", descending=True)
        else:
            out = out.sort(name)
        return out

    def __getitem__(self, i):
        if isinstance(i, int):
            return self.item(i)
        if isinstance(i, slice):
            return Series(self.name, self.to_list()[i])
        raise TypeError(i)

    def __iter__(self):
        return iter(self.to_list())


def _pyify(v):
    if isinstance(v, np.generic):
        return v.item()
    return v


class SeriesCatNamespace:
    def __init__(self, s: Series):
        self._s = s

    def get_categories(self) -> Series:
        col = self._s._col
        if not col.dtype.is_string:
            from ..errors import ComputeError
            raise ComputeError(f".cat.get_categories on {col.dtype!r}")
        return Series(self._s.name, _used_categories(col, len(self._s)))


def _used_categories(col: Column, nrows: int):
    """Categories actually referenced by live codes (dictionaries may hold
    an unused slot for the null filler)."""
    codes = np.asarray(col.data)[:nrows]
    if col.validity is not None:
        codes = codes[np.asarray(col.validity)[:nrows]]
    used = np.unique(codes[codes >= 0])
    if col.sdict is None:
        return []
    return list(col.sdict.values[used])
