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
    def cast(self, dtype, strict: bool = True):
        return self._apply(lambda c: c.cast(dtype, strict=strict))
    def is_null(self): return self._apply(lambda c: c.is_null())
    def is_not_null(self): return self._apply(lambda c: c.is_not_null())
    def fill_null(self, value=None, strategy=None):
        return self._apply(lambda c: c.fill_null(value, strategy=strategy))
    def round(self, d=0): return self._apply(lambda c: c.round(d))
    def shift(self, n=1): return self._apply(lambda c: c.shift(n))
    def cum_sum(self): return self._apply(lambda c: c.cum_sum())

    def arg_min(self): return self._agg("arg_min")
    def arg_max(self): return self._agg("arg_max")
    def entropy(self, base: float = 2.718281828459045, normalize=True):
        return self._agg("entropy", base=base, normalize=normalize)

    def mode(self) -> "Series":
        return self._apply(lambda c: Series._mode_expr(c))

    @staticmethod
    def _mode_expr(c):
        from ..expr.expr import Expr
        return Expr("agg", (c,), agg="mode")

    def rank(self, method: str = "average", descending: bool = False):
        return self._apply(lambda c: c.rank(method, descending))

    def clip(self, lower_bound=None, upper_bound=None):
        return self._apply(lambda c: c.clip(lower_bound, upper_bound))

    def exp(self): return self._apply(lambda c: c.exp())
    def log(self, base: float = 2.718281828459045):
        return self._apply(lambda c: c.log(base))
    def sqrt(self): return self._apply(lambda c: c.sqrt())
    def reverse(self): return self._apply(lambda c: c.reverse())
    def explode(self): return self._apply(lambda c: c.explode())
    def drop_nulls(self): return self._apply(lambda c: c.drop_nulls())
    def drop_nans(self):
        return self._apply(lambda c: c.filter(c.is_not_nan()))
    def gather_every(self, n: int, offset: int = 0):
        return self._apply(lambda c: c.gather_every(n, offset))
    def search_sorted(self, element, side: str = "any"):
        out = self._apply(lambda c: c.search_sorted(element, side))
        return out.item() if not hasattr(element, "__len__") else out

    def dot(self, other: "Series"):
        from ..expr.expr import Expr, col
        df = self.to_frame().hstack(other.rename("__rhs").to_frame())
        prod = (col(self.name or "") * col("__rhs")).sum().alias("v")
        return df.select(prod).item()

    def zip_with(self, mask: "Series", other: "Series") -> "Series":
        from ..expr.expr import col, when
        df = self.to_frame().hstack(mask.rename("__m").to_frame()) \
            .hstack(other.rename("__o").to_frame())
        e = when(col("__m")).then(col(self.name or "")) \
            .otherwise(col("__o")).alias(self.name or "")
        return df.select(e).get_column(self.name or "")

    def map_elements(self, fn, return_dtype=None) -> "Series":
        vals = [None if v is None else fn(v) for v in self.to_list()]
        return Series(self.name, vals, dtype=return_dtype)

    def hist(self, bins=None, bin_count: Optional[int] = None):
        """Histogram frame (breakpoint, count)."""
        import numpy as np
        from .frame import DataFrame
        vals = np.asarray([v for v in self.to_list() if v is not None],
                          dtype=float)
        if bins is None:
            bin_count = bin_count or 10
            counts, edges = np.histogram(vals, bins=bin_count)
        else:
            counts, edges = np.histogram(vals, bins=np.asarray(bins))
        return DataFrame({"breakpoint": list(edges[1:]),
                          "count": [int(c) for c in counts]})

    def gather(self, indices) -> "Series":
        import numpy as np
        lst = self.to_list()
        return Series(self.name, [lst[int(i)] for i in np.asarray(indices)])

    def slice(self, offset: int, length: Optional[int] = None) -> "Series":
        return self.to_frame().slice(offset, length) \
            .get_column(self.name or "")

    def limit(self, n: int = 10) -> "Series":
        return self.head(n)

    def sample(self, n: Optional[int] = None, fraction=None,
               with_replacement: bool = False, seed=None) -> "Series":
        return self.to_frame().sample(n, fraction=fraction,
                                      with_replacement=with_replacement,
                                      seed=seed).get_column(self.name or "")

    def shuffle(self, seed=None) -> "Series":
        return self.sample(n=len(self), seed=seed)

    def extend_constant(self, value, n: int) -> "Series":
        return Series(self.name, self.to_list() + [value] * n)

    def new_from_index(self, index: int, length: int) -> "Series":
        return Series(self.name, [self.to_list()[index]] * length)

    def append(self, other: "Series") -> "Series":
        return Series(self.name, self.to_list() + other.to_list())

    extend = append

    def set(self, filter_mask: "Series", value) -> "Series":
        return Series(self.name,
                      [value if m else v
                       for v, m in zip(self.to_list(),
                                       filter_mask.to_list())])

    def scatter(self, indices, values) -> "Series":
        import numpy as np
        lst = self.to_list()
        vals = values.to_list() if isinstance(values, Series) else (
            list(values) if hasattr(values, "__len__") else
            [values] * len(np.asarray(indices)))
        for i, v in zip(np.asarray(indices), vals):
            lst[int(i)] = v
        return Series(self.name, lst)

    # --- namespaces (delegate through single-column frames) -------------
    @property
    def str(self):
        return _SeriesNamespace(self, "str")

    @property
    def dt(self):
        return _SeriesNamespace(self, "dt")

    @property
    def list(self):
        return _SeriesNamespace(self, "list")

    @property
    def struct(self):
        return _SeriesNamespace(self, "struct")

    @property
    def ext(self):
        return _SeriesNamespace(self, "ext")

    # --- introspection ---------------------------------------------------
    def len(self) -> int:
        return len(self)

    def chunk_lengths(self):
        return [len(self)]

    def get_chunks(self):
        """Chunks of this Series (reference:
        `py-polars/src/polars/series/series.py:9115`); device columns are
        single-chunk by design."""
        return [self]

    def n_chunks(self) -> int:
        return 1

    def estimated_size(self, unit: str = "b"):
        import numpy as np
        nbytes = self._col.data.size * self._col.data.dtype.itemsize \
            if self._col.data is not None else 0
        div = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}[unit]
        return nbytes / div if div > 1 else int(nbytes)

    def has_nulls(self) -> bool:
        return self.null_count() > 0

    def is_empty(self) -> bool:
        return len(self) == 0

    def is_sorted(self, descending: bool = False) -> bool:
        lst = [v for v in self.to_list() if v is not None]
        ordered = all(a >= b for a, b in zip(lst, lst[1:])) if descending \
            else all(a <= b for a, b in zip(lst, lst[1:]))
        return ordered

    def to_pandas(self):
        import pandas as pd
        return pd.Series(self.to_list(), name=self.name or "")

    def to_arrow(self):
        import pyarrow as pa
        return pa.array(self.to_list())

    def __arrow_c_stream__(self, requested_schema=None):
        """Arrow PyCapsule export (reference:
        `py-polars/src/polars/series/series.py:1600`)."""
        import pyarrow as pa
        arr = pa.chunked_array([self.to_arrow()])
        return arr.__arrow_c_stream__(requested_schema)

    def equals(self, other: "Series") -> bool:
        return self.to_list() == other.to_list()

    series_equal = equals

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

    # --- generic delegation through the expression engine ----------------
    # Any Expr method not explicitly defined on Series runs on a
    # single-column frame; aggregations come back as python scalars
    # (py-polars Series mirrors Expr the same way).
    _EXPR_KEEP_SERIES = {"implode", "mode", "agg_groups"}

    def __dir__(self):
        # expression methods are reachable via __getattr__ delegation;
        # surface them for dir()/introspection parity with the reference
        from ..expr.expr import Expr
        base = set(super().__dir__())
        base.update(m for m in dir(Expr)
                    if not m.startswith("_") and callable(getattr(Expr, m)))
        return sorted(base)

    def __getattr__(self, attr):
        if attr.startswith("_"):
            raise AttributeError(attr)
        from ..expr.expr import Expr
        target = getattr(Expr, attr, None)
        if target is None or not callable(target):
            raise AttributeError(
                f"'Series' object has no attribute {attr!r}")

        def method(*args, **kwargs):
            from ..expr import meta as _meta
            from ..expr.expr import col
            name = self.name or ""
            frame = self.to_frame()
            n_extra = [0]

            def wrap(a):
                if isinstance(a, Series):
                    n_extra[0] += 1
                    cn = f"__pt_arg{n_extra[0]}"
                    nonlocal frame
                    frame = frame.hstack(a.rename(cn).to_frame())
                    return col(cn)
                return a

            eargs = [wrap(a) for a in args]
            ekw = {k: wrap(v) for k, v in kwargs.items()}
            e = target(col(name), *eargs, **ekw)
            if isinstance(e, Expr):
                out = frame.select(e.alias(name))
                s = out.get_column(name)
                if _meta.is_scalar_expr(e) and \
                        attr not in Series._EXPR_KEEP_SERIES:
                    return s.item() if len(s) else None
                return s
            return e  # meta-style non-expr results
        method.__name__ = attr
        return method

    @property
    def arr(self):
        return _SeriesNamespace(self, "list")

    @property
    def bin(self):
        return _SeriesNamespace(self, "bin")

    @property
    def plot(self):
        raise ModuleNotFoundError(
            "plotting requires altair, which is not bundled")

    @property
    def flags(self) -> dict:
        return {"SORTED_ASC": False, "SORTED_DESC": False}

    def clear(self, n: int = 0) -> "Series":
        return Series(self.name, [None] * n, dtype=self.dtype)

    def clone(self) -> "Series":
        return Series._from_column(self.name, self._col, len(self))

    def rechunk(self, in_place: bool = False) -> "Series":
        return self if in_place else self.clone()

    def get_chunks(self):
        return [self]

    def shrink_to_fit(self, in_place: bool = False) -> "Series":
        return self if in_place else self.clone()

    def has_validity(self) -> bool:
        return self._col.validity is not None

    def to_physical(self) -> "Series":
        return self._apply(lambda c: c.to_physical())

    def to_jax(self):
        return self._col.data[:len(self)]

    def to_torch(self):
        import torch
        return torch.from_numpy(np.ascontiguousarray(self.to_numpy()).copy())

    def to_dummies(self, separator: str = "_"):
        return self.to_frame().to_dummies(separator=separator)

    def to_init_repr(self, n: int = 1000) -> str:
        vals = self.to_list()[:n]
        return (f'pl.Series("{self.name}", {vals!r}, '
                f'dtype=pl.{self.dtype!r})')

    def describe(self):
        return self.to_frame().describe()

    def reshape(self, dimensions) -> "Series":
        dims = tuple(dimensions)
        if len(dims) != 2:
            from ..errors import InvalidOperationError
            raise InvalidOperationError("reshape supports 2 dimensions")
        lst = self.to_list()
        k = int(dims[1])
        rows = [lst[i:i + k] for i in range(0, len(lst), k)]
        return Series(self.name, rows)

    def unique_counts(self) -> "Series":
        return self._apply(lambda c: c.unique_counts())

    def __ne__(self, other):  # type: ignore[override]
        if isinstance(other, Series):
            return self.to_list() != other.to_list()
        return NotImplemented

    def __hash__(self):
        return id(self)


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


class _SeriesNamespace:
    """Delegates `.str/.dt/.list/.struct` calls through the expression
    engine on a single-column frame."""

    def __init__(self, s: Series, ns: str):
        self._s = s
        self._ns = ns

    def __getattr__(self, op):
        s = self._s
        ns = self._ns

        def call(*args, **kw):
            from ..expr.expr import col
            name = s.name or ""
            e = getattr(getattr(col(name), ns), op)(*args, **kw)
            return s.to_frame().select(e.alias(name)).get_column(name)
        return call
