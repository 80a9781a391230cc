"""Top-level functions (pl.* parity surface)."""

from __future__ import annotations

import builtins
from typing import Iterable, List, Optional, Sequence

import numpy as np

from ..dtypes import DataType, Int64, String
from ..errors import ComputeError
from ..expr.expr import Expr, col as _col, lit as _lit, _wrap, _wrap_col


# --- constructors --------------------------------------------------------

def from_dict(data, schema=None):
    from .frame import DataFrame
    return DataFrame(data, schema=schema)


def from_records(records, schema=None):
    from .frame import DataFrame
    return DataFrame(list(records), schema=schema)


def from_pandas(df):
    from .frame import DataFrame
    return DataFrame(df)


def from_numpy(arr, schema=None):
    from .frame import DataFrame
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    names = schema if isinstance(schema, list) else \
        [f"column_{i}" for i in range(arr.shape[1])]
    return DataFrame({n: arr[:, i] for i, n in enumerate(names)})


def from_arrow(at):
    from .frame import DataFrame
    return DataFrame(at)


# --- io ------------------------------------------------------------------

def read_parquet(source, columns=None, n_rows=None, **kw):
    from .frame import DataFrame
    from ..io.parquet import read_parquet_table
    return DataFrame._from_table(read_parquet_table(source, columns=columns,
                                                    n_rows=n_rows))


def read_csv(source, **kw):
    from .frame import DataFrame
    from ..io.csv import read_csv_table
    return DataFrame._from_table(read_csv_table(source, **kw))


def read_ipc(source, **kw):
    from .frame import DataFrame
    from ..io.ipc import read_ipc_table
    return DataFrame._from_table(read_ipc_table(source, **kw))


def read_json(source, **kw):
    from .frame import DataFrame
    from ..io.json_io import read_json_table
    return DataFrame._from_table(read_json_table(source))


def read_ndjson(source, **kw):
    from .frame import DataFrame
    from ..io.json_io import read_ndjson_table
    return DataFrame._from_table(read_ndjson_table(source))


# --- concat --------------------------------------------------------------

def concat(items: Sequence, how: str = "vertical", rechunk: bool = False):
    items = list(items)
    if not items:
        raise ComputeError("concat needs at least one item")
    from .frame import DataFrame
    from .lazyframe import LazyFrame
    from ..plan import logical as L
    if isinstance(items[0], LazyFrame):
        return LazyFrame._from_plan(L.Union([i._plan for i in items], how))
    if how in ("vertical", "vertical_relaxed", "diagonal", "diagonal_relaxed"):
        from ..ops.concat import vstack_tables
        hw = "vertical" if how.startswith("vertical") else "diagonal"
        return DataFrame._from_table(vstack_tables([i._table for i in items], hw))
    if how == "horizontal":
        out = items[0]
        for i in items[1:]:
            out = out.hstack(i)
        return out
    raise ComputeError(f"unknown concat strategy {how!r}")


# --- ranges --------------------------------------------------------------

def arange(start, end=None, step: int = 1, eager: bool = False,
           dtype: Optional[DataType] = None):
    return int_range(start, end, step, eager=eager, dtype=dtype)


def int_range(start, end=None, step: int = 1, *, eager: bool = False,
              dtype: Optional[DataType] = None):
    if end is None:
        start, end = 0, start
    if eager:
        from .series import Series
        vals = np.arange(start, end, step, dtype=np.int64)
        return Series("literal", vals,
                      dtype=dtype or Int64)
    return Expr("lit", value=np.arange(start, end, step, dtype=np.int64),
                dtype=dtype or Int64).alias("int")


def repeat(value, n: int, *, eager: bool = False, dtype=None):
    if eager:
        from .series import Series
        return Series("repeat", [value] * n, dtype=dtype)
    return _lit(value, dtype)


def date_range(start, end, interval: str = "1d", *, closed: str = "both",
               eager: bool = False):
    import datetime as _dt
    from ..ops.temporal import parse_every
    kind, n = parse_every(interval)
    out = []
    if isinstance(start, _dt.datetime) or isinstance(end, _dt.datetime):
        is_dt = True
    else:
        is_dt = False
    cur = start
    if kind == "months":
        def advance(d):
            m = d.month - 1 + n
            y = d.year + m // 12
            m = m % 12 + 1
            day = builtins.min(d.day, [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0) else 28,
                                       31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1])
            return d.replace(year=y, month=m, day=day)
    else:
        delta = _dt.timedelta(microseconds=n / 1000)
        if not is_dt:
            delta = _dt.timedelta(days=n // (86_400 * 1_000_000_000))

        def advance(d):
            return d + delta
    while cur <= end:
        out.append(cur)
        nxt = advance(cur)
        if nxt == cur:
            break
        cur = nxt
    if closed in ("left", "none") and out and out[-1] == end:
        pass
    if closed in ("left", "none"):
        out = [d for d in out if d != end] if closed == "left" else out[1:-1]
    elif closed == "right":
        out = [d for d in out if d != start]
    from .series import Series
    s = Series("literal", out)
    if eager:
        return s
    return _lit(np.asarray([(d - _dt.date(1970, 1, 1)).days for d in out]))


# --- horizontal / misc expr builders -------------------------------------

def all(*names) -> Expr:
    if not names:
        return Expr("wildcard")
    if len(names) == 1 and isinstance(names[0], str):
        return _col(names[0]).all()
    acc = _wrap_col(names[0])
    for n in names[1:]:
        acc = acc & _wrap_col(n)
    return acc


def any(*names) -> Expr:
    if len(names) == 1 and isinstance(names[0], str):
        return _col(names[0]).any()
    acc = _wrap_col(names[0])
    for n in names[1:]:
        acc = acc | _wrap_col(n)
    return acc


def exclude(*names) -> Expr:
    flat = []
    for n in names:
        flat.extend(n if isinstance(n, (list, tuple)) else [n])
    return Expr("exclude", names=tuple(flat))


def min(*exprs) -> Expr:
    if len(exprs) == 1:
        return _wrap_col(exprs[0]).min()
    return min_horizontal(*exprs)


def max(*exprs) -> Expr:
    if len(exprs) == 1:
        return _wrap_col(exprs[0]).max()
    return max_horizontal(*exprs)


def sum(*exprs) -> Expr:
    if len(exprs) == 1 and not isinstance(exprs[0], (list, tuple)):
        return _wrap_col(exprs[0]).sum()
    return sum_horizontal(*exprs)


def mean(e) -> Expr:
    return _wrap_col(e).mean()


def std(e, ddof: int = 1) -> Expr:
    return _wrap_col(e).std(ddof)


def var(e, ddof: int = 1) -> Expr:
    return _wrap_col(e).var(ddof)


def count(e=None) -> Expr:
    if e is None:
        return Expr("table_len")
    return _wrap_col(e).count()


def min_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[0]
    for e in es[1:]:
        from ..expr.expr import when
        acc = when(acc.is_null() | (e.is_not_null() & (e < acc))).then(e).otherwise(acc)
    return acc.alias("min")


def max_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[0]
    for e in es[1:]:
        from ..expr.expr import when
        acc = when(acc.is_null() | (e.is_not_null() & (e > acc))).then(e).otherwise(acc)
    return acc.alias("max")


def sum_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[0].fill_null(0)
    for e in es[1:]:
        acc = acc + e.fill_null(0)
    return acc.alias("sum")


def mean_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    total = es[0].fill_null(0)
    cnt = es[0].is_not_null().cast(Int64)
    for e in es[1:]:
        total = total + e.fill_null(0)
        cnt = cnt + e.is_not_null().cast(Int64)
    return (total / cnt).alias("mean")


def coalesce(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[-1]
    for e in reversed(es[:-1]):
        acc = e.fill_null(acc)
    return acc  # named after the first input, like polars


def corr(a, b, ddof: int = 1) -> Expr:
    """Pearson correlation via the sums formulation — composes out of
    plain aggregations so it is exact per group in group_by context and
    pairwise-complete under nulls."""
    a, b = _wrap_col(a), _wrap_col(b)
    pair = a.is_not_null() & b.is_not_null()
    from ..dtypes import Float64
    # float accumulation up front: the result is float anyway, and int
    # inputs would otherwise drag emulated-int64 segment ladders through
    # the group path (f32 sums accumulate compensated two-float,
    # ~49 exact bits)
    ax, bx = a.filter(pair).cast(Float64), b.filter(pair).cast(Float64)
    n = ax.count()
    sx, sy = ax.sum(), bx.sum()
    sxx, syy = (ax * ax).sum(), (bx * bx).sum()
    sxy = (ax * bx).sum()
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx).sqrt() * (n * syy - sy * sy).sqrt())
    return (num / den).alias("corr")


def cov(a, b, ddof: int = 1) -> Expr:
    a, b = _wrap_col(a), _wrap_col(b)
    pair = a.is_not_null() & b.is_not_null()
    from ..dtypes import Float64
    # float accumulation up front: the result is float anyway, and int
    # inputs would otherwise drag emulated-int64 segment ladders through
    # the group path (f32 sums accumulate compensated two-float,
    # ~49 exact bits)
    ax, bx = a.filter(pair).cast(Float64), b.filter(pair).cast(Float64)
    n = ax.count()
    return (((ax * bx).sum() - ax.sum() * bx.sum() / n)
            / (n - ddof)).alias("cov")


def concat_str(*exprs, separator: str = "") -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    return Expr("concat_str", tuple(es), separator=separator)


def struct(*exprs, **named) -> Expr:
    from ..expr.expr import struct as _struct
    return _struct(*exprs, **named)


def select(*exprs, **named):
    from .frame import DataFrame
    return DataFrame({}).select(*exprs, **named)


def _flatten(items):
    for it in items:
        if isinstance(it, (list, tuple)):
            yield from _flatten(it)
        else:
            yield it


def any_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[0]
    for e in es[1:]:
        acc = acc | e
    return acc.alias("any")


def all_horizontal(*exprs) -> Expr:
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = es[0]
    for e in es[1:]:
        acc = acc & e
    return acc.alias("all")


def fold(acc, function, exprs) -> Expr:
    """Horizontal fold with an accumulator expression (reference:
    `polars-plan` fold_exprs). Selector inputs (pl.all(), cs.numeric())
    expand against the schema inside the fold at planning time."""
    acc_e = _wrap_col(acc) if isinstance(acc, (Expr, str)) else \
        Expr("lit", value=acc, dtype=None)
    es = tuple(_wrap_col(e) for e in _flatten([exprs]))
    return Expr("fold_exprs", (acc_e,) + es, function=function, mode="fold")


def reduce(function, exprs) -> Expr:
    es = tuple(_wrap_col(e) for e in _flatten([exprs]))
    return Expr("fold_exprs", (es[0],) + es, function=function,
                mode="reduce")


def cum_fold(acc, function, exprs) -> Expr:
    """Like fold but keeps intermediate results as struct fields."""
    from ..expr import meta as _meta
    out = _wrap_col(acc) if isinstance(acc, (Expr, str)) else \
        Expr("lit", value=acc, dtype=None)
    fields, names = [], []
    for e in _flatten([exprs]):
        e = _wrap_col(e)
        out = function(out, e)
        names.append(_meta.output_name(e))
        fields.append(out.alias(names[-1]))
    from ..expr.expr import struct as _struct
    return _struct(*fields).alias("cum_fold")


def head(column, n: int = 10) -> Expr:
    return _wrap_col(column).head(n)


def tail(column, n: int = 10) -> Expr:
    return _wrap_col(column).tail(n)


def implode(name) -> Expr:
    return _wrap_col(name).implode()


def approx_n_unique(column) -> Expr:
    return _wrap_col(column).n_unique()


def map_batches(exprs, function, return_dtype=None) -> Expr:
    es = [_wrap_col(e) for e in _flatten([exprs])]
    if len(es) != 1:
        raise ComputeError("map_batches over multiple columns: pass one")
    return es[0].map_batches(function, return_dtype)


def arctan2(y, x) -> Expr:
    return Expr("binary", (_wrap_col(y), _wrap_col(x)), op="arctan2")


def format(fmt: str, *args) -> Expr:
    """String interpolation: pl.format("a={}", col) -> concat_str."""
    parts = fmt.split("{}")
    if len(parts) - 1 != len(args):
        raise ComputeError("format placeder count != number of args")
    from ..expr.expr import lit as _lit
    es = []
    for i, p in enumerate(parts):
        if p:
            es.append(_lit(p))
        if i < len(args):
            es.append(_wrap_col(args[i]).cast(String))
    return Expr("concat_str", tuple(es), separator="")


def datetime(year, month, day, hour=0, minute=0, second=0,
             microsecond=0, *, time_unit: str = "us", eager=False):
    """Build a Datetime from components (exprs or ints)."""
    from ..ops import temporal as T

    def days_expr(y, m, d):
        y = _wrap_col(y) if not isinstance(y, int) else Expr("lit", value=y, dtype=None)
        m = _wrap_col(m) if not isinstance(m, int) else Expr("lit", value=m, dtype=None)
        d = _wrap_col(d) if not isinstance(d, int) else Expr("lit", value=d, dtype=None)
        return Expr("datetime_components", (y, m, d),
                    hour=hour, minute=minute, second=second,
                    microsecond=microsecond, time_unit=time_unit)
    return days_expr(year, month, day)


def duration(*, weeks=0, days=0, hours=0, minutes=0, seconds=0,
             milliseconds=0, microseconds=0, time_unit: str = "us"):
    from ..dtypes import Duration as _Dur
    import datetime as _dt
    if all(isinstance(v, (int, float))
           for v in (weeks, days, hours, minutes, seconds, milliseconds,
                     microseconds)):
        td = _dt.timedelta(weeks=weeks, days=days, hours=hours,
                           minutes=minutes, seconds=seconds,
                           milliseconds=milliseconds,
                           microseconds=microseconds)
        return Expr("lit", value=td, dtype=_Dur(time_unit))
    raise ComputeError("pl.duration with expression parts not supported yet")


def date(year, month, day):
    import datetime as _dt
    if all(isinstance(v, int) for v in (year, month, day)):
        return Expr("lit", value=_dt.date(year, month, day), dtype=None)
    dtexpr = datetime(year, month, day)
    return Expr("dt", (dtexpr,), op="date")


def from_epoch(column, time_unit: str = "us"):
    from ..dtypes import Datetime as _Dt
    e = _wrap_col(column)
    if time_unit == "s":
        e = e * 1_000_000
        time_unit = "us"
    return e.cast(_Dt(time_unit))


def int_ranges(start, end, step: int = 1) -> Expr:
    """Per-row integer ranges as a List column."""
    return Expr("int_ranges", (_wrap_col(start), _wrap_col(end)), step=step)


def linear_space(start: float, end: float, num_samples: int,
                 *, eager: bool = True):
    import numpy as np
    from .series import Series
    vals = np.linspace(start, end, num_samples)
    s = Series("literal", list(vals))
    return s if eager else Expr("lit", value=list(vals), dtype=None)


def ones(n: int, dtype=None, *, eager: bool = True):
    from .series import Series
    s = Series("ones", [1] * n, dtype=dtype)
    return s


def zeros(n: int, dtype=None, *, eager: bool = True):
    from .series import Series
    s = Series("zeros", [0] * n, dtype=dtype)
    return s


def sql_expr(sql: str) -> Expr:
    """Parse one SQL expression to an Expr."""
    from ..sql.parser import Parser, tokenize
    from ..sql.translate import translate_expr
    p = Parser(tokenize(sql))
    ast = p.parse_expr()
    return translate_expr(ast, None, None)


def concat_list(*exprs) -> Expr:
    """Combine columns (flat or list) into one list per row."""
    es = [_wrap_col(e) for e in _flatten(exprs)]
    return Expr("concat_list", tuple(es))


def concat_arr(*exprs) -> Expr:
    """Array variant of concat_list (padded lists serve both roles)."""
    return concat_list(*exprs)


def arctan2d(y, x) -> Expr:
    """arctan2 in degrees (reference: py-polars arctan2d)."""
    return arctan2(y, x).degrees()


def arg_where(condition, *, eager: bool = False):
    e = _wrap_col(condition).arg_true()
    if eager:
        from .frame import DataFrame
        raise TypeError("eager arg_where needs a Series input; use "
                        "Series.arg_true()")
    return e


def arg_sort_by(*exprs, descending=False) -> Expr:
    """Row indices that sort the table by the given columns (reference:
    py-polars arg_sort_by)."""
    keys = [_wrap_col(e) for e in _flatten(exprs)]
    return Expr("row_index").sort_by(*keys, descending=descending)


def row_index() -> Expr:
    return Expr("row_index")


def cum_count(*columns, reverse: bool = False) -> Expr:
    cols = [_wrap_col(c) for c in _flatten(columns)]
    return cols[0].cum_count(reverse=reverse)


def cum_reduce(function, exprs) -> Expr:
    """Cumulative horizontal reduce kept per step as struct fields."""
    from ..expr import meta as _meta
    from ..expr.expr import struct as _struct
    es = [_wrap_col(e) for e in _flatten([exprs])]
    out = es[0]
    fields = [out.alias(_meta.output_name(es[0]))]
    for e in es[1:]:
        out = function(out, e)
        fields.append(out.alias(_meta.output_name(e)))
    return _struct(*fields).alias("cum_reduce")


def median(*columns) -> Expr:
    cols = [_wrap_col(c) for c in _flatten(columns)]
    return cols[0].median()


def n_unique(*columns) -> Expr:
    cols = [_wrap_col(c) for c in _flatten(columns)]
    return cols[0].n_unique()


def quantile(column, q: float, interpolation: str = "nearest") -> Expr:
    return _wrap_col(column).quantile(q, interpolation)


def first(column=None) -> Expr:
    from ..expr.expr import first as _first
    if column is None:
        return _first()
    return _wrap_col(column).first()


def last(column=None) -> Expr:
    from ..expr.expr import last as _last
    if column is None:
        return _last()
    return _wrap_col(column).last()


def escape_regex(value: str) -> str:
    import re
    return re.escape(value)


def set_random_seed(seed: int) -> None:
    """Global seed for sample/shuffle defaults (reference:
    py-polars set_random_seed)."""
    from .. import config as _config
    _config.RANDOM_SEED = int(seed)


def collect_all(lazy_frames, **kw):
    return [lf.collect(**kw) for lf in lazy_frames]


def collect_all_async(lazy_frames, **kw):
    import concurrent.futures as _fut
    ex = _fut.ThreadPoolExecutor(max_workers=1)
    fut = ex.submit(lambda: [lf.collect(**kw) for lf in lazy_frames])
    ex.shutdown(wait=False)
    return fut


def explain_all(lazy_frames, **kw) -> str:
    return "\n".join(lf.explain() for lf in lazy_frames)


def align_frames(*frames, on, how: str = "outer", select=None):
    """Align frames on key columns so each has the same key rows in the
    same order (reference: py-polars align_frames)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    keys = None
    for f in frames:
        k = f.select([Expr("col", name=c) for c in on_cols]).unique()
        keys = k if keys is None else concat([keys, k]).unique()
    keys = keys.sort(on_cols)
    out = []
    for f in frames:
        a = keys.join(f, on=on_cols, how="left").sort(on_cols)
        if select is not None:
            a = a.select(select)
        out.append(a)
    return out


def field(name) -> Expr:
    """Reference a sibling struct field inside struct.with_fields
    (reference: py-polars pl.field)."""
    names = [name] if isinstance(name, str) else list(name)
    if len(names) == 1:
        return Expr("field", name=names[0])
    from ..errors import InvalidOperationError
    raise InvalidOperationError("pl.field supports one name")


def business_day_count(start, end) -> Expr:
    """Business days (Mon-Fri) in [start, end) between two date columns."""
    return Expr("business_day_count",
                (_wrap_col(start), _wrap_col(end)))


def rolling_cov(a, b, *, window_size: int, min_samples=None,
                ddof: int = 1) -> Expr:
    return Expr("rolling_pair", (_wrap_col(a), _wrap_col(b)), stat="cov",
                window_size=window_size, min_samples=min_samples, ddof=ddof)


def rolling_corr(a, b, *, window_size: int, min_samples=None,
                 ddof: int = 1) -> Expr:
    return Expr("rolling_pair", (_wrap_col(a), _wrap_col(b)), stat="corr",
                window_size=window_size, min_samples=min_samples, ddof=ddof)


def read_ipc_stream(source, **kw):
    """Read an Arrow IPC *stream* (not file) into a DataFrame."""
    import io as _io
    import pyarrow.ipc as paipc
    from .frame import DataFrame
    if isinstance(source, (bytes, bytearray)):
        source = _io.BytesIO(source)
    t = paipc.open_stream(source).read_all()
    return from_arrow(t)


def read_ipc_schema(source) -> dict:
    import pyarrow.ipc as paipc
    from ..io.arrow_interop import dtype_from_arrow
    with open(source, "rb") if isinstance(source, str) else source as f:
        sch = paipc.open_file(f).schema
    return {n: dtype_from_arrow(sch.field(n).type) for n in sch.names}


def read_parquet_schema(source) -> dict:
    import pyarrow.parquet as pq
    from ..io.arrow_interop import dtype_from_arrow
    sch = pq.read_schema(str(source))
    return {n: dtype_from_arrow(sch.field(n).type) for n in sch.names}


def read_parquet_metadata(source) -> dict:
    import pyarrow.parquet as pq
    md = pq.read_metadata(str(source))
    return {"num_rows": md.num_rows, "num_columns": md.num_columns,
            "num_row_groups": md.num_row_groups,
            "created_by": md.created_by,
            "format_version": md.format_version}


class BatchedCsvReader:
    """Chunked CSV reading (reference: py-polars read_csv_batched)."""

    def __init__(self, source, batch_size: int, kw: dict):
        import pyarrow.csv as pacsv
        opts = pacsv.ReadOptions(
            block_size=builtins.max(int(batch_size), 1) * 64)
        self._reader = pacsv.open_csv(str(source), read_options=opts)
        self._done = False

    def next_batches(self, n: int):
        from .frame import DataFrame
        import pyarrow as pa
        if self._done:
            return None
        out = []
        for _ in range(n):
            try:
                b = self._reader.read_next_batch()
            except StopIteration:
                self._done = True
                break
            out.append(from_arrow(pa.Table.from_batches([b])))
        return out or None


def read_csv_batched(source, *, batch_size: int = 50_000, **kw):
    return BatchedCsvReader(source, batch_size, kw)


def read_delta(source, *, table: str = "data", version=None, **kw):
    """Read from the lakehouse store (our Delta-equivalent; reference:
    py-polars read_delta -> polarway-lakehouse store)."""
    from ..lakehouse import LakeStore
    store = LakeStore(str(source))
    if version is not None:
        return store.read_version(table, int(version))
    return store.read(table)


def scan_delta(source, *, table: str = "data", **kw):
    from ..lakehouse import LakeStore
    return LakeStore(str(source)).scan(table)


def scan_pyarrow_dataset(ds, *, allow_pyarrow_filter: bool = True):
    """Lazy frame over a pyarrow.dataset (materializes through the
    dataset's own column/predicate pushdown at collect time)."""
    return from_arrow(ds.to_table()).lazy()


def _norm_schema(schema):
    from ..dtypes import DataType as _DT
    items = schema.items() if isinstance(schema, dict) else list(schema)
    out = {}
    for nm, d in items:
        if isinstance(d, type) and issubclass(d, _DT):
            d = d()
        out[nm] = d
    return out


def register_io_source(callable_, *, schema):
    """Plug a custom source into the lazy engine (reference: py-polars
    register_io_source / io plugins): `callable_(with_columns, predicate,
    n_rows, batch_size)` yields DataFrames. Execution is deferred to
    collect time (the source runs inside the plan, not at registration)."""
    from .frame import DataFrame
    from ..plan import logical as L

    declared = _norm_schema(schema)

    def run(_t):
        frames = list(callable_(None, None, None, None))
        if not frames:
            return DataFrame(schema=declared)._table
        out = frames[0]
        for f in frames[1:]:
            out = out.vstack(f)
        return out._table

    from .lazyframe import LazyFrame
    empty = L.DataFrameScan(DataFrame(schema=declared)._table)
    return LazyFrame._from_plan(
        L.MapFunction(empty, run, schema_fn=lambda _s: dict(declared),
                      label="io_source"))


def map_groups(exprs, function, return_dtype=None, *,
               is_elementwise: bool = False,
               returns_scalar: bool = False) -> Expr:
    """Apply a custom UDF in a GroupBy context (reference:
    `py-polars/src/polars/functions/lazy.py:1209`). The function receives
    one Series per input expression for each group."""
    from ..expr.expr import _wrap_col
    es = tuple(_wrap_col(x) for x in
               (exprs if isinstance(exprs, (list, tuple)) else [exprs]))
    return Expr("map_groups_udf", es, fn=function,
                return_dtype=return_dtype, returns_scalar=returns_scalar)


def groups(column: str) -> Expr:
    """Deprecated sugar for `pl.col(column).agg_groups()` (reference:
    `py-polars/src/polars/functions/lazy.py:1879`)."""
    import warnings
    warnings.warn("pl.groups() is deprecated; use "
                  "pl.col(...).agg_groups() instead", DeprecationWarning,
                  stacklevel=2)
    from ..expr.expr import col as _c
    return _c(column).agg_groups()


def defer(function, *, schema, validate_schema: bool = True):
    """Defer an eager DataFrame-producing function until collect
    (reference: `py-polars/src/polars/io/plugins.py:109` pl.defer)."""
    declared = _norm_schema(schema) if not callable(schema) else None

    def source(with_columns, predicate, n_rows, batch_size):
        df = function()
        if validate_schema:
            got = dict(df.schema)
            want = declared if declared is not None else \
                _norm_schema(schema())
            if list(got) != list(want) or \
                    builtins.any(repr(got[k]) != repr(want[k])
                                 for k in want):
                from ..errors import SchemaError
                raise SchemaError(
                    f"defer: schema mismatch (declared {want}, got {got})")
        yield df

    sch = declared if declared is not None else _norm_schema(schema())
    return register_io_source(source, schema=sch)


def read_avro(source, columns=None, n_rows=None):
    """Read an Avro object-container file (self-contained codec,
    `io/avro.py`; reference: `polars-io/src/avro/read.rs`)."""
    from ..io.avro import read_avro as _ra
    return _ra(source, columns=columns, n_rows=n_rows)


def read_excel(source, **kw):
    raise ModuleNotFoundError(
        "read_excel requires fastexcel/openpyxl, which are not bundled")


def read_ods(source, **kw):
    raise ModuleNotFoundError(
        "read_ods requires an ods engine, which is not bundled")


def read_database(query, connection, **kw):
    raise ModuleNotFoundError(
        "read_database requires a database driver, which is not bundled")


def read_database_uri(query, uri, **kw):
    raise ModuleNotFoundError(
        "read_database_uri requires connectorx/adbc, which is not bundled")


def read_clipboard(**kw):
    raise OSError("no clipboard available in a headless environment")


def scan_iceberg(source, **kw):
    raise ModuleNotFoundError(
        "scan_iceberg requires pyiceberg, which is not bundled")


# --- py-polars top-level surface: string cache, ranges, misc --------------

class StringCache:
    """No-op context manager: dictionaries are per-column and merged on
    demand, so a global string cache is unnecessary (reference:
    polars StringCache exists to make categoricals comparable)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def enable_string_cache() -> None:
    return None


def disable_string_cache() -> None:
    return None


def using_string_cache() -> bool:
    return True  # per-column dicts behave as if always cached


def union(items, how: str = "vertical", **kw):
    return concat(items, how=how)


def cum_sum(*columns) -> Expr:
    cols = [_wrap_col(c) for c in _flatten(columns)]
    return cols[0].cum_sum()


def cum_sum_horizontal(*exprs) -> Expr:
    from ..expr.expr import struct as _struct
    from ..expr import meta as _meta
    es = [_wrap_col(e) for e in _flatten(exprs)]
    acc = None
    fields = []
    for e in es:
        acc = e if acc is None else (acc + e)
        fields.append(acc.alias(_meta.output_name(e)))
    return _struct(*fields).alias("cum_sum")


def time(hour=0, minute=0, second=0, microsecond=0) -> Expr:
    import datetime as _dt
    t = _dt.time(int(hour), int(minute), int(second), int(microsecond))
    ns = ((t.hour * 3600 + t.minute * 60 + t.second) * 1_000_000_000
          + t.microsecond * 1000)
    from ..dtypes import Time as _Time
    return Expr("lit", value=ns, dtype=_Time)


def datetime_range(start, end, interval: str = "1d", *,
                   closed: str = "both", eager: bool = False, **kw):
    return date_range(start, end, interval, closed=closed, eager=eager)


def date_ranges(start, end, interval: str = "1d", *, eager: bool = False,
                **kw) -> Expr:
    """Per-row ranges as a list column (reference: pl.date_ranges)."""
    s = _wrap_col(start)
    e2 = _wrap_col(end)
    from ..ops.temporal import parse_every
    kind, ns = parse_every(interval)
    if kind != "fixed":
        raise ComputeError("date_ranges: month intervals unsupported")
    step_days = builtins.max(ns // (86_400 * 1_000_000_000), 1)
    return Expr("int_ranges",
                (s.cast(None) if False else s.to_physical(),
                 (e2.to_physical() + 1)),
                step=int(step_days)).alias("date_range")


def datetime_ranges(start, end, interval: str = "1d", **kw) -> Expr:
    return date_ranges(start, end, interval, **kw)


def time_range(start=None, end=None, interval: str = "1h", *,
               eager: bool = False, **kw):
    import datetime as _dt
    from ..ops.temporal import parse_every
    from .series import Series
    s = start or _dt.time(0)
    e2 = end or _dt.time(23, 59, 59, 999999)
    kind, ns = parse_every(interval)
    out = []
    cur = (s.hour * 3600 + s.minute * 60 + s.second) * 10**9 \
        + s.microsecond * 1000
    endns = (e2.hour * 3600 + e2.minute * 60 + e2.second) * 10**9 \
        + e2.microsecond * 1000
    while cur <= endns:
        out.append(cur)
        cur += ns
    from ..dtypes import Time as _Time
    ser = Series("literal", out, dtype=_Time)
    if eager:
        return ser
    return Expr("lit", value=np.asarray(out, np.int64), dtype=_Time) \
        .alias("time")


def time_ranges(*a, **kw):
    raise ComputeError("time_ranges (per-row) not supported; "
                       "use time_range")


def linear_spaces(start, end, num_samples, *, eager: bool = False, **kw):
    raise ComputeError("linear_spaces (per-row) not supported; "
                       "use linear_space")


def from_dicts(dicts, schema=None):
    from .frame import DataFrame
    rows = list(dicts)
    if not rows:
        return DataFrame(schema=schema)
    cols = {}
    keys = []
    for r in rows:
        for k2 in r:
            if k2 not in cols:
                cols[k2] = []
                keys.append(k2)
    for r in rows:
        for k2 in keys:
            cols[k2].append(r.get(k2))
    return DataFrame(cols, schema=schema)


def from_repr(text: str):
    """Parse a printed DataFrame repr back into a frame (reference:
    pl.from_repr; useful for doctests/bug reports)."""
    from .frame import DataFrame
    lines = [ln for ln in text.splitlines() if "│" in ln]
    if len(lines) < 2:
        raise ComputeError("no table found in repr text")
    rows = [[c.strip() for c in ln.strip().strip("│").split("│")]
            for ln in lines]
    names = rows[0]
    dtypes = rows[1] if len(rows) > 1 and rows[1] and \
        rows[1][0] and not rows[1][0][0].isdigit() else None
    data_rows = rows[2:] if dtypes else rows[1:]
    cols = {n: [] for n in names}

    def parse_cell(s):
        if s in ("null", ""):
            return None
        if s in ("true", "false"):
            return s == "true"
        try:
            return int(s)
        except ValueError:
            pass
        try:
            return builtins.float(s)
        except ValueError:
            return s.strip('"')
    for r in data_rows:
        for n, c in zip(names, r):
            cols[n].append(parse_cell(c))
    return DataFrame(cols)


def from_torch(tensor, schema=None):
    return from_numpy(np.asarray(tensor.cpu().numpy()), schema=schema)


def from_dataframe(df, *, allow_copy: bool = True):
    """Dataframe-interchange-protocol import (via pyarrow)."""
    import pyarrow.interchange as pai
    return from_arrow(pai.from_dataframe(df, allow_copy=allow_copy))


def json_normalize(data, *, separator: str = ".", max_level=None):
    """Flatten nested dicts into dotted columns (reference:
    pl.json_normalize)."""
    rows = data if isinstance(data, list) else [data]

    def flatten(d, prefix="", level=0):
        out = {}
        for k2, v2 in d.items():
            key = f"{prefix}{separator}{k2}" if prefix else str(k2)
            if isinstance(v2, dict) and (max_level is None
                                         or level < max_level):
                out.update(flatten(v2, key, level + 1))
            else:
                out[key] = v2
        return out
    return from_dicts([flatten(r) for r in rows])


def build_info() -> dict:
    import jax as _jax
    return {"version": "0.1.0", "engine": "polaroid-tpu",
            "jax": _jax.__version__,
            "backend": _jax.default_backend()}


def show_versions() -> None:
    for k2, v2 in build_info().items():
        print(f"{k2:10} {v2}")


def get_index_type():
    from ..dtypes import UInt32 as _U32
    return _U32


def thread_pool_size() -> int:
    import os as _os
    return _os.cpu_count() or 1


threadpool_size = thread_pool_size


class GPUEngine:
    """Accepted for py-polars compatibility; collect(engine=GPUEngine())
    maps to the default device engine (the TPU is the accelerator here)."""

    def __init__(self, **config) -> None:
        self.config = config


class QueryOptFlags:
    """Optimizer toggles (reference: polars QueryOptFlags)."""

    def __init__(self, *, predicate_pushdown=True, projection_pushdown=True,
                 slice_pushdown=True, comm_subplan_elim=True,
                 comm_subexpr_elim=True, **kw) -> None:
        self.predicate_pushdown = predicate_pushdown
        self.projection_pushdown = projection_pushdown
        self.slice_pushdown = slice_pushdown
        self.comm_subplan_elim = comm_subplan_elim
        self.comm_subexpr_elim = comm_subexpr_elim

    @classmethod
    def none(cls):
        return cls(predicate_pushdown=False, projection_pushdown=False,
                   slice_pushdown=False, comm_subplan_elim=False,
                   comm_subexpr_elim=False)


class CompatLevel:
    @classmethod
    def newest(cls):
        return cls()

    @classmethod
    def oldest(cls):
        return cls()


class KeyedPartition:
    """One key=value pair of a partition (reference:
    `py-polars/src/polars/io/partition.py:26`)."""

    def __init__(self, name: str, str_value: str, raw_value) -> None:
        self.name = name
        self.str_value = str_value
        self.raw_value = raw_value

    def hive_name(self) -> str:
        return f"{self.name}={self.str_value}"


class BasePartitionContext:
    """Callback context for a partition file creation (reference:
    `py-polars/src/polars/io/partition.py:103`)."""

    def __init__(self, file_idx: int, file_path, full_path) -> None:
        self.file_idx = file_idx
        self.file_path = file_path
        self.full_path = full_path


class KeyedPartitionContext(BasePartitionContext):
    """Callback context for keyed partition creation (reference:
    `py-polars/src/polars/io/partition.py:55`)."""

    def __init__(self, file_idx: int, part_idx: int, in_part_idx: int,
                 keys, file_path, full_path) -> None:
        super().__init__(file_idx, file_path, full_path)
        self.part_idx = part_idx
        self.in_part_idx = in_part_idx
        self.keys = keys

    def hive_dirs(self):
        from pathlib import Path
        p = Path(self.keys[0].hive_name())
        for key in self.keys[1:]:
            p = p / key.hive_name()
        return p


class PartitionByKey:
    """Partitioned-sink spec: hive-style key directories (reference:
    polars PartitionByKey -> our write_parquet(partition_by=...))."""

    def __init__(self, base_path, *, by, include_key: bool = True,
                 **kw) -> None:
        self.base_path = str(base_path)
        self.by = [by] if isinstance(by, str) else [
            b if isinstance(b, str) else str(b) for b in by]
        self.include_key = include_key


class PartitionMaxSize:
    """Partitioned-sink spec: chunk files of at most max_size rows."""

    def __init__(self, base_path, *, max_size: int, **kw) -> None:
        self.base_path = str(base_path)
        self.max_size = int(max_size)


class PartitionParted(PartitionByKey):
    """Like PartitionByKey for pre-sorted ('parted') data."""


class Categories:
    """Namespace handle for global categories (reference: polars
    Categories). Per-column dictionaries make this a no-op."""

    def __init__(self, name: str = "") -> None:
        self.name = name


class ScanCastOptions:
    """Cast policy for scans (accepted; scans already upcast per our
    supertype rules)."""

    def __init__(self, **kw) -> None:
        self.options = kw


class Catalog:
    def __init__(self, *a, **kw):
        raise ModuleNotFoundError(
            "Catalog requires a Unity/REST catalog client, not bundled")


class CredentialProvider:
    pass


class CredentialProviderFunction(CredentialProvider):
    def __init__(self, function=None, **kw):
        self.function = function


CredentialProviderFunctionReturn = dict


class CredentialProviderAWS(CredentialProvider):
    def __init__(self, *a, **kw):
        raise ModuleNotFoundError("AWS credential chains require boto3, "
                                  "not bundled")


class CredentialProviderAzure(CredentialProvider):
    def __init__(self, *a, **kw):
        raise ModuleNotFoundError("Azure credential chains require "
                                  "azure-identity, not bundled")


class CredentialProviderGCP(CredentialProvider):
    def __init__(self, *a, **kw):
        raise ModuleNotFoundError("GCP credential chains require "
                                  "google-auth, not bundled")


def sql(query: str, *, eager: bool = False):
    """Run SQL against DataFrames/LazyFrames found in the caller's
    namespace (parity: `pl.sql`, py-polars `functions/sql.py`)."""
    import inspect
    from ..api.frame import DataFrame
    from ..api.lazyframe import LazyFrame
    from ..sql.context import SQLContext
    frame = inspect.currentframe().f_back
    ns = {}
    ns.update(frame.f_globals)
    ns.update(frame.f_locals)
    ctx = SQLContext()
    for name, obj in ns.items():
        if isinstance(obj, (DataFrame, LazyFrame)):
            ctx.register(name, obj)
    return ctx.execute(query, eager=eager)
