"""LazyFrame: deferred query construction.

Parity target: `py-polars/src/polars/lazyframe/frame.py` (collect at
`frame.py:2161`) over `polars-lazy/src/frame/mod.rs:628`
collect_with_engine — builds the logical plan (`plan/logical.py`), runs
the optimizer, then the in-memory or streaming executor.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from ..config import CONFIG
from ..errors import ComputeError
from ..expr import meta
from ..expr.expr import Expr, col as _col
from ..plan import logical as L
from ..plan.optimizer import optimize

# Optimized-plan memo: interactive collect() re-optimizes the same plan
# every call (reference re-optimizes per collect too, but its passes are
# ~µs; ours are ~1 ms of Python). Keyed by structural fingerprint —
# table objects fingerprint by id(), and the cached plan holds a strong
# ref to them, so an id can never be recycled while its key is live.
from collections import OrderedDict as _OrderedDict

_OPT_CACHE: "_OrderedDict[tuple, object]" = _OrderedDict()


def _optimize_cached(plan, eng):
    try:
        key = (plan.fingerprint(), eng)
    except Exception:
        return optimize(plan, eng)
    hit = _OPT_CACHE.get(key)
    if hit is None:
        hit = optimize(plan, eng)
        _OPT_CACHE[key] = hit
        if len(_OPT_CACHE) > 256:
            _OPT_CACHE.popitem(last=False)
    else:
        _OPT_CACHE.move_to_end(key)
    return hit


def _to_exprs(args, kwargs=None) -> List[Expr]:
    from .frame import _to_exprs as f
    return f(args, kwargs)


class LazyFrame:
    def __init__(self, data=None, schema=None):
        if data is None:
            from ..batch import Table
            from ..config import capacity_for
            self._plan = L.DataFrameScan(Table([], {}, capacity_for(0), 0, None))
        else:
            from .frame import DataFrame
            self._plan = L.DataFrameScan(DataFrame(data, schema=schema)._table)

    @classmethod
    def _from_plan(cls, plan: L.Plan) -> "LazyFrame":
        lf = cls.__new__(cls)
        lf._plan = plan
        return lf

    @classmethod
    def _from_existing(cls, table) -> "LazyFrame":
        return cls._from_plan(L.DataFrameScan(table))

    # --- introspection --------------------------------------------------
    @property
    def columns(self) -> List[str]:
        return list(self._plan.schema().keys())

    @property
    def schema(self) -> Dict[str, object]:
        return dict(self._plan.schema())

    def collect_schema(self) -> Dict[str, object]:
        return self.schema

    @property
    def dtypes(self):
        return list(self._plan.schema().values())

    @property
    def width(self) -> int:
        return len(self.columns)

    def explain(self, optimized: bool = True) -> str:
        p = optimize(self._plan) if optimized else self._plan
        return p.describe()

    def show_graph(self) -> str:
        return self.explain()

    def __repr__(self) -> str:
        return f"<LazyFrame at 0x{id(self):x}>\n{self._plan.describe()}"

    # --- plan builders --------------------------------------------------
    def select(self, *exprs, **named) -> "LazyFrame":
        es = _to_exprs(exprs, named)
        stripped, explode_names = [], []
        for e in es:
            e2, hit = meta.strip_top_explode(e)
            stripped.append(e2)
            if hit:
                explode_names.append(meta.output_name(e2))
        plan = L.Select(self._plan, stripped)
        if explode_names:
            plan = L.Explode(plan, explode_names)
        return LazyFrame._from_plan(plan)

    def with_columns(self, *exprs, **named) -> "LazyFrame":
        return LazyFrame._from_plan(
            L.WithColumns(self._plan, _to_exprs(exprs, named)))

    def filter(self, *predicates, **constraints) -> "LazyFrame":
        preds = _to_exprs(predicates)
        for k, v in constraints.items():
            preds.append(_col(k) == v)
        pred = preds[0]
        for p in preds[1:]:
            pred = pred & p
        return LazyFrame._from_plan(L.Filter(self._plan, pred))

    def group_by(self, *by, maintain_order: bool = False, **named_by):
        keys = _to_exprs(by, named_by)
        return LazyGroupBy(self, keys, maintain_order)

    def sort(self, by, *more_by, descending=False, nulls_last=False,
             maintain_order: bool = False) -> "LazyFrame":
        keys = _to_exprs((by,) + more_by)
        nk = len(keys)
        desc = descending if isinstance(descending, (list, tuple)) \
            else [descending] * nk
        nl = nulls_last if isinstance(nulls_last, (list, tuple)) \
            else [nulls_last] * nk
        return LazyFrame._from_plan(
            L.Sort(self._plan, keys, list(desc), list(nl), maintain_order))

    def top_k(self, k: int, by, descending=False) -> "LazyFrame":
        keys = _to_exprs((by,) if not isinstance(by, (list, tuple)) else tuple(by))
        nk = len(keys)
        desc = descending if isinstance(descending, (list, tuple)) \
            else [descending] * nk
        desc = [not d for d in desc]
        return LazyFrame._from_plan(
            L.Sort(self._plan, keys, list(desc), [True] * nk, True, (0, k)))

    def head(self, n: int = 5) -> "LazyFrame":
        return LazyFrame._from_plan(L.Slice(self._plan, 0, n))

    def limit(self, n: int = 5) -> "LazyFrame":
        return self.head(n)

    def tail(self, n: int = 5) -> "LazyFrame":
        return LazyFrame._from_plan(L.Slice(self._plan, -n, n))

    def slice(self, offset: int, length: Optional[int] = None) -> "LazyFrame":
        return LazyFrame._from_plan(L.Slice(self._plan, offset, length))

    def first(self) -> "LazyFrame":
        return self.head(1)

    def last(self) -> "LazyFrame":
        return self.tail(1)

    def unique(self, subset=None, keep: str = "any",
               maintain_order: bool = False) -> "LazyFrame":
        sub = [subset] if isinstance(subset, str) else \
            (list(subset) if subset is not None else None)
        return LazyFrame._from_plan(
            L.Distinct(self._plan, sub, keep, maintain_order))

    def drop(self, *names, strict: bool = True) -> "LazyFrame":
        flat = []
        for n in names:
            flat.extend(n if isinstance(n, (list, tuple)) else [n])
        return LazyFrame._from_plan(L.Drop(self._plan, flat, strict))

    def rename(self, mapping: Dict[str, str], strict: bool = True) -> "LazyFrame":
        return LazyFrame._from_plan(L.Rename(self._plan, mapping))

    def explode(self, *columns) -> "LazyFrame":
        flat = []
        for c in columns:
            if isinstance(c, (list, tuple)):
                flat.extend(c)
            else:
                flat.append(c)
        names = [c.attrs["name"] if isinstance(c, Expr) else c for c in flat]
        return LazyFrame._from_plan(L.Explode(self._plan, names))

    def unnest(self, *columns) -> "LazyFrame":
        flat = []
        for c in columns:
            flat.extend(c if isinstance(c, (list, tuple)) else [c])
        return LazyFrame._from_plan(L.MapFunction(
            self._plan, lambda t: _unnest_table(t, flat),
            schema_fn=lambda s: _unnest_schema(s, flat),
            label=f"unnest[{','.join(flat)}]"))

    def cast(self, dtypes, strict: bool = True) -> "LazyFrame":
        if isinstance(dtypes, dict):
            exprs = [_col(k).cast(v) for k, v in dtypes.items()]
        else:
            exprs = [_col(n).cast(dtypes) for n in self.columns]
        return self.with_columns(exprs)

    def with_row_index(self, name: str = "index", offset: int = 0) -> "LazyFrame":
        return LazyFrame._from_plan(L.WithRowIndex(self._plan, name, offset))

    def join(self, other: "LazyFrame", on=None, how: str = "inner", *,
             left_on=None, right_on=None, suffix: str = "_right",
             join_nulls: bool = False, nulls_equal: bool = False,
             coalesce: Optional[bool] = None,
             maintain_order: Optional[str] = None,
             validate: str = "m:m", allow_parallel: bool = True) -> "LazyFrame":
        join_nulls = join_nulls or nulls_equal
        if on is not None:
            left_on = right_on = [on] if isinstance(on, str) else list(on)
        elif how != "cross":
            if left_on is None or right_on is None:
                raise ComputeError("join requires `on` or `left_on`+`right_on`")
            left_on = [left_on] if isinstance(left_on, str) else list(left_on)
            right_on = [right_on] if isinstance(right_on, str) else list(right_on)
        else:
            left_on = right_on = []
        return LazyFrame._from_plan(
            L.Join(self._plan, other._plan, left_on, right_on, how, suffix,
                   join_nulls, coalesce, maintain_order))

    def join_where(self, other: "LazyFrame", *predicates,
                   suffix: str = "_right") -> "LazyFrame":
        """Inequality join (reference: iejoin,
        `polars-ops/src/frame/join/iejoin/mod.rs:206`, Khayyat et al.):
        predicates of the form `left_expr OP right_expr` (OP an
        inequality) drive a sort + wavelet-tree dominance enumeration —
        the cross product is never materialized (`ops/iejoin.py`).
        Right-side name collisions take `suffix`, as in polars —
        reference them suffixed in the predicates. Predicates that
        don't decompose into one-side-each inequalities are applied as
        filters on the candidate pairs (falling back to cross+filter
        only when NO predicate decomposes)."""
        if not predicates:
            raise ComputeError("join_where requires at least one predicate")
        preds = _to_exprs(predicates)
        from ..expr import meta as _meta
        lschema = self._plan.schema()
        rschema = other._plan.schema()
        out_right = {}
        for n in rschema:
            out_right[f"{n}{suffix}" if n in lschema else n] = n
        _flip = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}

        def side(e):
            roots = _meta.root_names(e)
            if roots and roots <= set(lschema):
                return "l"
            if roots and roots <= set(out_right):
                return "r"
            return None

        def to_right(e):
            # rewrite joined-output names back to right-frame names
            from ..expr.expr import Expr
            if e.kind == "col":
                return Expr("col", (), name=out_right[e.attrs["name"]])
            if not e.children:
                return e
            return Expr(e.kind, tuple(to_right(c) for c in e.children),
                        **e.attrs)

        def is_sortable(e, schema):
            try:
                dt = _meta.output_dtype(e, schema)
            except Exception:
                return False
            return not (dt.is_string or dt.is_nested)

        ineq, post = [], []
        for p in preds:
            op = p.attrs.get("op") if p.kind == "binary" else None
            if op in ("lt", "le", "gt", "ge"):
                a, b = p.children
                sa, sb = side(a), side(b)
                if sa == "l" and sb == "r" and is_sortable(a, lschema):
                    ineq.append((a, op, to_right(b)))
                    continue
                if sa == "r" and sb == "l" and is_sortable(b, lschema):
                    ineq.append((b, _flip[op], to_right(a)))
                    continue
            post.append(p)
        if ineq:
            return LazyFrame._from_plan(
                L.IEJoin(self._plan, other._plan, ineq, post, suffix))
        pred = preds[0]
        for p in preds[1:]:
            pred = pred & p
        crossed = L.Join(self._plan, other._plan, [], [], "cross", suffix,
                         False, None)
        return LazyFrame._from_plan(L.Filter(crossed, pred))

    def merge_sorted(self, other: "LazyFrame", key: str) -> "LazyFrame":
        """Merge two key-sorted frames into one key-sorted frame
        (reference: `polars-stream/src/nodes/merge_sorted.rs`). A stable
        device sort over the concatenation — one fused XLA sort instead
        of a sequential two-pointer merge."""
        unioned = L.Union([self._plan, other._plan], "vertical_relaxed")
        return LazyFrame._from_plan(
            L.Sort(unioned, [_col(key)], [False], [False], True))

    def group_by_dynamic(self, index_column: str, *, every: str,
                         period: Optional[str] = None,
                         offset: Optional[str] = None, closed: str = "left",
                         group_by=None, start_by: str = "window"):
        outer = self

        class _Dyn:
            def agg(_s, *aggs, **named):
                if (period is None or period == every) and closed == "left":
                    # non-overlapping windows lower to a REAL group-by on
                    # the truncated index + sort — the streaming engine's
                    # two-phase agg and every optimizer pass see through
                    # (mirrors the eager fast path in
                    # ops/temporal_window.py dynamic_group_by)
                    from ..ops.temporal_window import bucket_expr
                    ins = outer._plan.schema()
                    keys = _to_exprs((group_by,)) if group_by is not None \
                        else []
                    b = bucket_expr(index_column, ins[index_column], every,
                                    offset).alias(index_column)
                    gkeys = list(keys) + [b]
                    es = meta.expand_exprs(_to_exprs(aggs, named), ins)
                    gb = L.GroupBy(outer._plan, gkeys, list(es), False)
                    names = [meta.output_name(k) for k in gkeys]
                    srt = L.Sort(gb, [_col(n) for n in names],
                                 [False] * len(names), [False] * len(names),
                                 False, None)
                    return LazyFrame._from_plan(srt)

                def fn(t):
                    from ..ops.temporal_window import dynamic_group_by
                    keys = _to_exprs((group_by,)) if group_by is not None else []
                    es = meta.expand_exprs(_to_exprs(aggs, named),
                                           dict(t.schema))
                    return dynamic_group_by(t, index_column, every, period,
                                            offset, closed, keys, es, start_by)

                def schema_fn(ins):
                    keys = _to_exprs((group_by,)) if group_by is not None else []
                    out = {}
                    for k in keys:
                        out[meta.output_name(k)] = meta.output_dtype(k, ins)
                    out[index_column] = ins[index_column]
                    for a in meta.expand_exprs(_to_exprs(aggs, named), ins):
                        out[meta.output_name(a)] = meta.output_dtype(a, ins)
                    return out
                return LazyFrame._from_plan(
                    L.MapFunction(outer._plan, fn, schema_fn, False,
                                  "group_by_dynamic"))
        return _Dyn()

    def rolling(self, index_column: str, *, period: str, group_by=None,
                closed: str = "right"):
        outer = self

        class _Roll:
            def agg(_s, *aggs, **named):
                def fn(t):
                    from ..ops.temporal_window import rolling_agg
                    keys = _to_exprs((group_by,)) if group_by is not None else []
                    es = meta.expand_exprs(_to_exprs(aggs, named),
                                           dict(t.schema))
                    return rolling_agg(t, index_column, period, keys, es,
                                       closed)
                return LazyFrame._from_plan(
                    L.MapFunction(outer._plan, fn, None, False, "rolling"))
        return _Roll()

    def join_asof(self, other: "LazyFrame", *, on=None, left_on=None,
                  right_on=None, by=None, by_left=None, by_right=None,
                  strategy: str = "backward", suffix: str = "_right",
                  tolerance=None) -> "LazyFrame":
        from ..ops.asof import asof_join_plan
        return asof_join_plan(self, other, on, left_on, right_on, by, by_left,
                              by_right, strategy, suffix, tolerance)

    def drop_nulls(self, subset=None) -> "LazyFrame":
        names = [subset] if isinstance(subset, str) else (subset or self.columns)
        pred = None
        for n in names:
            p = _col(n).is_not_null()
            pred = p if pred is None else (pred & p)
        return self.filter(pred) if pred is not None else self

    def fill_null(self, value=None, strategy: Optional[str] = None) -> "LazyFrame":
        return self.with_columns([_col("*").fill_null(value, strategy=strategy)])

    def fill_nan(self, value) -> "LazyFrame":
        exprs = [_col(n).fill_nan(value) for n, dt in self.schema.items()
                 if dt.is_float]
        return self.with_columns(exprs) if exprs else self

    def reverse(self) -> "LazyFrame":
        def fn(t):
            from .frame import DataFrame
            return DataFrame._from_table(t).reverse()._table
        return LazyFrame._from_plan(
            L.MapFunction(self._plan, fn, label="reverse"))

    def unpivot(self, on=None, *, index=None, variable_name: str = "variable",
                value_name: str = "value") -> "LazyFrame":
        index = [index] if isinstance(index, str) else list(index or [])
        if on is None:
            on = [c for c in self.columns if c not in index]
        on = [on] if isinstance(on, str) else list(on)
        return LazyFrame._from_plan(
            L.Unpivot(self._plan, on, index, variable_name, value_name))

    melt = unpivot

    def map_batches(self, fn, schema=None, streamable: bool = False) -> "LazyFrame":
        def wrapped(t):
            from .frame import DataFrame
            out = fn(DataFrame._from_table(t))
            return out._table
        return LazyFrame._from_plan(
            L.MapFunction(self._plan, wrapped,
                          (lambda s: schema) if schema else None, streamable))

    # --- execution ------------------------------------------------------
    def optimized_plan(self) -> L.Plan:
        return optimize(self._plan)

    def collect(self, engine: str = "auto", streaming: bool = False,
                background: bool = False, **kw):
        from .frame import DataFrame
        from ..exec.executor import ExecState, execute
        self._plan.schema()  # validate names/dtypes before pushdowns mask them
        eng = engine if engine != "auto" else CONFIG.engine_affinity
        if streaming:
            eng = "streaming"
        plan = _optimize_cached(self._plan, eng)
        if CONFIG.visualize_ir:
            print(plan.describe())
        if streaming or eng == "streaming":
            from ..exec.streaming import execute_streaming
            t = execute_streaming(plan)
        elif eng == "distributed":
            from ..exec.distributed import collect_distributed
            t = collect_distributed(plan, kw.get("mesh"))
        else:
            state = ExecState()
            t = execute(plan, state)
            if CONFIG.log_metrics and state.timings:
                for name, dt in state.timings:
                    print(f"[metrics] {name}: {dt*1e3:.2f} ms")
        from ..ops.compact import compact
        return DataFrame._from_table(compact(t))

    def profile(self, **kw):
        from .frame import DataFrame
        from ..exec.executor import ExecState, execute
        plan = optimize(self._plan)
        state = ExecState(track_metrics=True)
        t = execute(plan, state)
        prof = DataFrame({
            "node": [n for n, _ in state.timings],
            "ms": [dt * 1e3 for _, dt in state.timings],
        })
        from ..ops.compact import compact
        return DataFrame._from_table(compact(t)), prof

    def fetch(self, n_rows: int = 500):
        return self.head(n_rows).collect()

    def lazy(self) -> "LazyFrame":
        return self

    def cache(self) -> "LazyFrame":
        return LazyFrame._from_plan(L.Cache(self._plan))

    # --- frame-level aggregation shortcuts -------------------------------
    def _agg_all(self, agg: str, **kw) -> "LazyFrame":
        cols = [n for n, dt in self._plan.schema().items()
                if agg in ("count", "null_count", "first", "last")
                or dt.is_numeric or dt.is_bool or dt.is_temporal
                or (agg in ("min", "max") and dt.is_string)]
        from ..expr.expr import Expr
        return self.select([Expr("agg", (_col(n),), agg=agg, **kw).alias(n)
                            for n in cols])

    def sum(self): return self._agg_all("sum")
    def mean(self): return self._agg_all("mean")
    def min(self): return self._agg_all("min")
    def max(self): return self._agg_all("max")
    def median(self): return self._agg_all("median")
    def std(self, ddof: int = 1): return self._agg_all("std", ddof=ddof)
    def var(self, ddof: int = 1): return self._agg_all("var", ddof=ddof)
    def quantile(self, q: float, interpolation: str = "nearest"):
        return self._agg_all("quantile", q=q, interpolation=interpolation)
    def null_count(self): return self._agg_all("null_count")
    def count(self): return self._agg_all("count")

    def shift(self, n: int = 1, *, fill_value=None) -> "LazyFrame":
        return self.with_columns([_col(c).shift(n, fill_value=fill_value)
                                  for c in self.columns])

    def interpolate(self) -> "LazyFrame":
        return self.with_columns([_col(c).interpolate()
                                  for c, dt in self._plan.schema().items()
                                  if dt.is_numeric])

    def gather_every(self, n: int, offset: int = 0) -> "LazyFrame":
        return self.select([_col(c).gather_every(n, offset)
                            for c in self.columns])

    def reverse(self) -> "LazyFrame":
        return self.select([_col(c).reverse() for c in self.columns])

    def inspect(self, fmt: str = "{}") -> "LazyFrame":
        def fn(t):
            from .frame import DataFrame
            print(fmt.format(DataFrame._from_table(t)))
            return t
        return LazyFrame._from_plan(
            L.MapFunction(self._plan, fn, streamable=False, label="inspect"))

    def set_sorted(self, column, *, descending: bool = False) -> "LazyFrame":
        return self  # sortedness hints: the optimizer derives order itself

    def serialize(self) -> str:
        from ..plan.serde import plan_to_dict
        import json as _json
        return _json.dumps(plan_to_dict(self._plan))

    @staticmethod
    def deserialize(source) -> "LazyFrame":
        from ..plan.serde import plan_from_dict
        import json as _json
        data = _json.loads(source) if isinstance(source, str) else source
        return LazyFrame._from_plan(plan_from_dict(data))

    def pipe(self, fn, *args, **kwargs):
        return fn(self, *args, **kwargs)

    def remote(self, context=None, **_kw) -> "LazyFrameRemote":
        """Run this query remotely (reference:
        `py-polars/src/polars/lazyframe/frame.py:8734` — Polars Cloud).
        Here `context` is a `RemoteClient` (or server address string);
        without one, collect() uses the in-process distributed engine."""
        return LazyFrameRemote(self, context)

    def pipe_with_schema(self, function) -> "LazyFrame":
        """Alter the frame with the resolved input schema available
        (reference: `py-polars/src/polars/lazyframe/frame.py:968`).
        Schemas resolve eagerly here, so this is pipe with the schema
        passed alongside."""
        return function(self, dict(self._plan.schema()))

    def pivot(self, on, on_columns, *, index=None, values=None,
              aggregate_function=None, maintain_order: bool = False,
              separator: str = "_") -> "LazyFrame":
        """Lazy pivot with explicitly enumerated output columns
        (reference: `py-polars/src/polars/lazyframe/frame.py:7753` —
        `on_columns` makes the output schema static, which is what lets
        the pivot stay lazy)."""
        on_names = [on] if isinstance(on, str) else list(on)
        if len(on_names) != 1:
            raise ComputeError("pivot supports a single `on` column")
        on_col = on_names[0]
        combos = list(on_columns.to_list()
                      if hasattr(on_columns, "to_list") else on_columns)
        schema = self._plan.schema()
        idx = [index] if isinstance(index, str) else list(index or [])
        vals = [values] if isinstance(values, str) else \
            list(values) if values is not None else None
        if not idx:
            idx = [c for c in schema if c != on_col and
                   (vals is None or c not in vals)][:1]
        if vals is None:
            vals = [c for c in schema if c != on_col and c not in idx]
        agg = aggregate_function or "first"

        def _run(df):
            return df.pivot(on_col, index=idx, values=vals,
                            aggregate_function=agg, on_columns=combos,
                            separator=separator)

        def _schema(ins):
            vd = {v: ins[v] for v in vals}
            out = {c: ins[c] for c in idx}
            for v in vals:
                for c in combos:
                    name = str(c) if len(vals) == 1 else \
                        f"{v}{separator}{c}"
                    out[name] = vd[v]
            return out

        def wrapped(t):
            from .frame import DataFrame
            return _run(DataFrame._from_table(t))._table

        return LazyFrame._from_plan(
            L.MapFunction(self._plan, wrapped, _schema, False,
                          label="pivot"))

    # --- sinks ----------------------------------------------------------
    def approx_n_unique(self) -> "LazyFrame":
        return self._agg_all("n_unique")

    def bottom_k(self, k: int, by, descending=False) -> "LazyFrame":
        desc = [not d for d in descending] \
            if isinstance(descending, (list, tuple)) else not descending
        return self.top_k(k, by, descending=desc)

    def clear(self, n: int = 0) -> "LazyFrame":
        from .frame import DataFrame
        sch = self.collect_schema()
        return DataFrame({k: [None] * n for k in sch}, schema=sch).lazy()

    def clone(self) -> "LazyFrame":
        return LazyFrame._from_plan(self._plan)

    def collect_async(self, **kw):
        """Collect on a worker thread; returns a concurrent Future
        (reference: py-polars collect_async returns an awaitable)."""
        import concurrent.futures as _fut
        ex = _fut.ThreadPoolExecutor(max_workers=1)
        fut = ex.submit(self.collect, **kw)
        ex.shutdown(wait=False)
        return fut

    def collect_batches(self, *, batch_size: int = 65536, engine="auto"):
        """Iterator of DataFrame batches (reference: sink_batches /
        collect_batches streaming surface)."""
        out = self.collect(engine=engine)
        off = 0
        while off < out.height:
            yield out.slice(off, batch_size)
            off += batch_size

    def sink_batches(self, callback, *, batch_size: int = 65536,
                     engine="auto") -> None:
        for b in self.collect_batches(batch_size=batch_size, engine=engine):
            if callback(b):
                break  # truthy return requests early stop (polars contract)

    def describe(self):
        return self.collect().describe()

    def drop_nans(self, subset=None) -> "LazyFrame":
        names = [subset] if isinstance(subset, str) else subset
        sch = self.collect_schema()
        cols = names or [n for n, d in sch.items()
                         if getattr(d, "is_float", False)]
        pred = None
        for n in cols:
            if not getattr(sch[n], "is_float", False):
                continue
            p = _col(n).is_not_nan().fill_null(True)  # nulls are kept
            pred = p if pred is None else (pred & p)
        return self.filter(pred) if pred is not None else self

    def match_to_schema(self, schema, **kw) -> "LazyFrame":
        def fn(df):
            return df.match_to_schema(schema, **kw)
        sch = {n: (d() if isinstance(d, type) else d)
               for n, d in dict(schema).items()}
        return self.map_batches(fn, schema=sch)

    def remove(self, *predicates, **constraints) -> "LazyFrame":
        preds = list(predicates)
        for k, v in constraints.items():
            preds.append(_col(k) == v)
        keep = None
        for p in preds:
            pe = p if isinstance(p, Expr) else _col(str(p))
            keep = pe if keep is None else (keep & pe)
        if keep is None:
            return self
        return self.filter(~keep.fill_null(False))

    def select_seq(self, *exprs, **named) -> "LazyFrame":
        return self.select(*exprs, **named)

    def with_columns_seq(self, *exprs, **named) -> "LazyFrame":
        return self.with_columns(*exprs, **named)

    def with_row_count(self, name: str = "row_nr",
                       offset: int = 0) -> "LazyFrame":
        return self.with_row_index(name, offset)

    def show(self, n: int = 10) -> None:
        print(self.head(n).collect())

    def sql(self, query: str, *, table_name: str = "self") -> "LazyFrame":
        from ..sql.context import SQLContext
        ctx = SQLContext()
        ctx.register(table_name, self)
        return ctx.execute(query)

    def update(self, other: "LazyFrame", on=None, how: str = "left",
               include_nulls: bool = False) -> "LazyFrame":
        def fn(df):
            o = other.collect() if isinstance(other, LazyFrame) else other
            return df.update(o, on=on, how=how, include_nulls=include_nulls)
        return self.map_batches(fn)

    def with_context(self, other) -> "LazyFrame":
        """Make other frames' columns available (reference: with_context).
        Implemented as an hstack of the context frames at collect time."""
        others = other if isinstance(other, (list, tuple)) else [other]

        def fn(df):
            out = df
            for o in others:
                od = o.collect() if isinstance(o, LazyFrame) else o
                out = out.hstack(od)
            return out
        return self.map_batches(fn)

    def sink_parquet(self, path, **kw) -> None:
        from ..api.functions import PartitionByKey, PartitionMaxSize
        from ..exec.streaming import execute_streaming
        if isinstance(path, PartitionByKey):
            self.collect().write_parquet(path.base_path,
                                         partition_by=path.by, **kw)
            return
        if isinstance(path, PartitionMaxSize):
            import os as _os
            _os.makedirs(path.base_path, exist_ok=True)
            i = 0
            for b in self.collect_batches(batch_size=path.max_size):
                b.write_parquet(
                    _os.path.join(path.base_path, f"{i:08d}.parquet"), **kw)
                i += 1
            return
        execute_streaming(optimize(L.Sink(self._plan, "parquet", path, kw), "streaming"))

    def sink_csv(self, path, **kw) -> None:
        from ..exec.streaming import execute_streaming
        execute_streaming(optimize(L.Sink(self._plan, "csv", path, kw), "streaming"))

    def sink_ipc(self, path, **kw) -> None:
        from ..exec.streaming import execute_streaming
        execute_streaming(optimize(L.Sink(self._plan, "ipc", path, kw), "streaming"))

    def sink_ndjson(self, path, **kw) -> None:
        from ..exec.streaming import execute_streaming
        execute_streaming(optimize(L.Sink(self._plan, "ndjson", path, kw), "streaming"))


class LazyGroupBy:
    def __init__(self, lf: LazyFrame, keys: List[Expr], maintain_order: bool,
                 having=None):
        self._lf = lf
        self._keys = keys
        self._maintain_order = maintain_order
        self._having = list(having) if having else []

    def agg(self, *aggs, **named) -> LazyFrame:
        exprs = _to_exprs(aggs, named)
        hav = [h.alias(f"__pt_having_{i}")
               for i, h in enumerate(self._having)]
        out = LazyFrame._from_plan(
            L.GroupBy(self._lf._plan, self._keys, exprs + hav,
                      self._maintain_order))
        if hav:
            pred = None
            for i in range(len(hav)):
                p = _col(f"__pt_having_{i}").fill_null(False)
                pred = p if pred is None else (pred & p)
            out = out.filter(pred).drop(
                *[f"__pt_having_{i}" for i in range(len(hav))])
        return out

    def having(self, *predicates) -> "LazyGroupBy":
        return LazyGroupBy(self._lf, self._keys, self._maintain_order,
                           having=self._having + list(predicates))

    def head(self, n: int = 5) -> LazyFrame:
        from ..expr.expr import lit as _lit
        ordinal = _lit(True).cum_count().over(*self._keys)
        return self._lf.filter(ordinal <= n)

    def tail(self, n: int = 5) -> LazyFrame:
        from ..expr.expr import lit as _lit
        ordinal = _lit(True).cum_count().over(*self._keys)
        glen = Expr("table_len").over(*self._keys)
        return self._lf.filter(ordinal > glen - n)

    def all(self) -> LazyFrame:
        return self.agg([_col(n).implode() for n in self._all_non_key()])

    def quantile(self, q: float, interpolation: str = "nearest") -> LazyFrame:
        return self.agg([_col(n).quantile(q, interpolation)
                         for n in self._all_non_key()])

    def map_groups(self, function, schema=None) -> LazyFrame:
        keys = self._keys

        def fn(df):
            from .groupby import GroupBy
            return GroupBy(df, keys, self._maintain_order) \
                .map_groups(function)
        return self._lf.map_batches(fn, schema=schema)

    apply = map_groups

    def _all_non_key(self):
        key_names = set()
        for k in self._keys:
            try:
                key_names.add(meta.output_name(k))
            except Exception:
                pass
        return [n for n in self._lf.columns if n not in key_names]

    def len(self, name: str = "len") -> LazyFrame:
        return self.agg(Expr("table_len").alias(name))

    def count(self) -> LazyFrame:
        return self.len(name="count")

    def sum(self): return self.agg([_col(n).sum() for n in self._all_non_key()])
    def mean(self): return self.agg([_col(n).mean() for n in self._all_non_key()])
    def min(self): return self.agg([_col(n).min() for n in self._all_non_key()])
    def max(self): return self.agg([_col(n).max() for n in self._all_non_key()])
    def first(self): return self.agg([_col(n).first() for n in self._all_non_key()])
    def last(self): return self.agg([_col(n).last() for n in self._all_non_key()])
    def median(self): return self.agg([_col(n).median() for n in self._all_non_key()])
    def n_unique(self): return self.agg([_col(n).n_unique() for n in self._all_non_key()])


# --- scan constructors ---------------------------------------------------

def scan_parquet(source, n_rows: Optional[int] = None, **options) -> LazyFrame:
    return LazyFrame._from_plan(
        L.Scan("parquet", source, n_rows=n_rows, options=options))


def scan_csv(source, has_header: bool = True, separator: str = ",",
             n_rows: Optional[int] = None, null_values=None, **options) -> LazyFrame:
    opts = {"has_header": has_header, "separator": separator,
            "null_values": null_values, **options}
    return LazyFrame._from_plan(L.Scan("csv", source, n_rows=n_rows, options=opts))


def scan_ipc(source, n_rows: Optional[int] = None, **options) -> LazyFrame:
    return LazyFrame._from_plan(L.Scan("ipc", source, n_rows=n_rows, options=options))


def scan_ndjson(source, n_rows: Optional[int] = None, **options) -> LazyFrame:
    return LazyFrame._from_plan(
        L.Scan("ndjson", source, n_rows=n_rows, options=options))


# --- unnest helpers ------------------------------------------------------

def _unnest_schema(schema, columns):
    from ..dtypes import Struct as StructT
    from ..errors import SchemaError
    out = {}
    for n, dt in schema.items():
        if n in columns:
            if not isinstance(dt, StructT):
                raise SchemaError(f"unnest: {n!r} is {dt!r}, not a Struct")
            for fn, fdt in dt.fields:
                out[fn] = fdt
        else:
            out[n] = dt
    return out


def _unnest_table(t, columns):
    """Replace struct columns by their fields in place (reference:
    `polars-ops` unnest / DataFrame::unnest)."""
    from ..batch import Table
    from ..errors import SchemaError
    import jax.numpy as jnp
    names, cols = [], {}
    for n in t.names:
        c = t.cols[n]
        if n in columns:
            if c.fields is None:
                raise SchemaError(f"unnest: {n!r} is {c.dtype!r}, not a Struct")
            for fn, f in c.fields.items():
                if c.validity is not None:
                    fv = f.validity & c.validity if f.validity is not None \
                        else c.validity
                    f = f.with_data(f.data, fv)
                names.append(fn)
                cols[fn] = f
        else:
            names.append(n)
            cols[n] = c
    return Table(names, cols, t.capacity, t._nrows, t.valid,
                 nrows_dev=t.nrows_dev)


class LazyFrameRemote:
    """Handle for remote execution of a LazyFrame (capability analogue of
    polars cloud's LazyFrameRemote; ours runs against the polaroid-tpu
    gRPC server or the in-process distributed engine)."""

    def __init__(self, lf: "LazyFrame", context=None):
        self._lf = lf
        self._context = context

    def collect(self):
        ctx = self._context
        if ctx is None:
            return self._lf.collect(engine="distributed")
        if isinstance(ctx, str):
            from ..client import RemoteClient
            ctx = RemoteClient(ctx)
        return ctx.execute_plan(self._lf).collect()

    def show(self, n: int = 10):
        return self._lf.head(n).collect()
