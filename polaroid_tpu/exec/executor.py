"""In-memory plan executor.

Capability analogue of the reference's recursive pull engine
(`polars-mem-engine/src/planner/lp.rs:78` create_physical_plan + one
executor per IR node in `src/executors/`): a post-order walk over the
optimized logical plan, each node dispatching to the device kernels in
`ops/`. Per-node wall times are recorded when PT_TRACK_METRICS is set
(the `.profile()` hook, reference: `polars-expr/src/state/node_timer.rs`).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax.numpy as jnp

from ..batch import Table
from ..config import CONFIG
from ..errors import ComputeError
from ..expr import meta
from ..expr.eval import eval_expr
from ..expr.expr import Expr
from ..ops import compact as C
from ..ops import sort as S
from ..ops.concat import vstack_tables
from ..ops.groupby import group_by_agg, unique_table
from ..ops.join import join_tables
from ..plan import logical as L


class ExecState:
    def __init__(self, track_metrics: bool = False):
        self.track_metrics = track_metrics or CONFIG.track_metrics
        self.timings: List[tuple] = []
        # Cache-node results, one entry per cache_id per query run
        self.subplan_cache: Dict[int, Table] = {}


def execute(plan: L.Plan, state: Optional[ExecState] = None) -> Table:
    state = state or ExecState()
    t0 = time.perf_counter() if state.track_metrics else 0.0
    out = _exec(plan, state)
    if state.track_metrics:
        out.count_rows()  # force
        state.timings.append((repr(plan), time.perf_counter() - t0))
    return out


def _exec(plan: L.Plan, state: ExecState) -> Table:
    k = plan.kind

    # fused segment compilation: chains of elementwise nodes (+ a
    # group_by/sort breaker on top) compile into ONE jitted XLA program
    from .compiled import BREAKERS, FUSABLE, collect_fusable_chain, run_fused
    if k in FUSABLE or k in BREAKERS:
        chain, inp = collect_fusable_chain(plan)
        if chain and (len(chain) >= 2 or chain[-1].kind in BREAKERS):
            t = execute(inp, state)
            return run_fused(chain, t)

    if k == "df_scan":
        return plan.table

    if k == "cache":
        hit = state.subplan_cache.get(plan.cache_id)
        if hit is None:
            hit = execute(plan.input, state)
            state.subplan_cache[plan.cache_id] = hit
        return hit

    if k == "scan":
        return _exec_scan(plan)

    if k == "fast_count":
        from ..dtypes import UInt32
        from ..io.parquet import parquet_num_rows
        n = parquet_num_rows(plan.source)
        if plan.n_rows is not None:
            n = min(n, plan.n_rows)
        from ..api.frame import DataFrame
        return DataFrame({plan.name: [n]},
                         schema={plan.name: UInt32})._table

    if k == "select":
        t = execute(plan.input, state)
        from ..api.frame import DataFrame
        df = DataFrame._from_table(t)
        return df.select(plan.exprs)._table

    if k == "with_columns":
        t = execute(plan.input, state)
        from ..api.frame import DataFrame
        return DataFrame._from_table(t).with_columns(plan.exprs)._table

    if k == "filter":
        t = execute(plan.input, state)
        from ..api.frame import DataFrame
        return DataFrame._from_table(t).filter(plan.predicate)._table

    if k == "group_by":
        t = execute(plan.input, state)
        ins = dict(t.schema)
        keys = meta.expand_exprs(plan.keys, ins)
        aggs = meta.expand_exprs(plan.aggs, ins)
        return group_by_agg(t, keys, aggs, plan.maintain_order)

    if k == "sort":
        t = execute(plan.input, state)
        vals = [eval_expr(b, t, "select") for b in plan.by]
        if plan.slice_ is not None and plan.slice_[0] == 0:
            return S.top_k_table(t, vals, plan.slice_[1], plan.descending,
                                 plan.nulls_last)
        return S.sort_table(t, vals, plan.descending, plan.nulls_last,
                            plan.maintain_order)

    if k == "slice":
        t = execute(plan.input, state)
        return C.slice_rows(t, plan.offset, plan.length)

    if k == "distinct":
        t = execute(plan.input, state)
        return unique_table(t, plan.subset, plan.keep, plan.maintain_order)

    if k == "iejoin":
        from ..ops.iejoin import iejoin_tables
        lt = execute(plan.left, state)
        rt = execute(plan.right, state)
        return iejoin_tables(lt, rt, plan.preds, plan.post, plan.suffix)
    if k == "join":
        lt = execute(plan.left, state)
        rt = execute(plan.right, state)
        return join_tables(lt, rt, plan.left_on, plan.right_on, plan.how,
                           plan.suffix, plan.join_nulls, plan.coalesce,
                           getattr(plan, "maintain_order", None))

    if k == "union":
        tables = [execute(p, state) for p in plan.inputs]
        how = "vertical" if plan.how.startswith("vertical") else "diagonal"
        return vstack_tables(tables, how)

    if k == "hconcat":
        from ..api.frame import DataFrame
        tables = [execute(p, state) for p in plan.inputs]
        df = DataFrame._from_table(tables[0])
        for t in tables[1:]:
            df = df.hstack(DataFrame._from_table(t))
        return df._table

    if k == "rename":
        t = execute(plan.input, state)
        return t.rename(plan.mapping, strict=False)

    if k == "drop":
        t = execute(plan.input, state)
        return t.drop_columns([n for n in plan.names if n in t.cols])

    if k == "with_row_index":
        t = execute(plan.input, state)
        from ..api.frame import DataFrame
        return DataFrame._from_table(t).with_row_index(
            plan.name, plan.offset)._table

    if k == "map_function":
        t = execute(plan.input, state)
        return plan.fn(t)

    if k == "sink":
        t = execute(plan.input, state)
        _run_sink(t, plan)
        return t

    if k == "unpivot":
        t = execute(plan.input, state)
        return _exec_unpivot(t, plan)

    if k == "explode":
        t = execute(plan.input, state)
        from ..ops.nested import explode_table
        return explode_table(t, plan.columns)

    raise ComputeError(f"cannot execute plan node {k!r}")


def _exec_scan(plan: L.Scan) -> Table:
    from .scan_predicate import to_arrow_filter
    filters = None
    residual = None
    if plan.predicate is not None:
        filters, residual = to_arrow_filter(plan.predicate)
    if plan.fmt == "parquet":
        from ..io.parquet import read_parquet_table
        t = read_parquet_table(plan.source, columns=plan.columns,
                               filters=filters,
                               n_rows=plan.n_rows if residual is None else None)
    elif plan.fmt == "csv":
        from ..io.csv import read_csv_table
        t = read_csv_table(plan.source, columns=plan.columns,
                           n_rows=plan.n_rows if plan.predicate is None else None,
                           **{kk: v for kk, v in plan.options.items()
                              if kk in ("has_header", "separator", "null_values")})
        residual = plan.predicate  # csv reader has no filter pushdown
    elif plan.fmt == "ipc":
        from ..io.ipc import read_ipc_table
        t = read_ipc_table(plan.source, columns=plan.columns,
                           n_rows=plan.n_rows if plan.predicate is None else None)
        residual = plan.predicate
    elif plan.fmt == "ndjson":
        from ..io.json_io import read_ndjson_table
        t = read_ndjson_table(plan.source,
                              n_rows=plan.n_rows if plan.predicate is None else None)
        if plan.columns is not None:
            t = t.select_columns([c for c in plan.columns if c in t.cols])
        residual = plan.predicate
    else:
        raise ComputeError(f"unknown scan format {plan.fmt!r}")
    if residual is not None:
        from ..api.frame import DataFrame
        t = DataFrame._from_table(t).filter(residual)._table
        if plan.n_rows is not None:
            t = C.slice_rows(t, 0, plan.n_rows)
    return t


def _run_sink(t: Table, plan: L.Sink) -> None:
    from ..api.frame import DataFrame
    df = DataFrame._from_table(t)
    if plan.fmt == "parquet":
        df.write_parquet(plan.target, **plan.options)
    elif plan.fmt == "csv":
        df.write_csv(plan.target, **plan.options)
    elif plan.fmt == "ipc":
        df.write_ipc(plan.target, **plan.options)
    elif plan.fmt == "ndjson":
        df.write_ndjson(plan.target, **plan.options)
    else:
        raise ComputeError(f"unknown sink format {plan.fmt!r}")


def _exec_unpivot(t: Table, plan: L.Unpivot) -> Table:
    """melt: stack `on` columns; built from vstack of per-column selects."""
    from ..api.frame import DataFrame
    from ..expr.expr import col, lit
    parts = []
    df = DataFrame._from_table(t)
    for n in plan.on:
        sel = [col(i) for i in plan.index] + [
            lit(n).alias(plan.variable_name),
            col(n).alias(plan.value_name)]
        parts.append(df.select(sel)._table)
    return vstack_tables(parts, "vertical")
