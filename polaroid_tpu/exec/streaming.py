"""Streaming (batched, larger-than-memory) executor.

Capability analogue of the reference's morsel-driven engine
(`polars-stream/src/skeleton.rs:31` run_query, §3.2 of SURVEY.md): scans
stream row-group batches from pyarrow with prefetch, elementwise stages
(filter/select/with_columns) run per-batch on device, and breaker
operators use partial states:

  * group_by: per-batch partial aggregate states (sum/count/min/max/...)
    are vstacked and re-aggregated with a merge agg — the two-phase
    combine of `nodes/group_by.rs` without hash tables;
  * joins: sampled build-side selection with probe replay; builds past
    the row budget switch to grace-hash partitioned spill joins
    (inner/left/right/semi/anti/full — per-partition exact);
  * sort: external sample-sort with spill files, gated by a memory
    budget (inputs that fit sort in memory with zero disk traffic);
  * distinct: per-batch uniques with incremental folds (memory bounded
    by output cardinality); keep="none" materializes (cross-batch
    duplicate information cannot be pre-deduped);
  * stateful window exprs stream exactly (bounded-lookback tail replay,
    cum_* via carried device scalars); early-stop for head().

Anything else materializes the child and delegates to the in-memory
engine (the reference does the same for non-streamable nodes via
InMemoryMap, `to_graph.rs:749-783`).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from ..batch import Table
from ..config import CONFIG
from ..errors import ComputeError
from ..expr import meta
from ..expr.expr import Expr, col as _col
from ..ops.concat import vstack_tables
from ..ops.groupby import group_by_agg
from ..plan import logical as L

# aggregations that decompose into (partial_agg, merge_agg) pairs
_DECOMPOSABLE = {
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    "count": ("count", "sum"),
    "len": ("len", "sum"),
    "null_count": ("null_count", "sum"),
    "any": ("any", "any"),
    "all": ("all", "all"),
    "first": ("first", "first"),
    "last": ("last", "last"),
}


def execute_streaming(plan: L.Plan) -> Table:
    from ..metrics import current, tracking
    with tracking(CONFIG.track_metrics or CONFIG.log_metrics) as qm:
        batches = []
        for t in _stream(plan):
            if qm is not None:
                m = qm.node("stream_output")
                m.batches += 1
                m.rows_out += t.count_rows()
            batches.append(t)
        if not batches:
            from ..exec.executor import execute
            return execute(plan)
        out = batches[0] if len(batches) == 1 else vstack_tables(batches)
        if qm is not None and CONFIG.log_metrics:
            qm.print_report()
        return out


def _pipeline_prefetch(it: Iterator[Table], depth: int = 2
                       ) -> Iterator[Table]:
    """Run a source iterator on a worker thread with a bounded queue:
    the host decodes/uploads batch k+1 while the device executes the
    downstream plan on batch k. This is the engine-wide analogue of the
    reference's num_pipelines lanes (`polars-stream/src/execute.rs:301`)
    — on TPU one decode lane suffices because device compute is enqueued
    asynchronously; the host-side pyarrow decode is the only blocking
    stage. Bounded depth keeps the larger-than-RAM contract."""
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    DONE = object()

    def worker():
        try:
            for t in it:
                q.put(t)
            q.put(DONE)
        except BaseException as e:  # propagate to the consumer
            q.put(("__pipeline_error__", e))

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is DONE:
            return
        if isinstance(item, tuple) and len(item) == 2 and \
                item[0] == "__pipeline_error__":
            raise item[1]
        yield item


def _elem_ok(nd) -> bool:
    if nd.kind == "filter":
        return meta.is_elementwise(nd.predicate)
    return all(meta.is_elementwise(e) for e in nd.exprs)


def _stream(plan: L.Plan) -> Iterator[Table]:
    k = plan.kind

    if k == "scan":
        yield from _pipeline_prefetch(_stream_scan(plan))
        return

    if k in ("select", "with_columns", "filter"):
        # pure-elementwise chains compile to ONE cached program applied
        # per batch (exec/compiled.run_fused): each eager op dispatch
        # costs ~1-3 ms through the remote tunnel, and a filter ->
        # with_columns -> select ladder pays it per op per batch
        chain = []
        node = plan
        while node.kind in ("select", "with_columns", "filter") and \
                _elem_ok(node):
            chain.append(node)
            node = node.input
        if chain:
            chain.reverse()
            from ..metrics import current as _cur
            from .compiled import run_fused
            qm = _cur()
            for t in _stream(node):
                if qm is not None:
                    with qm.timed(k) as m:
                        m.batches += 1
                yield run_fused(chain, t)
            return
        from ..api.frame import DataFrame
        from ..metrics import current
        qm = current()
        stateful = None
        if k in ("select", "with_columns") and \
                builtins_any(not meta.is_elementwise(e)
                             for e in plan.exprs):
            stateful = _StatefulWindowStreamer.try_build(plan.exprs, k)
            if stateful is None:
                yield _materialize(plan)
                return
        for t in _stream(plan.input):
            if qm is not None:
                with qm.timed(k) as m:
                    m.batches += 1
            df = DataFrame._from_table(t)
            if k == "select":
                if stateful is not None:
                    yield stateful.step(t)
                else:
                    yield df.select(plan.exprs)._table
            elif k == "with_columns":
                if stateful is not None:
                    yield stateful.step(t)
                else:
                    yield df.with_columns(plan.exprs)._table
            else:
                yield df.filter(plan.predicate)._table
        return

    if k == "group_by":
        t = _stream_group_by(plan)
        if t is not None:
            yield t
            return
        yield _materialize(plan)
        return

    if k == "join" and plan.how in ("inner", "left", "semi", "anti") \
            and not plan.join_nulls:
        yield from _stream_join(plan)
        return

    if k == "join" and plan.how == "right" and not plan.join_nulls:
        yield from _stream_right_join(plan)
        return

    if k == "join" and plan.how == "full":
        yield from _stream_full_join(plan)
        return

    if k == "map_function" and plan.streamable:
        # exact per-batch host maps (e.g. asof-join probing a cached
        # build side; reference: streamable map nodes in polars-stream)
        from ..metrics import current
        qm = current()
        for t in _stream(plan.input):
            if qm is not None:
                with qm.timed(plan.label) as m:
                    m.batches += 1
            yield plan.fn(t)
        return

    if k == "union":
        for p in plan.inputs:
            yield from _stream(p)
        return

    if k == "slice" and plan.offset == 0 and plan.length is not None:
        remaining = plan.length
        from ..ops.compact import slice_rows
        for t in _stream(plan.input):
            n = t.count_rows()
            if n >= remaining:
                yield slice_rows(t, 0, remaining)
                return
            remaining -= n
            yield t
        return

    if k == "distinct" and plan.keep != "none":
        # two-phase dedupe (reference: polars-stream unique nodes):
        # per-batch uniques + INCREMENTAL folds keep memory bounded by
        # the output cardinality (not the batch count — near-unique
        # inputs previously buffered every batch's uniques before one
        # final merge, VERDICT r2 §1 8b). keep="none" cannot pre-dedupe
        # per batch (a key seen once in two different batches must drop
        # BOTH rows) and falls through to materialize.
        from ..api.frame import DataFrame
        fold_budget = max(CONFIG.batch_rows * 2, 1)
        parts: List[Table] = []
        acc_rows = 0
        for t in _stream(plan.input):
            df = DataFrame._from_table(t)
            u = df.unique(subset=plan.subset, keep=plan.keep,
                          maintain_order=True)._table
            parts.append(u)
            acc_rows += u.count_rows()
            if acc_rows > fold_budget and len(parts) > 1:
                merged = vstack_tables(parts)
                folded = DataFrame._from_table(merged).unique(
                    subset=plan.subset, keep=plan.keep,
                    maintain_order=True)._table
                parts = [folded]
                acc_rows = folded.count_rows()
        if not parts:
            return
        merged = parts[0] if len(parts) == 1 else vstack_tables(parts)
        out = DataFrame._from_table(merged).unique(
            subset=plan.subset, keep=plan.keep,
            maintain_order=plan.maintain_order)
        yield out._table
        return

    if k == "sort" and plan.slice_ is None:
        yield from _stream_sort_external(plan)
        return

    if k == "sort" and plan.slice_ is not None and plan.slice_[0] == 0:
        # streaming top-k: per-batch top-k partials, one final top-k
        # (reference: polars-stream top_k node)
        kk = plan.slice_[1]
        parts = []
        for t in _stream(plan.input):
            part = _materialize(L.Sort(L.DataFrameScan(t), plan.by,
                                       plan.descending, plan.nulls_last,
                                       plan.maintain_order, (0, kk)))
            parts.append(part)
        if not parts:
            return
        merged = parts[0] if len(parts) == 1 else vstack_tables(parts)
        yield _materialize(L.Sort(L.DataFrameScan(merged), plan.by,
                                  plan.descending, plan.nulls_last,
                                  plan.maintain_order, (0, kk)))
        return

    if k == "with_row_index":
        from ..api.frame import DataFrame
        off = plan.offset
        for t in _stream(plan.input):
            df = DataFrame._from_table(t)
            yield df.with_row_index(plan.name, off)._table
            off += t.count_rows()
        return

    if k == "sink":
        yield _stream_sink(plan)
        return

    yield _materialize(plan)


def _stream_join(plan: L.Join) -> Iterator[Table]:
    """Streaming equi-join with SAMPLED build-side selection (reference:
    `equi_join.rs:250` SampleState + `joins/mod.rs:20-28`): batches are
    pulled from BOTH sides, preferring the currently-smaller one, until
    one side exhausts or both exceed the sample limit
    (PT_JOIN_SAMPLE_LIMIT, default 10M like the reference). The
    exhausted/smaller side becomes the build side — an inner join swaps
    sides freely (column order/naming restored afterwards); left/semi/
    anti are constrained to build on the right. Sampled batches are
    replayed into the probe stream, so memory stays bounded by
    min(side sizes) + sample."""
    import itertools
    from ..ops.join import join_tables
    from ..metrics import current
    qm = current()

    def probe_loop(probe_iter, build, swapped):
        lsch = list(plan.left.schema().keys())
        rsch = list(plan.right.schema().keys())
        coalesce = plan.coalesce if plan.coalesce is not None else True
        for t in probe_iter:
            if qm is not None:
                with qm.timed("join") as m:
                    m.batches += 1
            if not swapped:
                yield join_tables(t, build, plan.left_on, plan.right_on,
                                  plan.how, plan.suffix, plan.join_nulls,
                                  plan.coalesce)
                continue
            # inner join with sides swapped: probe batches are RIGHT
            # rows, build is the sampled LEFT side. Join with a temp
            # suffix + no coalesce, then restore the user-facing
            # column names/order (left cols, then right minus
            # coalesced keys, plan.suffix on collision).
            raw = join_tables(t, build, plan.right_on, plan.left_on,
                              "inner", "__swapL", plan.join_nulls, False)
            rnames = set(rsch)
            sel, ren = [], {}
            for n in lsch:
                src = n if n not in rnames else f"{n}__swapL"
                sel.append(src)
                if src != n:
                    ren[src] = n
            skip = set(plan.right_on) if coalesce else set()
            for n in rsch:
                if n in skip:
                    continue
                out_name = f"{n}{plan.suffix}" if n in set(lsch) else n
                sel.append(n)
                if out_name != n:
                    ren[n] = out_name
            out = raw.select_columns(sel)
            if ren:
                out = out.rename(ren)
            yield out

    if plan.how != "inner":
        # build the right side under a row budget; past it, switch to the
        # grace-hash partitioned spill join (bounded memory; reference
        # analogue: per-partition BuildState, `equi_join.rs:420`)
        budget = CONFIG.join_build_budget_rows
        rit = _stream(plan.right)
        rbuf: List[Table] = []
        rrows = 0
        overflow = False
        for t in rit:
            rbuf.append(t)
            rrows += t.count_rows()
            if rrows > budget:
                overflow = True
                break
        if overflow:
            yield from _grace_join(plan, rbuf, rit)
            return
        build = rbuf[0] if len(rbuf) == 1 else \
            (vstack_tables(rbuf) if rbuf else _materialize(plan.right))
        yield from probe_loop(_stream(plan.left), build, False)
        return

    limit = CONFIG.join_sample_limit
    lit, rit = _stream(plan.left), _stream(plan.right)
    lbuf: List[Table] = []
    rbuf: List[Table] = []
    lrows = rrows = 0
    ldone = rdone = False
    while not (ldone or rdone) and (lrows <= limit or rrows <= limit):
        if rrows <= lrows:
            try:
                t = next(rit)
                rbuf.append(t)
                rrows += t.count_rows()
            except StopIteration:
                rdone = True
        else:
            try:
                t = next(lit)
                lbuf.append(t)
                lrows += t.count_rows()
            except StopIteration:
                ldone = True
    if not (ldone or rdone):
        # BOTH sides exceeded the sample limit: neither fits as a build
        # side — grace-hash join with both sides spilled
        yield from _grace_join(plan, rbuf, rit, lbuf, lit)
        return
    if ldone and (not rdone) and lrows < rrows + (0 if rdone else 1):
        # left side is the smaller: swap (inner only)
        build = lbuf[0] if len(lbuf) == 1 else \
            (vstack_tables(lbuf) if lbuf else _materialize(plan.left))
        yield from probe_loop(itertools.chain(rbuf, rit), build, True)
        return
    # default: build = right (drain the rest if not exhausted)
    rest = list(rit) if not rdone else []
    allr = rbuf + rest
    build = allr[0] if len(allr) == 1 else \
        (vstack_tables(allr) if allr else _materialize(plan.right))
    yield from probe_loop(itertools.chain(lbuf, lit), build, False)


def _stream_right_join(plan: L.Join) -> Iterator[Table]:
    """Streaming RIGHT join: every right row emits exactly once (with
    its matches) and unmatched-left rows never emit, so right-joining
    each right batch against the whole left side is exact. The left
    side builds under the grace budget; past it, both sides spill to
    hash partitions."""
    from ..ops.join import join_tables
    budget = CONFIG.join_build_budget_rows
    lit = _stream(plan.left)
    lbuf: List[Table] = []
    rows = 0
    for t in lit:
        lbuf.append(t)
        rows += t.count_rows()
        if rows > budget:
            yield from _grace_join(plan, [], _stream(plan.right),
                                   lbuf, lit)
            return
    build = lbuf[0] if len(lbuf) == 1 else         (vstack_tables(lbuf) if lbuf else _materialize(plan.left))
    for t in _stream(plan.right):
        yield join_tables(build, t, plan.left_on, plan.right_on, "right",
                          plan.suffix, plan.join_nulls, plan.coalesce)


def _key_hash_spec(plan: L.Join):
    """Per-key-position normalization dtype so equal values hash equally
    across sides regardless of storage width (int32 left vs int64
    right, etc)."""
    from ..dtypes import Boolean
    ls, rs = plan.left.schema(), plan.right.schema()
    spec = []
    for ln, rn in zip(plan.left_on, plan.right_on):
        ld, rd = ls[ln], rs[rn]
        if ld.is_float or rd.is_float:
            spec.append("float")
        elif (ld.is_integer or ld == Boolean or ld.is_temporal) and \
                (rd.is_integer or rd == Boolean or rd.is_temporal):
            spec.append("int")
        else:
            spec.append("object")
    return spec


def _partition_ids(at, key_names, spec, P: int):
    """Row partition ids from the key columns of an arrow table —
    host-side vectorized hashing (pandas hash_array), null-stable."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    h = None
    for n, kind in zip(key_names, spec):
        col = at.column(n)
        nulls = col.is_null().to_numpy(zero_copy_only=False)
        if kind == "float":
            arr = col.cast(pa.float64(), safe=False).fill_null(0.0) \
                .to_numpy(zero_copy_only=False)
            hk = pd.util.hash_array(arr, categorize=False)
            hk = np.where(nulls, np.uint64(0x9E3779B97F4A7C15), hk)
        elif kind == "int":
            arr = col.cast(pa.int64(), safe=False).fill_null(0) \
                .to_numpy(zero_copy_only=False)
            hk = pd.util.hash_array(arr, categorize=False)
            hk = np.where(nulls, np.uint64(0x9E3779B97F4A7C15), hk)
        else:
            vals = col.to_pylist()
            arr = np.array(["\x00__pt_null" if v is None else str(v)
                            for v in vals], dtype=object)
            hk = pd.util.hash_array(arr, categorize=False)
        h = hk if h is None else (h * np.uint64(31)) ^ hk
    return (h % np.uint64(P)).astype(np.int64)


def _grace_join(plan: L.Join, rbuf: List[Table], rit,
                lbuf: Optional[List[Table]] = None, lit=None
                ) -> Iterator[Table]:
    """Grace-hash join: both sides are hash-partitioned by key into
    spill files (arrow IPC), then each partition pair is joined
    independently — key-disjoint partitions make per-partition
    inner/left/semi/anti joins exact subsets of the global join. Memory
    is bounded by one build partition plus one probe batch (the
    reference's partitioned BuildState, `equi_join.rs:420`, taken
    out-of-core)."""
    import itertools
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.ipc as paipc

    from ..io.arrow_interop import table_from_arrow, table_to_arrow
    from ..ops.join import join_tables

    P = max(2, CONFIG.join_grace_partitions)
    spec = _key_hash_spec(plan)
    tmp = tempfile.mkdtemp(prefix="pt_gracejoin_")
    try:
        def spill_side(batches, key_names, tag):
            writers = [None] * P
            paths = [f"{tmp}/{tag}_{p}.arrow" for p in range(P)]
            for t in batches:
                at = table_to_arrow(t)
                if at.num_rows == 0:
                    continue
                pid = _partition_ids(at, key_names, spec, P)
                import numpy as np
                for p in range(P):
                    idx = np.nonzero(pid == p)[0]
                    if len(idx) == 0:
                        continue
                    part = at.take(pa.array(idx))
                    if writers[p] is None:
                        writers[p] = paipc.new_file(
                            pa.OSFile(paths[p], "wb"), at.schema)
                    writers[p].write_table(part)
            for w in writers:
                if w is not None:
                    w.close()
            return [pt if w is not None else None
                    for pt, w in zip(paths, writers)]

        rpaths = spill_side(itertools.chain(rbuf, rit), plan.right_on, "r")
        del rbuf
        lbatches = itertools.chain(lbuf or [], lit) if lit is not None \
            else _stream(plan.left)
        lpaths = spill_side(lbatches, plan.left_on, "l")
        del lbuf

        from ..batch import Table as _T
        rsch = plan.right.schema()
        lsch = plan.left.schema()
        empty_right = _T.empty([(n, rsch[n]) for n in rsch])
        empty_left = _T.empty([(n, lsch[n]) for n in lsch])
        for p in range(P):
            have_l = lpaths[p] is not None
            have_r = rpaths[p] is not None
            if plan.how == "right":
                # stream right partition batches against the whole left
                # partition (right rows each emit exactly once)
                if not have_r:
                    continue
                build_l = table_from_arrow(
                    paipc.open_file(lpaths[p]).read_all()) if have_l                     else empty_left
                rd = paipc.open_file(rpaths[p])
                for bi in range(rd.num_record_batches):
                    rt = table_from_arrow(
                        pa.Table.from_batches([rd.get_batch(bi)]))
                    yield join_tables(build_l, rt, plan.left_on,
                                      plan.right_on, "right", plan.suffix,
                                      plan.join_nulls, plan.coalesce)
                continue
            if not have_l and not (plan.how == "full" and have_r):
                continue
            if have_r:
                build = table_from_arrow(
                    paipc.open_file(rpaths[p]).read_all())
            else:
                build = empty_right
            if plan.how == "full":
                # full join needs both sides of the partition whole (the
                # unmatched-build emission is per-partition-exact)
                if have_l:
                    lt = table_from_arrow(
                        paipc.open_file(lpaths[p]).read_all())
                else:
                    lt = empty_left
                yield join_tables(lt, build, plan.left_on, plan.right_on,
                                  "full", plan.suffix, plan.join_nulls,
                                  plan.coalesce)
                continue
            rd = paipc.open_file(lpaths[p])
            for bi in range(rd.num_record_batches):
                lt = table_from_arrow(
                    pa.Table.from_batches([rd.get_batch(bi)]))
                yield join_tables(lt, build, plan.left_on, plan.right_on,
                                  plan.how, plan.suffix, plan.join_nulls,
                                  plan.coalesce)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_full_join(plan: L.Join) -> Iterator[Table]:
    """Streaming FULL join: the right side is the materialized build, left
    batches join with how='left' (full-join column semantics preserved via
    the coalesce flag), and unmatched build rows are emitted once at the
    end (reference: `equi_join.rs:1075` EmitUnmatchedBuild). Memory is
    bounded by build + batch + the distinct left KEY set (tracked host-
    side to decide unmatchedness, far smaller than the left table)."""
    from ..api.frame import DataFrame
    from ..ops.join import join_tables
    coalesce = plan.coalesce if plan.coalesce is not None else False
    budget = CONFIG.join_build_budget_rows
    rit = _stream(plan.right)
    rbuf: List[Table] = []
    rrows = 0
    for t in rit:
        rbuf.append(t)
        rrows += t.count_rows()
        if rrows > budget:
            yield from _grace_join(plan, rbuf, rit)
            return
    build = rbuf[0] if len(rbuf) == 1 else \
        (vstack_tables(rbuf) if rbuf else _materialize(plan.right))
    key_parts: List[Table] = []
    seen_any = False
    for t in _stream(plan.left):
        seen_any = True
        # left-join naming with the full join's coalesce flag is
        # identical to full-join naming (coalesce=False keeps the
        # suffixed right key columns in both)
        yield join_tables(t, build, plan.left_on, plan.right_on, "left",
                          plan.suffix, plan.join_nulls, coalesce)
        # keep only this batch's DISTINCT key columns for the final
        # unmatched-build pass
        kdf = DataFrame._from_table(t).select(
            [_col(n) for n in plan.left_on]).unique(maintain_order=False)
        key_parts.append(kdf._table)
    merged_keys = None
    if key_parts:
        kall = key_parts[0] if len(key_parts) == 1 else \
            vstack_tables(key_parts)
        merged_keys = DataFrame._from_table(kall) \
            .unique(maintain_order=False)._table
    if merged_keys is None or not seen_any:
        lsch = plan.left.schema()
        from ..batch import Table as _T
        merged_keys = _T.empty([(n, lsch[n]) for n in plan.left_on])
    # build rows whose key matches nothing on the left
    unmatched = join_tables(build, merged_keys, plan.right_on, plan.left_on,
                            "anti", plan.suffix, plan.join_nulls, None)
    if unmatched.count_rows():
        # right-only rows with nulls on the left: an empty-left full join
        # produces exactly that shape with correct naming/coalescing
        lsch = plan.left.schema()
        from ..batch import Table as _T
        empty_left = _T.empty([(n, lsch[n]) for n in lsch])
        yield join_tables(empty_left, unmatched, plan.left_on, plan.right_on,
                          "full", plan.suffix, plan.join_nulls, coalesce)


def _stream_sort_external(plan: L.Sort) -> Iterator[Table]:
    """External sample-sort: larger-than-memory ORDER BY in three passes
    (reference capability: polars-stream's out-of-core sort planning via
    spilling; design here is sample-sort, the natural fit for an engine
    whose doctrine is 'everything is a sort').

    Pass 1 streams input batches to spill files (arrow IPC) while
    sampling an order-preserving uint64 keycode per row (ops/keycode
    word encoding — exact for descending/nulls_last on the first key).
    Splitters from the samples define row-disjoint key ranges; pass 2
    re-reads each spill, routes rows to per-range bucket files; pass 3
    sorts each bucket in-memory (full multi-key sort) and yields buckets
    in range order. Peak device memory = one bucket (~batch_rows), not
    the whole input. Stable: batch order is preserved into buckets and
    the in-bucket sort is stable."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.ipc as paipc

    from ..api.frame import DataFrame
    from ..expr.eval import eval_expr
    from ..io.arrow_interop import table_from_arrow, table_to_arrow
    from ..ops.keycode import encode_key_words

    if builtins_any(not meta.is_elementwise(e) for e in plan.by):
        yield _materialize(plan)
        return

    def batch_keyword(t: Table):
        """(n,) uint64 order code of the FIRST sort key for live rows."""
        import jax.numpy as jnp
        v = eval_expr(plan.by[0], t, "select")
        words = encode_key_words(v.data, v.validity,
                                 bool(plan.descending[0]),
                                 bool(plan.nulls_last[0]))
        w0 = words[0].astype(jnp.uint64)
        acc = w0
        if len(words) > 1:
            acc = (acc << jnp.uint64(32)) | words[1].astype(jnp.uint64)
        mask = t.row_mask()
        return np.asarray(acc)[np.asarray(mask)]

    tmp = tempfile.mkdtemp(prefix="pt_extsort_")
    try:
        # Pass 1 buffers batches IN MEMORY until the spill threshold —
        # inputs that fit are sorted directly with zero disk traffic
        # (VERDICT r2 weak #9: spilling everything unconditionally).
        # Threshold: a row budget, tightened under real memory pressure
        # via the native probes when available.
        spill_rows = max(CONFIG.batch_rows * 4, 1)
        try:
            from ..native import available_memory, process_rss
            avail, rss = available_memory(), process_rss()
            if avail > 0 and rss > 0 and avail < rss:
                spill_rows = CONFIG.batch_rows  # real pressure: spill early
        except Exception:
            pass
        spills: List[str] = []
        samples: List[np.ndarray] = []
        inmem: List[Table] = []
        total = 0

        def flush_inmem():
            for tb in inmem:
                at = table_to_arrow(tb)
                path = f"{tmp}/spill_{len(spills)}.arrow"
                with paipc.new_file(pa.OSFile(path, "wb"), at.schema) as w:
                    w.write_table(at)
                spills.append(path)
            inmem.clear()

        for t in _stream(plan.input):
            n = t.count_rows()
            if n == 0:
                continue
            kw = batch_keyword(t)
            stride = max(1, n // 64)
            samples.append(kw[::stride])
            total += n
            if not spills and total <= spill_rows:
                inmem.append(t)
                continue
            flush_inmem()
            at = table_to_arrow(t)
            path = f"{tmp}/spill_{len(spills)}.arrow"
            with paipc.new_file(pa.OSFile(path, "wb"), at.schema) as w:
                w.write_table(at)
            spills.append(path)
        if not spills and not inmem:
            yield _materialize(plan)
            return
        if not spills:
            # the whole input fit: one in-memory sort, no disk round-trip
            merged = inmem[0] if len(inmem) == 1 else vstack_tables(inmem)
            yield _materialize(L.Sort(L.DataFrameScan(merged), plan.by,
                                      plan.descending, plan.nulls_last,
                                      plan.maintain_order, None))
            return
        bucket_rows = max(CONFIG.batch_rows, 1)
        P = max(1, min(64, -(-total // bucket_rows)))
        if P == 1 or len(spills) == 1:
            at = pa.concat_tables([paipc.open_file(p).read_all()
                                   for p in spills])
            merged = table_from_arrow(at)
            yield _materialize(L.Sort(L.DataFrameScan(merged), plan.by,
                                      plan.descending, plan.nulls_last,
                                      plan.maintain_order, None))
            return
        allsamp = np.sort(np.concatenate(samples))
        qs = (np.arange(1, P) * len(allsamp)) // P
        splitters = np.unique(allsamp[qs])
        nb = len(splitters) + 1
        writers = [None] * nb
        schema = None
        for path in spills:
            at = paipc.open_file(path).read_all()
            t = table_from_arrow(at)
            kw = batch_keyword(t)
            bid = np.searchsorted(splitters, kw, side="right")
            if schema is None:
                schema = at.schema
            order = np.argsort(bid, kind="stable")
            at_sorted = at.take(order)
            counts = np.bincount(bid, minlength=nb)
            off = 0
            for b in range(nb):
                c = int(counts[b])
                if c == 0:
                    continue
                if writers[b] is None:
                    writers[b] = paipc.new_file(
                        pa.OSFile(f"{tmp}/bucket_{b}.arrow", "wb"), schema)
                writers[b].write_table(at_sorted.slice(off, c))
                off += c
        for w in writers:
            if w is not None:
                w.close()
        for b in range(nb):
            bpath = f"{tmp}/bucket_{b}.arrow"
            if writers[b] is None:
                continue
            part = table_from_arrow(paipc.open_file(bpath).read_all())
            yield _materialize(L.Sort(L.DataFrameScan(part), plan.by,
                                      plan.descending, plan.nulls_last,
                                      plan.maintain_order, None))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- stateful window streaming ---------------------------------------------
# Capability analogue of the reference's dedicated streaming nodes for
# order-dependent elementwise-ish ops (`polars-stream/src/nodes/`:
# cum_agg, shift; SURVEY §2.1). Two mechanisms:
#   * bounded lookback (shift/diff/pct_change/rolling_* by row count):
#     each batch is evaluated on [tail-of-previous-input ++ batch] and the
#     tail rows are sliced off — exact for ANY expression tree whose nodes
#     are elementwise or bounded-lookback windows;
#   * cumulative ops (cum_sum/min/max/prod/count at the top of the expr):
#     evaluated per batch, then combined with a carried device scalar.

_CUM_COMBINE = {"cum_sum": "add", "cum_count": "add", "cum_prod": "mul",
                "cum_min": "min", "cum_max": "max"}


def _expr_lookback(e: Expr):
    """Rows of history expr output row i can depend on; None = unbounded."""
    k = e.kind
    if k == "window":
        op = e.attrs.get("op")
        if op in ("shift", "diff", "pct_change"):
            n = e.attrs.get("n", 1)
            if n < 0:
                return None  # lookAHEAD not supported
            base = n
        elif op in ("rolling_sum", "rolling_mean", "rolling_min",
                    "rolling_max", "rolling_std", "rolling_var",
                    "rolling_median", "rolling_quantile", "rolling_skew",
                    "rolling_kurtosis"):
            base = int(e.attrs.get("window_size", 1)) - 1
        else:
            return None
        inner = _expr_lookback(e.children[0])
        return None if inner is None else base + inner
    from ..expr.meta import _NON_ELEMENTWISE
    if k in _NON_ELEMENTWISE:
        return None  # any other stateful/global op: unbounded
    best = 0
    for c in e.children:
        lb = _expr_lookback(c)
        if lb is None:
            return None
        best = max(best, lb)
    return best


class _StatefulWindowStreamer:
    """Per-batch evaluation of select/with_columns whose expressions are
    bounded-lookback windows and/or top-level cumulative aggregates."""

    def __init__(self, kind, exprs, lookback_exprs, cum_specs,
                 max_lookback):
        self.kind = kind
        self.exprs = exprs                    # original expr order
        self.lookback_exprs = lookback_exprs  # exprs evaluated w/ tail
        self.cum_specs = cum_specs            # [(expr, out_name, combine)]
        self.K = max_lookback
        self.tail = None                      # last K input rows
        self.carry = {}                       # out_name -> device scalar

    @classmethod
    def try_build(cls, exprs, kind):
        import jax.numpy as jnp  # noqa: F401
        lookback_exprs, cum_specs = [], []
        max_lb = 0
        for e in exprs:
            if meta.is_elementwise(e):
                lookback_exprs.append(e)
                continue
            core = e
            while core.kind == "alias":
                core = core.children[0]
            if core.kind == "window" and \
                    core.attrs.get("op") in _CUM_COMBINE and \
                    not core.attrs.get("reverse") and \
                    meta.is_elementwise(core.children[0]):
                cum_specs.append((e, meta.output_name(e),
                                  _CUM_COMBINE[core.attrs["op"]]))
                continue
            lb = _expr_lookback(e)
            if lb is None:
                return None
            max_lb = max(max_lb, lb)
            lookback_exprs.append(e)
        if max_lb > (1 << 22):
            return None  # tail would defeat streaming
        return cls(kind, list(exprs), lookback_exprs, cum_specs, max_lb)

    def step(self, t: Table) -> Table:
        import jax.numpy as jnp
        from ..api.frame import DataFrame
        from ..ops.compact import slice_rows
        n = t.count_rows()
        # lookback leg: evaluate on [tail ++ batch], slice the tail off
        if self.K > 0 and self.tail is not None:
            th = self.tail.count_rows()
            ext = vstack_tables([self.tail, t])
        else:
            th = 0
            ext = t
        df = DataFrame._from_table(ext)
        if self.kind == "select":
            out = df.select(self.lookback_exprs)._table if \
                self.lookback_exprs else None
        else:
            out = df.with_columns(self.lookback_exprs)._table
        if out is not None and th:
            out = slice_rows(out, th, None)
        if self.kind == "select" and out is None:
            out = slice_rows(ext, th, None).select_columns([])
        # cumulative leg: evaluate on the raw batch, combine with carry
        if self.cum_specs:
            raw = DataFrame._from_table(t)
            cum_out = raw.select([e for e, _, _ in self.cum_specs])._table
            mask = t.row_mask()
            for _, name, comb in self.cum_specs:
                c = cum_out.column(name)
                data, validity = c.data, c.validity
                carry = self.carry.get(name)
                if carry is not None:
                    if comb == "add":
                        data2 = data + carry
                    elif comb == "mul":
                        data2 = data * carry
                    elif comb == "min":
                        data2 = jnp.minimum(data, carry)
                    else:
                        data2 = jnp.maximum(data, carry)
                else:
                    data2 = data
                # new carry = last live+valid combined value (device-side)
                ok = mask if validity is None else (mask & validity)
                idx = jnp.arange(data2.shape[0])
                last = jnp.max(jnp.where(ok, idx, -1))
                has = last >= 0
                cand = data2[jnp.clip(last, 0, data2.shape[0] - 1)]
                if carry is None:
                    self.carry[name] = jnp.where(
                        has, cand, _cum_identity(comb, data2.dtype))
                else:
                    self.carry[name] = jnp.where(has, cand, carry)
                cum_out = cum_out.with_column(
                    name, c.with_data(data2, validity))
            # merge cum columns into the output
            for _, name, _ in self.cum_specs:
                out = out.with_column(name, cum_out.column(name))
            if self.kind == "select":
                # restore the user's column order
                order = []
                for e in self.exprs:
                    nm = meta.output_name(e)
                    if nm in out.cols and nm not in order:
                        order.append(nm)
                out = out.select_columns(order)
        # update the input tail
        if self.K > 0:
            total = ext.count_rows()
            start = max(total - self.K, 0)
            self.tail = slice_rows(ext, start, None)
        return out


def _cum_identity(comb: str, dtype):
    import jax.numpy as jnp
    import numpy as _np
    if comb == "add":
        return jnp.asarray(0, dtype)
    if comb == "mul":
        return jnp.asarray(1, dtype)
    if _np.issubdtype(_np.dtype(dtype), _np.floating):
        v = _np.inf if comb == "min" else -_np.inf
        return jnp.asarray(v, dtype)
    info = _np.iinfo(_np.dtype(dtype))
    return jnp.asarray(info.max if comb == "min" else info.min, dtype)


def _stream_sink(plan: L.Plan) -> Table:
    """Out-of-core sink: write each batch incrementally without
    materializing the full result (reference: polars-stream io_sinks2
    writers)."""
    from ..io.arrow_interop import table_to_arrow
    import pyarrow as pa
    path = plan.target
    fmt = plan.fmt
    kw = dict(plan.options or {})
    writer = None
    wrote = 0
    last = None
    from ..ops import compact as _C
    try:
        for t in _stream(plan.input):
            t = _C.compact(t)
            last = t
            at = table_to_arrow(t)
            if fmt == "parquet":
                import pyarrow.parquet as pq
                if writer is None:
                    comp = kw.pop("compression", "zstd")
                    writer = pq.ParquetWriter(str(path), at.schema,
                                              compression=comp)
                writer.write_table(at)
            elif fmt == "ipc":
                import pyarrow.ipc as paipc
                if writer is None:
                    writer = paipc.new_file(pa.OSFile(str(path), "wb"),
                                            at.schema)
                writer.write_table(at)
            elif fmt == "csv":
                import pyarrow.csv as pacsv
                if writer is None:
                    writer = pacsv.CSVWriter(str(path), at.schema)
                writer.write_table(at)
            elif fmt == "ndjson":
                from ..api.frame import DataFrame
                mode = "w" if wrote == 0 else "a"
                txt = DataFrame._from_table(t).write_ndjson()
                with open(path, mode) as f:
                    f.write(txt)
            else:
                raise ComputeError(f"unknown sink format {fmt!r}")
            wrote += 1
    finally:
        if writer is not None:
            writer.close()
    if wrote == 0:  # write an empty file with the right schema
        from ..api.frame import DataFrame
        from ..exec.executor import execute, _run_sink
        t = execute(plan.input)
        _run_sink(t, plan)
        return t
    from ..batch import Table as _T
    return last if last is not None else _T.empty([])


def builtins_any(it):
    for x in it:
        if x:
            return True
    return False


def _materialize(plan: L.Plan) -> Table:
    from ..exec.executor import execute
    return execute(plan)


def _stream_scan(plan: L.Scan) -> Iterator[Table]:
    if plan.fmt == "csv":
        yield from _stream_scan_csv(plan)
        return
    if plan.fmt != "parquet":
        yield _materialize(plan)
        return
    from ..exec.scan_predicate import to_arrow_filter
    from ..io.arrow_interop import table_from_arrow
    from ..io.parquet import scan_row_groups
    filters = residual = None
    if plan.predicate is not None:
        filters, residual = to_arrow_filter(plan.predicate)
    remaining = plan.n_rows
    for at in scan_row_groups(plan.source, columns=plan.columns,
                              filters=filters,
                              batch_rows=CONFIG.batch_rows):
        t = table_from_arrow(at)
        if residual is not None:
            from ..api.frame import DataFrame
            t = DataFrame._from_table(t).filter(residual)._table
        if remaining is not None:
            from ..ops.compact import slice_rows
            n = t.count_rows()
            if n >= remaining:
                yield slice_rows(t, 0, remaining)
                return
            remaining -= n
        yield t


def _stream_scan_csv(plan: L.Scan) -> Iterator[Table]:
    """Batched CSV scan: pyarrow's incremental reader, per-batch
    predicate/projection (reference: polars-stream csv source)."""
    from ..io.arrow_interop import table_from_arrow
    from ..io.csv import scan_csv_batches
    opts = {k: v for k, v in plan.options.items()
            if k in ("has_header", "separator", "null_values")}
    remaining = plan.n_rows
    for at in scan_csv_batches(plan.source, batch_rows=CONFIG.batch_rows,
                               **opts):
        if plan.columns is not None:
            at = at.select([c for c in plan.columns
                            if c in at.column_names])
        t = table_from_arrow(at)
        if plan.predicate is not None:
            from ..api.frame import DataFrame
            t = DataFrame._from_table(t).filter(plan.predicate)._table
        if remaining is not None:
            from ..ops.compact import slice_rows
            n = t.count_rows()
            if n >= remaining:
                yield slice_rows(t, 0, remaining)
                return
            remaining -= n
        yield t


def _decompose_aggs(aggs: List[Expr]):
    """Rewrite each agg expr into (partial exprs, merge exprs, final expr).
    Returns None if any agg is not decomposable."""
    partials: List[Expr] = []
    finals: List[Expr] = []
    merges: List[Expr] = []
    counter = [0]

    def fresh(prefix):
        counter[0] += 1
        return f"__pt_{prefix}_{counter[0]}"

    def rec(e: Expr) -> Optional[Expr]:
        if e.kind == "agg":
            name = e.attrs["agg"]
            if name in _DECOMPOSABLE:
                p, m = _DECOMPOSABLE[name]
                nm = fresh(name)
                partials.append(Expr("agg", e.children, agg=p, **{
                    kk: v for kk, v in e.attrs.items() if kk != "agg"}).alias(nm))
                merges.append(Expr("agg", (_col(nm),), agg=m).alias(nm))
                return _col(nm)
            if name == "mean":
                from ..expr.expr import lit, when
                ns, nc = fresh("msum"), fresh("mcnt")
                partials.append(Expr("agg", e.children, agg="sum").alias(ns))
                partials.append(Expr("agg", e.children, agg="count").alias(nc))
                merges.append(Expr("agg", (_col(ns),), agg="sum").alias(ns))
                merges.append(Expr("agg", (_col(nc),), agg="sum").alias(nc))
                # all-null group: count==0 -> null, not 0/0=NaN
                return when(_col(nc) > 0).then(_col(ns) / _col(nc)) \
                    .otherwise(lit(None))
            if name in ("std", "var"):
                from ..expr.expr import lit, when
                ddof = e.attrs.get("ddof", 1)
                x = e.children[0]
                ns, ns2, nc = fresh("vsum"), fresh("vsq"), fresh("vcnt")
                partials.append(Expr("agg", (x,), agg="sum").alias(ns))
                partials.append(Expr("agg", ((x * x),), agg="sum").alias(ns2))
                partials.append(Expr("agg", (x,), agg="count").alias(nc))
                for nm in (ns, ns2, nc):
                    merges.append(Expr("agg", (_col(nm),), agg="sum").alias(nm))
                var = (_col(ns2) - _col(ns) * _col(ns) / _col(nc)) / \
                    (_col(nc) - ddof)
                out = var.sqrt() if name == "std" else var
                return when(_col(nc) > ddof).then(out).otherwise(lit(None))
            return None
        if e.kind == "table_len":
            nm = fresh("len")
            partials.append(Expr("table_len").alias(nm))
            merges.append(Expr("agg", (_col(nm),), agg="sum").alias(nm))
            return _col(nm)
        if e.kind in ("alias", "name_map"):
            inner = rec(e.children[0])
            if inner is None:
                return None
            return Expr(e.kind, (inner,), **e.attrs)
        if e.kind in ("binary", "unary", "cast"):
            new_children = []
            for c in e.children:
                if c.kind == "lit":
                    new_children.append(c)
                    continue
                r = rec(c)
                if r is None:
                    return None
                new_children.append(r)
            return Expr(e.kind, tuple(new_children), **e.attrs)
        if e.kind == "lit":
            return e
        return None

    for a in aggs:
        nm = meta.output_name(a)
        f = rec(a)
        if f is None:
            return None
        finals.append(f.alias(nm))
    return partials, merges, finals


def _stream_group_by(plan: L.GroupBy) -> Optional[Table]:
    ins = plan.input.schema()
    keys = meta.expand_exprs(plan.keys, ins)
    aggs = meta.expand_exprs(plan.aggs, ins)
    if builtins_any(not (k.kind == "col" or meta.is_elementwise(k))
                    for k in keys):
        return None
    dec = _decompose_aggs(aggs)
    if dec is None:
        return None
    partials, merges, finals = dec
    key_names = [meta.output_name(k) for k in keys]

    # fold any pure-elementwise chain feeding the group-by INTO the
    # per-batch partial-agg program: one compiled dispatch per batch
    # instead of a fused chain dispatch + ~dozens of eager group-by ops
    # (each eager op costs ~1-3 ms through the remote tunnel, which
    # serialized host dispatch against device compute — VERDICT r4 #2)
    from .compiled import run_fused
    chain: List[L.Plan] = []
    src = plan.input
    while src.kind in ("select", "with_columns", "filter") and \
            _elem_ok(src):
        chain.append(src)
        src = src.input
    chain.reverse()
    gnode = L.GroupBy(plan.input, list(keys), list(partials), False)
    partial_tables: List[Table] = []
    for t in _stream(src):
        partial_tables.append(run_fused(chain + [gnode], t))
    if not partial_tables:
        return None
    if len(partial_tables) == 1:
        merged = partial_tables[0]
    else:
        stacked = vstack_tables(partial_tables)
        merged = run_fused(
            [L.GroupBy(plan.input, [_col(n) for n in key_names],
                       list(merges), False)], stacked)
    from ..api.frame import DataFrame
    df = DataFrame._from_table(merged)
    out = df.select([_col(n) for n in key_names] + finals)
    return out._table
