"""Group-by: sort-based segment aggregation.

TPU-native replacement for the reference's two-phase hash group-by
(`polars-stream/src/nodes/group_by.rs`, hot/cold tables in
`polars-expr/src/hot_groups/`, `GroupedReduction` impls in
`polars-expr/src/reduce/`): instead of per-thread hash tables + partition
combine, keys are encoded to order-preserving words (`keycode.py`), rows
are sorted once with XLA's fused multi-operand sort, group boundaries fall
out of adjacent-inequality, and every aggregation is a vectorized
segment reduction — deterministic, single compile, no dynamic allocation.

The same machinery powers `unique` (mask the first/last row per group) and
feeds the distributed path (`parallel/shuffle.py`): local partial states
are exchanged by hash partition and merged with a second segment pass.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .merge_sort import sort_ops as _mssort

from ..batch import Column, Table, storage_numpy_dtype, width_for
from ..dtypes import (Boolean, DataType, Date, Datetime, Duration, Float32,
                      Float64, Int64, UInt32)
from ..errors import ComputeError, DuplicateError, InvalidOperationError
from ..expr import meta
from ..expr.eval import Val, _acc_dtype, _float_dt, _sum_dtype, _type_bounds, \
    cast_val, eval_expr
from ..expr.expr import Expr
from . import compact as C
from .keycode import encode_key_words, lex_sort_indices

__all__ = ["GroupContext", "build_groups", "group_by_agg", "unique_table"]


class GroupContext:
    """Group layout over rows.

    Sorted layout (default): perm maps sorted slot -> original row, groups
    are contiguous runs, gid is monotone (`sorted_ids=True`).

    Dense layout (statically small key domains — dictionary strings,
    bools, 8/16-bit ints): perm is the identity and gid is the key's
    dense code directly — NO SORT; segment reductions scatter by gid
    (`sorted_ids=False`). The hash-table O(n) group-by the reference gets
    from HotGrouper, expressed as direct indexing.

    `cap` is the row capacity; `out_cap` the group-slot count (== cap for
    sorted, == padded key-domain product for dense). Dead rows get
    gid == out_cap (the dump slot).
    """

    __slots__ = ("perm", "gid", "newgrp", "live_sorted", "ngroups", "cap",
                 "_group_start", "group_count", "out_cap", "sorted_ids",
                 "sorted_cache", "mxu_stash", "sorted_extra")

    def __init__(self, perm, gid, newgrp, live_sorted, ngroups, cap,
                 group_start, group_count, out_cap=None, sorted_ids=True):
        # id(row-order column data) -> (sorted data, sorted validity|None):
        # bare-column agg inputs carried through the ONE build sort so
        # _sorted_val skips its per-agg permutation gather (~30 ms per
        # column at 4M rows on TPU)
        self.sorted_cache = {}
        # dense MXU layout: batched one-hot reductions, one kernel pass
        # for ALL simple aggregates (keyed ("len",) / ("count"|"sum",
        # id(col.data)))
        self.mxu_stash = {}
        # sorted extra_words (within-group ordering words) from the
        # build sort — free to expose, lets rank().over() read the
        # value order without a second sort
        self.sorted_extra = ()
        self.perm = perm
        self.gid = gid
        self.newgrp = newgrp
        self.live_sorted = live_sorted
        self.ngroups = ngroups
        self.cap = cap
        self._group_start = group_start  # None = compute lazily (dense path)
        self.group_count = group_count  # per-group live size
        self.out_cap = out_cap if out_cap is not None else cap
        self.sorted_ids = sorted_ids

    @property
    def group_start(self):
        # per-group first slot (original row index in the dense layout);
        # a TPU scatter — computed only for aggs that need positions
        if self._group_start is None:
            idx = jnp.arange(self.cap, dtype=jnp.int32)
            if not self.sorted_ids and self.out_cap <= _MXU_GROUP_LIMIT \
                    and jax.default_backend() != "cpu":
                self._group_start = _masked_seg_minmax(
                    idx, self.gid, self.out_cap, self.live_sorted, False,
                    self.cap)
            else:
                self._group_start = _seg_min(
                    jnp.where(self.live_sorted, idx,
                              self.cap).astype(jnp.int32),
                    self.gid, self.out_cap, self.sorted_ids)
        return self._group_start


def key_words_for(key_vals: Sequence[Val], cap: int) -> List[jax.Array]:
    words: List[jax.Array] = []
    for v in key_vals:
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        validity = v.validity
        if validity is not None and validity.shape[0] != cap:
            validity = jnp.broadcast_to(validity, (cap,))
        words.extend(encode_key_words(data, validity, False, False))
    return words


def build_groups(key_vals: Sequence[Val], mask: jax.Array,
                 extra_words: Sequence[jax.Array] = (),
                 carry_cols=()) -> GroupContext:
    """`extra_words`: additional sort-key words ordering rows WITHIN
    groups (over(order_by)). `carry_cols`: (key, data, validity|None)
    triples carried through the build sort as tail operands, landing in
    ctx.sorted_cache (skips per-agg permutation gathers)."""
    cap = mask.shape[0]
    dead = (~mask).astype(jnp.uint32)
    words = [dead] + key_words_for(key_vals, cap) + list(extra_words)
    n_grp_words = len(words) - len(extra_words)
    tails, layout = [], []
    from .keycode import col_from_u32_words, col_to_u32_words
    for ck, cdata, cval in carry_cols:
        ws = col_to_u32_words(cdata)
        tails.extend(ws)
        if cval is not None:
            tails.append(cval.astype(jnp.uint32))
        layout.append((ck, cdata.dtype, len(ws), cval is not None))
    if not tails and len(words) == 2 and cap < (1 << 31):
        # single-word key, no carries: ONE fused-u64 single-operand
        # sort ([dead:1|key:32|idx:31], ops/fused_sort.py) instead of
        # the 3-operand stable sort — the group-layout sort is the
        # fixed cost of every window/over and general group-by
        from .fused_sort import fused_argsort_dead_key
        dead_s, key_s, perm = fused_argsort_dead_key(words[0], words[1])
        skeys, stails = [dead_s, key_s], ()
    else:
        skeys, stails, perm = lex_sort_indices(words, tuple(tails))
    live_sorted = skeys[0] == 0
    idx = jnp.arange(cap)
    newgrp = idx == 0
    for w in skeys[1:n_grp_words]:
        newgrp = newgrp | (w != jnp.roll(w, 1))
    newgrp = newgrp & live_sorted
    gid = jnp.cumsum(newgrp.astype(jnp.int32)) - 1
    gid = jnp.where(live_sorted, gid, cap)  # dump slot for dead rows
    ngroups = jnp.sum(newgrp)
    ones = live_sorted.astype(jnp.int32)
    group_count = _seg_sum(ones, gid, cap)
    group_start = _seg_min(jnp.where(live_sorted, idx, cap).astype(jnp.int32),
                           gid, cap)
    ctx = GroupContext(perm, gid, newgrp, live_sorted, ngroups, cap,
                       group_start, group_count)
    if extra_words:
        ctx.sorted_extra = tuple(skeys[n_grp_words:])
    wi = 0
    from ..batch import storage_numpy_dtype as _snd
    for ck, cdt, nw, hasv in layout:
        sdata = col_from_u32_words(list(stails[wi:wi + nw]),
                                   jnp.dtype(cdt))
        wi += nw
        svalid = None
        if hasv:
            svalid = stails[wi] != 0
            wi += 1
        ctx.sorted_cache[ck] = (sdata, svalid)
    return ctx


# --- segment reduction helpers (dump-slot pattern: ids == ncap are dropped
# by reducing into ncap+1 slots and slicing) -------------------------------
#
# sorted layout (gid non-decreasing, dump ids last): scatter-free — TPU
# scatters serialize (~125ms per segment op at 8M rows), so the sorted
# path uses a segmented associative scan plus a one-off boundary sort
# (cached per gid array) and pure gathers instead.

_BOUNDS_CACHE: dict = {}  # id(gid) -> (gid ref, (starts, ends, ngroups))


def _sorted_bounds(gid, ncap):
    hit = _BOUNDS_CACHE.get(id(gid))
    if hit is not None and hit[0] is gid and hit[1] == ncap:
        return hit[2]
    cap = gid.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    live = gid < ncap
    newg = live & ((idx == 0) | (gid != jnp.roll(gid, 1)))
    ngroups = jnp.sum(newg.astype(jnp.int32))
    nlive = jnp.sum(live.astype(jnp.int32))
    # compact boundary slots to the front: starts[g] = first slot of
    # group g (boundaries appear in increasing gid order)
    border = (~newg).astype(jnp.uint32)
    _, starts = _mssort([border, idx], 1, is_stable=True)
    g_arange = jnp.arange(cap, dtype=jnp.int32)
    next_start = jnp.concatenate([starts[1:],
                                  jnp.full((1,), cap, jnp.int32)])
    ends = jnp.where(g_arange < ngroups - 1, next_start, nlive)
    res = (newg, starts, ends, ngroups)
    if len(_BOUNDS_CACHE) >= 4:
        _BOUNDS_CACHE.pop(next(iter(_BOUNDS_CACHE)))
    _BOUNDS_CACHE[id(gid)] = (gid, ncap, res)
    return res


def _segscan(v, flags, op):
    """Segmented inclusive scan (log-doubling over primitive rolls —
    see _seg_scan_doubling for why not associative_scan on TPU)."""
    gid = jnp.cumsum(flags.astype(jnp.int32))
    return _seg_scan_doubling(v, gid, op)


def _fit(arr, ncap, fill):
    cap = arr.shape[0]
    if ncap <= cap:
        return jax.lax.slice_in_dim(arr, 0, ncap)
    return jnp.concatenate([arr, jnp.full((ncap - cap,), fill, arr.dtype)])


def _split_words(x):
    """Bitcast an array to 1 (<=4B) or 2 (8B) uint32 word arrays
    (TPU-legal forms; see keycode.col_to_u32_words)."""
    from .keycode import col_to_u32_words
    return col_to_u32_words(x)


def _join_words(words, dtype):
    from .keycode import col_from_u32_words
    return col_from_u32_words(words, jnp.dtype(dtype))


def _bcast_end_rows(seed_vals, gid, ncap):
    """Broadcast each run's END-slot value to all of its rows via a
    reversed segmented max scan (no ncap-sized gather — XLA gathers
    cost ~7 ns/element on TPU). seed_vals: list of (incl_scan, ident)
    where ident must compare below every real value."""
    cap = gid.shape[0]
    live = gid < ncap
    idx = jnp.arange(cap, dtype=jnp.int32)
    is_end = live & ((idx == cap - 1) | (jnp.roll(gid, -1) != gid))
    out = []
    for incl, ident in seed_vals:
        out.append(_seg_scan_doubling(
            jnp.where(is_end, incl, ident)[::-1], gid[::-1],
            jnp.maximum)[::-1])
    return out


def _group_mean_rows(sx, spart, gid, ncap):
    """Per-row group mean over a gid-sorted layout, gather-free: two
    segmented inclusive scans + end-slot broadcasts."""
    xf = jnp.where(spart, sx, 0).astype(jnp.float32)
    s_incl = _seg_scan_doubling(xf, gid, jnp.add)
    c_incl = _seg_scan_doubling(spart.astype(jnp.int32), gid, jnp.add)
    tot_row, cnt_row = _bcast_end_rows(
        [(s_incl, -jnp.inf), (c_incl, -1)], gid, ncap)
    return tot_row / jnp.maximum(cnt_row, 1).astype(jnp.float32)


def _compact_at_ends(gid, ncap, arrays):
    """Stably compact each array's values at segment-END slots to the
    front (in gid order) with ONE multi-operand sort. On TPU a sort pass
    is ~25ms for 8M rows while a random gather is ~80ms (f32) / ~160ms
    (8-byte) — boundary extraction must never gather. Returns
    (compacted arrays, ngroups)."""
    cap = gid.shape[0]
    live = gid < ncap
    idx = jnp.arange(cap, dtype=jnp.int32)
    is_end = live & ((idx == cap - 1) | (jnp.roll(gid, -1) != gid))
    return _compact_selected(is_end, arrays)


def _compact_selected(sel, arrays):
    """Stably compact each array's values at `sel` slots to the front.
    Returns (compacted arrays, count). Boundary extraction IS a 1-bit
    stable partition: the Pallas block-partition kernel does it in
    ~bandwidth time (~7 ms vs ~22 ms for the carry sort at 8M rows)."""
    ngroups = jnp.sum(sel.astype(jnp.int32))
    words: list = []
    splits: list = []
    for a in arrays:
        w = _split_words(a)
        splits.append((len(w), a.dtype))
        words.extend(w)
    from .pallas_partition import compact_words, use_partition_kernel
    out = None
    if use_partition_kernel():
        res_k = compact_words(sel, words)
        if res_k is not None:
            out = [None] + res_k[0]  # align with the sort-output layout
    if out is None:
        flag = (~sel).astype(jnp.uint32)
        out = _mssort([flag] + list(words), 1, is_stable=True)
    res = []
    pos = 1
    for nw, dt in splits:
        res.append(_join_words(list(out[pos:pos + nw]), dt))
        pos += nw
    return res, ngroups


def _seg_scan_doubling(v, gid, combine):
    """Segmented inclusive scan via log-doubling over primitive rolls.

    Replaces (a) `jax.lax.associative_scan` with custom combiners — the
    remote compiler never returns at multi-million-row sizes — and
    (b) the 64-bit (gid<<32 | value) cummax / f64 cumsum packings, which
    v5e EMULATES word-by-word through reduce_window (the r2 bench's
    688 ms sort-path group-by was almost entirely this). log2(cap)
    unrolled steps of roll + compare + select, all 32-bit-native.

    Float sums get pairwise-tree accumulation order (error grows with
    the scan DEPTH, not the global prefix magnitude) — the same quality
    as the reference's pairwise float_sum (`polars-compute/src/
    float_sum.rs`)."""
    cap = v.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    k = 1
    while k < cap:
        vs = jnp.roll(v, k)
        gs = jnp.roll(gid, k)
        ok = (gs == gid) & (idx >= k)
        v = jnp.where(ok, combine(v, vs), v)
        k <<= 1
    return v


def _seg_scan_doubling_multi(arrs, gid, combine):
    """Segmented inclusive scan over a TUPLE of arrays with an arbitrary
    associative combine(prev_arrs, cur_arrs) -> new_arrs — the
    log-doubling form of linear recurrences (EWM etc.) without
    associative_scan."""
    cap = arrs[0].shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    k = 1
    while k < cap:
        shifted = [jnp.roll(a, k) for a in arrs]
        gs = jnp.roll(gid, k)
        ok = (gs == gid) & (idx >= k)
        new = combine(shifted, arrs)
        arrs = [jnp.where(ok, nv, av) for nv, av in zip(new, arrs)]
        k <<= 1
    return arrs


def _seg_scan_doubling2(vh, vl, gid):
    """Segmented inclusive SUM scan on two-float (double-single) pairs:
    Knuth two-sum keeps ~49 bits of accumulator through the doubling
    tree, matching the old f64-cumsum quality without any emulated
    64-bit arithmetic."""
    cap = vh.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)

    def ds_add(ah, al, bh, bl):
        s = ah + bh
        v = s - ah
        e = (ah - (s - v)) + (bh - v)
        lo = e + al + bl
        hi2 = s + lo
        lo2 = lo - (hi2 - s)
        return hi2, lo2

    k = 1
    while k < cap:
        sh = jnp.roll(vh, k)
        sl = jnp.roll(vl, k)
        gs = jnp.roll(gid, k)
        ok = (gs == gid) & (idx >= k)
        nh, nl = ds_add(vh, vl, sh, sl)
        vh = jnp.where(ok, nh, vh)
        vl = jnp.where(ok, nl, vl)
        k <<= 1
    return vh, vl


def _seg_sorted(data, gid, ncap, op, ident):
    """Per-group totals over a gid-sorted layout: segmented log-doubling
    scan (`_seg_scan_doubling`) leaves each group's total at its END
    slot; one boundary-compaction sort moves end slots to the front in
    gid order (gather-free — a sort pass is ~25 ms for 8M rows while a
    random gather is ~80 ms)."""
    cap = gid.shape[0]
    live = gid < ncap
    if op is jnp.add:
        x = jnp.where(live, data, jnp.zeros((), data.dtype))
        if data.dtype == jnp.float32 and jax.config.jax_enable_x64:
            # compensated two-float accumulation: f64-quality sums from
            # 32-bit-native ops (the engine's f32 sums accumulate wide,
            # and v5e emulates real f64 adds word-by-word)
            hi, lo = _seg_scan_doubling2(x, jnp.zeros_like(x), gid)
            (thi, tlo), ngroups = _compact_at_ends(gid, ncap, [hi, lo])
            tot = (thi.astype(jnp.float64) +
                   tlo.astype(jnp.float64)).astype(data.dtype)
        else:
            scanned = _seg_scan_doubling(x, gid, jnp.add)
            (tot,), ngroups = _compact_at_ends(gid, ncap, [scanned])
        gvalid = jnp.arange(cap) < ngroups
        out = jnp.where(gvalid, tot, jnp.asarray(ident, data.dtype))
        return _fit(out, ncap, ident)
    if op is jnp.minimum or op is jnp.maximum:
        from .keycode import encode_orderable
        is_min = op is jnp.minimum
        x = jnp.where(live, data, jnp.asarray(ident, data.dtype))
        u = encode_orderable(x, descending=is_min)  # max of u == op-best
        if u.dtype.itemsize <= 4:
            scanned = _seg_scan_doubling(u.astype(jnp.uint32), gid,
                                         jnp.maximum)
            (best_u,), ngroups = _compact_at_ends(gid, ncap, [scanned])
        else:
            # 64-bit values: one 3-word sort puts each segment's largest
            # encoding at its end (gid ascends; dead gid == ncap sorts
            # past every live segment)
            hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
            lo32 = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            sgid, bh, bl = _mssort(
                [gid.astype(jnp.int32), hi, lo32], 3, is_stable=False)
            (cbh, cbl), ngroups = _compact_at_ends(sgid, ncap, [bh, bl])
            best_u = ((cbh.astype(jnp.uint64) << jnp.uint64(32)) |
                      cbl.astype(jnp.uint64))
        from .keycode import decode_orderable
        val = decode_orderable(best_u, data.dtype, descending=is_min)
        gvalid = jnp.arange(cap) < ngroups
        out = jnp.where(gvalid, val, jnp.asarray(ident, data.dtype))
        return _fit(out, ncap, ident)
    scanned = _seg_scan_doubling(
        jnp.where(live, data, jnp.asarray(ident, data.dtype)), gid, op)
    (tot,), ngroups = _compact_at_ends(gid, ncap, [scanned])
    out = jnp.where(jnp.arange(cap) < ngroups, tot,
                    jnp.asarray(ident, data.dtype))
    return _fit(out, ncap, ident)


def _seg_reduce_op(data, gid, ncap, op, ident):
    """Segmented reduce with an arbitrary associative op (no segment_*
    primitive): sort rows by gid, segmented scan, scatter each segment's
    last scanned value into its group slot. gid values are slot indices
    (need not be dense); gid >= ncap rows are dead."""
    cap = gid.shape[0]
    order = jnp.argsort(gid, stable=True)
    g2 = gid[order]
    d2 = data[order]
    live = g2 < ncap
    idx = jnp.arange(cap)
    newg = (idx == 0) | (g2 != jnp.roll(g2, 1))
    scanned = _segscan(jnp.where(live, d2, jnp.asarray(ident, d2.dtype)),
                       newg, op)
    is_last = jnp.concatenate([newg[1:], jnp.ones(1, jnp.bool_)])
    tgt = jnp.where(is_last & live, g2, ncap).astype(jnp.int32)
    out = jnp.full((ncap + 1,), ident, d2.dtype).at[tgt].set(
        jnp.where(is_last & live, scanned,
                  jnp.asarray(ident, d2.dtype)))
    return out[:ncap]


def _use_segscan() -> bool:
    # CPU scatters are fast and the associative scan is not; the
    # scatter-free path pays off on accelerators only
    return jax.default_backend() != "cpu"


def _seg_unsorted_dense(v, gid, ncap: int, op, ident):
    """Exact segment reduction over an UNSORTED dense-code gid on
    accelerator: sort (gid, value-words) and run the sorted doubling
    path. Sentinel rows (one identity per group slot) keep empty groups
    in their dense slots. Replaces TPU scatter-based segment ops, which
    serialize (H2O q1 at 4M rows: 293 ms via scatters vs ~25 ms here).
    """
    cap = gid.shape[0]
    from .keycode import col_from_u32_words, col_to_u32_words
    g_ext = jnp.concatenate([jnp.where(gid < ncap, gid, ncap + 1)
                             .astype(jnp.int32),
                             jnp.arange(ncap, dtype=jnp.int32)])
    v_ext = jnp.concatenate([v, jnp.full(ncap, ident, v.dtype)])
    words = col_to_u32_words(v_ext)
    out = jax.lax.sort((g_ext,) + tuple(words), num_keys=1,
                       is_stable=False)
    g2 = out[0]
    v2 = col_from_u32_words(list(out[1:]), jnp.dtype(v.dtype))
    return _seg_sorted(v2, jnp.where(g2 < ncap, g2, cap + ncap).astype(
        jnp.int32), ncap, op, ident)


def _seg_sum(data, gid, ncap, sorted_ids: bool = True):
    if _use_segscan():
        if sorted_ids:
            return _seg_sorted(data, gid, ncap, jnp.add, 0)
        return _seg_unsorted_dense(data, gid, ncap, jnp.add, 0)
    out = jax.ops.segment_sum(data, gid, num_segments=ncap + 1,
                              indices_are_sorted=sorted_ids)
    return jax.lax.slice_in_dim(out, 0, ncap)


def _seg_min(data, gid, ncap, sorted_ids: bool = True):
    if _use_segscan():
        if jnp.issubdtype(data.dtype, jnp.floating):
            ident = jnp.inf
        else:
            ident = jnp.iinfo(data.dtype).max
        if sorted_ids:
            return _seg_sorted(data, gid, ncap, jnp.minimum, ident)
        return _seg_unsorted_dense(data, gid, ncap, jnp.minimum, ident)
    out = jax.ops.segment_min(data, gid, num_segments=ncap + 1,
                              indices_are_sorted=sorted_ids)
    return jax.lax.slice_in_dim(out, 0, ncap)


def _seg_max(data, gid, ncap, sorted_ids: bool = True):
    if _use_segscan():
        if jnp.issubdtype(data.dtype, jnp.floating):
            ident = -jnp.inf
        else:
            ident = jnp.iinfo(data.dtype).min
        if sorted_ids:
            return _seg_sorted(data, gid, ncap, jnp.maximum, ident)
        return _seg_unsorted_dense(data, gid, ncap, jnp.maximum, ident)
    out = jax.ops.segment_max(data, gid, num_segments=ncap + 1,
                              indices_are_sorted=sorted_ids)
    return jax.lax.slice_in_dim(out, 0, ncap)


# --- one-hot matmul segment sums (MXU path) --------------------------------
# TPU scatters serialize; for small group counts the sum IS a matmul:
# out[g] = sum_i v_i * (gid_i == g)  ==  v-blocks @ one-hot-blocks, scanned
# over row blocks with an f32 accumulator. ~16x faster than segment_sum on
# v5e at G<=4096 (930M rows/s for 8M x 1024). Exact for counts < 2^24 and
# float sums (blockwise accumulation); integer sums keep the exact scatter.

_MXU_GROUP_LIMIT = 4096


def _onehot_seg_sum_f32(values, gid, G: int, live):
    """sum of values per group via one-hot matmuls. `values` is a list of
    f32 arrays; returns a list of (G,) f32 arrays. On TPU this is a
    hand-written Pallas kernel (one-hot built in VMEM, single HBM pass);
    elsewhere, scanned XLA dots."""
    from .pallas_kernels import onehot_seg_sum, use_pallas
    if use_pallas():
        stacked = jnp.stack([jnp.where(live, v, 0).astype(jnp.float32)
                             for v in values], axis=0)
        out = onehot_seg_sum(stacked, gid, G)
        return [out[i] for i in range(len(values))]
    n = gid.shape[0]
    B = min(n, 1 << 16)
    K = max(n // B, 1)
    gpad = G  # matmul width
    g2 = gid.reshape(K, B)
    stacked = jnp.stack([jnp.where(live, v, 0).astype(jnp.float32)
                         for v in values], axis=0)  # C, n
    C = stacked.shape[0]
    vb = stacked.reshape(C, K, B).transpose(1, 0, 2)  # K, C, B

    def step(acc, xs):
        gb, vv = xs
        onehot = (gb[:, None] == jnp.arange(gpad)[None, :]) \
            .astype(jnp.float32)
        return acc + jax.lax.dot(vv, onehot,
                                 precision=jax.lax.Precision.HIGHEST), None

    acc0 = jnp.zeros((C, gpad), jnp.float32)
    out, _ = jax.lax.scan(step, acc0, (g2, vb))
    return [out[i] for i in range(C)]


def _masked_seg_minmax(x, gid, G: int, live, is_max: bool, identity):
    """Per-group min/max via blocked masked reductions — no scatter.
    XLA fuses the (B, G) broadcast-compare-select into the axis-0 reduce,
    so nothing is materialized; ~20x faster than segment_min/max scatters
    on TPU (measured 3ms vs 70ms at 8M rows, G~1k). f32 inputs on TPU use
    the Pallas single-pass kernel instead."""
    from .pallas_kernels import onehot_seg_minmax, use_pallas
    if use_pallas() and x.dtype == jnp.float32 and \
            np.isinf(float(identity)):
        gm = jnp.where(live, gid, -1)
        return onehot_seg_minmax(x, gm, G, is_max, float(identity))
    n = x.shape[0]
    B = min(n, 1 << 14)
    K = max(n // B, 1)
    x = jnp.where(live, x, identity)
    g2 = gid.reshape(K, B)
    x2 = x.reshape(K, B)
    red = jnp.max if is_max else jnp.min

    def step(acc, xs):
        gb, vv = xs
        m = jnp.where(gb[:, None] == jnp.arange(G)[None, :], vv[:, None],
                      identity)
        r = red(m, axis=0)
        return (jnp.maximum(acc, r) if is_max else jnp.minimum(acc, r)), None

    acc0 = jnp.full((G,), identity, x.dtype)
    out, _ = jax.lax.scan(step, acc0, (g2, x2))
    return out


def _onehot_gather_f32(table_vals, gid):
    """Per-row lookup out[i] = table_vals[gid[i]] via scanned one-hot
    matvecs (MXU). 8M-row gathers from small tables cost ~58ms on TPU;
    this is ~3ms. `table_vals` is (G,) f32; gid rows >= G read 0."""
    from .pallas_kernels import onehot_gather, use_pallas
    if use_pallas():
        return onehot_gather(table_vals, gid)
    G = table_vals.shape[0]
    n = gid.shape[0]
    B = min(n, 1 << 16)
    K = max(n // B, 1)
    g2 = gid.reshape(K, B)

    def step(_, gb):
        oh = (gb[:, None] == jnp.arange(G)[None, :]).astype(jnp.float32)
        return None, jax.lax.dot(oh, table_vals,
                                 precision=jax.lax.Precision.HIGHEST)

    _, out = jax.lax.scan(step, None, g2)
    return out.reshape(-1)


def _dense_mxu_ok(ctx) -> bool:
    # CPU scatters are fast and CPU floats are true f64 — the matmul path
    # is an accelerator optimization only
    return (not ctx.sorted_ids) and ctx.out_cap <= _MXU_GROUP_LIMIT \
        and jax.default_backend() != "cpu"


# --- dense (no-sort) group layout for statically small key domains --------

def _dense_spans(key_vals: Sequence[Val], key_exprs=None, table=None):
    """Per-key (span, base) when the key's domain is statically known:
    dictionary strings (dict length), Boolean, 8/16-bit ints, and wider
    ints carrying host-cached min/max stats (see Column.stats). Returns
    None if any key is unbounded. Slot 0 of each span is null."""
    out = []
    for i, v in enumerate(key_vals):
        dt = v.dtype
        name = repr(dt)
        if dt.is_string:
            if v.sdict is None:
                return None
            out.append((len(v.sdict) + 1, None))
        elif name == "Boolean":
            out.append((3, None))
        elif name in ("Int8", "UInt8"):
            out.append((257, -128 if name == "Int8" else 0))
        elif name in ("Int16", "UInt16"):
            out.append((65537, -32768 if name == "Int16" else 0))
        elif dt.is_integer and key_exprs is not None and table is not None:
            e = key_exprs[i]
            while e.kind == "alias":
                e = e.children[0]
            if e.kind != "col":
                return None
            c = table.cols.get(e.attrs["name"])
            if c is None or c.stats is None or "min" not in c.stats:
                return None
            span = int(c.stats["max"]) - int(c.stats["min"]) + 2
            if span <= 1:
                span = 2
            out.append((span, int(c.stats["min"])))
        else:
            return None
    return out


def _dense_code(v: Val, span: int, base, cap: int):
    data = v.data if v.data.shape[0] == cap else \
        jnp.broadcast_to(v.data, (cap,))
    name = repr(v.dtype)
    if v.dtype.is_string:
        code = data.astype(jnp.int32) + 1  # null code -1 -> 0
    elif name == "Boolean":
        code = data.astype(jnp.int32) + 1
    else:  # integer with known base
        code = (data.astype(jnp.int64) - base + 1).astype(jnp.int32)
    if v.validity is not None:
        validity = v.validity if v.validity.shape[0] == cap else \
            jnp.broadcast_to(v.validity, (cap,))
        code = jnp.where(validity, code, 0)
    return jnp.clip(code, 0, span - 1)


def _dense_decode(gidx, v: Val, span: int, base=None):
    """Group slot code -> key value (data, validity); code 0 is null."""
    name = repr(v.dtype)
    code = gidx.astype(jnp.int64)
    validity = code != 0
    if v.dtype.is_string:
        hi = max(len(v.sdict) - 1, 0) if v.sdict is not None else 0
        return jnp.clip(code - 1, 0, hi).astype(jnp.int32), validity
    if name == "Boolean":
        return code == 2, validity
    stor = jnp.dtype(storage_numpy_dtype(v.dtype))
    return (code - 1 + (base or 0)).astype(stor), validity


def build_groups_dense(key_vals: Sequence[Val], mask: jax.Array,
                       spans) -> GroupContext:
    """O(n) group layout: gid = mixed-radix dense key code; no sort."""
    from ..config import capacity_for
    cap = mask.shape[0]
    prod = 1
    for span, _ in spans:
        prod *= span
    out_cap = capacity_for(prod)
    gid = jnp.zeros(cap, jnp.int32)
    for v, (span, base) in zip(key_vals, spans):
        gid = gid * span + _dense_code(v, span, base or 0, cap)
    gid = jnp.where(mask, gid, out_cap)
    idx = jnp.arange(cap, dtype=jnp.int32)
    if out_cap <= _MXU_GROUP_LIMIT and jax.default_backend() != "cpu":
        (cnt,) = _onehot_seg_sum_f32([jnp.ones(cap, jnp.float32)], gid,
                                     out_cap, mask)
        group_count = cnt.astype(jnp.int32)
    else:
        group_count = _seg_sum(mask.astype(jnp.int32), gid, out_cap, False)
    ngroups = jnp.sum(group_count > 0)
    return GroupContext(idx, gid, None, mask, ngroups, cap,
                        None, group_count, out_cap, sorted_ids=False)


# ---------------------------------------------------------------------------
# aggregation over groups
# ---------------------------------------------------------------------------

def _sorted_val(v: Val, ctx: GroupContext) -> Tuple[jax.Array, jax.Array]:
    """(data, participates) in sorted order. participates = live row ∩ expr
    live-mask ∩ validity. The dense layout's perm is the identity — skip
    the 8M-row gathers there (TPU gathers dominate the agg otherwise)."""
    cap = ctx.cap
    data = v.data if v.data.shape[0] == cap else jnp.broadcast_to(v.data, (cap,))
    part = jnp.ones(cap, jnp.bool_)
    if v.validity is not None:
        part = part & (v.validity if v.validity.shape[0] == cap
                       else jnp.broadcast_to(v.validity, (cap,)))
    if v.live is not None:
        part = part & v.live
    if not ctx.sorted_ids:
        return data, part & ctx.live_sorted
    hit = ctx.sorted_cache.get(id(data)) if v.live is None else None
    if hit is not None:
        sdata, svalid = hit
        p = ctx.live_sorted if svalid is None else \
            (svalid & ctx.live_sorted)
        return sdata, p
    return data[ctx.perm], part[ctx.perm] & ctx.live_sorted


def _group_present(v: Val, ctx: GroupContext) -> jax.Array:
    """Per-sorted-slot mask of rows present in the group for this expr
    (live ∩ expr live), ignoring validity (for len/null_count/first)."""
    cap = ctx.cap
    part = jnp.ones(cap, jnp.bool_)
    if v.live is not None:
        part = part & v.live
    if not ctx.sorted_ids:
        return part & ctx.live_sorted
    return part[ctx.perm] & ctx.live_sorted


def reduce_group(agg: str, v: Val, ctx: GroupContext, attrs: dict,
                 table: Table) -> Val:
    """One GroupedReduction (reference: `polars-expr/src/reduce/*.rs`)."""
    cap = ctx.cap
    ncap = ctx.out_cap
    sids = ctx.sorted_ids
    gid = ctx.gid
    dt = v.dtype
    if agg in ("implode", "agg_groups"):
        return _group_implode(v, ctx, agg)
    sx, spart = _sorted_val(v, ctx)
    present = _group_present(v, ctx)

    def asval(out_dt, data, validity=None, sdict=None):
        return Val(out_dt, data, validity, sdict, False)

    mxu = _dense_mxu_ok(ctx)

    if agg == "len":
        if mxu:
            (c,) = _onehot_seg_sum_f32([jnp.ones(cap, jnp.float32)], gid,
                                       ncap, present)
            return asval(UInt32, c.astype(jnp.uint32))
        cnt = _seg_sum(present.astype(jnp.uint32), gid, ncap, sids)
        return asval(UInt32, cnt)
    if agg == "count":
        if mxu:
            st = ctx.mxu_stash.get(("count", id(v.data))) \
                if v.live is None else None
            if st is not None:
                return asval(UInt32, st.astype(jnp.uint32))
            (c,) = _onehot_seg_sum_f32([jnp.ones(cap, jnp.float32)], gid,
                                       ncap, spart)
            return asval(UInt32, c.astype(jnp.uint32))
        cnt = _seg_sum(spart.astype(jnp.uint32), gid, ncap, sids)
        return asval(UInt32, cnt)
    if agg == "null_count":
        if mxu:
            (c,) = _onehot_seg_sum_f32([jnp.ones(cap, jnp.float32)], gid,
                                       ncap, present & ~spart)
            return asval(UInt32, c.astype(jnp.uint32))
        cnt = _seg_sum((present & ~spart).astype(jnp.uint32), gid, ncap, sids)
        return asval(UInt32, cnt)
    if agg in ("any", "all"):
        if not dt.is_bool:
            raise InvalidOperationError(f"{agg} on {dt!r}")
        if agg == "any":
            if mxu:
                r = _masked_seg_minmax(
                    jnp.where(spart & sx, 1, 0).astype(jnp.int32), gid,
                    ncap, jnp.ones(cap, jnp.bool_), True, 0)
                return asval(Boolean, r == 1)
            r = _seg_max(jnp.where(spart & sx, 1, 0), gid, ncap, sids)
            return asval(Boolean, r == 1)
        if mxu:
            # all = min over participating rows (identity 1)
            r = _masked_seg_minmax(sx.astype(jnp.int32), gid, ncap, spart,
                                   False, 1)
            return asval(Boolean, r == 1)
        r = _seg_min(jnp.where(spart, sx.astype(jnp.int32), 1), gid, ncap, sids)
        return asval(Boolean, r == 1)
    if agg == "sum":
        if dt.is_bool:
            if mxu:
                (s,) = _onehot_seg_sum_f32([jnp.ones(cap, jnp.float32)], gid,
                                           ncap, spart & sx)
                return asval(UInt32, s.astype(jnp.uint32))
            s = _seg_sum(jnp.where(spart & sx, jnp.uint32(1), jnp.uint32(0)), gid, ncap, sids)
            return asval(UInt32, s)
        if mxu and dt.is_float:
            out_dt = _sum_dtype(dt)
            st = ctx.mxu_stash.get(("sum", id(v.data))) \
                if v.live is None else None
            if st is not None:
                return asval(out_dt, st.astype(
                    jnp.dtype(storage_numpy_dtype(out_dt))))
            (s,) = _onehot_seg_sum_f32([sx], gid, ncap, spart)
            return asval(out_dt,
                         s.astype(jnp.dtype(storage_numpy_dtype(out_dt))))
        acc = _acc_dtype(dt)
        out_dt = _sum_dtype(dt)
        s = _seg_sum(jnp.where(spart, sx, 0).astype(acc), gid, ncap, sids)
        return asval(out_dt, s.astype(jnp.dtype(storage_numpy_dtype(out_dt))))
    if agg == "product":
        # log-free product via segment exp(sum(log)) is lossy; use scan-free
        # trick: segment_prod doesn't exist -> sum of logs for floats,
        # iterated doubling too costly; implement via sorted cumprod ratio.
        acc = _acc_dtype(_float_dt(dt))
        lx = jnp.where(spart, sx, 1).astype(acc)
        cp = jnp.cumprod(lx)
        start = ctx.group_start
        prev = jnp.where(start > 0, cp[jnp.maximum(start - 1, 0)], 1)
        endpos = start + ctx.group_count - 1
        total = cp[jnp.clip(endpos, 0, cap - 1)] / prev
        return asval(dt, total.astype(sx.dtype))
    if agg == "mean":
        if mxu and (dt.is_float or dt.is_integer or dt.is_bool):
            out_dt = _float_dt(dt)
            ss = ctx.mxu_stash.get(("sum", id(v.data))) \
                if v.live is None else None
            nn = ctx.mxu_stash.get(("count", id(v.data))) \
                if v.live is None else None
            if ss is not None and nn is not None:
                m = ss / jnp.maximum(nn, 1)
                return asval(out_dt, m.astype(jnp.dtype(
                    storage_numpy_dtype(out_dt))), nn > 0)
            s, n = _onehot_seg_sum_f32([sx, jnp.ones(cap, jnp.float32)],
                                       gid, ncap, spart)
            m = s / jnp.maximum(n, 1)
            return asval(out_dt, m.astype(jnp.dtype(
                storage_numpy_dtype(out_dt))), n > 0)
        n = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids)
        acc = _acc_dtype(dt)
        if _use_segscan() and not (isinstance(dt, (Datetime, Duration))
                                   or dt == Date) and not dt.is_float:
            # int means: accumulate as compensated f32 pairs (~49 exact
            # bits through _seg_sorted's two-float ladder) instead of an
            # emulated-int64 ladder — the result is float anyway
            acc = jnp.float32
        s = _seg_sum(jnp.where(spart, sx, 0).astype(acc), gid, ncap, sids)
        out_dt = dt if (isinstance(dt, (Datetime, Duration)) or dt == Date) \
            else _float_dt(dt)
        m = s / jnp.maximum(n, 1)
        data = m.astype(sx.dtype) if out_dt == dt and not dt.is_float else \
            m.astype(jnp.dtype(storage_numpy_dtype(out_dt)))
        return asval(out_dt, data, n > 0)
    if agg in ("min", "max"):
        if mxu:
            has = _masked_seg_minmax(spart.astype(jnp.int32), gid, ncap,
                                     jnp.ones(cap, jnp.bool_), True, 0) > 0
        else:
            has = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids) > 0
        if dt.is_string:
            big = jnp.int32(np.iinfo(np.int32).max)
            if mxu:
                r = _masked_seg_minmax(sx, gid, ncap, spart,
                                       agg == "max",
                                       big if agg == "min" else -1)
            elif agg == "min":
                r = _seg_min(jnp.where(spart, sx, big), gid, ncap, sids)
            else:
                r = _seg_max(jnp.where(spart, sx, -1), gid, ncap, sids)
            return asval(dt, r, has, v.sdict)
        lo, hi = _type_bounds(sx.dtype)
        if mxu:
            r = _masked_seg_minmax(sx, gid, ncap, spart, agg == "max",
                                   hi if agg == "min" else lo)
        elif agg == "min":
            r = _seg_min(jnp.where(spart, sx, hi), gid, ncap, sids)
        else:
            r = _seg_max(jnp.where(spart, sx, lo), gid, ncap, sids)
        return asval(dt, r, has)
    if agg in ("var", "std"):
        ddof = attrs.get("ddof", 1)
        if mxu and (dt.is_float or dt.is_integer or dt.is_bool):
            # scatter-free two-pass: one-hot sums for (s, n), mean gathered
            # back to rows by one-hot matvec, second pass for sq devs
            s, nf = _onehot_seg_sum_f32([sx, jnp.ones(cap, jnp.float32)],
                                        gid, ncap, spart)
            m = s / jnp.maximum(nf, 1)
            mrow = _onehot_gather_f32(m, gid)
            dev = (sx.astype(jnp.float32) - mrow) ** 2
            (ss,) = _onehot_seg_sum_f32([dev], gid, ncap, spart)
            var = ss / jnp.maximum(nf - ddof, 1)
            out = jnp.sqrt(var) if agg == "std" else var
            out_dt = _float_dt(dt)
            return asval(out_dt, out.astype(jnp.dtype(
                storage_numpy_dtype(out_dt))), nf > ddof)
        n = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids)
        acc = _acc_dtype(_float_dt(dt))
        if _use_segscan():
            # accelerator: f32 + the compensated two-float ladder in
            # _seg_sorted (~49 exact bits) — the chip demotes f64
            # arithmetic to f32 anyway, so an emulated-f64 dev/ss chain
            # only adds conversion passes (q6 std 62 ms -> this path)
            acc = jnp.float32
        if sids and _use_segscan():
            mrow = _group_mean_rows(sx, spart, gid, ncap)
        else:
            s = _seg_sum(jnp.where(spart, sx, 0).astype(acc), gid, ncap,
                         sids)
            m = s / jnp.maximum(n, 1)
            # two-pass for stability: gather group mean back to rows
            mrow = m[jnp.clip(gid, 0, ncap - 1)]
        dev = jnp.where(spart, (sx.astype(acc) - mrow.astype(acc)) ** 2, 0)
        ss = _seg_sum(dev, gid, ncap, sids)
        var = ss / jnp.maximum(n - ddof, 1)
        out = jnp.sqrt(var) if agg == "std" else var
        out_dt = _float_dt(dt)
        return asval(out_dt, out.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                     n > ddof)
    if agg in ("first", "last"):
        idx = jnp.arange(cap, dtype=jnp.int32)
        pos = jnp.where(present, idx, cap if agg == "first" else -1)
        if mxu:
            sel = _masked_seg_minmax(pos, gid, ncap,
                                     jnp.ones(cap, jnp.bool_),
                                     agg == "last",
                                     cap if agg == "first" else -1)
        elif agg == "first":
            sel = _seg_min(pos, gid, ncap, sids)
        else:
            sel = _seg_max(pos, gid, ncap, sids)
        selc = jnp.clip(sel, 0, cap - 1)
        data = sx[selc]
        has = (sel < cap) & (sel >= 0)
        validity = has & spart[selc]
        if v.validity is None and v.live is None:
            validity = None if True else validity
            validity = None
        else:
            validity = has & spart[selc]
        # group with no present rows -> null
        if validity is None:
            if mxu:
                anyp = _masked_seg_minmax(present.astype(jnp.int32), gid,
                                          ncap, jnp.ones(cap, jnp.bool_),
                                          True, 0)
            else:
                anyp = _seg_sum(present.astype(jnp.int32), gid, ncap, sids)
            validity = anyp > 0
        return asval(dt, data, validity, v.sdict)
    if agg == "n_unique":
        return _group_n_unique(v, ctx, table)
    if agg in ("median", "quantile"):
        q = 0.5 if agg == "median" else float(attrs["q"])
        interp = "linear" if agg == "median" else attrs.get("interpolation", "nearest")
        return _group_quantile(v, ctx, q, interp)
    if agg in ("arg_min", "arg_max"):
        return _group_arg_extreme(v, ctx, agg)
    if agg == "mode":
        return _group_mode(v, ctx)
    if agg in ("implode", "agg_groups"):
        return _group_implode(v, ctx, agg)
    if agg in ("skew", "kurtosis"):
        # two-pass central moments per group (reference:
        # polars-compute/src/moment.rs under group_by)
        acc = _acc_dtype(_float_dt(dt))
        n = _seg_sum(spart.astype(acc), gid, ncap, sids)
        if sids and _use_segscan():
            mrow = _group_mean_rows(sx, spart, gid, ncap).astype(acc)
        else:
            s = _seg_sum(jnp.where(spart, sx, 0).astype(acc), gid, ncap,
                         sids)
            m = s / jnp.maximum(n, 1)
            mrow = m[jnp.clip(gid, 0, ncap - 1)]
        dev = jnp.where(spart, sx.astype(acc) - mrow, 0)
        m2 = _seg_sum(dev * dev, gid, ncap, sids) / jnp.maximum(n, 1)
        out_dt = Float64
        stor = jnp.dtype(storage_numpy_dtype(out_dt))
        if agg == "skew":
            m3 = _seg_sum(dev ** 3, gid, ncap, sids) / jnp.maximum(n, 1)
            g = m3 / jnp.maximum(m2, 1e-300) ** 1.5
            if not attrs.get("bias", True):
                g = g * jnp.sqrt(n * (n - 1)) / jnp.maximum(n - 2, 1)
                return asval(out_dt, g.astype(stor), (n > 2) & (m2 > 0))
            return asval(out_dt, g.astype(stor), (n > 0) & (m2 > 0))
        m4 = _seg_sum(dev ** 4, gid, ncap, sids) / jnp.maximum(n, 1)
        g = m4 / jnp.maximum(m2 * m2, 1e-300)
        valid = (n > 0) & (m2 > 0)
        if not attrs.get("bias", True):
            g = ((n + 1) * g - 3 * (n - 1)) * (n - 1) / \
                jnp.maximum((n - 2) * (n - 3), 1) + 3
            valid = (n > 3) & (m2 > 0)
        if attrs.get("fisher", True):
            g = g - 3.0
        return asval(out_dt, g.astype(stor), valid)
    if agg in ("nan_min", "nan_max"):
        n = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids)
        lo, hi = _type_bounds(sx.dtype)
        if agg == "nan_min":
            r = _seg_min(jnp.where(spart, sx, hi), gid, ncap, sids)
        else:
            r = _seg_max(jnp.where(spart, sx, lo), gid, ncap, sids)
        if dt.is_float:
            has_nan = _seg_max(
                jnp.where(spart & jnp.isnan(sx), 1, 0), gid, ncap, sids)
            r = jnp.where(has_nan > 0, jnp.nan, r)
        return asval(dt, r, n > 0)
    if agg in ("bitwise_and", "bitwise_or", "bitwise_xor"):
        n = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids)
        if dt.is_bool:
            if agg == "bitwise_and":
                r = _seg_min(jnp.where(spart, sx.astype(jnp.int32), 1),
                             gid, ncap, sids) == 1
            elif agg == "bitwise_or":
                r = _seg_max(jnp.where(spart, sx.astype(jnp.int32), 0),
                             gid, ncap, sids) == 1
            else:
                r = (_seg_sum(jnp.where(spart & sx, 1, 0), gid, ncap,
                              sids) % 2) == 1
            return asval(Boolean, r, n > 0)
        if not dt.is_integer:
            raise InvalidOperationError(f"{agg} on {dt!r}")
        if dt.is_signed_integer:
            ones = jnp.array(-1, sx.dtype)
        else:
            ones = jnp.array(np.iinfo(np.dtype(str(sx.dtype))).max, sx.dtype)
        if agg == "bitwise_and":
            fn2, ident = jnp.bitwise_and, ones
        elif agg == "bitwise_or":
            fn2, ident = jnp.bitwise_or, jnp.array(0, sx.dtype)
        else:
            fn2, ident = jnp.bitwise_xor, jnp.array(0, sx.dtype)
        r = _seg_reduce_op(jnp.where(spart, sx, ident), gid, ncap, fn2,
                           ident)
        return asval(dt, r, n > 0)
    if agg == "entropy":
        import math
        base = float(attrs.get("base", math.e))
        normalize = bool(attrs.get("normalize", True))
        acc = _acc_dtype(_float_dt(dt))
        xf = jnp.where(spart, sx, 0).astype(acc)
        n = _seg_sum(spart.astype(jnp.int32), gid, ncap, sids)
        if normalize:
            if sids and _use_segscan():
                s_incl = _seg_scan_doubling(xf.astype(jnp.float32), gid,
                                            jnp.add)
                (trow,) = _bcast_end_rows([(s_incl, -jnp.inf)], gid, ncap)
                trow = trow.astype(xf.dtype)
            else:
                tot = _seg_sum(xf, gid, ncap, sids)
                trow = tot[jnp.clip(gid, 0, ncap - 1)]
            p = xf / jnp.where(trow == 0, 1, trow)
        else:
            p = xf
        term = jnp.where(spart & (p > 0), p * jnp.log(p), 0.0)
        h = -_seg_sum(term, gid, ncap, sids) / math.log(base)
        out_dt = _float_dt(dt)
        return asval(out_dt,
                     h.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                     n > 0)
    raise ComputeError(f"unknown group aggregation {agg!r}")


def _group_arg_extreme(v: Val, ctx: GroupContext, agg: str) -> Val:
    """arg_min/arg_max: position (among the group's rows) of the extreme
    valid value, first occurrence winning ties."""
    cap, ncap = ctx.cap, ctx.out_cap
    sx, spart = _sorted_val(v, ctx)
    present = _group_present(v, ctx)
    lo_b, hi_b = _type_bounds(sx.dtype)
    fill = hi_b if agg == "arg_min" else lo_b
    vals = jnp.where(spart, sx, fill)
    m = (_seg_min if agg == "arg_min" else _seg_max)(
        vals, ctx.gid, ncap, ctx.sorted_ids)
    # rank of each row within its group (counting all member rows), via a
    # (gid, slot) sort — works for both sorted and dense layouts
    g = jnp.where(present, ctx.gid, ncap).astype(jnp.int32)
    slot = jnp.arange(cap, dtype=jnp.int32)
    sg, sslot = _mssort([g, slot], 1, is_stable=True)
    idx = jnp.arange(cap, dtype=jnp.int32)
    base = _seg_min(jnp.where(sg < ncap, idx, cap), sg, ncap, True)
    rank = idx - base[jnp.clip(sg, 0, ncap - 1)]
    hit = (sg < ncap) & spart[sslot] & \
        (vals[sslot] == m[jnp.clip(sg, 0, ncap - 1)])
    cand = jnp.where(hit, rank, cap)
    pos = _seg_min(cand, sg, ncap, True)
    has = pos < cap
    return Val(UInt32, jnp.where(has, pos, 0).astype(jnp.uint32), has)


def _group_mode(v: Val, ctx: GroupContext) -> Val:
    """Most frequent valid value per group (smallest value wins ties;
    polars returns an arbitrary tied mode — we pick deterministically)."""
    cap, ncap = ctx.cap, ctx.out_cap
    sx, spart = _sorted_val(v, ctx)
    vw = encode_key_words(sx, spart, False, True)
    gkey = jnp.where(spart, ctx.gid, ncap).astype(jnp.uint32)
    words = [gkey] + vw
    skeys, tails, _ = lex_sort_indices(words, (sx, spart.astype(jnp.int32)))
    sval, pres2 = tails[0], tails[1].astype(jnp.bool_)
    idx = jnp.arange(cap)
    new_pair = idx == 0
    for w in skeys:
        new_pair = new_pair | (w != jnp.roll(w, 1))
    pair_id = jnp.cumsum(new_pair.astype(jnp.int32)) - 1
    run_len = _seg_sum(pres2.astype(jnp.int32), pair_id, cap, True)
    rl = jnp.where(pres2, run_len[pair_id], 0)
    gid2 = skeys[0].astype(jnp.int32)
    best = _seg_max(rl, gid2, ncap, True)
    is_best = pres2 & new_pair & (rl == best[jnp.clip(gid2, 0, ncap - 1)]) \
        & (rl > 0)
    cand = jnp.where(is_best, idx, cap).astype(jnp.int32)
    pos = _seg_min(cand, gid2, ncap, True)
    has = pos < cap
    data = sval[jnp.clip(pos, 0, cap - 1)]
    return Val(v.dtype, data, has, v.sdict, False)


def _group_implode(v: Val, ctx: GroupContext, agg: str) -> Val:
    """Gather each group's rows into a padded list row (agg without a
    reduction — polars' implicit implode; reference: AggregatedList in
    `polars-expr/src/expressions/`). The list width is the max group size
    (host sync — the fused-jit path marks this chain nofuse and re-runs
    eagerly)."""
    from ..dtypes import List as ListT, UInt32 as U32
    nested = agg == "implode" and (v.lengths is not None
                                   or v.fields is not None)
    cap, ncap = ctx.cap, ctx.out_cap
    if not nested:
        sx, spart = _sorted_val(v, ctx)
    present = _group_present(v, ctx)
    g = jnp.where(present, ctx.gid, ncap).astype(jnp.int32)
    slot = jnp.arange(cap, dtype=jnp.int32)
    sg, sslot = _mssort([g, slot], 1, is_stable=True)
    idx = jnp.arange(cap, dtype=jnp.int32)
    base = _seg_min(jnp.where(sg < ncap, idx, cap), sg, ncap, True)
    pos = idx - base[jnp.clip(sg, 0, ncap - 1)]
    counts = _seg_sum(present.astype(jnp.int32), ctx.gid, ncap,
                      ctx.sorted_ids)
    W = width_for(int(jnp.max(counts)))
    ok = (sg < ncap) & (pos < W)
    tgt = jnp.where(ok, jnp.clip(sg, 0, ncap - 1) * W +
                    jnp.clip(pos, 0, W - 1), ncap * W)
    if nested:
        from ..batch import Column as _Col, _reshape_leading
        from ..dtypes import Struct as StructT

        def _as_col(x):
            return _Col(x.dtype, x.data, x.validity, x.sdict,
                        lengths=getattr(x, "lengths", None),
                        elem_valid=getattr(x, "elem_valid", None),
                        fields={k: _as_col(f) for k, f in x.fields.items()}
                        if getattr(x, "fields", None) is not None else None)

        ev = None
        if v.validity is not None:
            sv = v.validity if v.validity.shape[0] == cap else \
                jnp.broadcast_to(v.validity, (cap,))
            sv = sv[ctx.perm][sslot]
            evflat = jnp.zeros(ncap * W + 1, jnp.bool_).at[tgt].set(
                sv, mode="drop")
            ev = evflat[:ncap * W].reshape(ncap, W)
        if isinstance(v.dtype, StructT):
            # List(Struct) layout: one imploded List column per field
            # (matches batch._list_of_struct_from_host)
            fields_out = {}
            for nm, f in v.fields.items():
                fv = Val(f.dtype, f.data, f.validity, f.sdict, False,
                         live=v.live, lengths=getattr(f, "lengths", None),
                         elem_valid=getattr(f, "elem_valid", None),
                         fields=getattr(f, "fields", None))
                fields_out[nm] = _group_implode(fv, ctx, "implode")
            return Val(ListT(v.dtype), None, None, None, False,
                       lengths=counts.astype(jnp.int32), elem_valid=ev,
                       fields=fields_out)
        # List input: lift the whole nested layout one level — gather rows
        # structurally into (ncap, W, ...) arrays (List(List) "item" form)
        orig = ctx.perm[sslot].astype(jnp.int32)
        rowflat = jnp.full(ncap * W + 1, cap, jnp.int32).at[tgt].set(
            orig, mode="drop")
        rows = jnp.clip(rowflat[:ncap * W], 0, cap - 1)
        col = _as_col(v)
        taken = col.take(rows)
        child = _Col(taken.dtype, taken.data, None, taken.sdict,
                     lengths=taken.lengths, elem_valid=taken.elem_valid,
                     fields=taken.fields)
        child = _reshape_leading(child, ncap, W)
        return Val(ListT(v.dtype), None, None, None, False,
                   lengths=counts.astype(jnp.int32), elem_valid=ev,
                   fields={"item": child})
    if agg == "agg_groups":
        vals = ctx.perm[sslot].astype(jnp.uint32)
        inner_dt, sdict = U32, None
        elem_src = None
    else:
        vals = sx[sslot]
        inner_dt, sdict = v.dtype, v.sdict
        elem_src = spart[sslot] \
            if (v.validity is not None or v.live is not None) else None
    flat = jnp.zeros(ncap * W + 1, vals.dtype).at[tgt].set(vals, mode="drop")
    data2 = flat[:ncap * W].reshape(ncap, W)
    elem_valid = None
    if elem_src is not None:
        evflat = jnp.zeros(ncap * W + 1, jnp.bool_).at[tgt].set(
            elem_src, mode="drop")
        elem_valid = evflat[:ncap * W].reshape(ncap, W)
    return Val(ListT(inner_dt), data2, None, sdict, False,
               lengths=counts.astype(jnp.int32), elem_valid=elem_valid)


def _group_n_unique(v: Val, ctx: GroupContext, table: Table) -> Val:
    """Distinct count per group: re-sort by (gid, value) then count
    boundaries per segment."""
    cap = ctx.cap
    ncap = ctx.out_cap
    sx, spart = _sorted_val(v, ctx)
    present = _group_present(v, ctx)
    vw = encode_key_words(sx, spart, False, False)
    words = [jnp.where(present, ctx.gid, ncap).astype(jnp.uint32)] + vw
    skeys, tails, perm2 = lex_sort_indices(words, (present.astype(jnp.int32),))
    pres2 = tails[0].astype(jnp.bool_)
    idx = jnp.arange(cap)
    new_pair = idx == 0
    for w in skeys:
        new_pair = new_pair | (w != jnp.roll(w, 1))
    gid2 = skeys[0].astype(jnp.int32)
    cnt = _seg_sum(jnp.where(pres2 & new_pair, 1, 0), gid2, ncap,
                   False)
    return Val(UInt32, cnt.astype(jnp.uint32), None, None, False)


def _group_quantile(v: Val, ctx: GroupContext, q: float, interp: str) -> Val:
    """Per-group quantile: re-sort rows by (gid, value) so each group's
    values are contiguous sorted runs, then select the quantile rows.

    4-byte values ride the gather-free fast path: ONE fused-u64
    single-operand sort (hi=gid, lo=encoded value — ops/fused_sort.py),
    then per-row run geometry from cumulative min/max scans, and the
    picks land as a masked segment-sum (each row knows its rank r and
    its group size nn; the rows with r == floor/ceil(q*(nn-1))
    contribute the interpolation terms). The r3 path cost two
    multi-operand sorts plus TWO ncap-sized XLA gathers (~7 ns/element
    — the dominant term of H2O q6 at 114 ms); this path has no gathers
    at all. 8-byte values keep the general multi-word sort."""
    cap = ctx.cap
    ncap = ctx.out_cap
    sx, spart = _sorted_val(v, ctx)
    n = _seg_sum(spart.astype(jnp.int32), ctx.gid, ncap,
                 ctx.sorted_ids)
    if sx.dtype.itemsize <= 4 and ncap < (1 << 31):
        return _group_quantile_fused(v, ctx, q, interp, sx, spart, n)
    vw = encode_key_words(sx, spart, False, True)  # nulls last within group
    gkey = jnp.where(spart, ctx.gid, ncap).astype(jnp.uint32)
    words = [gkey] + vw
    _, tails, _ = lex_sort_indices(words, (sx,))
    sorted_vals = tails[0]
    # positions of valid rows in the second sort are exactly rank order:
    # valid rows sort before nulls/dead within ascending gid, so the k-th
    # valid row overall sits at slot k.
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pos = q * (n.astype(fdt) - 1)
    base = jnp.cumsum(n) - n  # start offset of each group's valid run
    dt = v.dtype
    out_dt = dt if (isinstance(dt, (Datetime, Duration)) or dt == Date) \
        else _float_dt(dt)

    def pick(p):
        return sorted_vals[jnp.clip(base + p, 0, cap - 1)]

    if interp == "linear":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        frac = (pos - i0).astype(fdt)
        val = pick(jnp.maximum(i0, 0)).astype(fdt) * (1 - frac) + \
            pick(jnp.maximum(i1, 0)).astype(fdt) * frac
    elif interp == "lower":
        val = pick(jnp.maximum(jnp.floor(pos).astype(jnp.int32), 0))
    elif interp == "higher":
        val = pick(jnp.maximum(jnp.ceil(pos).astype(jnp.int32), 0))
    elif interp == "midpoint":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        val = (pick(jnp.maximum(i0, 0)).astype(fdt) +
               pick(jnp.maximum(i1, 0)).astype(fdt)) / 2
    else:
        val = pick(jnp.maximum(jnp.round(pos).astype(jnp.int32), 0))
    if isinstance(dt, (Datetime, Duration)) or dt == Date:
        return Val(out_dt, val.astype(sx.dtype), n > 0)
    return Val(out_dt, val.astype(jnp.dtype(storage_numpy_dtype(out_dt))), n > 0)


def _group_quantile_fused(v: Val, ctx: GroupContext, q: float, interp: str,
                          sx, spart, n) -> Val:
    """Gather-free per-group quantile for 4-byte values (see
    _group_quantile docstring)."""
    from .fused_sort import fused_sort_kv
    from .keycode import decode_orderable, encode_orderable
    cap = ctx.cap
    ncap = ctx.out_cap
    dt = v.dtype
    gkey = jnp.where(spart, ctx.gid.astype(jnp.uint32), jnp.uint32(ncap))
    valw = encode_orderable(sx).astype(jnp.uint32)
    g_s, val_s = fused_sort_kv(gkey, valw, live=spart)
    # dead rows became (~0, ~0): they share the sentinel group ~0 with
    # nothing live (gkey <= ncap < 2^31), so real runs are unpolluted
    j = jnp.arange(cap, dtype=jnp.int32)
    live = g_s != jnp.uint32(0xFFFFFFFF)
    g_i = g_s.astype(jnp.int32)
    newg = (j == 0) | (g_s != jnp.roll(g_s, 1))
    is_last = (j == cap - 1) | (g_s != jnp.roll(g_s, -1))
    start = jax.lax.cummax(jnp.where(newg, j, 0))
    end = jax.lax.cummin(jnp.where(is_last, j, cap), reverse=True)
    nn = end - start + 1
    r = j - start
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pos = q * (nn.astype(fdt) - 1)
    vv = decode_orderable(val_s, jnp.dtype(storage_numpy_dtype(dt)),
                          False).astype(fdt)
    if interp == "linear":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        frac = (pos - i0.astype(fdt))
        contrib = jnp.where(r == i0, vv * (1 - frac), 0) + \
            jnp.where(r == i1, vv * frac, 0)
    elif interp == "lower":
        contrib = jnp.where(r == jnp.floor(pos).astype(jnp.int32), vv, 0)
    elif interp == "higher":
        contrib = jnp.where(r == jnp.ceil(pos).astype(jnp.int32), vv, 0)
    elif interp == "midpoint":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        contrib = jnp.where(r == i0, vv / 2, 0) + \
            jnp.where(r == i1, vv / 2, 0)
    else:  # nearest
        contrib = jnp.where(r == jnp.round(pos).astype(jnp.int32), vv, 0)
    contrib = jnp.where(live, contrib, 0)
    val = _seg_sum(contrib, jnp.where(live, g_i, ncap), ncap,
                   sorted_ids=True)
    out_dt = dt if (isinstance(dt, (Datetime, Duration)) or dt == Date) \
        else _float_dt(dt)
    if isinstance(dt, (Datetime, Duration)) or dt == Date:
        return Val(out_dt, val.astype(sx.dtype), n > 0)
    return Val(out_dt, val.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
               n > 0)


# ---------------------------------------------------------------------------
# group-expression evaluation (aggs + elementwise combinations of aggs)
# ---------------------------------------------------------------------------

def eval_group_expr(e: Expr, table: Table, ctx: GroupContext,
                    key_names: Sequence[str], key_outputs: dict) -> Val:
    """Evaluate an agg-context expression to a per-group Val."""
    from ..expr.eval import _eval_binary, _eval_unary, _lit_val, cast_val as _cv
    k = e.kind
    if k in ("alias", "name_map", "name_keep"):
        return eval_group_expr(e.children[0], table, ctx, key_names, key_outputs)
    if k == "agg":
        inner = eval_expr(e.children[0], table, "agg")
        return reduce_group(e.attrs["agg"], inner, ctx, e.attrs, table)
    if k == "table_len":
        # the layout pass already counted live rows per group — reuse it
        # (avoids a fresh 8M-row segment scatter on TPU)
        return Val(UInt32, ctx.group_count.astype(jnp.uint32), None, None,
                   False)
    if k == "lit":
        return _lit_val(e.attrs["value"], e.attrs["dtype"])
    if k == "when_then":
        from ..expr.eval import _eval_when_then
        return _eval_when_then(
            e, table, "agg",
            evalf=lambda c: eval_group_expr(c, table, ctx, key_names,
                                            key_outputs),
            cap=ctx.out_cap)
    if k == "col" and e.attrs["name"] in key_outputs:
        return key_outputs[e.attrs["name"]]
    if k == "cast":
        return _cv(eval_group_expr(e.children[0], table, ctx, key_names,
                                   key_outputs), e.attrs["dtype"])
    if k == "binary":
        l = eval_group_expr(e.children[0], table, ctx, key_names, key_outputs)
        r = eval_group_expr(e.children[1], table, ctx, key_names, key_outputs)
        fake = Table([], {}, ctx.cap, None, None)
        return _eval_binary(e.attrs["op"], l, r, fake)
    if k == "fma":
        # fused arithmetic over per-group values (the optimizer's fma
        # pass also rewrites agg-combination exprs like corr(a,b)**2)
        from ..expr.eval import _eval_fma
        a = eval_group_expr(e.children[0], table, ctx, key_names, key_outputs)
        b = eval_group_expr(e.children[1], table, ctx, key_names, key_outputs)
        c = eval_group_expr(e.children[2], table, ctx, key_names, key_outputs)
        fake = Table([], {}, ctx.cap, None, None)
        return _eval_fma(e.attrs["op"], a, b, c, fake)
    if k == "unary":
        return _eval_unary(e.attrs["op"],
                           eval_group_expr(e.children[0], table, ctx,
                                           key_names, key_outputs), e.attrs)
    if k == "col":
        # bare column in agg context -> implicit implode (polars semantics:
        # group_by().agg(pl.col("x")) yields a list per group)
        inner = eval_expr(e, table, "agg")
        return reduce_group("implode", inner, ctx, {}, table)
    if k == "list":
        from ..expr.eval import _eval_list
        v = eval_group_expr(e.children[0], table, ctx, key_names, key_outputs)
        fake = Table([], {}, ctx.out_cap, None, None)
        return _eval_list(e, v, fake)
    if k == "map_groups_udf":
        return _eval_map_groups_udf(e, table, ctx)
    raise InvalidOperationError(
        f"expression kind {k!r} not supported in group_by aggregation")


def _eval_map_groups_udf(e: Expr, table: Table, ctx: GroupContext) -> Val:
    """pl.map_groups(exprs, fn): host UDF over each group's Series
    (reference: `py-polars/src/polars/functions/lazy.py:1209` — a Python
    round-trip there too, so the host loop matches the reference's cost
    model)."""
    import numpy as _np
    from ..api.series import Series as _Series
    fn = e.attrs["fn"]
    returns_scalar = e.attrs.get("returns_scalar", False)
    # per-row child values on host, in sorted-group layout
    host_cols = []
    for c in e.children:
        v = eval_expr(c, table, "agg")
        cap = ctx.cap
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        col = Val(v.dtype, data[ctx.perm],
                  None if v.validity is None else
                  jnp.broadcast_to(v.validity, (cap,))[ctx.perm],
                  v.sdict, False)
        from ..api.frame import DataFrame as _DF
        from ..batch import Column as _Col
        t1 = Table(["x"], {"x": _Col(col.dtype, col.data, col.validity,
                                     col.sdict)}, cap, None,
                   jnp.ones(cap, jnp.bool_))
        host_cols.append(_DF._from_table(t1).get_column("x").to_list())
    gid = _np.asarray(ctx.gid)
    live = _np.asarray(ctx.live_sorted)
    oc = ctx.out_cap
    # group ids are SLOT indices: 0..ng-1 in the sorted layout, raw key
    # codes in the dense layout — place each group's result at its slot
    slots = _np.unique(gid[live])
    results = [None] * oc
    filled = _np.zeros(oc, bool)
    for g in slots:
        rows = _np.nonzero(live & (gid == g))[0]
        series = [_Series("", [hc[i] for i in rows]) for hc in host_cols]
        out = fn(series)
        if isinstance(out, _Series):
            out = out.to_list()
        if returns_scalar and isinstance(out, list):
            out = out[0] if out else None
        results[int(g)] = out
        filled[int(g)] = True
    from ..api.frame import DataFrame as _DF2
    src = _DF2({"r": results})._table.column("r")
    out_col = src.take(jnp.arange(oc))
    validity = out_col.validity
    inb = jnp.asarray(filled)
    validity = inb if validity is None else (validity & inb)
    return Val(out_col.dtype, out_col.data, validity, out_col.sdict, False,
               lengths=out_col.lengths, elem_valid=out_col.elem_valid,
               fields=out_col.fields)


def _aggs_need_sorted_layout(agg_exprs: Sequence[Expr]) -> bool:
    """product's cumprod trick requires contiguous group runs."""
    def rec(e: Expr) -> bool:
        if e.kind == "agg" and e.attrs.get("agg") == "product":
            return True
        return any(rec(c) for c in e.children)
    return any(rec(a) for a in agg_exprs)


def group_by_agg(table: Table, key_exprs: Sequence[Expr],
                 agg_exprs: Sequence[Expr],
                 maintain_order: bool = False) -> Table:
    """GROUP BY keys AGG exprs -> one row per group.

    maintain_order may be the sentinel "key": the optimizer elided a
    downstream sort(keys asc) and in exchange REQUIRES ascending key
    order — every path here emits it except the hash-exchange fast path
    (hash order), so "key" only closes that gate."""
    key_order = maintain_order == "key"
    if key_order:
        maintain_order = False
    cap = table.capacity
    mask = table.row_mask()
    key_vals = [eval_expr(k, table, "select") for k in key_exprs]
    key_vals = [Val(v.dtype,
                    v.data if v.data.shape[0] == cap
                    else jnp.broadcast_to(v.data, (cap,)),
                    None if v.validity is None else
                    (v.validity if v.validity.shape[0] == cap
                     else jnp.broadcast_to(v.validity, (cap,))),
                    v.sdict, False, v.live) for v in key_vals]

    # dense O(n) path when key domains are statically small and no agg
    # needs the sorted contiguous layout (product's cumprod trick)
    spans = _dense_spans(key_vals, key_exprs, table) \
        if not any(v.live is not None for v in key_vals) else None
    spans0 = spans
    if spans is not None and _aggs_need_sorted_layout(agg_exprs):
        spans = None

    # large dense-coded domains with simple aggregates: hash-exchange
    # pipeline (ops/hgroup.py) — beyond the MXU one-hot limit the dense
    # path pays per-agg big-domain segment ops (~168 ms at 1M unique
    # keys / 8.4M rows) while the exchange runs ~36 ms G-independent.
    # median/quantile (and var/std beyond the MXU limit) divert here at
    # ANY domain size: they have no dense one-hot formulation, and the
    # sorted-layout path costs a full-array sort per query (h2o q6
    # median+std 70 ms -> ~12 ms via the exchange)
    if spans0 is not None and not maintain_order and not key_order \
            and _use_segscan() \
            and cap >= (1 << 14) and cap < (1 << 24):
        _ps = 1
        for s, _ in spans0:
            _ps *= s
        _has_q = _aggs_have_quantile(agg_exprs)
        if _ps <= (1 << 32) and (_MXU_GROUP_LIMIT < _ps or _has_q):
            t_fast = _hash_groupby_fast(table, key_exprs, agg_exprs,
                                        key_vals, spans0, mask, cap)
            if t_fast is not None:
                return t_fast
    prod_span = 1
    if spans is not None:
        for s, _ in spans:
            prod_span *= s
        from ..config import CONFIG as _CFG
        if prod_span > max(4 * cap, 1 << 20):
            spans = None  # domain too large to scatter densely
        elif _use_segscan() and prod_span > _MXU_GROUP_LIMIT and \
                (len(agg_exprs) > 2 or prod_span > max(cap // 4, 1 << 14)):
            # accelerator, beyond the MXU one-hot limit: each dense-path
            # aggregate pays its own (gid+sentinels, value) sort, while
            # the sorted layout shares ONE build sort — dense still wins
            # for 1-2 aggregates over domains well under the row count
            # (its gid is free: dict codes / mixed-radix), e.g. the
            # 1M-unique string group-by at 8.4M rows: 168 ms dense vs
            # 411 ms sorted. Counted at OUTPUT-expr granularity on
            # purpose: routing corr(a,b)**2 (six internal sum terms) to
            # the sorted layout measured 270 ms vs 59 dense — the
            # sorted path's f64 term ladders dwarf the dense path's
            # per-term sorts (r5 probe)
            spans = None
    if spans is not None:
        gctx = build_groups_dense(key_vals, mask, spans)
        if _dense_mxu_ok(gctx):
            # batch every simple one-hot reduction into ONE Pallas pass:
            # per-agg kernel launches each re-read gid and rebuild the
            # one-hots (the bench q1 engine pipeline paid 3 passes over
            # 8.4M rows for len+sum+mean)
            reqs = {}

            def _collect_mxu(e):
                if e.kind == "table_len":
                    reqs.setdefault(("len",), None)
                elif e.kind == "agg" and e.children:
                    c = e.children[0]
                    while c.kind == "alias":
                        c = c.children[0]
                    kind = e.attrs.get("agg")
                    if c.kind == "col":
                        colo = table.cols.get(c.attrs.get("name"))
                        if colo is not None and colo.data is not None and \
                                colo.lengths is None and \
                                colo.fields is None and \
                                colo.data.ndim == 1 and \
                                colo.data.shape[0] == cap:
                            did = id(colo.data)
                            if kind == "len":
                                reqs.setdefault(("len",), None)
                            elif kind in ("count", "mean") or \
                                    (kind == "sum" and
                                     colo.dtype.is_float):
                                if kind in ("count", "mean"):
                                    reqs.setdefault(("count", did), colo)
                                if (kind == "sum" and
                                        colo.dtype.is_float) or \
                                        (kind == "mean" and
                                         (colo.dtype.is_float or
                                          colo.dtype.is_integer or
                                          colo.dtype.is_bool)):
                                    reqs.setdefault(("sum", did), colo)
                for ch in e.children:
                    _collect_mxu(ch)

            for e in agg_exprs:
                _collect_mxu(e)
            if len(reqs) > 1:
                keys_l, rows = [], []
                ones = jnp.ones(cap, jnp.float32)
                for rk, colo in reqs.items():
                    keys_l.append(rk)
                    if rk[0] == "len":
                        rows.append(ones)
                    elif rk[0] == "count":
                        rows.append(ones if colo.validity is None else
                                    colo.validity.astype(jnp.float32))
                    else:  # sum
                        v = colo.data.astype(jnp.float32)
                        if colo.validity is not None:
                            v = jnp.where(colo.validity, v,
                                          jnp.float32(0))
                        rows.append(v)
                # gid already routes dead rows to the dump slot; only
                # per-column validity needed masking above
                outs_mxu = _onehot_seg_sum_f32(
                    rows, gctx.gid, gctx.out_cap,
                    jnp.ones(cap, jnp.bool_))
                gctx.mxu_stash = dict(zip(keys_l, outs_mxu))
    else:
        # carry bare-column agg inputs AND the key columns through the
        # build sort (skips per-agg and per-key permutation gathers on
        # accelerators)
        carry = []
        if _use_segscan():
            seen_cols = set()
            for kv in key_vals:
                if kv.data is not None and kv.data.ndim == 1 and \
                        kv.data.shape[0] == cap and \
                        id(kv.data) not in {c[0] for c in carry}:
                    carry.append((id(kv.data), kv.data, kv.validity))

            def _collect(e):
                if e.kind == "agg" and e.children:
                    c = e.children[0]
                    while c.kind == "alias":
                        c = c.children[0]
                    if c.kind == "col":
                        nm = c.attrs.get("name")
                        colo = table.cols.get(nm)
                        if nm not in seen_cols and colo is not None and \
                                colo.data is not None and \
                                colo.lengths is None and \
                                colo.fields is None and \
                                colo.data.shape[0] == cap and \
                                len(carry) < 6:
                            seen_cols.add(nm)
                            carry.append((id(colo.data), colo.data,
                                          colo.validity))
                for ch in e.children:
                    _collect(ch)

            for e in agg_exprs:
                _collect(e)
        gctx = build_groups(key_vals, mask, carry_cols=carry)
    ocap = gctx.out_cap

    # group keys
    key_outputs = {}
    names: List[str] = []
    cols = {}
    gvalid_rows = gctx.group_count > 0
    if spans is not None:
        # dense layout: the slot index IS the key — decode it (no gather,
        # no group_start scatter)
        slot = jnp.arange(ocap, dtype=jnp.int64)
        key_decoded = []
        for (span, base) in reversed(spans):
            key_decoded.append(slot % span)
            slot = slot // span
        key_decoded.reverse()
        for ke, kv, kc, (span, base) in zip(key_exprs, key_vals,
                                            key_decoded, spans):
            name = meta.output_name(ke)
            data, kvalid = _dense_decode(kc, kv, span, base)
            svalid = None
            if kv.validity is not None:
                svalid = kvalid & gvalid_rows
            out_v = Val(kv.dtype, data, svalid, kv.sdict, False)
            key_outputs[name] = out_v
            if name in cols:
                raise DuplicateError(f"duplicate key name {name!r}")
            names.append(name)
            cols[name] = Column(kv.dtype, data, svalid, kv.sdict)
    else:
        # sorted layout: value at each group's first row. On
        # accelerators all keys extract together with ONE boundary
        # compaction over the carried (already-sorted) columns — the
        # per-key permutation gathers cost ~30 ms each at 4M rows.
        key_rows = None
        if _use_segscan() and gctx.newgrp is not None:
            from .keycode import col_to_u32_words as _cw, \
                col_from_u32_words as _cfw
            words, lay = [], []
            ok = True
            for kv in key_vals:
                hit = gctx.sorted_cache.get(id(kv.data)) \
                    if kv.data is not None else None
                if hit is None:
                    ok = False
                    break
                sdata, svalid = hit
                ws = _cw(sdata)
                words.extend(ws)
                if svalid is not None:
                    words.append(svalid.astype(jnp.uint32))
                lay.append((kv.dtype, sdata.dtype, len(ws),
                            svalid is not None))
            if ok and words:
                from .pallas_partition import (compact_words,
                                               use_partition_kernel)
                if use_partition_kernel():
                    res_k = compact_words(gctx.newgrp, words)
                    if res_k is not None:
                        key_rows = res_k[0]
                if key_rows is None:
                    outw = _mssort(
                        [(~gctx.newgrp).astype(jnp.uint32)] + words, 1,
                        is_stable=True)
                    key_rows = list(outw[1:])
        if key_rows is not None:
            wi = 0
            for ke, kv, (dt_k, stor_k, nw, hasv) in zip(key_exprs,
                                                        key_vals, lay):
                name = meta.output_name(ke)
                from .keycode import col_from_u32_words as _cfw2
                sdata = _cfw2(key_rows[wi:wi + nw], jnp.dtype(stor_k))
                wi += nw
                svalid = None
                if hasv:
                    svalid = (key_rows[wi] != 0) & gvalid_rows
                    wi += 1
                out_v = Val(kv.dtype, sdata, svalid, kv.sdict, False)
                key_outputs[name] = out_v
                if name in cols:
                    raise DuplicateError(f"duplicate key name {name!r}")
                names.append(name)
                cols[name] = Column(kv.dtype, sdata, svalid, kv.sdict)
        else:
            start = jnp.clip(gctx.group_start, 0, cap - 1)
            for ke, kv in zip(key_exprs, key_vals):
                name = meta.output_name(ke)
                src = kv.data[gctx.perm]
                sdata = src[start]
                svalid = None
                if kv.validity is not None:
                    svalid = kv.validity[gctx.perm][start] & gvalid_rows
                out_v = Val(kv.dtype, sdata, svalid, kv.sdict, False)
                key_outputs[name] = out_v
                if name in cols:
                    raise DuplicateError(f"duplicate key name {name!r}")
                names.append(name)
                cols[name] = Column(kv.dtype, sdata, svalid, kv.sdict)

    for ae in agg_exprs:
        name = meta.output_name(ae)
        v = eval_group_expr(ae, table, gctx, names, key_outputs)
        if name in cols:
            raise DuplicateError(f"duplicate column name {name!r}")
        data = v.data
        if data is not None and data.shape[0] != ocap:
            data = jnp.broadcast_to(data, (ocap,) + data.shape[1:])
        validity = v.validity
        if validity is not None and validity.shape[0] != ocap:
            validity = jnp.broadcast_to(validity, (ocap,))
        names.append(name)

        def _fieldcol(x):
            if isinstance(x, Column):
                return x
            return Column(x.dtype, x.data, x.validity, x.sdict,
                          lengths=getattr(x, "lengths", None),
                          elem_valid=getattr(x, "elem_valid", None),
                          fields={k: _fieldcol(f)
                                  for k, f in x.fields.items()}
                          if getattr(x, "fields", None) is not None
                          else None)

        vfields = getattr(v, "fields", None)
        cols[name] = Column(v.dtype, data, validity, v.sdict,
                            lengths=getattr(v, "lengths", None),
                            elem_valid=getattr(v, "elem_valid", None),
                            fields={k: _fieldcol(f)
                                    for k, f in vfields.items()}
                            if vfields is not None else None)

    if gctx.sorted_ids:
        # groups occupy a front prefix; emit the deferred device count so
        # collect() stays sync-free (batch.Table nrows_dev)
        out = Table(names, cols, ocap, None, None, nrows_dev=gctx.ngroups)
    elif maintain_order:
        # the first-occurrence sort below re-orders rows anyway; keep the
        # dense slot layout so group_start/perm indexing stays aligned
        out = Table(names, cols, ocap, None, gvalid_rows)
    else:
        # dense layout leaves holes (empty key-code slots); compact to a
        # live prefix on device while still inside the fused program —
        # ocap is group-domain-sized, so this argsort+gather is trivial
        # and saves collect() a host-synced compaction later
        from .compact import compact_perm, gather_table
        tmp = Table(names, cols, ocap, None, gvalid_rows)
        perm = compact_perm(gvalid_rows)
        out = gather_table(tmp, perm, None, None)
        out = out.with_valid(None, None, nrows_dev=gctx.ngroups)
    if maintain_order:
        # order groups by first occurrence (original row index of first row)
        start_mo = jnp.clip(gctx.group_start, 0, cap - 1)
        first_orig = gctx.perm[start_mo]
        order_val = Val(Int64, first_orig.astype(jnp.int64), None, None, False)
        from .sort import sort_table
        out = sort_table(out, [order_val], [False], [False])
    return out


# ---------------------------------------------------------------------------
# unique / distinct
# ---------------------------------------------------------------------------

def unique_table(table: Table, subset: Optional[Sequence[str]],
                 keep: str = "any", maintain_order: bool = False) -> Table:
    """DISTINCT via group machinery: select one representative row per key
    group as a row mask (original order preserved for free).
    Reference: `polars-ops/src/frame/  unique`, streaming distinct."""
    names = subset or list(table.names)
    cap = table.capacity
    mask = table.row_mask()
    key_vals = []
    for n in names:
        c = table.column(n)
        key_vals.append(Val(c.dtype, c.data, c.validity, c.sdict, False))
    gctx = build_groups(key_vals, mask)
    # representatives directly in the sorted layout: the stable group
    # sort keeps original order within a run, so run start == first
    # occurrence and run end == last. Writeback to original row order is
    # a 2-operand sort by the permutation (sort-as-scatter; TPU boolean
    # scatters at table size serialize).
    if keep in ("any", "first"):
        is_rep = gctx.newgrp
    elif keep == "last":
        run_end = jnp.concatenate(
            [gctx.newgrp[1:], jnp.ones(1, jnp.bool_)]) | ~jnp.concatenate(
                [gctx.live_sorted[1:], jnp.zeros(1, jnp.bool_)])
        is_rep = run_end & gctx.live_sorted
    elif keep == "none":
        cnt_row = gctx.group_count[jnp.clip(gctx.gid, 0, cap - 1)]
        is_rep = gctx.newgrp & (cnt_row == 1)
    else:
        raise ComputeError(f"invalid keep strategy {keep!r}")
    _, sel_w = _mssort(
        [gctx.perm.astype(jnp.int32), is_rep.astype(jnp.uint32)],
        1, is_stable=False)
    return table.with_valid((sel_w != 0) & mask, None)


# ---------------------------------------------------------------------------
# hash-exchange fast path for large dense-coded domains (ops/hgroup.py)
# ---------------------------------------------------------------------------

_SIMPLE_AGGS = ("sum", "mean", "min", "max", "count", "len",
                "var", "std", "median", "quantile")


def _aggs_have_quantile(agg_exprs) -> bool:
    """Static: does any output aggregate a median/quantile? (these have
    no dense one-hot path, so the hash-exchange gate opens for them at
    any domain size)"""
    for e in agg_exprs:
        ee = e
        while ee.kind == "alias":
            ee = ee.children[0]
        if ee.kind == "agg" and ee.attrs.get("agg") in ("median",
                                                        "quantile"):
            return True
    return False


_COMBO_NODE_KINDS = ("binary", "unary", "fma", "cast", "lit", "alias",
                     "name_map", "name_keep")
_ROWWISE_KINDS = ("col", "lit", "binary", "unary", "cast", "alias",
                  "is_not_null", "is_null", "fma", "when_then",
                  "name_map", "name_keep")


def _expr_rowwise(e: Expr) -> bool:
    """Static: elementwise-only expression (no aggregations/windows) —
    safe to evaluate per-row before the exchange."""
    if e.kind not in _ROWWISE_KINDS:
        return False
    return all(_expr_rowwise(c) for c in e.children)


def _combo_leaf(ee: Expr, table: Table, cap: int):
    """Validate one aggregate leaf inside a combination expression.
    Returns (kind, cols, pred, out_dt) or None. cols is a 1-tuple of a
    column name, or a 2-tuple for a product (the sum-of-a*b cross term
    that corr/cov decompose into); pred the rowwise filter predicate
    node (shared by every factor) or None; out_dt the float cast dtype
    applied to the inputs, or None."""
    kind = ee.attrs.get("agg") if ee.kind == "agg" else "len"
    if ee.kind == "table_len" or (kind == "len" and not ee.children):
        return ("len", None, None, None)
    if kind not in ("sum", "mean", "min", "max", "count") or \
            not ee.children:
        return None

    state = {"pred": None, "dt": None, "bad": False}

    def strip(c):
        while True:
            if c.kind in ("alias", "name_map", "name_keep"):
                c = c.children[0]
            elif c.kind == "cast" and c.attrs["dtype"].is_float:
                if state["dt"] is None:
                    state["dt"] = c.attrs["dtype"]
                c = c.children[0]
            elif c.kind == "expr_filter":
                # the optimizer's CSE/fma rewrites COPY nodes, so
                # predicate sameness is structural (repr), not identity
                p = c.children[1]
                if (state["pred"] is not None and
                        repr(state["pred"]) != repr(p)) \
                        or not _expr_rowwise(p):
                    state["bad"] = True
                    return c
                state["pred"] = p
                c = c.children[0]
            else:
                return c

    def col_ok(nm):
        colo = table.cols.get(nm)
        if colo is None or colo.data is None or colo.lengths is not None \
                or colo.fields is not None or colo.data.ndim != 1 or \
                colo.data.shape[0] != cap or colo.data.dtype.itemsize != 4:
            return False
        dt = colo.dtype
        return dt.is_float or dt.is_integer or dt.is_bool

    base = strip(ee.children[0])
    if state["bad"]:
        return None
    if base.kind == "binary" and base.attrs.get("op") == "mul" and \
            kind in ("sum", "mean", "count"):
        sides = []
        for ch in base.children:
            s = strip(ch)
            if state["bad"] or s.kind != "col":
                return None
            sides.append(s.attrs["name"])
        if not all(col_ok(nm) for nm in sides):
            return None
        dts = [table.cols[nm].dtype for nm in sides]
        if state["dt"] is None and not all(d == Float32 for d in dts):
            # un-cast products keep exact Int64 semantics on the
            # general paths; only float accumulation rides here
            return None
        return (kind, tuple(sides), state["pred"], state["dt"])
    if base.kind != "col" or not col_ok(base.attrs["name"]):
        return None
    if kind in ("min", "max") and state["dt"] is not None:
        return None  # cast-then-extreme: keep the general path's dtype
    return (kind, (base.attrs["name"],), state["pred"], state["dt"])


def _plan_combo(ee: Expr, table: Table, cap: int):
    """Arithmetic combination of aggregate leaves (corr/cov/`max-min`
    style): returns [(node, leafdesc)] or None. The hash path computes
    each leaf with the exchange pipeline and evaluates the combining
    arithmetic on the per-group outputs."""
    leaves: list = []
    seen: set = set()

    def walk(e) -> bool:
        if e.kind in ("agg", "table_len"):
            if id(e) not in seen:
                d = _combo_leaf(e, table, cap)
                if d is None:
                    return False
                seen.add(id(e))
                leaves.append((e, d))
            return True
        if e.kind == "lit":
            return True
        if e.kind not in _COMBO_NODE_KINDS:
            return False
        return bool(e.children) and all(walk(c) for c in e.children)

    if not walk(ee):
        return None
    return leaves if any(True for _ in leaves) else None


def _hash_groupby_plan(table: Table, agg_exprs: Sequence[Expr], cap: int):
    """Static walk: every output must be a simple aggregate of a bare
    4-byte numeric column (or len), OR an arithmetic combination of
    such aggregate leaves (corr(a,b)**2, max(a)-min(b), ...). Returns
    [(name, kind, col|None, extra)] or None when any output
    disqualifies; extra carries ddof for var/std, (q, interp) for
    median/quantile, and the leaf list for "expr" combos."""
    def _plan_simple(ee):
        if ee.kind != "agg" or ee.attrs.get("agg") not in _SIMPLE_AGGS:
            return None
        kind = ee.attrs["agg"]
        if kind == "len" and not ee.children:
            return ("len", None, None)
        if not ee.children:
            return None
        c = ee.children[0]
        while c.kind == "alias":
            c = c.children[0]
        if c.kind != "col":
            return None
        colo = table.cols.get(c.attrs.get("name"))
        if colo is None or colo.data is None or colo.lengths is not None \
                or colo.fields is not None or colo.data.ndim != 1 \
                or colo.data.shape[0] != cap \
                or colo.data.dtype.itemsize != 4:
            return None
        dt = colo.dtype
        if not (dt.is_float or dt.is_integer or dt.is_bool):
            return None
        extra = None
        if kind in ("var", "std"):
            if dt.is_bool:
                return None
            extra = int(ee.attrs.get("ddof", 1))
        elif kind in ("median", "quantile"):
            # the contrib math decodes values as f32 — exact only for
            # float32 inputs (int32 beyond 2^24 would round)
            if not dt.is_float:
                return None
            if kind == "median":
                extra = (0.5, "linear")
            else:
                qv = ee.attrs.get("q")
                if not isinstance(qv, (int, float)):
                    return None  # quantile by expression: general path
                extra = (float(qv),
                         ee.attrs.get("interpolation", "nearest"))
            kind = "quantile"
        if kind == "len":
            return ("len", None, None)
        return (kind, c.attrs["name"], extra)

    plan = []
    for e in agg_exprs:
        name = meta.output_name(e)
        ee = e
        while ee.kind == "alias":
            ee = ee.children[0]
        if ee.kind == "table_len":
            plan.append((name, "len", None, None))
            continue
        ent = _plan_simple(ee)
        if ent is not None:
            plan.append((name,) + ent)
            continue
        # combination of aggregate leaves (corr(a,b)**2, max(a)-min(b),
        # (a*b).sum(), ...) — also reached when a SIMPLE agg has a
        # computed child
        if ee.kind in _COMBO_NODE_KINDS + ("agg",):
            leaves = _plan_combo(ee, table, cap)
            if leaves is not None:
                plan.append((name, "expr", ee, leaves))
                continue
        return None
    return plan


def _carry_quantile_prefix(code, mask, data, q: float, interp: str,
                           cap: int):
    """Per-group quantile via one carry sort keyed (dead, code, value):
    live rows group by code with ascending encoded values, so the
    quantile falls out of run geometry + one additive segment scan.
    Output is compacted to the group-prefix layout of
    `_local_groupby_carry` — the (dead, code) run structure is
    identical, so group slots align with the main carry pass."""
    from ..parallel.shuffle import _ms_sort
    from .keycode import decode_orderable, encode_orderable
    dead = (~mask).astype(jnp.uint32)
    vw = encode_orderable(data).astype(jnp.uint32)
    sdead, sk, sv = _ms_sort([dead, code.astype(jnp.uint32), vw], 3,
                             is_stable=False)
    live = sdead == 0
    idx = jnp.arange(cap, dtype=jnp.int32)
    newg = ((idx == 0) | (sk != jnp.roll(sk, 1)) |
            (sdead != jnp.roll(sdead, 1)))
    endg = ((idx == cap - 1) | (sk != jnp.roll(sk, -1)) |
            (sdead != jnp.roll(sdead, -1)))
    gid = jnp.where(live,
                    jnp.cumsum((newg & live).astype(jnp.int32)) - 1, cap)
    start = jax.lax.cummax(jnp.where(newg, idx, 0))
    end = jax.lax.cummin(jnp.where(endg, idx, cap), reverse=True)
    nn = (end - start + 1).astype(jnp.float64)
    r = idx - start
    vv = decode_orderable(sv, jnp.dtype(data.dtype),
                          False).astype(jnp.float32)
    pos = jnp.float64(q) * (nn - 1)
    if interp == "linear":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        frac = (pos - i0).astype(jnp.float32)
        contrib = jnp.where(r == i0, vv * (1 - frac), 0.) + \
            jnp.where((r == i1) & (i1 != i0), vv * frac, 0.)
    elif interp == "lower":
        contrib = jnp.where(r == jnp.floor(pos).astype(jnp.int32), vv, 0.)
    elif interp == "higher":
        contrib = jnp.where(r == jnp.ceil(pos).astype(jnp.int32), vv, 0.)
    elif interp == "midpoint":
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.ceil(pos).astype(jnp.int32)
        contrib = jnp.where(r == i0, vv / 2, 0.) + \
            jnp.where(r == i1, vv / 2, 0.)
    else:  # nearest
        contrib = jnp.where(r == jnp.round(pos).astype(jnp.int32), vv, 0.)
    contrib = jnp.where(live, contrib, jnp.float32(0))
    scan = _seg_scan_doubling(contrib, gid, jnp.add)
    compacted, _ng = _compact_at_ends(gid, cap, [scan])
    return compacted[0]


def _hash_groupby_fast(table: Table, key_exprs, agg_exprs, key_vals,
                       spans, mask, cap: int) -> Optional[Table]:
    """Group-by over a large dense-coded key domain via the
    hash-exchange pipeline (ops/hgroup.py): O(n) in the domain size with
    a lax.cond carry-sort fallback on bucket overflow. Covers simple
    aggregates only; returns None (caller keeps its normal paths) when
    the query shape disqualifies."""
    plan = _hash_groupby_plan(table, agg_exprs, cap)
    if plan is None:
        return None
    from .hgroup import hash_groupby_u32, precheck, out_capacity
    from ..parallel.shuffle import _local_groupby_carry, _ident

    # mixed-radix u32 key code (slot 0 per key = null), first key most
    # significant — matches the dense path's decode order
    code = jnp.zeros(cap, jnp.uint32)
    for kv, (span, base) in zip(key_vals, spans):
        code = code * jnp.uint32(span) + \
            _dense_code(kv, span, base, cap).astype(jnp.uint32)

    # build the (vals, aggs, scan_dtypes) request: one shared count for
    # len; per-column participation counts for mean/validity
    vals: list = []
    aggs: list = []
    scans: list = []
    slot_of: dict = {}

    def _want(tag, maker):
        if tag not in slot_of:
            slot_of[tag] = len(vals)
            v, a, s = maker()
            vals.append(v)
            aggs.append(a)
            scans.append(s)
        return slot_of[tag]

    def _col(nm):
        return table.cols[nm]

    _masked_memo: dict = {}

    def _masked(colo, fill):
        d = colo.data
        if colo.validity is not None:
            # memoized so repeated requests of one column hand the SAME
            # array object to hash_groupby_u32, whose transport-word
            # dedupe keys on identity
            mk = (id(colo), float(fill) if isinstance(fill, float)
                  else fill)
            d = _masked_memo.get(mk)
            if d is None:
                d = jnp.where(colo.validity, colo.data,
                              jnp.asarray(fill, colo.data.dtype))
                _masked_memo[mk] = d
        return d

    def _want_count(nm, colo):
        if colo is None or colo.validity is None:
            return _want(("len",), lambda: (mask.astype(jnp.float32),
                                            "count", None))
        return _want(("cnt", nm), lambda: (
            colo.validity.astype(jnp.float32), "sum", None))

    # --- combo ("expr") leaf machinery: predicate / masked-value
    # vectors memoized by identity so hgroup's transport-word dedupe
    # sees ONE array per (column, mask, encoding) — corr(a,b)'s sum,
    # sumsq and sumprod requests of a column all ride one word
    _pred_memo: dict = {}
    _vec_memo: dict = {}
    leaf_spec: dict = {}

    def _predvec(p):
        if p is None:
            return None
        pv = _pred_memo.get(repr(p))
        if pv is None:
            v = eval_expr(p, table, "select")
            d = v.data
            if d.shape[0] != cap:
                d = jnp.broadcast_to(d, (cap,))
            pv = d.astype(jnp.bool_)
            if v.validity is not None:
                pval = v.validity
                if pval.shape[0] != cap:
                    pval = jnp.broadcast_to(pval, (cap,))
                pv = pv & pval
            _pred_memo[repr(p)] = pv
        return pv

    def _partvec(lcols, lpred):
        part = _predvec(lpred)
        for nm2 in lcols:
            cv = table.cols[nm2].validity
            if cv is not None:
                part = cv if part is None else (part & cv)
        return part

    def _valvec(nm2, part, as_f32, ident=None):
        key2 = (nm2, None if part is None else id(part), as_f32,
                None if ident is None else float(ident))
        x = _vec_memo.get(key2)
        if x is None:
            d = table.cols[nm2].data
            if as_f32 and d.dtype != jnp.float32:
                d = d.astype(jnp.float32)
            if part is not None:
                fill = jnp.zeros((), d.dtype) if ident is None else \
                    jnp.asarray(ident, d.dtype)
                d = jnp.where(part, d, fill)
            _vec_memo[key2] = x = d
        return x

    def _want_part_count(part):
        if part is None:
            return _want(("len",), lambda: (mask.astype(jnp.float32),
                                            "count", None))
        return _want(("cpart", id(part)), lambda: (
            part.astype(jnp.float32), "sum", None))

    def _register_leaf(node, lk, lcols, lpred, ldt):
        if id(node) in leaf_spec:
            return
        if lk == "len":
            _want(("len",), lambda: (mask.astype(jnp.float32), "count",
                                     None))
            leaf_spec[id(node)] = ("len",)
            return
        part = _partvec(lcols, lpred)
        if lk == "count":
            if part is None:
                _want(("len",), lambda: (mask.astype(jnp.float32),
                                         "count", None))
                leaf_spec[id(node)] = ("count", ("len",))
            else:
                _want_part_count(part)
                leaf_spec[id(node)] = ("count", ("cpart", id(part)))
            return
        if lk in ("min", "max"):
            nm1 = lcols[0]
            colo = _col(nm1)
            ident = _ident(colo.data.dtype, lk)
            xv = _valvec(nm1, part, False, ident)
            tag = (lk, "cx", id(xv))
            _want(tag, lambda x=xv, k=lk: (x, k, None))
            ctag = None
            if part is not None:
                _want_part_count(part)
                ctag = ("cpart", id(part))
            leaf_spec[id(node)] = (lk, tag, ctag, colo.dtype)
            return
        # sum / mean
        if len(lcols) == 2:
            va = _valvec(lcols[0], part, True)
            vb = _valvec(lcols[1], part, True)
            stag = ("cprod", id(va), id(vb))
            _want(stag, lambda a=va, b=vb: ((a, b), "sumprod",
                                            jnp.dtype(jnp.float64)))
            sum_out = ldt or Float32
        else:
            nm1 = lcols[0]
            dt1 = _col(nm1).dtype
            if dt1.is_bool:
                xv = _valvec(nm1, part, True)
                stag = ("csum", id(xv), False)
                _want(stag, lambda x=xv: (x, "sum", None))
                sum_out = ldt or UInt32
            elif dt1.is_float or ldt is not None:
                # float accumulation; an explicit Float64 cast rides the
                # compensated (hi, lo) f32 ladder (~49 exact bits)
                xv = _valvec(nm1, part, True)
                f64 = ldt == Float64
                stag = ("csum", id(xv), f64)
                _want(stag, lambda x=xv, w=f64: (
                    x, "sum", jnp.dtype(jnp.float64) if w else None))
                sum_out = ldt or _sum_dtype(dt1)
            else:
                # bare int sum: exact word transport + int64 scan, the
                # engine's Int64 sum semantics
                xv = _valvec(nm1, part, False)
                stag = ("csum", id(xv), "i")
                _want(stag, lambda x=xv, d=dt1: (
                    x, "sum", jnp.dtype(_acc_dtype(d))))
                sum_out = _sum_dtype(dt1)
        if lk == "mean":
            _want_part_count(part)
            ctag = ("len",) if part is None else ("cpart", id(part))
            mean_dt = ldt if ldt is not None and ldt.is_float \
                else _float_dt(sum_out)
            leaf_spec[id(node)] = ("mean", stag, ctag, mean_dt)
        else:
            leaf_spec[id(node)] = ("sum", stag, sum_out)

    for name, kind, nm, extra in plan:
        if kind == "len":
            _want(("len",), lambda: (mask.astype(jnp.float32), "count",
                                     None))
        elif kind == "count":
            _want_count(nm, _col(nm))
        elif kind in ("sum", "mean"):
            colo = _col(nm)
            dt = colo.dtype
            if dt.is_bool:
                _want(("sum", nm), lambda: (
                    _masked(colo, 0).astype(jnp.float32), "sum", None))
            elif dt.is_float:
                _want(("sum", nm), lambda: (_masked(colo, 0.0), "sum",
                                            None))
            else:
                acc = jnp.dtype(_acc_dtype(dt))
                _want(("sum", nm), lambda: (_masked(colo, 0), "sum", acc))
            if kind == "mean":
                _want_count(nm, colo)
        elif kind in ("var", "std"):
            # naive (n, s, ss) moments with f64 scans: the transport
            # word is the exact 4-byte value; the post-exchange ladder
            # upcasts to f64 before squaring, so the cancellation in
            # ss - s^2/n keeps ~52 bits (nulls ride as 0 and are
            # excluded by the validity count)
            colo = _col(nm)
            _want(("sumf64", nm), lambda: (_masked(colo, 0), "sum",
                                           jnp.dtype(jnp.float64)))
            _want(("ssq", nm), lambda: (_masked(colo, 0), "sumsq",
                                        jnp.dtype(jnp.float64)))
            _want_count(nm, colo)
        elif kind == "quantile":
            colo = _col(nm)
            if colo.validity is not None:
                return None  # per-column nulls would pollute the runs
            q, interp = extra
            _want(("quant", nm, q, interp), lambda: (
                colo.data, ("quantile", q, interp), None))
            _want_count(nm, colo)
        elif kind == "expr":
            for node, (lk, lcols, lpred, ldt) in extra:
                _register_leaf(node, lk, lcols, lpred, ldt)
        else:  # min / max
            colo = _col(nm)
            ident = _ident(colo.data.dtype, kind)
            _want((kind, nm), lambda: (_masked(colo, ident), kind, None))
            if colo.validity is not None:
                _want_count(nm, colo)

    M = out_capacity(cap)

    def fast_br(_):
        # NOT compacted here: an in-branch _compact_selected prefix
        # pass measured a net LOSS (q6 41 -> 74 ms — the multi-word
        # partition pass over the 1.5x-rows bucket layout costs far
        # more than collect()'s lazy compaction of the G-sized result)
        gk, outs, gv, _ok = hash_groupby_u32(code, vals, mask, aggs,
                                             scan_dtypes=scans)
        return gk, tuple(outs), gv

    def slow_br(_):
        # carry fallback: sumsq lowers to a pre-squared f64 "sum";
        # quantile runs its own (dead, code, value)-keyed carry pass —
        # identical (dead, code) run structure, so its compacted group
        # prefix aligns with the main carry's slot for slot
        c_vals, c_aggs, back = [], [], []
        q_outs = {}
        for i, (v, a, s) in enumerate(zip(vals, aggs, scans)):
            if isinstance(a, tuple) and a[0] == "quantile":
                q_outs[i] = _carry_quantile_prefix(
                    code, mask, v, a[1], a[2], cap)
                continue
            if a == "sumsq":
                x = v.astype(s if s is not None else jnp.float64)
                c_vals.append(x * x)
                c_aggs.append("sum")
            elif a == "sumprod":
                acc = s if s is not None else jnp.float64
                c_vals.append(v[0].astype(acc) * v[1].astype(acc))
                c_aggs.append("sum")
            else:
                c_vals.append(v if s is None else v.astype(s))
                c_aggs.append(a)
            back.append(i)
        gk, c_outs, gv = _local_groupby_carry(code, c_vals, mask, c_aggs)
        outs: list = [None] * len(vals)
        for i, o in zip(back, c_outs):
            outs[i] = o
        for i, o in q_outs.items():
            outs[i] = jnp.where(gv, o, jnp.float32(0))
        pad = M - gk.shape[0]
        gk = jnp.concatenate([gk.astype(jnp.uint32),
                              jnp.zeros(pad, jnp.uint32)])
        outs = tuple(jnp.concatenate([o, jnp.zeros(pad, o.dtype)])
                     for o in outs)
        gv = jnp.concatenate([gv, jnp.zeros(pad, bool)])
        return gk, outs, gv

    gkey, outs, gvalid = jax.lax.cond(precheck(code, mask), fast_br,
                                      slow_br, None)

    # decode group keys (mixed radix, reversed)
    names: List[str] = []
    cols = {}
    slot = gkey
    key_codes = []
    for (span, base) in reversed(spans):
        key_codes.append((slot % jnp.uint32(span)).astype(jnp.int64))
        slot = slot // jnp.uint32(span)
    key_codes.reverse()
    for ke, kv, kc, (span, base) in zip(key_exprs, key_vals, key_codes,
                                        spans):
        name = meta.output_name(ke)
        data, kvalid = _dense_decode(kc, kv, span, base)
        svalid = (kvalid & gvalid) if kv.validity is not None else None
        if name in cols:
            raise DuplicateError(f"duplicate key name {name!r}")
        names.append(name)
        cols[name] = Column(kv.dtype, data, svalid, kv.sdict)

    def _out(tag):
        return outs[slot_of[tag]]

    def _leaf_val(node):
        spec = leaf_spec[id(node)]
        k = spec[0]
        if k == "len":
            return Val(UInt32, _out(("len",)).astype(jnp.uint32), None,
                       None, False)
        if k == "count":
            return Val(UInt32, _out(spec[1]).astype(jnp.uint32), None,
                       None, False)
        if k == "sum":
            _, tag, out_dt = spec
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            return Val(out_dt, _out(tag).astype(stor), None, None, False)
        if k == "mean":
            _, stag, ctag, out_dt = spec
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            s = _out(stag)
            nn = _out(ctag).astype(s.dtype)
            m = s / jnp.maximum(nn, 1)
            return Val(out_dt, m.astype(stor), _out(ctag) > 0, None,
                       False)
        _, tag, ctag, dt_ = spec  # min / max
        validity = None if ctag is None else (_out(ctag) > 0)
        return Val(dt_, _out(tag), validity, None, False)

    def _combo_val(e):
        """Evaluate the combining arithmetic over per-group leaf
        outputs (M-length arrays) — the post-exchange mirror of
        eval_group_expr's combination handling."""
        if e.kind in ("alias", "name_map", "name_keep"):
            return _combo_val(e.children[0])
        if id(e) in leaf_spec:
            return _leaf_val(e)
        from ..expr.eval import _eval_binary as _eb, _eval_fma as _ef, \
            _eval_unary as _eu, _lit_val as _lv
        fake = Table([], {}, M, None, None)
        if e.kind == "binary":
            return _eb(e.attrs["op"], _combo_val(e.children[0]),
                       _combo_val(e.children[1]), fake)
        if e.kind == "fma":
            return _ef(e.attrs["op"], _combo_val(e.children[0]),
                       _combo_val(e.children[1]),
                       _combo_val(e.children[2]), fake)
        if e.kind == "unary":
            return _eu(e.attrs["op"], _combo_val(e.children[0]), e.attrs)
        if e.kind == "cast":
            return cast_val(_combo_val(e.children[0]), e.attrs["dtype"])
        if e.kind == "lit":
            return _lv(e.attrs["value"], e.attrs["dtype"])
        raise InvalidOperationError(
            f"combo node {e.kind!r} unsupported in hash group-by")

    for name, kind, nm, extra in plan:
        if name in cols:
            raise DuplicateError(f"duplicate column name {name!r}")
        names.append(name)
        if kind == "len":
            cols[name] = Column(UInt32, _out(("len",)).astype(jnp.uint32),
                                None, None)
        elif kind == "count":
            colo = _col(nm)
            tag = ("len",) if colo.validity is None else ("cnt", nm)
            cols[name] = Column(UInt32, _out(tag).astype(jnp.uint32),
                                None, None)
        elif kind in ("var", "std"):
            colo = _col(nm)
            ddof = extra
            ctag = ("len",) if colo.validity is None else ("cnt", nm)
            n = _out(ctag).astype(jnp.float64)
            s = _out(("sumf64", nm))
            ss = _out(("ssq", nm))
            var = (ss - s * s / jnp.maximum(n, 1)) / \
                jnp.maximum(n - ddof, 1)
            var = jnp.maximum(var, 0.0)   # cancellation can dip below 0
            o = jnp.sqrt(var) if kind == "std" else var
            out_dt = _float_dt(colo.dtype)
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            cols[name] = Column(out_dt, o.astype(stor), n > ddof, None)
        elif kind == "quantile":
            colo = _col(nm)
            q, interp = extra
            n = _out(("len",))
            o = _out(("quant", nm, q, interp))
            out_dt = _float_dt(colo.dtype)
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            cols[name] = Column(out_dt, o.astype(stor), n > 0, None)
        elif kind == "sum":
            colo = _col(nm)
            dt = colo.dtype
            out_dt = UInt32 if dt.is_bool else _sum_dtype(dt)
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            cols[name] = Column(out_dt, _out(("sum", nm)).astype(stor),
                                None, None)
        elif kind == "mean":
            colo = _col(nm)
            out_dt = _float_dt(colo.dtype)
            stor = jnp.dtype(storage_numpy_dtype(out_dt))
            ctag = ("len",) if colo.validity is None else ("cnt", nm)
            n = _out(ctag).astype(jnp.float32)
            m = _out(("sum", nm)).astype(jnp.float32) / jnp.maximum(n, 1)
            cols[name] = Column(out_dt, m.astype(stor), n > 0, None)
        elif kind == "expr":
            v = _combo_val(nm)
            data = v.data
            if data.ndim == 0 or data.shape[0] != M:
                data = jnp.broadcast_to(data, (M,))
            validity = v.validity
            if validity is not None and (validity.ndim == 0 or
                                         validity.shape[0] != M):
                validity = jnp.broadcast_to(validity, (M,))
            cols[name] = Column(v.dtype, data, validity, v.sdict)
        else:  # min / max
            colo = _col(nm)
            v = _out((kind, nm))
            validity = None
            if colo.validity is not None:
                validity = _out(("cnt", nm)) > 0
            cols[name] = Column(colo.dtype, v, validity, None)

    # rows are NOT a live prefix (group slots sit at run ends in the
    # bucket-major layout) — keep the mask; collect() compacts lazily
    return Table(names, cols, M, None, gvalid)
