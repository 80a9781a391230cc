"""Distributed shuffle + relational ops over a device mesh.

TPU-native replacement for the reference's in-process hash partitioning
(`polars-utils/src/hashing.rs:72` HashPartitioner,
`polars-expr/src/hash_keys.rs:263` gen_idxs_per_partition, group-by
combine in `polars-stream/src/nodes/group_by.rs:215`): every chip holds a
row shard; group-by/join first pre-aggregate/pre-partition locally, then
exchange by `hash(key) % n_shards` with ONE `lax.all_to_all` over ICI, and
finish with a local segment pass. All code here is pure jnp and runs under
`shard_map` — XLA overlaps the collective with surrounding compute.

Keys are pre-packed uint64 words (`ops/keycode.py`); payload columns ride
alongside. Static per-destination capacity keeps shapes fixed; skewed
exchanges get slack via the `per_dest_cap` parameter (heavy-hitter
splitting uses the local pre-aggregation: duplicates of a hot key are
already collapsed to ONE partial state per chip before the shuffle, the
same trick as the reference's HotGrouper eviction tables).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import AXIS, CHIP_AXIS, HOST_AXIS
from ..ops.merge_sort import sort_ops as _ms_sort

# agg kind -> (identity, combine) for segment reductions
_MERGE_OF = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def is_mesh_2d(mesh) -> bool:
    return HOST_AXIS in mesh.shape and CHIP_AXIS in mesh.shape


def mesh_spec(mesh) -> P:
    """Row-sharding PartitionSpec for a 1-D (shards) or 2-D (hosts x
    chips) mesh — global row-major order maps shard id to h*C + c, the
    routing convention of exchange_records_2d."""
    if is_mesh_2d(mesh):
        return P((HOST_AXIS, CHIP_AXIS))
    return P(AXIS)


def total_shards(mesh) -> int:
    if is_mesh_2d(mesh):
        return mesh.shape[HOST_AXIS] * mesh.shape[CHIP_AXIS]
    return mesh.shape[AXIS]


def _router(mesh, per_dest_cap: int, with_overflow: bool = False):
    """Exchange function bound to the mesh topology: one ICI all_to_all
    on a flat mesh, the two-stage ICI+DCN schedule on a (hosts x chips)
    mesh. Output capacity is S*per_dest_cap either way."""
    if is_mesh_2d(mesh):
        H = mesh.shape[HOST_AXIS]
        C = mesh.shape[CHIP_AXIS]

        def route(dest, key, pays, valid):
            return exchange_records_2d(dest, key, pays, valid, H, C,
                                       per_dest_cap, HOST_AXIS, CHIP_AXIS,
                                       with_overflow=with_overflow)
    else:
        S = mesh.shape[AXIS]

        def route(dest, key, pays, valid):
            return exchange_records(dest, key, pays, valid, S,
                                    per_dest_cap, axis=AXIS,
                                    with_overflow=with_overflow)
    return route


def _hash_u64(k):
    from ..ops.hashing import _fmix32, combine_hashes
    lo = (k & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (k >> jnp.uint64(32)).astype(jnp.uint32)
    return combine_hashes(_fmix32(hi), _fmix32(lo))


def _segscan(v, flags, op):
    """Segmented inclusive scan: at slot i, the reduction of v over
    [segment_start(i), i]. Log-doubling over primitive rolls — no
    associative_scan (custom-combiner scans hang the remote compiler at
    size) and no 64-bit packings (emulated on v5e)."""
    from ..ops.groupby import _seg_scan_doubling
    gid = jnp.cumsum(flags.astype(jnp.int32))
    return _seg_scan_doubling(v, gid, op)


def _group_bounds(newg, live, carry=()):
    """(starts, ends, ngroups, carried): group g's sorted-slot range
    [start, end), computed with one boundary-compaction sort (no
    scatters/gathers). `carry` arrays are compacted at the boundary slot
    too — the gather-free way to read per-group leading values (e.g.
    group keys)."""
    cap = newg.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    ngroups = jnp.sum(newg.astype(jnp.int32))
    nlive = jnp.sum(live.astype(jnp.int32))
    # boundary compaction is a 1-bit stable partition — ride the Pallas
    # partition kernel when available (~3x the carry sort)
    from ..ops.pallas_partition import compact_words, use_partition_kernel
    out = None
    if use_partition_kernel():
        res_k = compact_words(newg, [idx] + list(carry))
        if res_k is not None:
            out = [None] + res_k[0]
    if out is None:
        border = (~newg).astype(jnp.uint32)
        out = _ms_sort([border, idx] + list(carry), 1, is_stable=True)
    starts = out[1]
    g_arange = jnp.arange(cap, dtype=jnp.int32)
    next_start = jnp.concatenate([starts[1:],
                                  jnp.full((1,), cap, jnp.int32)])
    ends = jnp.where(g_arange < ngroups - 1, next_start, nlive)
    return starts, ends, ngroups, list(out[2:])


def local_groupby(key, vals: Sequence, valid, aggs: Sequence[str]):
    """Per-chip group-by over packed keys.

    Returns (gkey[M], outs list[M], gvalid[M]) — a masked partial-group
    table (M >= cap; live slots marked by gvalid, slot positions
    unspecified). `aggs[i]` applies to vals[i]; "count" ignores vals[i]
    and counts valid rows.

    Accelerator u32-key path is runtime-adaptive (ops/hgroup.py):
    dense MXU one-hot when the live key range < 8192, hash-exchange
    (fmix32 + Pallas bucket exchange + per-bucket batched sorts)
    otherwise, with a `lax.cond` fallback to the carry sort on bucket
    overflow. u64 keys and 8-byte values use the carry sort: ONE
    multi-operand stable sort + segmented log-doubling scans.
    """
    cap = key.shape[0]
    if (jax.default_backend() != "cpu"
            and key.dtype.itemsize <= 4
            and cap >= (1 << 14) and cap < (1 << 24)
            and all(getattr(v, "dtype", None) is not None
                    and v.dtype.itemsize == 4 for v in vals)
            and all(a in ("sum", "count", "min", "max") for a in aggs)):
        from ..ops.hgroup import adaptive_local_groupby
        gk, outs, gv = adaptive_local_groupby(
            key, list(vals), valid, aggs,
            lambda: _local_groupby_carry(key, vals, valid, aggs))
        if key.dtype != jnp.uint32:
            gk = gk.astype(key.dtype)
        return gk, list(outs), gv
    return _local_groupby_carry(key, vals, valid, aggs)


def _local_groupby_carry(key, vals: Sequence, valid, aggs: Sequence[str]):
    """The carry-sort group-by (all dtypes; exact u64 keys)."""
    cap = key.shape[0]
    dead = (~valid).astype(jnp.uint32)
    # ONE multi-operand sort carries the payload columns alongside the
    # key words — on TPU an extra carried operand costs a fraction of a
    # sort pass, while a post-sort random gather costs ~2x a whole sort
    # (measured: 8M f32 gather 79ms vs 3-word sort 37ms). 64-bit keys
    # split into u32 words: v5e emulates 64-bit ops at a severe penalty.
    if key.dtype.itemsize <= 4:
        k32 = key.astype(jnp.uint32) if key.dtype != jnp.uint32 else key
        out = _ms_sort([dead, k32] + list(vals), 2, is_stable=True)
        sdead, kwords, svals = out[0], (out[1],), list(out[2:])
    else:
        khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
        klo = (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        out = _ms_sort([dead, khi, klo] + list(vals), 3, is_stable=True)
        sdead, kwords, svals = out[0], (out[1], out[2]), list(out[3:])
    live = sdead == 0
    idx = jnp.arange(cap, dtype=jnp.int32)
    newg = idx == 0
    for w in kwords:
        newg = newg | (w != jnp.roll(w, 1))
    newg = newg & live
    if jax.default_backend() == "cpu":
        # CPU: sorted scatters beat the associative scan
        gid = jnp.where(live, jnp.cumsum(newg.astype(jnp.int32)) - 1, cap)

        def seg(v, kind):
            fn = {"sum": jax.ops.segment_sum, "min": jax.ops.segment_min,
                  "max": jax.ops.segment_max}[kind]
            out = fn(v, gid, num_segments=cap + 1, indices_are_sorted=True)
            return jax.lax.slice_in_dim(out, 0, cap)

        outs = []
        for sv, agg in zip(svals, aggs):
            if agg == "count":
                outs.append(seg(live.astype(jnp.int32), "sum"))
            elif agg == "sum":
                outs.append(seg(jnp.where(live, sv, 0), "sum"))
            elif agg == "min":
                outs.append(seg(jnp.where(live, sv, _ident(sv.dtype, "min")),
                                "min"))
            elif agg == "max":
                outs.append(seg(jnp.where(live, sv, _ident(sv.dtype, "max")),
                                "max"))
            else:
                raise ValueError(f"agg {agg}")
        start = seg(jnp.where(live, idx, cap).astype(jnp.int32), "min")
        gcount = seg(live.astype(jnp.int32), "sum")
        gvalid = gcount > 0
        skey = _key_from_words(kwords, key.dtype)
        gkey = skey[jnp.clip(start, 0, cap - 1)]
        return gkey, outs, gvalid
    # accelerator path: segmented log-doubling scans leave every
    # group's totals (and its running count) at the group's END slot;
    # ONE boundary compaction then extracts keys + counts + every
    # aggregate together — a single partition-kernel pass instead of
    # one per aggregate plus a bounds pass
    from ..ops.groupby import (_compact_at_ends, _seg_scan_doubling,
                               _seg_scan_doubling2)
    from ..ops.keycode import decode_orderable, encode_orderable
    g_arange = jnp.arange(cap, dtype=jnp.int32)
    gid = jnp.where(live, jnp.cumsum(newg.astype(jnp.int32)) - 1, cap)
    carry: list = list(kwords)
    slots: list = []  # per agg: (kind, extra) to decode compacted words
    cnt_scan = _seg_scan_doubling(live.astype(jnp.int32), gid, jnp.add)
    carry.append(cnt_scan)
    for sv, agg in zip(svals, aggs):
        if agg == "count":
            slots.append(("count", None))
        elif agg == "sum":
            if sv.dtype == jnp.float32 and jax.config.jax_enable_x64:
                x = jnp.where(live, sv, jnp.float32(0))
                hi, lo = _seg_scan_doubling2(x, jnp.zeros_like(x), gid)
                carry.extend([hi, lo])
                slots.append(("sum2", sv.dtype))
            else:
                x = jnp.where(live, sv, jnp.zeros((), sv.dtype))
                carry.append(_seg_scan_doubling(x, gid, jnp.add))
                slots.append(("sum", sv.dtype))
        elif agg in ("min", "max"):
            is_min = agg == "min"
            iv = _ident(sv.dtype, agg)
            x = jnp.where(live, sv, iv)
            u = encode_orderable(x, descending=is_min)
            if u.dtype.itemsize > 4:
                uh = (u >> jnp.uint64(32)).astype(jnp.uint32)
                ul = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)

                def comb2(prev, cur):
                    (ph, pl_), (ch, cl) = prev, cur
                    take_p = (ph > ch) | ((ph == ch) & (pl_ > cl))
                    return (jnp.where(take_p, ph, ch),
                            jnp.where(take_p, pl_, cl))

                from ..ops.groupby import _seg_scan_doubling_multi
                sh_, sl_ = _seg_scan_doubling_multi([uh, ul], gid, comb2)
                carry.extend([sh_, sl_])
                slots.append(("minmax64", (sv.dtype, is_min)))
            else:
                carry.append(_seg_scan_doubling(u.astype(jnp.uint32), gid,
                                                jnp.maximum))
                slots.append(("minmax", (sv.dtype, is_min)))
        else:
            raise ValueError(f"agg {agg}")
    compacted, ngroups = _compact_at_ends(gid, cap, carry)
    gvalid = g_arange < ngroups
    nkw = len(kwords)
    gkw = compacted[:nkw]
    gcount = jnp.where(gvalid, compacted[nkw], 0)
    outs = []
    wi = nkw + 1
    for kind, extra in slots:
        if kind == "count":
            outs.append(gcount)
        elif kind == "sum":
            outs.append(jnp.where(gvalid, compacted[wi],
                                  jnp.zeros((), extra)))
            wi += 1
        elif kind == "sum2":
            tot = (compacted[wi].astype(jnp.float64) +
                   compacted[wi + 1].astype(jnp.float64)).astype(extra)
            outs.append(jnp.where(gvalid, tot, jnp.zeros((), extra)))
            wi += 2
        elif kind == "minmax":
            dt, is_min = extra
            val = decode_orderable(compacted[wi], dt, descending=is_min)
            outs.append(jnp.where(gvalid, val, _ident(jnp.dtype(dt),
                                                      "min" if is_min
                                                      else "max")))
            wi += 1
        else:  # minmax64
            dt, is_min = extra
            u = (compacted[wi].astype(jnp.uint64) << jnp.uint64(32)) | \
                compacted[wi + 1].astype(jnp.uint64)
            val = decode_orderable(u, dt, descending=is_min)
            outs.append(jnp.where(gvalid, val, _ident(jnp.dtype(dt),
                                                      "min" if is_min
                                                      else "max")))
            wi += 2
    gkey = _key_from_words(gkw, key.dtype)
    return gkey, outs, gvalid


def _key_from_words(words, dtype):
    """Reassemble a key array from its sorted u32 words (elementwise —
    replaces a u64 gather that costs ~4x a whole sort pass on TPU)."""
    if len(words) == 1:
        return words[0].astype(dtype)
    u = (words[0].astype(jnp.uint64) << jnp.uint64(32)) | \
        words[1].astype(jnp.uint64)
    return u.astype(dtype)


def _ident(dt, kind):
    if jnp.issubdtype(dt, jnp.floating):
        v = jnp.inf if kind == "min" else -jnp.inf
        return jnp.array(v, dt)
    info = jnp.iinfo(dt)
    return jnp.array(info.max if kind == "min" else info.min, dt)


def exchange_by_hash(key, payloads: Sequence, valid, num_shards: int,
                     per_dest_cap: int, axis: str = AXIS):
    """Route (key,payload) records to shard hash(key)%S with one
    all_to_all. Returns (key', payloads', valid') with capacity
    S*per_dest_cap. Records beyond a destination's capacity are dropped —
    callers size per_dest_cap with slack (local pre-aggregation bounds the
    record count per (chip, dest) at the group count, so cap==local
    capacity is always lossless)."""
    dest = _hash_u64(key) % jnp.uint32(num_shards)
    return exchange_records(dest, key, payloads, valid, num_shards,
                            per_dest_cap, axis)


def exchange_records(dest, key, payloads: Sequence, valid, num_shards: int,
                     per_dest_cap: int, axis: str = AXIS,
                     with_overflow: bool = False):
    """Route records to explicit destinations (range partitioning for
    distributed sort, hash partitioning for joins/group-by).

    Records beyond a destination's `per_dest_cap` slots are dropped, so
    callers MUST size the capacity losslessly (exact dest histograms or
    a by-construction bound). `with_overflow=True` additionally returns
    the per-shard dropped-record count so jitted wrappers can surface a
    hard runtime error instead of silent row loss."""
    cap = key.shape[0]
    dest = jnp.where(valid, dest.astype(jnp.uint32),
                     jnp.uint32(num_shards)).astype(jnp.int32)
    # sort records by destination; position within destination = rank.
    # The send buffer is built with an INVERSE GATHER (slot -> record),
    # not a scatter — TPU scatters serialize.
    order = jnp.argsort(dest, stable=True)
    dsort = dest[order]
    starts = jnp.searchsorted(dsort, jnp.arange(num_shards + 1))
    counts = starts[1:] - starts[:-1]
    p = jnp.arange(num_shards * per_dest_cap)
    d = (p // per_dest_cap).astype(jnp.int32)
    w = (p % per_dest_cap).astype(jnp.int32)
    src = order[jnp.clip(starts[d] + w, 0, cap - 1)]
    ok_slot = w < counts[d]

    def scatter(arr, fill):
        out = jnp.where(ok_slot, arr[src], jnp.asarray(fill, arr.dtype))
        return out.reshape(num_shards, per_dest_cap)

    skey = scatter(key, jnp.uint64(0))
    svalid = scatter(valid.astype(jnp.int32), 0)
    spay = [scatter(p, jnp.zeros((), p.dtype)) for p in payloads]

    rkey = jax.lax.all_to_all(skey, axis, 0, 0, tiled=True)
    rvalid = jax.lax.all_to_all(svalid, axis, 0, 0, tiled=True)
    rpay = [jax.lax.all_to_all(p, axis, 0, 0, tiled=True) for p in spay]
    n = num_shards * per_dest_cap
    out = (rkey.reshape(n), [p.reshape(n) for p in rpay],
           rvalid.reshape(n).astype(jnp.bool_))
    if with_overflow:
        dropped = jnp.sum(
            jnp.maximum(counts - per_dest_cap, 0).astype(jnp.int64))
        return out + (dropped,)
    return out


def exchange_records_2d(dest, key, payloads: Sequence, valid,
                        n_hosts: int, n_chips: int, per_dest_cap: int,
                        host_axis: str, chip_axis: str,
                        with_overflow: bool = False):
    """Hierarchical all-to-all over a (hosts x chips) mesh: records with
    global destination shard d = h*C + c first ride ICI (all_to_all over
    `chip_axis`, routed by c) so each chip holds the records bound for
    its chip-index on EVERY host, then cross DCN (all_to_all over
    `host_axis`, routed by h) between same-chip-index peers only — the
    two-stage schedule that keeps the slow DCN leg to one contiguous
    block per host pair (SURVEY §2.4 TPU mapping; scaling-book
    hierarchy). Shapes stay static.

    Capacity contract: `per_dest_cap` bounds the records any ONE source
    shard sends to any ONE destination shard (the same contract as the
    flat exchange). Stage 1 routes by chip index only, so one source can
    hold records for ALL H hosts sharing that chip index — its capacity
    is H*per_dest_cap; stage 2's per-host capacity is C*per_dest_cap
    (all same-host source chips). Final capacity = H*C*per_dest_cap =
    S*per_dest_cap, identical to the flat exchange."""
    C, H = n_chips, n_hosts
    c_d = (dest % jnp.uint32(C)).astype(jnp.uint32)
    h_d = (dest // jnp.uint32(C)).astype(jnp.uint32)
    # stage 1 (ICI): route by destination chip index; h_d rides along
    r1 = exchange_records(c_d, key, list(payloads) + [h_d], valid, C,
                          H * per_dest_cap, axis=chip_axis,
                          with_overflow=with_overflow)
    if with_overflow:
        k1, p1, v1, drop1 = r1
    else:
        k1, p1, v1 = r1
    h1 = p1[-1].astype(jnp.uint32)
    # stage 2 (DCN): route by destination host index
    r2 = exchange_records(jnp.where(v1, h1, jnp.uint32(H)), k1, p1[:-1],
                          v1, H, C * per_dest_cap, axis=host_axis,
                          with_overflow=with_overflow)
    if with_overflow:
        k2, p2, v2, drop2 = r2
        return k2, p2, v2, drop1 + drop2
    return r2


def make_sharded_groupby_2d(mesh, aggs: Sequence[str], per_dest_cap: int,
                            host_axis: str = None, chip_axis: str = None):
    """jit-compiled distributed group-by over a 2-D (hosts x chips)
    mesh: local partial agg -> hierarchical ICI+DCN exchange -> local
    merge. Same contract as make_sharded_groupby with a (H, C) mesh."""
    from .mesh import CHIP_AXIS, HOST_AXIS
    host_axis = host_axis or HOST_AXIS
    chip_axis = chip_axis or CHIP_AXIS
    H = mesh.shape[host_axis]
    C = mesh.shape[chip_axis]
    S = H * C
    spec = P((host_axis, chip_axis))

    def step(key, valid, *vals):
        gkey, partials, gvalid = local_groupby(key, list(vals), valid, aggs)
        dest = _hash_u64(gkey) % jnp.uint32(S)
        rkey, rpart, rvalid, dropped = exchange_records_2d(
            dest, gkey, partials, gvalid, H, C, per_dest_cap,
            host_axis, chip_axis, with_overflow=True)
        merge_aggs = [_MERGE_OF[a] for a in aggs]
        gk, outs, gv = local_groupby(rkey, rpart, rvalid, merge_aggs)
        return (gk, gv, dropped[None]) + tuple(outs)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec, spec) + tuple(spec for _ in aggs),
                   out_specs=tuple(spec for _ in range(3 + len(aggs))))
    return jax.jit(fn)


def make_sharded_groupby(mesh, aggs: Sequence[str], per_dest_cap: int):
    """jit-compiled distributed group-by over row-sharded arrays (flat
    or hosts x chips mesh — 2-D meshes ride the two-stage ICI+DCN
    exchange).

    Inputs: key (uint64, sharded on rows), vals list, valid.
    Outputs: sharded (gkey, gvalid, dropped, outs...).

    NOTE: per_dest_cap = local shard capacity is always lossless but
    makes the post-exchange merge run at full-dataset size per shard —
    use the two-phase `make_groupby_partials` / `make_groupby_merge`
    pair with exact histogram sizing for scaling-critical paths."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route = _router(mesh, per_dest_cap, with_overflow=True)

    def step(key, valid, *vals):
        gkey, partials, gvalid = local_groupby(key, list(vals), valid, aggs)
        dest = _hash_u64(gkey) % jnp.uint32(S)
        rkey, rpart, rvalid, dropped = route(dest, gkey, partials, gvalid)
        merge_aggs = [_MERGE_OF[a] for a in aggs]
        gk, outs, gv = local_groupby(rkey, rpart, rvalid, merge_aggs)
        return (gk, gv, dropped[None]) + tuple(outs)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec, spec) + tuple(spec for _ in aggs),
                   out_specs=tuple(spec for _ in range(3 + len(aggs))))
    return jax.jit(fn)


def make_groupby_partials(mesh, aggs: Sequence[str]):
    """Phase 1 of the sized distributed group-by: per-chip partial agg +
    exact per-(source, dest) routing histogram. The host reads the
    histogram max to pick the exchange capacity (the reference sizes
    partitions by sampling, `nodes/group_by.rs` CardinalitySketch; we
    count exactly), so phase 2's merge runs at ~ngroups/S per shard
    instead of full-dataset size."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)

    def step(key, valid, *vals):
        gkey, partials, gvalid = local_groupby(key, list(vals), valid, aggs)
        dest = (_hash_u64(gkey) % jnp.uint32(S)).astype(jnp.int32)
        oh = jnp.where(gvalid[:, None],
                       dest[:, None] == jnp.arange(S, dtype=jnp.int32)[None],
                       False)
        counts = jnp.sum(oh, axis=0, dtype=jnp.int32)
        return (gkey, gvalid, counts) + tuple(partials)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec, spec) + tuple(spec for _ in aggs),
                   out_specs=tuple(spec for _ in range(3 + len(aggs))))
    return jax.jit(fn)


def make_groupby_merge(mesh, aggs: Sequence[str], per_dest_cap: int):
    """Phase 2: exchange the (already sharded) partial states by key
    hash with the histogram-sized capacity, merge locally."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route = _router(mesh, per_dest_cap, with_overflow=True)
    merge_aggs = [_MERGE_OF[a] for a in aggs]

    def step(gkey, gvalid, *partials):
        dest = _hash_u64(gkey) % jnp.uint32(S)
        rkey, rpart, rvalid, dropped = route(dest, gkey, list(partials),
                                             gvalid)
        gk, outs, gv = local_groupby(rkey, rpart, rvalid, merge_aggs)
        return (gk, gv, dropped[None]) + tuple(outs)

    fn = shard_map(step, mesh=mesh,
                   in_specs=(spec, spec) + tuple(spec for _ in aggs),
                   out_specs=tuple(spec for _ in range(3 + len(aggs))))
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# exact (non-decomposable) distributed group-by: full-row shuffle by key
# hash, then per-shard EXACT aggregation over complete groups — the
# distributed path for median / quantile / n_unique / first / last
# (VERDICT r2 #6; reference analogue: the streaming engine keeps these
# in-engine via its generic Grouper, `polars-stream/src/nodes/group_by.rs`).
# ---------------------------------------------------------------------------

def _venc_words(x):
    """Order-preserving u32 word(s) for a value column (sort operand)."""
    from ..ops.keycode import encode_orderable
    u = encode_orderable(x)
    if u.dtype.itemsize == 8:
        return [(u >> jnp.uint64(32)).astype(jnp.uint32),
                (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)]
    return [u.astype(jnp.uint32)]


def _vdec(words, dtype):
    """Decode sorted order-preserving words back to the value dtype."""
    from ..ops.keycode import decode_orderable
    if len(words) == 2:
        u = (words[0].astype(jnp.uint64) << jnp.uint64(32)) | \
            words[1].astype(jnp.uint64)
    else:
        u = words[0]
    return decode_orderable(u, dtype, False)


def local_groupby_exact(key, valid, rowidx, vals, vvalids, specs):
    """Per-chip exact group-by on packed u64 keys over FULL rows.

    Every group's rows are entirely on this chip (hash-routed), so
    order-dependent and holistic aggregations are exact. specs: list of
    dicts {kind, vi, q, interp, ddof} — kind in {len, count, null_count,
    sum, min, max, mean, std, var, any, all, first, last, median,
    quantile, n_unique}; vi indexes vals/vvalids (None for len).
    rowidx = global original row index (orders first/last).

    Returns (gkey, gvalid, outs) where outs alternates (data, out_valid)
    per spec, each of capacity cap with group g's result at slot g.
    """
    cap = key.shape[0]
    dead = (~valid).astype(jnp.uint32)
    khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
    klo = (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    idx = jnp.arange(cap, dtype=jnp.int32)

    # base sort: rows ordered by (key, original row index); value columns
    # and their validity ride along (one multi-operand sort, no gathers)
    ops = [dead, khi, klo, rowidx.astype(jnp.int32)] + list(vals) + \
        [v.astype(jnp.uint8) for v in vvalids]
    out = _ms_sort(ops, 4, is_stable=True)
    sdead, shi, slo = out[0], out[1], out[2]
    nv = len(vals)
    svals = list(out[4:4 + nv])
    svv = [v != 0 for v in out[4 + nv:]]
    live = sdead == 0
    newg = ((idx == 0) | (shi != jnp.roll(shi, 1)) |
            (slo != jnp.roll(slo, 1))) & live
    starts, ends, ngroups, gkw = _group_bounds(newg, live, (shi, slo))
    g_arange = jnp.arange(cap, dtype=jnp.int32)
    gvalid = g_arange < ngroups
    gcount = jnp.where(gvalid, ends - starts, 0)
    gid = jnp.where(live, jnp.cumsum(newg.astype(jnp.int32)) - 1, cap)
    gkey = _key_from_words(gkw, key.dtype)
    s0 = jnp.clip(starts, 0, cap - 1)
    e1 = jnp.clip(ends - 1, 0, cap - 1)

    from ..ops.groupby import _seg_max, _seg_min, _seg_sum

    # per-value-column cached quantities
    nn_cache: dict = {}     # vi -> per-group non-null count
    byval_cache: dict = {}  # vi -> (sorted venc words, sorted vnull)

    def cnt_nn(vi):
        if vi not in nn_cache:
            nn_cache[vi] = _seg_sum(
                jnp.where(live & svv[vi], 1, 0).astype(jnp.int32), gid, cap)
        return nn_cache[vi]

    def byval(vi):
        """Second sort: within each group, valid values ascending with
        nulls at the end (for quantile/median/n_unique). Group bounds are
        identical to the base sort (same key operands)."""
        if vi not in byval_cache:
            vnull = jnp.where(vvalids[vi], jnp.uint32(0), jnp.uint32(1))
            words = _venc_words(vals[vi])
            sout = jax.lax.sort((dead, khi, klo, vnull) + tuple(words),
                                num_keys=4 + len(words), is_stable=True)
            byval_cache[vi] = (list(sout[4:]), sout[3])
        return byval_cache[vi]

    outs: List = []
    for sp in specs:
        kind = sp["kind"]
        vi = sp.get("vi")
        if kind == "len":
            outs += [gcount.astype(jnp.int64), gvalid]
            continue
        if kind == "count":
            outs += [cnt_nn(vi).astype(jnp.int64), gvalid]
            continue
        if kind == "null_count":
            outs += [(gcount - cnt_nn(vi)).astype(jnp.int64), gvalid]
            continue
        if kind == "sum":
            v = jnp.where(live & svv[vi], svals[vi],
                          jnp.zeros((), svals[vi].dtype))
            outs += [_seg_sum(v, gid, cap), gvalid]
            continue
        if kind in ("min", "max"):
            red = _seg_min if kind == "min" else _seg_max
            iv = _ident(svals[vi].dtype, kind)
            v = jnp.where(live & svv[vi], svals[vi], iv)
            outs += [red(v, gid, cap), gvalid & (cnt_nn(vi) > 0)]
            continue
        if kind in ("any", "all"):
            red = _seg_max if kind == "any" else _seg_min
            fill = 0 if kind == "any" else 1
            v = jnp.where(live & svv[vi], svals[vi].astype(jnp.int32), fill)
            outs += [red(v, gid, cap) != 0, gvalid]
            continue
        if kind in ("first", "last"):
            slot = s0 if kind == "first" else e1
            outs += [svals[vi][slot], gvalid & svv[vi][slot]]
            continue
        if kind in ("mean", "std", "var"):
            c = cnt_nn(vi).astype(jnp.float64)
            vf = svals[vi].astype(jnp.float64)
            m = jnp.where(live & svv[vi], vf, 0.0)
            s = _seg_sum(m, gid, cap)
            if kind == "mean":
                outs += [s / jnp.maximum(c, 1), gvalid & (cnt_nn(vi) > 0)]
                continue
            ddof = sp.get("ddof", 1)
            s2 = _seg_sum(jnp.where(live & svv[vi], vf * vf, 0.0), gid, cap)
            var = (s2 - s * s / jnp.maximum(c, 1)) / jnp.maximum(c - ddof, 1)
            if kind == "std":
                var = jnp.sqrt(jnp.maximum(var, 0.0))
            outs += [var, gvalid & (cnt_nn(vi) > ddof)]
            continue
        if kind == "n_unique":
            swords, svnull = byval(vi)
            newpair = newg | (svnull != jnp.roll(svnull, 1))
            for w in swords:
                newpair = newpair | (w != jnp.roll(w, 1))
            outs += [_seg_sum(jnp.where(live & newpair, 1, 0)
                              .astype(jnp.int32), gid, cap)
                     .astype(jnp.uint32), gvalid]
            continue
        if kind in ("median", "quantile"):
            q = 0.5 if kind == "median" else float(sp.get("q", 0.5))
            interp = "linear" if kind == "median" else \
                sp.get("interp", "nearest")
            swords, _ = byval(vi)
            c = cnt_nn(vi)
            pos = (c - 1).astype(jnp.float64) * q
            if interp == "lower":
                ilo = ihi = jnp.floor(pos)
            elif interp == "higher":
                ilo = ihi = jnp.ceil(pos)
            elif interp == "nearest":
                ilo = ihi = jnp.round(pos)
            elif interp == "midpoint":
                ilo, ihi = jnp.floor(pos), jnp.ceil(pos)
            else:  # linear
                ilo, ihi = jnp.floor(pos), jnp.ceil(pos)
            lo_slot = jnp.clip(s0 + jnp.maximum(ilo, 0).astype(jnp.int32),
                               0, cap - 1)
            hi_slot = jnp.clip(s0 + jnp.maximum(ihi, 0).astype(jnp.int32),
                               0, cap - 1)
            dt = jnp.dtype(vals[vi].dtype)
            vlo = _vdec([w[lo_slot] for w in swords], dt)
            if interp == "linear":
                vhi = _vdec([w[hi_slot] for w in swords], dt)
                frac = pos - jnp.floor(pos)
                res = vlo.astype(jnp.float64) * (1 - frac) + \
                    vhi.astype(jnp.float64) * frac
            elif interp == "midpoint":
                vhi = _vdec([w[hi_slot] for w in swords], dt)
                res = (vlo.astype(jnp.float64) +
                       vhi.astype(jnp.float64)) * 0.5
            else:
                res = vlo
            outs += [res, gvalid & (c > 0)]
            continue
        raise ValueError(f"exact agg kind {kind!r}")
    return gkey, gvalid, outs


def make_sharded_groupby_exact(mesh, specs, n_vals: int, per_dest_cap: int):
    """jit-compiled exact distributed group-by: full rows (key + value
    columns + validity + global row index) hash-shuffled, per-shard exact
    aggregation. Output: (gkey, gvalid, dropped, outs...) where outs
    alternates (data, out_valid) per spec."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route = _router(mesh, per_dest_cap, with_overflow=True)

    def step(key, valid, rowidx, *vv):
        vals = list(vv[:n_vals])
        dest = _hash_u64(key) % jnp.uint32(S)
        pays = [rowidx] + vals + [x.astype(jnp.uint8) for x in vv[n_vals:]]
        k2, p2, v2, dropped = route(dest, key, pays, valid)
        ridx2 = p2[0]
        vals2 = p2[1:1 + n_vals]
        vv2 = [x != 0 for x in p2[1 + n_vals:]]
        gkey, gvalid, outs = local_groupby_exact(
            k2, v2, ridx2, vals2, vv2, specs)
        return (gkey, gvalid, dropped[None]) + tuple(outs)

    n_in = 3 + 2 * n_vals
    n_out = 3 + 2 * len(specs)
    fn = shard_map(step, mesh=mesh,
                   in_specs=tuple(spec for _ in range(n_in)),
                   out_specs=tuple(spec for _ in range(n_out)))
    return jax.jit(fn)


def shuffle_rows_step(key, payloads, valid, num_shards: int,
                      per_dest_cap: int, axis: str = AXIS):
    """Row-level shuffle (for joins): every live row is routed to
    hash(key)%S. Unlike group-by, rows are not pre-aggregated."""
    return exchange_by_hash(key, payloads, valid, num_shards, per_dest_cap,
                            axis)


def _expand_slots(m, offs, out_cap: int):
    """Output slot -> group map: scatter each emitting group's index at
    its first output slot (start = offs - m, unique among m>0 groups and
    strictly increasing), forward-fill with cummax. One scatter + one
    cumop instead of log(n) serialized gather passes for searchsorted
    (TPU: 5.5ms vs 52ms at 2M slots; see ops/join._expand_rows)."""
    n = m.shape[0]
    start = (offs - m).astype(jnp.int64)
    pos = jnp.where(m > 0, start, jnp.int64(out_cap))
    markers = jnp.zeros(out_cap, jnp.int32).at[pos].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(markers)


def _merged_side_counts(lkey, lvalid, rkey, rvalid, want_ids: bool):
    """Shared merged-sort prologue of the local join kernels: sort both
    sides' keys together, return per-group (cl, cr) side counts in the
    sorted layout plus (optionally) the sorted side indices/keys."""
    capL, capR = lkey.shape[0], rkey.shape[0]
    capT = capL + capR
    key = jnp.concatenate([lkey, rkey])
    valid = jnp.concatenate([lvalid, rvalid])
    tag = jnp.concatenate([jnp.zeros(capL, jnp.uint32),
                           jnp.ones(capR, jnp.uint32)])
    dead = (~valid).astype(jnp.uint32)
    khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
    klo = (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    if want_ids:
        sidx = jnp.concatenate([jnp.arange(capL, dtype=jnp.int32),
                                jnp.arange(capR, dtype=jnp.int32)])
        sdead, shi, slo, stag, ssid, skey64 = _ms_sort(
            [dead, khi, klo, tag, sidx, key], 4, is_stable=True)
    else:
        sdead, shi, slo, stag = _ms_sort(
            [dead, khi, klo, tag], 4, is_stable=True)
        ssid = skey64 = None
    live = sdead == 0
    idx = jnp.arange(capT)
    newg = ((idx == 0) | (shi != jnp.roll(shi, 1)) |
            (slo != jnp.roll(slo, 1))) & live
    starts, ends, ngroups, _ = _group_bounds(newg, live)
    e1 = jnp.clip(ends - 1, 0, capT - 1)
    cl_scan = _segscan(jnp.where(live & (stag == 0), 1, 0), newg, jnp.add)
    cr_scan = _segscan(jnp.where(live & (stag == 1), 1, 0), newg, jnp.add)
    g_arange = jnp.arange(capT, dtype=jnp.int32)
    gv = g_arange < ngroups
    cl = jnp.where(gv, cl_scan[e1], 0)
    cr = jnp.where(gv, cr_scan[e1], 0)
    return (capL, capR, capT, live, stag, ssid, skey64, starts, cl, cr,
            newg, ngroups)


def _join_emit_counts(cl, cr, how: str):
    """Per-group output row count for each join type (the reference's
    emit logic incl. unmatched rows, `equi_join.rs:1075`
    EmitUnmatchedBuild)."""
    cl1 = jnp.maximum(cl, 1)
    cr1 = jnp.maximum(cr, 1)
    if how == "inner":
        return cl * cr
    if how == "left":
        return cl * cr1
    if how == "right":
        return cl1 * cr
    if how == "full":
        return cl * cr1 + jnp.where(cl == 0, cr, 0)
    raise ValueError(f"join type {how!r}")


def local_join(lkey, lpay, lvalid, rkey, rpay, rvalid, out_cap: int,
               how: str = "inner"):
    """Per-chip inner/left/right/full join on packed u64 keys with STATIC
    output capacity (overflow rows dropped — callers size it from the
    sizing pass). Pure-jnp variant of `ops/join.py` for use inside
    shard_map.

    Returns (jkey, lpay', rpay', jvalid, lmatch, rmatch) with capacity
    out_cap; lmatch/rmatch are False on output rows whose left/right
    side is an unmatched fill (payload validity must be masked)."""
    (capL, capR, capT, live, stag, ssid, skey64, gstart, cl, cr,
     newg, ngroups) = _merged_side_counts(lkey, lvalid, rkey, rvalid, True)
    m = _join_emit_counts(cl, cr, how)
    offs = jnp.cumsum(m)
    k = jnp.arange(out_cap, dtype=jnp.int64)
    gc = jnp.clip(_expand_slots(m, offs, out_cap), 0, capT - 1)
    base = offs[gc] - m[gc]
    r = (k - base).astype(jnp.int32)
    cl_g, cr_g = cl[gc], cr[gc]
    cl1_g = jnp.maximum(cl_g, 1)
    cr1_g = jnp.maximum(cr_g, 1)
    if how == "inner":
        i = r // cr1_g
        j = r % cr1_g
        lmatch = jnp.ones(out_cap, jnp.bool_)
        rmatch = jnp.ones(out_cap, jnp.bool_)
    elif how == "left":
        i = r // cr1_g
        j = r % cr1_g
        lmatch = jnp.ones(out_cap, jnp.bool_)
        rmatch = cr_g > 0
    elif how == "right":
        j = r // cl1_g
        i = r % cl1_g
        rmatch = jnp.ones(out_cap, jnp.bool_)
        lmatch = cl_g > 0
    else:  # full
        main = cl_g * cr1_g
        in_main = r < main
        i = jnp.where(in_main, r // cr1_g, 0)
        j = jnp.where(in_main, r % cr1_g, r - main)
        lmatch = in_main & (cl_g > 0)
        rmatch = jnp.where(in_main, cr_g > 0, True)
    lslot = jnp.clip(gstart[gc] + i, 0, capT - 1)
    rslot = jnp.clip(gstart[gc] + cl_g + j, 0, capT - 1)
    total = offs[capT - 1]
    jvalid = k < total
    lmatch = lmatch & jvalid
    rmatch = rmatch & jvalid
    lidx = jnp.clip(ssid[lslot], 0, capL - 1)
    ridx = jnp.clip(ssid[rslot], 0, capR - 1)
    jkey = jnp.where(lmatch, skey64[lslot], skey64[rslot])
    lout = [p[lidx] for p in lpay]
    rout = [p[ridx] for p in rpay]
    return jkey, lout, rout, jvalid, lmatch, rmatch


def local_semi_flags(lkey, lvalid, rkey, rvalid, how: str):
    """Per-chip semi/anti match flags aligned with the exchanged LEFT
    rows: True where the row survives the semi (has a match) or anti
    (has none) filter. Writeback to left-row order rides one sort
    (sort-as-scatter; TPU boolean scatters serialize)."""
    (capL, capR, capT, live, stag, ssid, _, gstart, cl, cr,
     newg, ngroups) = _merged_side_counts(lkey, lvalid, rkey, rvalid, True)
    # group id per sorted slot (prefix count of newg)
    gid = jnp.clip(jnp.cumsum(newg.astype(jnp.int32)) - 1, 0, capT - 1)
    has_match = cr[gid] > 0
    want = has_match if how == "semi" else ~has_match
    sel = want & live & (stag == 0)
    wb = jnp.where(stag == 0, ssid, capL).astype(jnp.int32)
    _, sel_w = jax.lax.sort((wb, sel.astype(jnp.uint32)), num_keys=1)
    return jax.lax.slice_in_dim(sel_w, 0, capL) != 0


def local_join_count(lkey, lvalid, rkey, rvalid, how: str = "inner"):
    """Per-chip join output-row COUNT on packed u64 keys (the sizing
    pass before local_join; analogue of the reference's join
    sampling, `nodes/joins/equi_join.rs` SampleState)."""
    (capL, capR, capT, live, stag, _, _, starts, cl, cr,
     newg, ngroups) = _merged_side_counts(lkey, lvalid, rkey, rvalid, False)
    m = _join_emit_counts(cl, cr, how)
    return jnp.sum(m.astype(jnp.int64))[None]


def make_sharded_join_count(mesh, l_dest_cap: int, r_dest_cap: int,
                            how: str = "inner"):
    """jit: shuffle both key columns by hash, return per-shard output-row
    counts (host-synced by the caller to pick the output capacity)."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route_l = _router(mesh, l_dest_cap)
    route_r = _router(mesh, r_dest_cap)

    def step(lkey, lvalid, rkey, rvalid):
        lk, _, lv = route_l(_hash_u64(lkey) % jnp.uint32(S), lkey, [],
                            lvalid)
        rk, _, rv = route_r(_hash_u64(rkey) % jnp.uint32(S), rkey, [],
                            rvalid)
        return local_join_count(lk, lv, rk, rv, how)

    fn = shard_map(step, mesh=mesh, in_specs=(spec,) * 4,
                   out_specs=spec)
    return jax.jit(fn)


def make_dest_hist(S: int, sharding=None):
    """jit factory: per-(source shard, destination) record counts for
    hash routing — the lossless per_dest_cap for exchange_by_hash is the
    max entry (the reference sizes partitions by sampling; we count
    exactly). Row-major sharding means source shard = row // (cap/S),
    so this is one global one-hot reduction, no shard_map needed.

    A FRESH jit per executor (not a module-level jit, not eager):
    arrays coming out of shard_map carry a Manual-axis AbstractMesh that
    (a) poisons eager sharding propagation against fresh Auto-mesh
    constants and (b) confuses the global jit executable cache when the
    same shapes recur under a new Mesh object."""

    def hist(key, valid):
        cap = key.shape[0]
        dest = (_hash_u64(key) % jnp.uint32(S)).astype(jnp.int32)
        src = (jnp.arange(cap) // (cap // S)).astype(jnp.int32)
        idx = src * S + dest
        oh = idx[:, None] == jnp.arange(S * S, dtype=jnp.int32)[None, :]
        return jnp.sum(oh & valid[:, None], axis=0, dtype=jnp.int32
                       ).reshape(S, S)

    if sharding is not None:
        # explicit in_shardings: inputs may arrive stamped with a
        # Manual-axis AbstractMesh from an earlier shard_map output;
        # forcing the executor's concrete mesh avoids mixed-mesh traces
        return jax.jit(hist, in_shardings=(sharding, sharding))
    return jax.jit(hist)


def make_sharded_join(mesh, n_lpay: int, n_rpay: int, per_dest_cap: int,
                      out_cap: int, r_per_dest_cap: int = None,
                      how: str = "inner"):
    """jit-compiled distributed join (inner/left/right/full): both sides
    shuffled by key hash, then joined locally per shard. Output order:
    (jkey, jvalid, lmatch, rmatch, dropped, lpays..., rpays...); the
    `dropped` scalar per shard is the exchange-overflow count — the
    executor REFUSES the result if any records were dropped (shuffle
    safety: no silent row loss)."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    r_cap = r_per_dest_cap if r_per_dest_cap is not None else per_dest_cap
    route_l = _router(mesh, per_dest_cap, with_overflow=True)
    route_r = _router(mesh, r_cap, with_overflow=True)

    def step(lkey, lvalid, rkey, rvalid, *pays):
        lpay = list(pays[:n_lpay])
        rpay = list(pays[n_lpay:])
        ldest = _hash_u64(lkey) % jnp.uint32(S)
        rdest = _hash_u64(rkey) % jnp.uint32(S)
        lk, lp, lv, ldrop = route_l(ldest, lkey, lpay, lvalid)
        rk, rp, rv, rdrop = route_r(rdest, rkey, rpay, rvalid)
        jk, lo, ro, jv, lm, rm = local_join(lk, lp, lv, rk, rp, rv,
                                            out_cap, how)
        return (jk, jv, lm, rm, (ldrop + rdrop)[None]) + tuple(lo) + tuple(ro)

    n_out = 5 + n_lpay + n_rpay
    fn = shard_map(step, mesh=mesh,
                   in_specs=tuple(spec for _ in range(4 + n_lpay + n_rpay)),
                   out_specs=tuple(spec for _ in range(n_out)))
    return jax.jit(fn)


def local_unique(key, rowidx, valid, keep: str):
    """Per-chip DISTINCT flags on packed u64 keys: True where the row is
    its group's representative. `rowidx` is the global original row
    index, so keep="first"/"last" match single-device semantics; rows
    with equal keys were hash-routed to one shard, making local
    representatives globally unique. Returns flags aligned with the
    input rows (writeback via one sort)."""
    cap = key.shape[0]
    dead = (~valid).astype(jnp.uint32)
    khi = (key >> jnp.uint64(32)).astype(jnp.uint32)
    klo = (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    pos = jnp.arange(cap, dtype=jnp.int32)
    sdead, shi, slo, sridx, spos = _ms_sort(
        [dead, khi, klo, rowidx.astype(jnp.int32), pos], 4,
        is_stable=True)
    live = sdead == 0
    idx = jnp.arange(cap)
    newg = ((idx == 0) | (shi != jnp.roll(shi, 1)) |
            (slo != jnp.roll(slo, 1))) & live
    run_end = (jnp.concatenate([newg[1:], jnp.ones(1, jnp.bool_)]) |
               ~jnp.concatenate([live[1:], jnp.zeros(1, jnp.bool_)])) & live
    if keep in ("any", "first"):
        rep = newg
    elif keep == "last":
        rep = run_end
    elif keep == "none":
        rep = newg & run_end  # groups of size one
    else:
        raise ValueError(f"keep {keep!r}")
    _, rep_w = jax.lax.sort((spos, rep.astype(jnp.uint32)), num_keys=1)
    return rep_w != 0


def make_sharded_unique(mesh, per_dest_cap: int, keep: str, n_pay: int,
                        out_cap: int = None):
    """jit-compiled distributed DISTINCT: rows + a global row index are
    hash-shuffled by the (packed) subset key, each shard flags its
    representatives. Output: (flag, dropped, rowidx', pays...).

    `out_cap` (host-sized from the routing histogram's per-destination
    incoming totals) compacts each shard's survivors to a prefix and
    slices the exchange capacity S*per_dest down to out_cap — without it
    the global output capacity is S^2*per_dest (quadratic in shards)."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route = _router(mesh, per_dest_cap, with_overflow=True)

    def step(key, valid, rowidx, *pays):
        dest = _hash_u64(key) % jnp.uint32(S)
        k2, p2, v2, dropped = route(dest, key, [rowidx] + list(pays), valid)
        flag = local_unique(k2, p2[0], v2, keep) & v2
        if out_cap is not None and out_cap < k2.shape[0]:
            outs = jax.lax.sort(((~flag).astype(jnp.uint32),) + tuple(p2),
                                num_keys=1, is_stable=True)
            flag = jax.lax.slice_in_dim(outs[0], 0, out_cap) == 0
            p2 = [jax.lax.slice_in_dim(o, 0, out_cap) for o in outs[1:]]
        return (flag, dropped[None]) + tuple(p2)

    fn = shard_map(step, mesh=mesh,
                   in_specs=tuple(spec for _ in range(3 + n_pay)),
                   out_specs=tuple(spec for _ in range(3 + n_pay)))
    return jax.jit(fn)


def make_sharded_semi(mesh, per_dest_cap: int, r_per_dest_cap: int,
                      how: str, n_lpay: int, out_cap: int = None):
    """jit-compiled distributed semi/anti join: left rows + payloads are
    shuffled with the keys; output is the exchanged left rows with a
    survive-flag (semi: has a match; anti: has none), plus the overflow
    count (refused on drop). `out_cap` compacts survivors per shard
    (see make_sharded_unique)."""
    S = total_shards(mesh)
    spec = mesh_spec(mesh)
    route_l = _router(mesh, per_dest_cap, with_overflow=True)
    route_r = _router(mesh, r_per_dest_cap, with_overflow=True)

    def step(lkey, lvalid, rkey, rvalid, *lpay):
        ldest = _hash_u64(lkey) % jnp.uint32(S)
        rdest = _hash_u64(rkey) % jnp.uint32(S)
        lk, lp, lv, ldrop = route_l(ldest, lkey, list(lpay), lvalid)
        rk, _, rv, rdrop = route_r(rdest, rkey, [], rvalid)
        flag = local_semi_flags(lk, lv, rk, rv, how) & lv
        if out_cap is not None and out_cap < lk.shape[0]:
            outs = jax.lax.sort(((~flag).astype(jnp.uint32),) + tuple(lp),
                                num_keys=1, is_stable=True)
            flag = jax.lax.slice_in_dim(outs[0], 0, out_cap) == 0
            lp = [jax.lax.slice_in_dim(o, 0, out_cap) for o in outs[1:]]
        return (flag, (ldrop + rdrop)[None]) + tuple(lp)

    fn = shard_map(step, mesh=mesh,
                   in_specs=tuple(spec for _ in range(4 + n_lpay)),
                   out_specs=tuple(spec for _ in range(2 + n_lpay)))
    return jax.jit(fn)
