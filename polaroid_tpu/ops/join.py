"""Joins: sorted-segment merge join.

TPU-native replacement for the reference's partitioned hash join
(`polars-stream/src/nodes/joins/equi_join.rs` Sample/Build/Probe state
machine; `polars-ops/src/frame/join/hash_join/`): both sides' key columns
are cast to a common supertype, encoded into order-preserving words
(`keycode.py`), CONCATENATED into one array with a side tag, and sorted
once — rows with equal keys become contiguous runs with left rows before
right rows. Match counts per run are segment sums; the output size is one
host-synced scalar that picks a static capacity bucket; the expansion
enumerates (group, i, j) pairs with a scatter+cummax slot map + gathers.

Exact for any number of key columns (no hash collisions), deterministic,
and O((n+m)log(n+m)) in XLA's fused sort — the TPU answer to build/probe
hash tables that need dynamic allocation.
"""

from __future__ import annotations

import functools

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .merge_sort import sort_ops as _mssort

from ..batch import Column, Table, storage_numpy_dtype
from ..config import capacity_for
from ..dtypes import supertype
from ..errors import ComputeError, SchemaError
from ..expr.eval import Val, _align_strings, cast_val
from ..strings import NULL_CODE
from . import compact as Cp
from .groupby import _seg_max, _seg_min, _seg_sum
from .keycode import (col_from_u32_words as _col_from_u32_words,
                      col_to_u32_words as _col_u32_words,
                      encode_key_words, lex_sort_indices)

__all__ = ["join_tables", "cross_join", "lookup_join_sorted"]


def _key_vals(t: Table, names: Sequence[str]) -> List[Val]:
    out = []
    for n in names:
        c = t.column(n)
        out.append(Val(c.dtype, c.data, c.validity, c.sdict, False))
    return out


def _unify_keys(lv: List[Val], rv: List[Val]):
    """Cast both sides' keys to common supertypes; merge string dicts."""
    lo, ro = [], []
    for a, b in zip(lv, rv):
        if a.dtype.is_string or b.dtype.is_string:
            if not (a.dtype.is_string and b.dtype.is_string):
                raise SchemaError(
                    f"join key dtype mismatch: {a.dtype!r} vs {b.dtype!r}")
            a, b = _align_strings(a, b)
        else:
            st = supertype(a.dtype, b.dtype)
            a, b = cast_val(a, st), cast_val(b, st)
        lo.append(a)
        ro.append(b)
    return lo, ro


@jax.jit
def _merged_sort_stats(words, side_idx):
    """Merged lex sort + per-group side counts, as ONE compiled program
    (remote-dispatch-friendly). Returns the sorted-layout arrays the
    join paths consume plus max right-count (the m:1 detector)."""
    capT = side_idx.shape[0]
    skeys, tails, perm = lex_sort_indices(list(words), (side_idx,))
    s_sideidx = tails[0]
    s_dead = skeys[0]
    s_tag = skeys[-1]
    live_sorted = s_dead == 0
    idx = jnp.arange(capT)
    newgrp = idx == 0
    for w in skeys[1:-1]:
        newgrp = newgrp | (w != jnp.roll(w, 1))
    newgrp = newgrp & live_sorted
    gid = jnp.where(live_sorted, jnp.cumsum(newgrp.astype(jnp.int32)) - 1,
                    capT)
    cl = _seg_sum(jnp.where(live_sorted & (s_tag == 0), 1, 0), gid, capT)
    cr = _seg_sum(jnp.where(live_sorted & (s_tag == 1), 1, 0), gid, capT)
    group_start = _seg_min(
        jnp.where(live_sorted, idx, capT).astype(jnp.int32), gid, capT)
    return (s_sideidx, s_tag, live_sorted, gid, cl, cr, group_start, perm,
            jnp.max(cr))


def join_tables(left: Table, right: Table, left_on: Sequence[str],
                right_on: Sequence[str], how: str, suffix: str = "_right",
                join_nulls: bool = False, coalesce: Optional[bool] = None,
                maintain_order: Optional[str] = None,
                validate: str = "m:m") -> Table:
    if how == "cross":
        return cross_join(left, right, suffix)
    if how == "outer":
        how = "full"
    if coalesce is None:
        coalesce = how != "full"
    if len(left_on) != len(right_on):
        raise ComputeError("left_on and right_on lengths differ")

    lv, rv = _unify_keys(_key_vals(left, left_on), _key_vals(right, right_on))

    lmask = left.row_mask()
    rmask = right.row_mask()
    if validate and validate not in ("m:m", "many_to_many"):
        # uniqueness checks are opt-in; one scalar sync per checked side
        # (reference: polars-ops join validation)
        from .groupby import build_groups as _bg

        def _unique(vals, mask) -> bool:
            g = _bg(vals, mask)
            return int(g.ngroups) == int(jnp.sum(mask))

        if validate in ("1:1", "one_to_one", "1:m", "one_to_many") and \
                not _unique(lv, lmask):
            raise ComputeError(
                f"join keys did not fulfill {validate} validation: "
                "left keys are not unique")
        if validate in ("1:1", "one_to_one", "m:1", "many_to_one") and \
                not _unique(rv, rmask):
            raise ComputeError(
                f"join keys did not fulfill {validate} validation: "
                "right keys are not unique")
    if not join_nulls:
        for v in lv:
            if v.validity is not None:
                lmask = lmask & v.validity
        for v in rv:
            if v.validity is not None:
                rmask = rmask & v.validity
    capL, capR = left.capacity, right.capacity
    capT = capL + capR

    # dense fast path: small key domains -> direct-indexed lookup join;
    # only the build (right) side is sorted, probes are O(1) gathers
    spans = None
    if how in ("inner", "left", "semi", "anti") and not join_nulls:
        spans = _dense_join_spans(lv, rv, lmask, rmask, capL, capR,
                                  left, right, left_on, right_on)

    # collocated hash join (ops/hjoin.py): single-word 31-bit keys,
    # inner/left, right side unique — output rows in collocated order
    # (join order is unspecified). Preferred over the dense path when
    # the key span is large (the dense probe is a per-row gather,
    # ~8 ns/element on v5e — 2M probes over a 1M span cost ~60 ms while
    # the exchange runs ~12). `ok` is read ONCE here, at the same point
    # the sort-merge path below pays its count-phase readback; ok=False
    # (wide keys / bucket overflow / m:m right side / deep fill) falls
    # through.
    _span_prod = 1
    if spans is not None:
        for _s, _b in spans:
            _span_prod *= _s
    if (how in ("inner", "left") and not join_nulls
            and maintain_order in (None, "none")
            and jax.default_backend() != "cpu"
            and capL + capR >= (1 << 15)
            and (spans is None or _span_prod > (1 << 16))):
        from .hjoin import collocated_join
        res = collocated_join(left, right, left_on, right_on, how, suffix,
                              coalesce, lv, rv, lmask, rmask)
        if res is not None:
            t_fast, okd = res
            # the `ok` readback costs a full tunnel RTT (~25 ms):
            # memoize it by input identity like the dense sizing
            # readback — repeated collects of the same query skip the
            # device sync entirely (VERDICT r4 #4)
            refs = tuple(v.data for v in list(lv) + list(rv)) + tuple(
                a for a in (left.valid, left.nrows_dev, right.valid,
                            right.nrows_dev) if a is not None) + tuple(
                v.validity for v in (list(lv) + list(rv))
                if v.validity is not None)
            memo_key = ("cjok", how, bool(coalesce), left._nrows,
                        right._nrows, len(refs)) + \
                tuple(id(a) for a in refs)
            hit = _CJ_OK_MEMO.get(memo_key)
            if hit is not None and len(hit[0]) == len(refs) and \
                    all(a is b for a, b in zip(hit[0], refs)):
                ok_val = hit[1]
            else:
                import numpy as _np
                ok_val = bool(_np.asarray(okd))
                _CJ_OK_MEMO[memo_key] = (refs, ok_val)
                if len(_CJ_OK_MEMO) > 64:
                    _CJ_OK_MEMO.pop(next(iter(_CJ_OK_MEMO)))
            if ok_val:
                return t_fast

    if spans is not None:
        return _dense_join(left, right, left_on, right_on, how, suffix,
                           coalesce, lv, rv, lmask, rmask, spans,
                           join_nulls)

    def side_words(vals, mask, cap):
        ws = []
        for v in vals:
            data = v.data if v.data.shape[0] == cap else \
                jnp.broadcast_to(v.data, (cap,))
            validity = v.validity if join_nulls else None
            if validity is not None and validity.shape[0] != cap:
                validity = jnp.broadcast_to(validity, (cap,))
            ws.append(encode_key_words(data, validity, False, False))
        return ws

    lws = side_words(lv, lmask, capL)
    rws = side_words(rv, rmask, capR)
    nwords = [len(w) for w in lws]
    if [len(w) for w in rws] != nwords:
        # nullability differs between sides under join_nulls: pad null word
        for i in range(len(lws)):
            if len(lws[i]) < len(rws[i]):
                lws[i] = [jnp.ones(capL, jnp.uint32)] + lws[i]
            elif len(rws[i]) < len(lws[i]):
                rws[i] = [jnp.ones(capR, jnp.uint32)] + rws[i]

    dead = jnp.concatenate([(~lmask).astype(jnp.uint32),
                            (~rmask).astype(jnp.uint32)])
    keywords = [jnp.concatenate([lw, rw])
                for lws_i, rws_i in zip(lws, rws)
                for lw, rw in zip(lws_i, rws_i)]
    tag = jnp.concatenate([jnp.zeros(capL, jnp.uint32),
                           jnp.ones(capR, jnp.uint32)])
    side_idx = jnp.concatenate([jnp.arange(capL, dtype=jnp.int32),
                                jnp.arange(capR, dtype=jnp.int32)])

    words = [dead] + keywords + [tag]
    # one jitted program for sort + group stats: through the remote
    # tunnel every eager op pays a dispatch RTT, so the whole phase
    # compiles once (cached per word-count/shape) and dispatches once
    (s_sideidx, s_tag, live_sorted, gid, cl, cr, group_start, perm,
     max_cr) = _merged_sort_stats(tuple(words), side_idx)

    if how == "semi" or how == "anti":
        # one jitted program, no host sync (the output rides the left
        # table's capacity)
        key = ("gsa", how, join_nulls, capL, capT)
        jf = _DENSE_JIT_CACHE.get(key)
        if jf is None:
            def fn_sa(gid, cr, live_sorted, s_tag, s_sideidx, lmask,
                      row_mask):
                has_match = cr > 0
                flag_row = has_match[jnp.clip(gid, 0, capT - 1)]
                want = flag_row if how == "semi" else ~flag_row
                lsel = want & live_sorted & (s_tag == 0)
                # writeback to original left rows via sort (TPU boolean
                # scatters at table size serialize); right rows dump
                # past capL
                wb = jnp.where(s_tag == 0, s_sideidx,
                               capL).astype(jnp.int32)
                _, sel_w = _mssort([wb, lsel.astype(jnp.uint32)],
                                   1, is_stable=False)
                sel = jax.lax.slice_in_dim(sel_w, 0, capL) != 0
                # anti join keeps left rows masked out by null keys too
                if how == "anti" and not join_nulls:
                    sel = sel | (row_mask & ~lmask)
                return sel & row_mask
            jf = jax.jit(fn_sa)
            _DENSE_JIT_CACHE[key] = jf
        sel = jf(gid, cr, live_sorted, s_tag, s_sideidx, lmask,
                 left.row_mask())
        return left.with_valid(sel, None)

    # --- count phase: ONE readback for (max_cr, total, extraL, extraR);
    # the m:1 decision and the output capacity both come from it ---
    key_c = ("gc", how, join_nulls, capT)
    jf_c = _DENSE_JIT_CACHE.get(key_c)
    if jf_c is None:
        def fn_c(cl, cr, max_cr, lnull, rnull):
            cr1 = jnp.maximum(cr, 1)
            cl1 = jnp.maximum(cl, 1)
            if how == "inner":
                m = cl * cr
            elif how == "left":
                m = cl * cr1
            elif how == "right":
                m = cl1 * cr
            elif how == "full":
                m = cl * cr1 + jnp.where(cl == 0, cr, 0)
            else:
                raise ComputeError(f"unknown join type {how!r}")
            eL = jnp.sum(lnull.astype(jnp.int64)) \
                if how in ("left", "full") and not join_nulls else \
                jnp.int64(0)
            eR = jnp.sum(rnull.astype(jnp.int64)) \
                if how in ("right", "full") and not join_nulls else \
                jnp.int64(0)
            return m, jnp.stack([max_cr.astype(jnp.int64),
                                 jnp.sum(m.astype(jnp.int64)), eL, eR])
        jf_c = jax.jit(fn_c)
        _DENSE_JIT_CACHE[key_c] = jf_c
    lnull = left.row_mask() & ~lmask
    rnull = right.row_mask() & ~rmask
    m, packed = jf_c(cl, cr, max_cr, lnull, rnull)
    mcr, mtotal, extraL, extraR = (int(x) for x in np.asarray(packed))
    total = mtotal + extraL + extraR

    # m:1 fast path (TPU): when every key group has at most one right
    # row (the orders-join-users shape), the output aligns with LEFT
    # rows — no expansion, no per-column random gathers. Right payloads
    # ride sorts + cummax forward-fills instead (see lookup_join_sorted;
    # gathers cost ~8.7ns/elem on this chip vs ~1.3ns/row/word sorted).
    # (null-key left rows surface naturally here: the output is aligned
    # with ALL live left rows, unmatched ones get null right payloads)
    if how in ("inner", "left") and mcr <= 1 and \
            all(right.cols[n].lengths is None and right.cols[n].fields is None
                for n in right.names):
        return _m1_join_fast(left, right, left_on, right_on, how, suffix,
                             coalesce, gid, live_sorted, s_tag, s_sideidx,
                             perm, capT)

    capO = capacity_for(max(total, 1))

    # --- assemble phase: expansion indices + output gather, one program
    from ..exec.compiled import _flatten_table, _unflatten_table, _table_key
    lflat, lmeta = _flatten_table(left)
    rflat, rmeta = _flatten_table(right)
    key_b = ("gb", how, suffix, coalesce, tuple(left_on), tuple(right_on),
             capO, total, extraL, extraR, capL, capR, capT,
             _table_key(left), _table_key(right))
    hit_b = _DENSE_JIT_CACHE.get(key_b)
    if hit_b is None:
        meta_cell: list = [None]

        def fn_b(lflat, rflat, m, cl, cr, group_start, s_sideidx,
                 lnull, rnull):
            ltab = _unflatten_table(lflat, lmeta)
            rtab = _unflatten_table(rflat, rmeta)
            cr1 = jnp.maximum(cr, 1)
            cl1 = jnp.maximum(cl, 1)
            offsets = jnp.cumsum(m)
            k = jnp.arange(capO, dtype=jnp.int64)
            # scatter+cummax instead of binary search (see _expand_rows)
            g = _expand_rows(m, offsets, capO)
            gc = jnp.clip(g, 0, capT - 1)
            base = offsets[gc] - m[gc]
            r = (k - base).astype(jnp.int32)

            cl_g, cr_g = cl[gc], cr[gc]
            cr1_g, cl1_g = cr1[gc], cl1[gc]
            gs = group_start[gc]
            if how == "inner":
                i = r // jnp.maximum(cr_g, 1)
                j = r % jnp.maximum(cr_g, 1)
                lmatch = jnp.ones(capO, jnp.bool_)
                rmatch = jnp.ones(capO, jnp.bool_)
            elif how == "left":
                i = r // cr1_g
                j = r % cr1_g
                lmatch = jnp.ones(capO, jnp.bool_)
                rmatch = cr_g > 0
            elif how == "right":
                j = r // cl1_g
                i = r % cl1_g
                rmatch = jnp.ones(capO, jnp.bool_)
                lmatch = cl_g > 0
            else:  # full
                main = cl_g * cr1_g
                in_main = r < main
                i = jnp.where(in_main, r // cr1_g, 0)
                j = jnp.where(in_main, r % cr1_g, r - main)
                lmatch = in_main & (cl_g > 0)
                rmatch = jnp.where(in_main, cr_g > 0, True)

            valid_out = k < (total - extraL - extraR)
            lslot = jnp.clip(gs + i, 0, capT - 1)
            rslot = jnp.clip(gs + cl_g + j, 0, capT - 1)
            lidx = jnp.clip(s_sideidx[lslot], 0, capL - 1)
            ridx = jnp.clip(s_sideidx[rslot], 0, capR - 1)
            lmatch = lmatch & valid_out
            rmatch = rmatch & valid_out

            # append unmatched null-key rows (host-known counts)
            if extraL or extraR:
                nl_perm = jnp.argsort(~lnull, stable=True) if extraL \
                    else None
                nr_perm = jnp.argsort(~rnull, stable=True) if extraR \
                    else None
                pos = k - (total - extraL - extraR)
                if extraL:
                    sel = (pos >= 0) & (pos < extraL)
                    lidx = jnp.where(
                        sel, nl_perm[jnp.clip(pos, 0, capL - 1)], lidx)
                    lmatch = lmatch | sel
                if extraR:
                    pos2 = pos - extraL
                    sel2 = (pos2 >= 0) & (pos2 < extraR)
                    ridx = jnp.where(
                        sel2, nr_perm[jnp.clip(pos2, 0, capR - 1)], ridx)
                    rmatch = rmatch | sel2

            out_t = _assemble_join_output(
                ltab, rtab, left_on, right_on, how, suffix, coalesce,
                lidx, ridx, lmatch, rmatch, total, capO)
            out_flat, out_meta = _flatten_table(out_t)
            meta_cell[0] = out_meta
            return out_flat
        jitted = jax.jit(fn_b)
        out_flat = jitted(lflat, rflat, m, cl, cr, group_start, s_sideidx,
                          lnull, rnull)
        hit_b = (jitted, meta_cell[0])
        _DENSE_JIT_CACHE[key_b] = hit_b
        if len(_DENSE_JIT_CACHE) > 256:
            _DENSE_JIT_CACHE.pop(next(iter(_DENSE_JIT_CACHE)))
    else:
        jitted, _ = hit_b
        out_flat = jitted(lflat, rflat, m, cl, cr, group_start, s_sideidx,
                          lnull, rnull)
    out = _unflatten_table(out_flat, hit_b[1])
    _propagate_join_stats(out, left, right, suffix)
    return out


@jax.jit
def _minmax_masked(data, mask):
    """(min, max) over live rows, packed into one array so the caller
    pays a single host readback."""
    info = jnp.iinfo(data.dtype)
    mn = jnp.min(jnp.where(mask, data, info.max))
    mx = jnp.max(jnp.where(mask, data, info.min))
    return jnp.stack([mn.astype(jnp.int64), mx.astype(jnp.int64)])


_STAT_BUCKET = 1024  # same bucketing as exec/compiled._ensure_groupby_stats


def _int_key_stats(tbl: Table, name: str, v: Val, mask, cap) -> tuple:
    """Bucketed (min, max) of an integer join key, cached on the Column
    (the reference's Sample phase analogue, `equi_join.rs:250`; one
    device sync the first time, free afterwards)."""
    c = tbl.cols.get(name) if tbl is not None else None
    cacheable = c is not None and v.data is c.data
    if cacheable and c.stats is not None and "min" in c.stats:
        return c.stats["min"], c.stats["max"]
    data = v.data if v.data.shape[0] == cap else \
        jnp.broadcast_to(v.data, (cap,))
    mn, mx = (int(x) for x in np.asarray(_minmax_masked(data, mask)))
    if mx < mn:
        mn, mx = 0, 0
    B = _STAT_BUCKET
    mn, mx = (mn // B) * B, ((mx // B) + 1) * B - 1
    if cacheable:
        c.stats = {"min": mn, "max": mx}
    return mn, mx


def _dense_join_spans(lv, rv, lmask, rmask, capL, capR,
                      left=None, right=None, left_on=(), right_on=()):
    """Per-key (span, base) when both sides' domains are small: shared
    string dictionaries, bools, small/statistic-bounded ints. Int ranges
    come from bucketed column stats cached across queries (the
    reference's Sample phase analogue, `equi_join.rs:250`)."""
    spans = []
    for ki, (a, b) in enumerate(zip(lv, rv)):
        dt = a.dtype
        if dt.is_string:
            # after _align_strings both share one dict
            spans.append((len(a.sdict or []) + 1, None))
        elif repr(dt) == "Boolean":
            spans.append((3, None))
        elif dt.is_integer:
            bits = dt.bit_width()
            if bits <= 16:
                base = -(1 << (bits - 1)) if dt.is_signed_integer else 0
                spans.append(((1 << bits) + 1, base))
            else:
                ln = left_on[ki] if ki < len(left_on) else None
                rn = right_on[ki] if ki < len(right_on) else None
                lmn, lmx = _int_key_stats(left, ln, a, lmask, capL)
                rmn, rmx = _int_key_stats(right, rn, b, rmask, capR)
                mn, mx = min(lmn, rmn), max(lmx, rmx)
                spans.append((mx - mn + 2, mn))
        else:
            return None
    prod = 1
    for s, _ in spans:
        prod *= s
    if prod > max(4 * (capL + capR), 1 << 21):
        return None
    return spans


_DENSE_JIT_CACHE: dict = {}
_DENSE_DECISION_MEMO: dict = {}  # input-identity -> (refs, (total, mcr))
_CJ_OK_MEMO: dict = {}           # input-identity -> (refs, ok)


def _expand_rows(m, moff, capO: int):
    """Map output slot k -> emitting source row, given per-row emission
    counts `m` and their inclusive cumsum `moff` (trace-time helper).

    Scatters each emitting row's index at its first output slot
    (start = moff - m; starts are unique among m>0 rows and strictly
    increasing), then forward-fills with cummax — slot k in
    [start[r], start[r] + m[r]) lands exactly on r because the next
    emitting row's start is start[r] + m[r]. Replaces
    searchsorted(moff, arange, 'right'): one scatter + one cumulative op
    instead of log(n) serialized full-gather passes (TPU: 5.5ms vs 52ms
    at 2M rows)."""
    n = m.shape[0]
    start = (moff - m).astype(jnp.int64)
    pos = jnp.where(m > 0, start, jnp.int64(capO))  # dead rows drop
    markers = jnp.zeros(capO, jnp.int32).at[pos].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(markers)


def _dense_codes(vals, mask, cap, spans, prod):
    """Mixed-radix dense key code per row; dead rows get the dump code
    `prod` (trace-safe)."""
    gid = jnp.zeros(cap, jnp.int32)
    for v, (span, base) in zip(vals, spans):
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        if v.dtype.is_string:
            c = data.astype(jnp.int32) + 1
        elif repr(v.dtype) == "Boolean":
            c = data.astype(jnp.int32) + 1
        else:
            c = (data.astype(jnp.int64) - (base or 0) + 1).astype(jnp.int32)
        gid = gid * span + jnp.clip(c, 0, span - 1)
    return jnp.where(mask, gid, prod)


def _dense_join(left, right, left_on, right_on, how, suffix, coalesce,
                lv, rv, lmask, rmask, spans, join_nulls=False):
    """Direct-indexed join over a small dense key domain, compiled as two
    cached XLA programs (count phase -> ONE host sync for the output
    size -> assemble phase). Through the remote tunnel every eager op
    pays a dispatch round trip, so the phase structure — not just the
    kernels — is the performance surface (reference pipeline analogue:
    `equi_join.rs` Build/Probe as dedicated nodes)."""
    from ..exec.compiled import _flatten_table, _unflatten_table, _table_key
    capL, capR = left.capacity, right.capacity
    prod = 1
    for s, _ in spans:
        prod *= s

    kdts = tuple(repr(v.dtype) for v in lv)
    base_key = (how, tuple(spans), prod, capL, capR, kdts)
    lk = tuple(v.data for v in lv)
    rk = tuple(v.data for v in rv)
    lsd = [v.sdict for v in lv]
    ldt = [v.dtype for v in lv]

    def rebuild_vals(datas, side_vals):
        return [Val(v.dtype, d, None, v.sdict, False)
                for v, d in zip(side_vals, datas)]

    if how in ("semi", "anti"):
        key = ("dsa",) + base_key
        jf = _DENSE_JIT_CACHE.get(key)
        if jf is None:
            def fn(lk, rk, lmask, rmask, row_live):
                code_l = _dense_codes(rebuild_vals(lk, lv), lmask, capL,
                                      spans, prod)
                code_r = _dense_codes(rebuild_vals(rk, rv), rmask, capR,
                                      spans, prod)
                counts = _seg_sum(jnp.ones(capR, jnp.int32), code_r, prod,
                                  False)
                cnt_p = jnp.where(lmask,
                                  counts[jnp.clip(code_l, 0, prod - 1)], 0)
                sel = lmask & (cnt_p > 0)
                if how == "anti":
                    sel = row_live & ~sel
                return sel & row_live
            jf = jax.jit(fn)
            _DENSE_JIT_CACHE[key] = jf
        sel = jf(lk, rk, lmask, rmask, left.row_mask())
        return left.with_valid(sel, None)

    # --- phase A: per-row expansion counts + total (one program) ---
    key_a = ("da",) + base_key
    jf_a = _DENSE_JIT_CACHE.get(key_a)
    if jf_a is None:
        def fn_a(lk, rk, lmask, rmask, row_live):
            code_l = _dense_codes(rebuild_vals(lk, lv), lmask, capL,
                                  spans, prod)
            code_r = _dense_codes(rebuild_vals(rk, rv), rmask, capR,
                                  spans, prod)
            counts = _seg_sum(jnp.ones(capR, jnp.int32), code_r, prod,
                              False)
            cnt_p = jnp.where(lmask,
                              counts[jnp.clip(code_l, 0, prod - 1)], 0)
            if how == "inner":
                m = cnt_p
            else:  # left: every live left row emits >= 1
                m = jnp.where(row_live, jnp.maximum(cnt_p, 1), 0)
            # pack (total, max build-group size) into ONE readback: the
            # total sizes the output; the max is the m:1 detector
            packed = jnp.stack([jnp.sum(m.astype(jnp.int64)),
                                jnp.max(counts).astype(jnp.int64)])
            return code_l, code_r, counts, cnt_p, m, packed
        jf_a = jax.jit(fn_a)
        _DENSE_JIT_CACHE[key_a] = jf_a
    code_l, code_r, counts, cnt_p, m, packed = jf_a(
        lk, rk, lmask, rmask, left.row_mask())
    # the one host sync — memoized by INPUT IDENTITY: repeated collects
    # of the same plan over the same (unchanged) device arrays re-derive
    # the same (total, m:1?) decision, and through the remote tunnel the
    # readback alone costs a ~25 ms round trip per query. The memo keeps
    # strong refs to the exact arrays and compares by identity, so a
    # recycled id() can never alias.
    # lmask/rmask are freshly-built arrays per query (row_mask() makes
    # a new arange when `valid` is None), so key on the STABLE inputs
    # they derive from: key arrays, key validities, and each side's
    # valid/nrows_dev arrays by identity plus host nrows by value
    rm_extra = tuple(
        a for a in (left.valid, left.nrows_dev, right.valid,
                    right.nrows_dev) if a is not None) + tuple(
        v.validity for v in (list(lv) + list(rv))
        if v.validity is not None)
    refs = tuple(lk) + tuple(rk) + rm_extra
    memo_key = base_key + (left._nrows, right._nrows, len(rm_extra),
                           bool(join_nulls)) + \
        tuple(id(a) for a in refs)
    hit = _DENSE_DECISION_MEMO.get(memo_key)
    if hit is not None and len(hit[0]) == len(refs) and \
            all(a is b for a, b in zip(hit[0], refs)):
        total, mcr = hit[1]
    else:
        total, mcr = (int(x) for x in np.asarray(packed))
        _DENSE_DECISION_MEMO[memo_key] = (refs, (total, mcr))
        if len(_DENSE_DECISION_MEMO) > 64:
            _DENSE_DECISION_MEMO.pop(next(iter(_DENSE_DECISION_MEMO)))

    # m:1 fast path: every key has at most one build row, so the output
    # IS the left table (original order, capacity, column buffers — zero
    # copy) with right payloads arriving via one dense-lookup gather per
    # column and unmatched rows masked (inner) or null-filled (left).
    # This is the FK->PK shape (reference: polars-ops
    # hash_join/single_keys_inner.rs probe of a unique build side); it
    # avoids the expansion machinery and all left-side gathers.
    if mcr <= 1:
        return _dense_m1_join(left, right, left_on, right_on, how, suffix,
                              coalesce, base_key, code_l, code_r, cnt_p,
                              lmask, prod)
    capO = capacity_for(max(total, 1))

    # --- phase B: expansion indices + output gather (one program) ---
    lflat, lmeta = _flatten_table(left)
    rflat, rmeta = _flatten_table(right)
    key_b = (("db", capO, total, suffix, coalesce, tuple(left_on),
              tuple(right_on), _table_key(left), _table_key(right))
             + base_key)
    hit_b = _DENSE_JIT_CACHE.get(key_b)
    if hit_b is None:
        meta_cell: list = [None]

        def fn_b(lflat, rflat, code_l, code_r, counts, cnt_p, m):
            ltab = _unflatten_table(lflat, lmeta)
            rtab = _unflatten_table(rflat, rmeta)
            offsets = jnp.cumsum(counts) - counts  # exclusive per code
            rsorted = jnp.argsort(code_r, stable=True)  # dump sorts last
            moff = jnp.cumsum(m)
            k = jnp.arange(capO, dtype=jnp.int64)
            # output-slot -> left-row map WITHOUT binary search: scatter
            # each emitting row's index at its first output slot, then
            # forward-fill with cummax (start offsets are unique over
            # m>0 rows and monotone, so the fill is exact). On TPU this
            # is one scatter + one cumop vs log(n) serialized gather
            # passes for searchsorted (measured 5.5ms vs 52ms at 2M).
            p = _expand_rows(m, moff, capO)
            pc = jnp.clip(p, 0, capL - 1)
            j = (k - (moff[pc] - m[pc])).astype(jnp.int32)
            slot = offsets[jnp.clip(code_l[pc], 0, prod - 1)] + j
            ridx = rsorted[jnp.clip(slot, 0, capR - 1)]
            live_out = k < total
            lmatch = live_out
            rmatch = live_out & (cnt_p[pc] > 0)
            out_t = _assemble_join_output(
                ltab, rtab, left_on, right_on, how, suffix, coalesce,
                pc, ridx, lmatch, rmatch, total, capO)
            out_flat, out_meta = _flatten_table(out_t)
            meta_cell[0] = out_meta
            return out_flat
        jitted = jax.jit(fn_b)
        out_flat = jitted(lflat, rflat, code_l, code_r, counts, cnt_p, m)
        hit_b = (jitted, meta_cell[0])
        _DENSE_JIT_CACHE[key_b] = hit_b
        if len(_DENSE_JIT_CACHE) > 256:
            _DENSE_JIT_CACHE.pop(next(iter(_DENSE_JIT_CACHE)))
    else:
        jitted, out_meta = hit_b
        out_flat = jitted(lflat, rflat, code_l, code_r, counts, cnt_p, m)
    out = _unflatten_table(out_flat, hit_b[1])
    # stats survive the gather: live output values are a subset of the
    # source column's live values, so cached bounds stay valid and the
    # downstream group-by skips its stats sync
    _propagate_join_stats(out, left, right, suffix)
    return out


def _dense_m1_join(left: Table, right: Table, left_on, right_on, how: str,
                   suffix: str, coalesce: bool, base_key, code_l, code_r,
                   cnt_p, lmask, prod: int) -> Table:
    """Dense-domain join when every key has at most one build (right)
    row: the output is aligned with the LEFT rows — left column buffers
    are reused untouched, right payloads arrive via a dense-lookup
    gather (scatter right row indices by key code once, gather by the
    probe codes), unmatched rows are masked out (inner) or left live
    with null right payloads (left join). No expansion pass, no output
    re-bucketing, no host sync beyond phase A's.

    Reference analogue: the unique-build-side probe of
    `polars-ops/src/frame/join/hash_join/single_keys_inner.rs`."""
    from ..exec.compiled import _flatten_table, _unflatten_table, _table_key
    capL, capR = left.capacity, right.capacity
    r_names = [n for n in right.names
               if not (coalesce and n in set(right_on))]
    rpay = right.select_columns(r_names) if r_names else None

    valid_key = ("dm1v", how) + base_key
    jf_v = _DENSE_JIT_CACHE.get(valid_key)
    if jf_v is None:
        def fn_v(cnt_p, lmask, row_live):
            rmatch = lmask & (cnt_p > 0)
            out_valid = rmatch if how == "inner" else row_live
            return rmatch, out_valid
        jf_v = jax.jit(fn_v)
        _DENSE_JIT_CACHE[valid_key] = jf_v
    rmatch, out_valid = jf_v(cnt_p, lmask, left.row_mask())

    names, cols = list(left.names), dict(left.cols)
    if rpay is not None:
        rflat, rmeta = _flatten_table(rpay)
        key_g = ("dm1g", how, _table_key(rpay), capL) + base_key
        hit = _DENSE_JIT_CACHE.get(key_g)
        if hit is None:
            meta_cell: list = [None]

            def fn_g(rflat, code_l, code_r, rmatch):
                rtab = _unflatten_table(rflat, rmeta)
                ridx = jnp.zeros(prod, jnp.int32).at[code_r].set(
                    jnp.arange(capR, dtype=jnp.int32), mode="drop")
                gidx = ridx[jnp.clip(code_l, 0, prod - 1)]
                gnames, gcols = [], {}
                for n in rtab.names:
                    gc = rtab.cols[n].take(gidx)
                    validity = rmatch if gc.validity is None \
                        else (gc.validity & rmatch)
                    gnames.append(n)
                    gcols[n] = Column(gc.dtype, gc.data, validity, gc.sdict,
                                      lengths=gc.lengths,
                                      elem_valid=gc.elem_valid,
                                      fields=gc.fields)
                out_flat, out_meta = _flatten_table(
                    Table(gnames, gcols, capL, None, None))
                meta_cell[0] = out_meta
                return out_flat
            jitted = jax.jit(fn_g)
            out_flat = jitted(rflat, code_l, code_r, rmatch)
            hit = (jitted, meta_cell[0])
            _DENSE_JIT_CACHE[key_g] = hit
        else:
            jitted, _ = hit
            out_flat = jitted(rflat, code_l, code_r, rmatch)
        gtab = _unflatten_table(out_flat, hit[1])
        lnames = set(left.names)
        for n in gtab.names:
            out_name = f"{n}{suffix}" if n in lnames else n
            names.append(out_name)
            cols[out_name] = gtab.cols[n]
    out = Table(names, cols, capL, None, out_valid)
    _propagate_join_stats(out, left, right, suffix)
    return out


def _ensure_col_stats(tbl: Table, name: str) -> None:
    """Cache bucketed min/max on a flat integer column (one readback,
    amortized across queries — the column object persists on the source
    table while join outputs are rebuilt per collect)."""
    c = tbl.cols[name]
    if (not c.dtype.is_integer or c.stats is not None or c.data is None
            or c.fields is not None or c.lengths is not None):
        return
    mask = tbl.row_mask()
    if c.validity is not None:
        mask = mask & c.validity
    mn, mx = (int(x) for x in np.asarray(_minmax_masked(c.data, mask)))
    if mx < mn:
        mn, mx = 0, 0
    B = _STAT_BUCKET
    c.stats = {"min": (mn // B) * B, "max": ((mx // B) + 1) * B - 1}


def _propagate_join_stats(out: Table, left: Table, right: Table,
                          suffix: str) -> None:
    """Live output values are a subset of the source column's live
    values, so cached bounds stay valid bounds; caching them on the
    source and copying forward lets the downstream group-by's dense
    path skip its per-collect stats sync."""
    for n in out.names:
        src_t, src_n = None, None
        if n in left.cols:
            src_t, src_n = left, n
        elif n in right.cols:
            src_t, src_n = right, n
        elif n.endswith(suffix) and n[:-len(suffix)] in right.cols:
            src_t, src_n = right, n[:-len(suffix)]
        if src_t is None:
            continue
        _ensure_col_stats(src_t, src_n)
        src = src_t.cols[src_n]
        if src.stats is not None:
            out.cols[n].stats = dict(src.stats)


def _assemble_join_output(left, right, left_on, right_on, how, suffix,
                          coalesce, lidx, ridx, lmatch, rmatch, total, capO):
    # --- build output columns ---
    names: List[str] = []
    cols = {}
    lkeys = set(left_on) if coalesce else set()
    rkeys = set(right_on) if coalesce else set()

    def add_side(t: Table, sidx, match, skip: set, other_names, is_left: bool):
        for n in t.names:
            if n in skip:
                continue
            c = t.cols[n]
            gc = c.take(sidx)
            validity = gc.validity
            if how in ("full", "right") and is_left:
                validity = match if validity is None else (validity & match)
            if how in ("full", "left") and not is_left:
                validity = match if validity is None else (validity & match)
            name = n
            if name in cols:
                name = f"{n}{suffix}"
                if name in cols:
                    raise ComputeError(f"duplicate output column {name!r}")
            names.append(name)
            cols[name] = Column(gc.dtype, gc.data, validity, gc.sdict,
                                lengths=gc.lengths, elem_valid=gc.elem_valid,
                                fields=gc.fields)

    if how == "right":
        add_side(left, lidx, lmatch, lkeys, right.names, True)
        add_side(right, ridx, rmatch, set(), left.names, False)
    else:
        add_side(left, lidx, lmatch, set(), right.names, True)
        add_side(right, ridx, rmatch, rkeys, left.names, False)

    if how == "full" and coalesce:
        # merge key columns: take left when matched else right
        for ln, rn in zip(left_on, right_on):
            lc = left.cols[ln]
            rc = right.cols[rn]
            a = Val(lc.dtype, lc.data[lidx],
                    None if lc.validity is None else lc.validity[lidx],
                    lc.sdict, False)
            b = Val(rc.dtype, rc.data[ridx],
                    None if rc.validity is None else rc.validity[ridx],
                    rc.sdict, False)
            if a.dtype.is_string:
                a, b = _align_strings(a, b)
            else:
                st = supertype(a.dtype, b.dtype)
                a, b = cast_val(a, st), cast_val(b, st)
            data = jnp.where(lmatch, a.data, b.data)
            av = lmatch & (a.validity if a.validity is not None else True)
            bv = rmatch & (b.validity if b.validity is not None else True)
            validity = jnp.where(lmatch, av, bv)
            cols[ln] = Column(a.dtype, data, validity, a.sdict)
            rname = f"{rn}{suffix}" if rn in cols or rn == ln else rn
            names[:] = [n for n in names if n != rname]
            cols.pop(rname, None)

    return Table(names, cols, capO, total, None)


def cross_join(left: Table, right: Table, suffix: str = "_right") -> Table:
    L = Cp.compact(left)
    R = Cp.compact(right)
    nl, nr = L.nrows or 0, R.nrows or 0
    total = nl * nr
    capO = capacity_for(max(total, 1))
    k = jnp.arange(capO, dtype=jnp.int64)
    i = jnp.clip((k // max(nr, 1)).astype(jnp.int32), 0, max(L.capacity - 1, 0))
    j = jnp.clip((k % max(nr, 1)).astype(jnp.int32), 0, max(R.capacity - 1, 0))
    names, cols = [], {}
    for n in L.names:
        names.append(n)
        cols[n] = L.cols[n].take(i)
    for n in R.names:
        name = n if n not in cols else f"{n}{suffix}"
        names.append(name)
        cols[name] = R.cols[n].take(j)
    return Table(names, cols, capO, total, None)


@functools.partial(jax.jit, static_argnums=(0,))
def _m1_fill(capL: int, gid, live_sorted, s_tag, s_sideidx, perm, r_words):
    """Device core of the m:1 fast path as ONE compiled program (see
    _m1_join_fast for the algorithm). r_words are the right columns'
    u32 words at right capacity; returns (hit, filled words) aligned
    with original left rows."""
    capT = gid.shape[0]
    idxT = jnp.arange(capT, dtype=jnp.int32)
    # 1. inverse permutation: inv[concat_row] = sorted slot
    _, inv = jax.lax.sort((perm.astype(jnp.int32), idxT), num_keys=1)
    pad = jnp.zeros(capL, jnp.uint32)
    concat_words = [jnp.concatenate([pad, w]) for w in r_words]
    # 2. into sorted-slot order (single-word key sort)
    if concat_words:
        sorted_ws = _mssort([inv] + list(concat_words),
                            1, is_stable=False)[1:]
    else:
        sorted_ws = ()
    # 3. reversed forward-fill: right row is LAST in its run
    isr = live_sorted & (s_tag == 1)
    risr = isr[::-1]
    # gid DESCENDS in reversed order; capT - gid ascends, so cummax of it
    # is "the nearest right row's group at or after this sorted slot"
    rmark = (capT - gid[::-1]).astype(jnp.int32)
    cnt = jnp.cumsum(risr.astype(jnp.uint32)).astype(jnp.uint64)
    lastg = jax.lax.cummax(jnp.where(risr, rmark, jnp.int32(0)))
    hit_sorted = (lastg == rmark)[::-1] & live_sorted & (s_tag == 0)
    filled = []
    for w in sorted_ws:
        pack = jnp.where(risr,
                         (cnt << jnp.uint64(32)) |
                         w[::-1].astype(jnp.uint64), jnp.uint64(0))
        f = jax.lax.cummax(pack)
        filled.append((f & jnp.uint64(0xFFFFFFFF)
                       ).astype(jnp.uint32)[::-1])
    # 4. writeback: every left row appears exactly once; right rows dump
    wb_key = jnp.where(s_tag == 0, s_sideidx, capL).astype(jnp.int32)
    outs = _mssort(
        [wb_key, hit_sorted.astype(jnp.uint32)] + list(filled),
        1, is_stable=False)
    hit = jax.lax.slice_in_dim(outs[1], 0, capL) != 0
    fills = [jax.lax.slice_in_dim(o, 0, capL) for o in outs[2:]]
    return hit, tuple(fills)


def _m1_join_fast(left: Table, right: Table, left_on, right_on, how: str,
                  suffix: str, coalesce: bool, gid, live_sorted, s_tag,
                  s_sideidx, perm, capT: int) -> Table:
    """Inner/left join when right keys are unique per group: output rows
    ARE the left rows (original order preserved), right payloads arrive
    via sort + cummax forward-fill — zero random gathers (TPU: gathers
    are ~7x costlier per element than sorted words; see
    lookup_join_sorted). Steps:

      1. one 2-operand sort inverts the merged-sort permutation;
      2. one sort drops every right payload word into sorted-slot order;
      3. per word, a reversed cummax over (monotone right-row counter |
         word) forward-fills the run's single right row onto its left
         rows (right rows sort after left rows within a run);
      4. one writeback sort by original left row index.
    """
    capL, capR = left.capacity, right.capacity

    # right payload columns (minus coalesced keys), split into u32 words
    r_names = [n for n in right.names
               if not (coalesce and n in right_on)]
    r_words, layout = [], []
    for n in r_names:
        c = right.cols[n]
        ws = _col_u32_words(c.data)
        hasv = c.validity is not None
        if hasv:
            ws.append(c.validity.astype(jnp.uint32))
        layout.append((n, c, len(ws) - int(hasv), hasv))
        r_words.extend(ws)

    hit, fills = _m1_fill(capL, gid, live_sorted, s_tag, s_sideidx, perm,
                          tuple(r_words))

    names, cols = list(left.names), dict(left.cols)
    lnames = set(left.names)
    wi = 0
    for n, c, nwords, hasv in layout:
        ws = fills[wi:wi + nwords]
        wi += nwords
        validity = hit
        if hasv:
            validity = hit & (fills[wi] != 0)
            wi += 1
        data = _col_from_u32_words(ws, storage_numpy_dtype(c.dtype))
        out_name = f"{n}{suffix}" if n in lnames else n
        names.append(out_name)
        cols[out_name] = Column(c.dtype, data, validity, c.sdict)
    out_valid = left.row_mask()
    if how == "inner":
        out_valid = out_valid & hit
    out = Table(names, cols, capL, None, out_valid)
    _propagate_join_stats(out, left, right, suffix)
    return out


def lookup_join_sorted(bkey, bval, pkey):
    """Inner-join value lookup against a unique-key build side, expressed
    entirely in sorts + primitive cumulative ops (no gathers, scatters,
    searchsorted or associative_scan — measured on TPU: gather 4M<-1M =
    34.7 ms vs lax.sort 1Mx2 = 1.25 ms, so sorts are the primitive of
    choice; 178 ms -> 61.5 ms at 4M probes x 1M build).

    Returns (value, hit) aligned with pkey. Capability analogue of the
    reference's IdxTable probe (`polars-expr/src/idx_table/mod.rs`)
    for the unique-build case.

    Mechanics: merge-sort both sides by (key, side-tag) so each key run
    holds its build row first; `cummax(where(is_build, key+1, 0))` gives
    the latest build key at or before each row (keys are sorted, hence
    monotone) -> hit test; the build VALUE forward-fills through
    `cummax((cumsum(is_build) << 32) | value_bits)` — the build counter
    is monotone so the max is the latest build row's payload. Writeback
    to probe order is a sort by probe index (sort-as-scatter)."""
    nb, npr = bkey.shape[0], pkey.shape[0]
    tot = nb + npr
    # 32-bit-native formulation (v5e emulates 64-bit word-by-word:
    # u64 sort operand +30%, u64 cummax 14.4 ms/pass — tools/agg_probe):
    # u32 keys sort as one word; wider keys split into hi/lo words.
    from .keycode import encode_orderable
    kb = encode_orderable(bkey)
    kp = encode_orderable(pkey)
    if kb.dtype.itemsize <= 4:
        kwords = [jnp.concatenate([kb.astype(jnp.uint32),
                                   kp.astype(jnp.uint32)])]
    else:
        k64 = jnp.concatenate([kb.astype(jnp.uint64),
                               kp.astype(jnp.uint64)])
        kwords = [(k64 >> jnp.uint64(32)).astype(jnp.uint32),
                  (k64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)]
    tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                           jnp.ones(npr, jnp.int32)])
    vbits = jnp.concatenate([
        jax.lax.bitcast_convert_type(bval.astype(jnp.float32), jnp.uint32),
        jnp.zeros(npr, jnp.uint32)])
    idx = jnp.concatenate([jnp.full(nb, tot, jnp.int32),
                           jnp.arange(npr, dtype=jnp.int32)])
    nk = len(kwords)
    out = _mssort(kwords + [tag, vbits, idx], nk + 1, is_stable=False)
    skw = out[:nk]
    st, sv, si = out[nk], out[nk + 1], out[nk + 2]
    isb = st == 0
    # key-run ids: build rows sort FIRST within a run, so a probe row
    # hits iff its run starts with a build row; the build VALUE
    # propagates by segmented max (unique build keys -> one build row
    # per run, and any u32 >= 0). Both ride one fused doubling scan.
    pos = jnp.arange(tot, dtype=jnp.int32)
    newk = pos == 0
    for w in skw:
        newk = newk | (w != jnp.roll(w, 1))
    rid = jnp.cumsum(newk.astype(jnp.int32))
    from .groupby import _seg_scan_doubling_multi

    def comb(prev, cur):
        (ha, va), (hb, vb) = prev, cur
        return (jnp.maximum(ha, hb), jnp.maximum(va, vb))

    hasb, vfill = _seg_scan_doubling_multi(
        [isb.astype(jnp.int32), jnp.where(isb, sv, jnp.uint32(0))],
        rid, comb)
    hit = (hasb > 0) & ~isb
    outv = jax.lax.bitcast_convert_type(vfill, jnp.float32)
    outv = jnp.where(hit, outv, jnp.float32(0))
    _, rv, rh = _mssort([si, outv, hit.astype(jnp.int32)], 1,
                        is_stable=False)
    return rv[:npr], rh[:npr].astype(jnp.bool_)
