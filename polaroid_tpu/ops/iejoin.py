"""Inequality join (IEJoin) — wavelet-tree dominance enumeration.

Capability analogue of the reference's sort-based IEJoin
(`polars-ops/src/frame/join/iejoin/mod.rs:206-382`, Khayyat et al.):
`join_where` with inequality predicates, WITHOUT materializing the
cross product. The reference sweeps a bitset sequentially; per-element
bitset sweeps don't map to XLA, so we reformulate the pair enumeration
as 2-D dominance rank/select queries over a wavelet tree
(`ops/wavelet.py`) — every phase is sorts, cumsums and batched
gathers:

  predicate 1 (la OP1 ra):  sort right by ra (direction chosen so the
      matching rows form a PREFIX of the order); per left row the
      prefix length P_i is one batched binary search.
  predicate 2 (lb OP2 rb):  build a wavelet tree over the rb-ranks in
      ra-order; count_lt(0, P_i, K_i) counts matches per left row in
      O(log n) gathers, and select(0, P_i, k) enumerates the k-th
      matching right row for each output slot.

Complexity O((n + out) log n) versus the cross product's O(n*m) memory
and compute. A single inequality skips the wavelet (prefix enumeration
is direct); extra predicates beyond the driving two are evaluated on
the assembled candidate pairs and masked.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Column, Table
from ..config import capacity_for
from ..dtypes import supertype
from ..errors import ComputeError
from ..expr.eval import Val, cast_val, eval_expr
from .keycode import encode_orderable
from .wavelet import build_wavelet, wavelet_count_lt, wavelet_select

__all__ = ["iejoin_tables"]

_FLIP = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}


def _encode_pair(lv: Val, rv: Val, capL: int, capR: int):
    """Cast both sides to a common supertype and encode order-preserving
    uint64 words (nulls handled by the caller's masks)."""
    if lv.dtype.is_string or rv.dtype.is_string:
        raise ComputeError("join_where inequality on string keys is not "
                           "supported")
    st = supertype(lv.dtype, rv.dtype)
    lv, rv = cast_val(lv, st), cast_val(rv, st)

    def enc(v, cap):
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        return encode_orderable(data).astype(jnp.uint64)

    return enc(lv, capL), enc(rv, capR), lv.validity, rv.validity


def _prefix_len(rsorted_key, nlive, lkey, op: str):
    """Per-left-row count of live right rows satisfying `la OP ra`, as a
    prefix length of the chosen right order (ascending for gt/ge —
    matches are the SMALLEST ra; the caller reverses the order for
    lt/le)."""
    if op == "gt":       # ra <  la
        p = jnp.searchsorted(rsorted_key, lkey, side="left")
    elif op == "ge":     # ra <= la
        p = jnp.searchsorted(rsorted_key, lkey, side="right")
    elif op == "lt":     # ra >  la  (suffix of asc = prefix of desc)
        p = nlive - jnp.searchsorted(rsorted_key, lkey, side="right")
    elif op == "le":     # ra >= la
        p = nlive - jnp.searchsorted(rsorted_key, lkey, side="left")
    else:
        raise ComputeError(f"not an inequality: {op!r}")
    return jnp.clip(p, 0, nlive).astype(jnp.int32)


def iejoin_pairs(la, lb, lmask, ra, rb, rmask, op1: str, op2: Optional[str],
                 out_cap: int):
    """Device core: returns (m per left row, total, lidx, ridx, pair_ok)
    where (lidx, ridx)[:total] enumerate the matching pairs."""
    capL, capR = la.shape[0], ra.shape[0]
    nlive = jnp.sum(rmask.astype(jnp.int32))

    # right order by predicate-1 key, dead rows last; reverse for lt/le
    dead = (~rmask).astype(jnp.uint32)
    ra_hi = (ra >> jnp.uint64(32)).astype(jnp.uint32)
    ra_lo = (ra & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    ridx0 = jnp.arange(capR, dtype=jnp.int32)
    _, _, _, order_a = jax.lax.sort((dead, ra_hi, ra_lo, ridx0),
                                    num_keys=3, is_stable=True)
    if op1 in ("lt", "le"):
        # matches are the largest ra: reverse the LIVE prefix (dead rows
        # stay at the end)
        pos = jnp.arange(capR, dtype=jnp.int32)
        rev = jnp.where(pos < nlive, nlive - 1 - pos, pos)
        order_a = order_a[jnp.clip(rev, 0, capR - 1)]
    # sorted ra values (ascending over the live prefix) for the searches;
    # dead tail entries become MAX sentinels so the array is globally
    # ascending (their raw values would break the binary search) — P is
    # clipped to nlive so sentinel hits can't leak in
    sd, sh, sl = jax.lax.sort((dead, ra_hi, ra_lo), num_keys=3,
                              is_stable=True)
    ra_sorted64 = jnp.where(
        sd != 0, jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (sh.astype(jnp.uint64) << jnp.uint64(32)) | sl.astype(jnp.uint64))
    P = _prefix_len(ra_sorted64, nlive, la, op1)
    P = jnp.where(lmask, P, 0)

    if op2 is None:
        m = P
        moff = jnp.cumsum(m.astype(jnp.int64))
        total = moff[capL - 1] if capL else jnp.int64(0)
        from .join import _expand_rows
        li = jnp.clip(_expand_rows(m, moff, out_cap), 0, capL - 1)
        k = jnp.arange(out_cap, dtype=jnp.int64)
        j = (k - (moff[li] - m[li])).astype(jnp.int32)
        ridx = order_a[jnp.clip(j, 0, capR - 1)]
        ok = k < total
        return m, total, li, ridx, ok

    # --- second predicate: wavelet over rb-ranks in order_a ---
    rb_hi = (rb >> jnp.uint64(32)).astype(jnp.uint32)
    rb_lo = (rb & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    _, _, _, order_b = jax.lax.sort((dead, rb_hi, rb_lo, ridx0),
                                    num_keys=3, is_stable=True)
    # rank_b[row] = position of row in order_b (inverse permutation via
    # one sort; TPU scatters serialize)
    _, rank_b = jax.lax.sort((order_b, ridx0), num_keys=1)
    seq = rank_b[order_a]
    tables = build_wavelet(seq)
    sdb, shb, slb = jax.lax.sort((dead, rb_hi, rb_lo), num_keys=3,
                                 is_stable=True)
    rb_sorted64 = jnp.where(
        sdb != 0, jnp.uint64(0xFFFFFFFFFFFFFFFF),
        (shb.astype(jnp.uint64) << jnp.uint64(32)) | slb.astype(jnp.uint64))
    # K = first rb-rank NOT matching / boundary rank for lb OP2 rb
    if op2 == "gt":      # rb <  lb : ranks <  K, K = lower bound
        K = jnp.searchsorted(rb_sorted64, lb, side="left")
        low_side = True
    elif op2 == "ge":    # rb <= lb : ranks <  K, K = upper bound
        K = jnp.searchsorted(rb_sorted64, lb, side="right")
        low_side = True
    elif op2 == "lt":    # rb >  lb : ranks >= K, K = upper bound
        K = jnp.searchsorted(rb_sorted64, lb, side="right")
        low_side = False
    elif op2 == "le":    # rb >= lb : ranks >= K
        K = jnp.searchsorted(rb_sorted64, lb, side="left")
        low_side = False
    else:
        raise ComputeError(f"not an inequality: {op2!r}")
    K = jnp.clip(K, 0, nlive).astype(jnp.int32)
    C = wavelet_count_lt(tables, jnp.zeros_like(P), P, K)
    m = jnp.where(lmask, C if low_side else P - C, 0).astype(jnp.int32)

    moff = jnp.cumsum(m.astype(jnp.int64))
    total = moff[capL - 1] if capL else jnp.int64(0)
    from .join import _expand_rows
    li = jnp.clip(_expand_rows(m, moff, out_cap), 0, capL - 1)
    k = jnp.arange(out_cap, dtype=jnp.int64)
    j = (k - (moff[li] - m[li])).astype(jnp.int32)
    # k-th match of left row li: the (j + base)-th smallest rb-rank in
    # the prefix [0, P_li) — base = 0 for rank< K matches, C for rank>=K
    base = jnp.zeros_like(j) if low_side else C[li]
    sel_k = jnp.clip(base + j, 0, capR - 1)
    P_li = jnp.maximum(P[li], 1)
    rank = wavelet_select(tables, jnp.zeros_like(sel_k), P_li, sel_k)
    ridx = order_b[jnp.clip(rank, 0, capR - 1)]
    ok = k < total
    return m, total, li, ridx, ok


_IEJ_CACHE: dict = {}


def iejoin_tables(left: Table, right: Table,
                  preds: Sequence[Tuple], post, suffix: str) -> Table:
    """Execute join_where: `preds` is a list of (left_expr, op,
    right_expr) inequalities (op in lt/le/gt/ge, left OP right); `post`
    is a list of extra predicates evaluated on the joined table. The
    first two inequalities drive the dominance enumeration; the rest
    join `post`."""
    from ..exec.compiled import _flatten_table, _table_key, _unflatten_table
    capL, capR = left.capacity, right.capacity
    lmask, rmask = left.row_mask(), right.row_mask()

    le1, op1, re1 = preds[0]
    lv1 = eval_expr(le1, left, "select")
    rv1 = eval_expr(re1, right, "select")
    la, ra, lval1, rval1 = _encode_pair(lv1, rv1, capL, capR)
    if lval1 is not None:
        lmask = lmask & lval1
    if rval1 is not None:
        rmask = rmask & rval1
    op2 = None
    lb = rb = None
    if len(preds) > 1:
        le2, op2x, re2 = preds[1]
        lv2 = eval_expr(le2, left, "select")
        rv2 = eval_expr(re2, right, "select")
        lb, rb, lval2, rval2 = _encode_pair(lv2, rv2, capL, capR)
        if lval2 is not None:
            lmask = lmask & lval2
        if rval2 is not None:
            rmask = rmask & rval2
        op2 = op2x
    else:
        lb = jnp.zeros(capL, jnp.uint64)
        rb = jnp.zeros(capR, jnp.uint64)

    # count phase (one program, ONE host sync for the output capacity)
    key_c = ("iec", op1, op2, capL, capR)
    jf = _IEJ_CACHE.get(key_c)
    if jf is None:
        def fn_c(la, lb, lmask, ra, rb, rmask):
            m, total, *_ = iejoin_pairs(la, lb, lmask, ra, rb, rmask,
                                        op1, op2, 1)
            return m, total
        jf = jax.jit(fn_c)
        _IEJ_CACHE[key_c] = jf
    m, total_dev = jf(la, lb, lmask, ra, rb, rmask)
    total = int(np.asarray(total_dev))
    out_cap = capacity_for(max(total, 1))

    # assemble phase: enumerate pairs + gather both sides
    lflat, lmeta = _flatten_table(left)
    rflat, rmeta = _flatten_table(right)
    key_b = ("ieb", op1, op2, out_cap, suffix, _table_key(left),
             _table_key(right))
    hit = _IEJ_CACHE.get(key_b)
    if hit is None:
        meta_cell: list = [None]

        def fn_b(lflat, rflat, la, lb, lmask, ra, rb, rmask):
            lt = _unflatten_table(lflat, lmeta)
            rt = _unflatten_table(rflat, rmeta)
            _, _, li, ridx, ok = iejoin_pairs(la, lb, lmask, ra, rb, rmask,
                                              op1, op2, out_cap)
            names, cols = [], {}
            for n in lt.names:
                c = lt.cols[n].take(li)
                names.append(n)
                cols[n] = c
            for n in rt.names:
                c = rt.cols[n].take(ridx)
                out_name = f"{n}{suffix}" if n in cols else n
                names.append(out_name)
                cols[out_name] = c
            out_t = Table(names, cols, out_cap, None, ok)
            out_flat, out_meta = _flatten_table(out_t)
            meta_cell[0] = out_meta
            return out_flat
        jitted = jax.jit(fn_b)
        out_flat = jitted(lflat, rflat, la, lb, lmask, ra, rb, rmask)
        hit = (jitted, meta_cell[0])
        _IEJ_CACHE[key_b] = hit
        if len(_IEJ_CACHE) > 128:
            _IEJ_CACHE.pop(next(iter(_IEJ_CACHE)))
    else:
        jitted, _ = hit
        out_flat = jitted(lflat, rflat, la, lb, lmask, ra, rb, rmask)
    out = _unflatten_table(out_flat, hit[1])

    # remaining predicates: evaluate on the pair table and mask
    extra = list(preds[2:])
    post = list(post)
    if extra or post:
        from ..api.frame import DataFrame
        from ..expr.expr import Expr
        conj = None
        for (lex, op, rex) in extra:
            rren = _suffix_expr(rex, set(left.names), suffix)
            p = Expr("binary", (lex, rren), op=op)
            conj = p if conj is None else (conj & p)
        for p in post:
            conj = p if conj is None else (conj & p)
        out = DataFrame._from_table(out).filter(conj)._table
    return out


def _suffix_expr(e, lnames, suffix: str):
    """Rewrite right-frame column refs to their joined output names."""
    from ..expr.expr import Expr
    if e.kind == "col":
        n = e.attrs["name"]
        return Expr("col", (), name=f"{n}{suffix}" if n in lnames else n)
    if not e.children:
        return e
    return Expr(e.kind, tuple(_suffix_expr(c, lnames, suffix)
                              for c in e.children), **e.attrs)
