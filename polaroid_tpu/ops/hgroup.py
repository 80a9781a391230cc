"""Hash-exchange group-by — the TPU-native general aggregation path.

Replaces the monolithic carry-sort group-by (one full-array multi-operand
`lax.sort`, ~52 ms at 8.4M rows on v5e) for 32-bit keys with a
bucket-exchange pipeline built from the primitives this chip is actually
fast at (tools/bucket_probe*.py, 2026-08-21):

  1. ``h = fmix32(key)`` — a BIJECTIVE murmur finalizer, so h-equality
     is key-equality (no collision handling) and the top bits are
     uniformly distributed regardless of key skew. Dead rows take
     ``h = 0xFFFFFFFF`` (the one real key that maps there is detected
     and routed to the fallback path).
  2. Per 8192-row block: one 2-operand `lax.sort` per value word
     (3.1 ms/8.4M vs 21.8 monolithic) groups each block by h; the top
     5 bits of h are the bucket digit, so bucket runs are contiguous.
  3. `bucket_exchange` (ops/exchange.py, Pallas) moves every run into a
     padded [K=32, B*CAP] bucket-major layout; cell overflow (4-sigma
     capacity) or the reserved-key collision falls back to the carry
     sort via `lax.cond` — the fast path is data-independent.
  4. One batched per-bucket sort (num_keys=2 for min/max so run order
     gives the extreme at the run end), then segmented log-doubling
     scans leave every aggregate at its run's end slot. Group key =
     inverse fmix32 of h.

Output is a masked partial table (slots anywhere, `gvalid` marks them)
of capacity B*K*CAP ~= 1.25n — the contract the distributed shuffle
consumers already use. Counts are exact (i32); f32 sums accumulate in
f32 (the carry-sort path's two-word compensation is kept for the
fallback).

Reference analogue: hash group-by + GroupedReduction combine
(`polars-expr/src/hash_keys.rs:19-100`, `polars-expr/src/reduce/`),
re-expressed as block sorts + a padded all-to-all instead of hash
tables, which is the shape a vector machine can run at bandwidth.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .exchange import CAP, K, S, bucket_exchange
from .hashing import _fmix32

_FILL = 0xFFFFFFFF
_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_C1_INV = pow(_C1, -1, 1 << 32)
_C2_INV = pow(_C2, -1, 1 << 32)


def fmix32_inv(h):
    """Inverse of hashing._fmix32 (each step is invertible)."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(_C2_INV)
    h = h ^ (h >> 13) ^ (h >> 26)
    h = h * jnp.uint32(_C1_INV)
    h = h ^ (h >> 16)
    return h


def _quantile_ranks(q: float, nn):
    """Per-row (i0, i1, frac) for position q*(nn-1). Dyadic q (0.5,
    0.25, ...) with denominator <= 1024 uses exact int32 math — the
    median's f64 position arithmetic was ~17 ms of emulated-f64 passes
    at 4.2M rows on v5e. Non-dyadic q keeps f64 (f32 would round
    q*(nn-1) across the floor boundary at exact-integer positions)."""
    num, den = float(q).as_integer_ratio()
    if den <= 1024:  # power of 2 by construction of as_integer_ratio
        m = nn - 1
        t = jnp.int32(num) * m.astype(jnp.int32)
        i0 = t // jnp.int32(den)
        rem = t - i0 * jnp.int32(den)
        i1 = i0 + (rem != 0).astype(jnp.int32)
        frac = rem.astype(jnp.float32) / jnp.float32(den)
        return i0, i1, frac
    pos = jnp.float64(q) * (nn.astype(jnp.float64) - 1)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.ceil(pos).astype(jnp.int32)
    return i0, i1, (pos - i0).astype(jnp.float32)


def _encode_val(v, agg):
    """One u32 transport word per aggregated value."""
    from .keycode import encode_orderable
    if agg in ("min", "max"):
        u = encode_orderable(v, descending=(agg == "min"))
        return u.astype(jnp.uint32)
    if isinstance(agg, tuple) and agg[0] == "quantile":
        # order-preserving ascending word: the per-bucket final sort
        # (num_keys=2) leaves every group's values as a sorted run
        return encode_orderable(v).astype(jnp.uint32)
    if v.dtype == jnp.uint32:
        return v
    if v.dtype.itemsize == 4:
        return jax.lax.bitcast_convert_type(v, jnp.uint32)
    raise TypeError(v.dtype)


def hash_groupby_u32(key: jax.Array, vals: Sequence[jax.Array],
                     valid: jax.Array, aggs: Sequence,
                     scan_dtypes=None):
    """Fast-path group-by for u32-storable keys and 4-byte values.

    Returns (gkey u32 (M,), outs, gvalid (M,), ok bool) with
    M = ceil(n/S)*K*CAP. When ``ok`` is False the outputs are garbage
    and the caller must use its fallback (lax.cond on ``ok`` —
    ``precheck`` computes it without running the pipeline).

    aggs[i] is "sum"/"count"/"min"/"max", "sumsq" (sum of squares,
    upcast BEFORE squaring — the var/std building block), "sumprod"
    (vals[i] is a PAIR (a, b) of 4-byte arrays; sum of a*b per group —
    the covariance/correlation cross term; both factor words ride the
    shared raw-word sort so they stay row-aligned), or the tuple
    ("quantile", q, interp): the value word rides the final sort as a
    second sort key so every group's values form an ascending run, and
    the quantile falls out of per-row run geometry + the shared
    additive scan (two rows per group contribute the interpolation
    terms — same trick as groupby._group_quantile_fused, here on the
    bucket-major layout).

    scan_dtypes[i] (optional) overrides the accumulator dtype of a
    "sum"/"sumsq" val: values transport as their exact 4-byte words but
    the post-exchange segmented scan upcasts (e.g. int32 -> int64 so
    sums match the engine's Int64 semantics instead of wrapping at 32
    bits; float sumsq -> float64 so the naive var formula keeps ~52
    bits against cancellation).
    """
    n = key.shape[0]
    B = -(-n // S)
    npad = B * S
    h = jnp.where(valid, _fmix32(key.astype(jnp.uint32)),
                  jnp.uint32(_FILL))
    badkey = jnp.any(valid & (h == jnp.uint32(_FILL)))
    if npad != n:
        h = jnp.concatenate([h, jnp.full((npad - n,), jnp.uint32(_FILL))])
    digit = (h >> jnp.uint32(27)).astype(jnp.int32)
    live = h != jnp.uint32(_FILL)
    # per-block bucket histogram (live rows only): one fused
    # compare-accumulate pass, no gathers
    oh = (digit.reshape(B, S, 1) ==
          jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
    oh = oh & live.reshape(B, S, 1)
    counts = jnp.sum(oh, axis=1, dtype=jnp.int32)          # (B, K)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(counts, axis=1)[:, :-1]],
        axis=1)
    ok = (jnp.max(counts) <= CAP) & ~badkey

    # transport words, DEDUPED by (source array, encoding): each word
    # costs a 2-op block sort, an exchange lane, and — the dominant
    # term — a 2-op per-bucket final sort (~7 ms at 4.2M rows), so
    # median+std of one column must ride ONE word, not three. A raw
    # (sum/sumsq) request can also ride an order-encoded word of the
    # same array — the orderable encoding is bijective, the scan
    # decodes it back exactly.
    def _desired_enc(agg):
        if agg in ("min", "max"):
            return ("ord", agg == "min")
        if isinstance(agg, tuple) and agg[0] == "quantile":
            return ("ord", False)
        return ("raw",)

    uniq_words: List = []       # padded u32 transport words
    uniq_enc: List = []         # encoding of each unique word
    uniq_ordered: List = []     # word needs num_keys=2 in the final sort
    slot_by_key: dict = {}
    agg_word: List = []         # per agg: (slot, word_enc) / prod / None

    def _add_word(v, agg, allow_ord_share=True):
        enc = _desired_enc(agg)
        key_exact = (id(v), enc)
        slot = slot_by_key.get(key_exact)
        if slot is None and enc == ("raw",) and allow_ord_share:
            # ride any order-encoded word of the same array
            for d in (False, True):
                slot = slot_by_key.get((id(v), ("ord", d)))
                if slot is not None:
                    break
        if slot is None:
            w = _encode_val(v, agg)
            if npad != n:
                w = jnp.concatenate([w, jnp.zeros((npad - n,),
                                                  jnp.uint32)])
            slot = len(uniq_words)
            uniq_words.append(w)
            uniq_enc.append(enc)
            uniq_ordered.append(enc[0] == "ord")
            slot_by_key[key_exact] = slot
        return slot

    for v, agg in zip(vals, aggs):
        if agg == "count":
            agg_word.append(None)
            continue
        if agg == "sumprod":
            # both factor words must ride the SAME permutation through
            # every sort. Raw words share one multi-operand sort call
            # (below), so two raw slots are aligned by construction;
            # ord-word sharing is disallowed because ord words sort in
            # their own num_keys=2 calls.
            sa = _add_word(v[0], "sum", allow_ord_share=False)
            sb = _add_word(v[1], "sum", allow_ord_share=False)
            agg_word.append(("prod", sa, sb))
            continue
        slot = _add_word(v, agg)
        agg_word.append((slot, uniq_enc[slot]))

    h2 = h.reshape(B, S)
    if uniq_words:
        # ONE multi-operand block sort: lax.sort cost scales with
        # operand count, so a single (1+R)-operand call beats R
        # separate 2-operand calls for R >= 2, and it keeps every raw
        # word row-aligned (the sumprod factors require this)
        o = jax.lax.sort(
            (h2,) + tuple(w.reshape(B, S) for w in uniq_words),
            dimension=1, num_keys=1, is_stable=False)
        hs = o[0]
        sorted_real = list(o[1:])
    else:
        hs = jax.lax.sort((h2,), dimension=1, num_keys=1,
                          is_stable=False)[0]
        sorted_real = []

    ex = bucket_exchange(
        starts, counts, [hs.reshape(-1)] + [x.reshape(-1)
                                            for x in sorted_real],
        fills=(_FILL,) + (0,) * len(sorted_real))
    hx = ex[0]                                   # (K, B*CAP)
    vx = ex[1:]
    L = hx.shape[1]
    M = K * L

    # per-bucket batched final sorts — the dominant pipeline term. ALL
    # raw words ride ONE multi-operand call (row-aligned, cheaper than
    # per-word 2-op sorts); each ordered word joins the key
    # (num_keys=2) in its own call so run order is by value and the run
    # end holds the encoded extreme
    word_sorted: List = [None] * len(vx)
    hfin = None
    raw_ix = [i for i, o2 in enumerate(uniq_ordered) if not o2]
    if raw_ix:
        o = jax.lax.sort((hx,) + tuple(vx[i] for i in raw_ix),
                         dimension=1, num_keys=1, is_stable=False)
        hfin = o[0]
        for j, i in enumerate(raw_ix):
            word_sorted[i] = o[1 + j]
    for i, ordered in enumerate(uniq_ordered):
        if not ordered:
            continue
        o = jax.lax.sort((hx, vx[i]), dimension=1, num_keys=2,
                         is_stable=False)
        hfin = o[0]
        word_sorted[i] = o[1]
    if hfin is None:
        hfin = jax.lax.sort((hx,), dimension=1, num_keys=1,
                            is_stable=False)[0]
    outs_sorted: List = [None if aw is None else
                         (word_sorted[aw[1]], word_sorted[aw[2]])
                         if aw[0] == "prod" else word_sorted[aw[0]]
                         for aw in agg_word]

    liveF = hfin != jnp.uint32(_FILL)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    prev = jnp.concatenate(
        [hfin[:, :1], hfin[:, :-1]], axis=1)
    flag = (hfin != prev) | (col == 0)
    nxt = jnp.concatenate([hfin[:, 1:], hfin[:, -1:]], axis=1)
    endf = (hfin != nxt) | (col == L - 1)
    rid = (jnp.cumsum(flag.astype(jnp.int32), axis=1) - 1 +
           jnp.arange(K, dtype=jnp.int32)[:, None] * (L + 1))
    gid = rid.reshape(-1)

    from .groupby import _seg_scan_doubling_multi
    from .keycode import decode_orderable
    gvalid = (endf & liveF).reshape(-1)
    gkey = fmix32_inv(hfin).reshape(-1)
    any_quant = any(isinstance(a, tuple) and a[0] == "quantile"
                    for a in aggs)
    if any_quant:
        # per-row run geometry on the bucket-major layout: rank r and
        # run length nn feed the two-row interpolation contributions
        start = jax.lax.cummax(jnp.where(flag, col, 0), axis=1)
        end = jax.lax.cummin(jnp.where(endf, col, L), axis=1,
                             reverse=True)
        nn_q = end - start + 1
        r_q = col - start
    # all additive scans (sums + the shared count) ride ONE multi-array
    # doubling ladder: the gid rolls/compares amortize across arrays.
    # f64-requested FLOAT sums ride as compensated (hi, lo) f32 PAIRS
    # on accelerators — one emulated-f64 ladder measured ~5 ms/array at
    # 4.2M rows (std-alone 33 ms engine) vs ~1 ms for two f32 slots;
    # sumsq keeps exact squares via a Veltkamp/Dekker two-prod, so the
    # pair carries x*x to ~49 bits like the engine's other compensated
    # accumulators (groupby c259773)
    comp_f32 = jax.default_backend() != "cpu"
    scan_in: List[jax.Array] = []
    scan_pair: List[bool] = []   # slot starts a compensated (hi, lo) pair

    def _push(x, pair=False, lo=None):
        scan_in.append(x)
        scan_pair.append(pair)
        if pair:
            scan_in.append(lo)
            scan_pair.append(False)
        return len(scan_in) - (2 if pair else 1)

    scan_slot = {}
    need_cnt = any(a == "count" for a in aggs)
    if need_cnt:
        scan_slot["count"] = _push(liveF.astype(jnp.int32).reshape(-1))
    for i, (agg, so, v) in enumerate(zip(aggs, outs_sorted, vals)):
        if agg == "sumprod":
            # sum of a*b (the covariance/correlation cross term): both
            # factors transported exactly, multiplied post-exchange.
            # f64-requested: Dekker two-prod keeps the product exact as
            # a compensated (hi, lo) f32 pair (C = 2^12+1 splits each
            # f32 into 12-bit halves, so every partial product is
            # exact), riding the same compensated ladder as sum/sumsq
            wa, wb = so
            a32 = jax.lax.bitcast_convert_type(wa, v[0].dtype).reshape(-1)
            b32 = jax.lax.bitcast_convert_type(wb, v[1].dtype).reshape(-1)
            sdt = None if scan_dtypes is None else scan_dtypes[i]
            if comp_f32 and sdt == jnp.float64:
                af = a32.astype(jnp.float32)
                bf = b32.astype(jnp.float32)
                C = jnp.float32((1 << 12) + 1)
                ca = C * af
                ah = ca - (ca - af)
                al = af - ah
                cb = C * bf
                bh = cb - (cb - bf)
                bl = bf - bh
                p = af * bf
                err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
                scan_slot[i] = _push(p, pair=True, lo=err)
                continue
            if sdt is not None:
                x = a32.astype(sdt) * b32.astype(sdt)
            else:
                x = a32 * b32
            scan_slot[i] = _push(x)
            continue
        if agg in ("sum", "sumsq"):
            enc = agg_word[i][1]
            if enc[0] == "ord":  # riding a shared order-encoded word
                x = decode_orderable(so, jnp.dtype(v.dtype),
                                     enc[1]).reshape(-1)
            else:
                x = jax.lax.bitcast_convert_type(so, v.dtype).reshape(-1)
            sdt = None if scan_dtypes is None else scan_dtypes[i]
            if comp_f32 and sdt == jnp.float64 and \
                    jnp.issubdtype(x.dtype, jnp.floating):
                xf = x.astype(jnp.float32)
                if agg == "sumsq":
                    C = jnp.float32((1 << 13) + 1)
                    c = C * xf
                    xh = c - (c - xf)
                    xl = xf - xh
                    p = xf * xf
                    err = ((xh * xh - p) + 2 * (xh * xl)) + xl * xl
                    scan_slot[i] = _push(p, pair=True, lo=err)
                else:
                    scan_slot[i] = _push(xf, pair=True,
                                         lo=jnp.zeros_like(xf))
                continue
            if sdt is not None:
                x = x.astype(sdt)
            if agg == "sumsq":
                x = x * x
            scan_slot[i] = _push(x)
        elif isinstance(agg, tuple) and agg[0] == "quantile":
            _, q, interp = agg
            vv = decode_orderable(so, jnp.dtype(v.dtype),
                                  False).astype(jnp.float32)
            i0, i1, frac = _quantile_ranks(q, nn_q)
            if interp == "linear":
                contrib = jnp.where(r_q == i0, vv * (1 - frac), 0.) + \
                    jnp.where((r_q == i1) & (i1 != i0), vv * frac, 0.)
            elif interp == "lower":
                contrib = jnp.where(r_q == i0, vv, 0.)
            elif interp == "higher":
                contrib = jnp.where(r_q == i1, vv, 0.)
            elif interp == "midpoint":
                # i1 == i0 -> the same row takes vv/2 twice = vv
                contrib = jnp.where(r_q == i0, vv / 2, 0.) + \
                    jnp.where(r_q == i1, vv / 2, 0.)
            else:  # nearest
                inear = jnp.where(frac > 0.5, i1,
                                  jnp.where(frac < 0.5, i0,
                                            (i0 + 1) // 2 * 2))
                contrib = jnp.where(r_q == inear, vv, 0.)
            scan_slot[i] = _push(jnp.where(liveF, contrib,
                                           jnp.float32(0)).reshape(-1))
    if scan_in:
        def _combine(p, c):
            out = []
            j = 0
            while j < len(p):
                if scan_pair[j]:
                    s = p[j] + c[j]
                    bb = s - p[j]
                    err = (p[j] - (s - bb)) + (c[j] - bb)
                    out.append(s)
                    out.append(p[j + 1] + c[j + 1] + err)
                    j += 2
                else:
                    out.append(p[j] + c[j])
                    j += 1
            return out

        scanned = _seg_scan_doubling_multi(scan_in, gid, _combine)
    outs: List[jax.Array] = []
    for i, (agg, so, v) in enumerate(zip(aggs, outs_sorted, vals)):
        if agg == "count":
            outs.append(jnp.where(gvalid, scanned[scan_slot["count"]], 0))
        elif agg in ("sum", "sumsq", "sumprod"):
            vdt = v[0].dtype if agg == "sumprod" else v.dtype
            sdt = vdt if scan_dtypes is None or scan_dtypes[i] is None \
                else scan_dtypes[i]
            sl = scan_slot[i]
            if scan_pair[sl]:
                tot = scanned[sl].astype(jnp.float64) + \
                    scanned[sl + 1].astype(jnp.float64)
                outs.append(jnp.where(gvalid, tot, jnp.zeros((), sdt)))
            else:
                outs.append(jnp.where(gvalid, scanned[sl],
                                      jnp.zeros((), sdt)))
        elif isinstance(agg, tuple) and agg[0] == "quantile":
            outs.append(jnp.where(gvalid, scanned[scan_slot[i]],
                                  jnp.float32(0)))
        else:  # min / max at the run end, encoded
            val = decode_orderable(so.reshape(-1), v.dtype,
                                   descending=(agg == "min"))
            from ..parallel.shuffle import _ident as _id2
            outs.append(jnp.where(gvalid, val, _id2(v.dtype, agg)))
    return gkey, outs, gvalid, ok


def precheck(key: jax.Array, valid: jax.Array):
    """The fast-path feasibility predicate, computable without running
    the pipeline: no bucket cell overflow, no reserved-key collision."""
    n = key.shape[0]
    B = -(-n // S)
    h = jnp.where(valid, _fmix32(key.astype(jnp.uint32)),
                  jnp.uint32(_FILL))
    badkey = jnp.any(valid & (h == jnp.uint32(_FILL)))
    if B * S != n:
        h = jnp.concatenate([h, jnp.full((B * S - n,), jnp.uint32(_FILL))])
    digit = (h >> jnp.uint32(27)).astype(jnp.int32)
    live = h != jnp.uint32(_FILL)
    oh = (digit.reshape(B, S, 1) ==
          jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
    counts = jnp.sum(oh & live.reshape(B, S, 1), axis=1, dtype=jnp.int32)
    return (jnp.max(counts) <= CAP) & ~badkey


def out_capacity(n: int) -> int:
    return -(-n // S) * K * CAP


# ---------------------------------------------------------------------------
# adaptive dispatcher: dense (range < 8192) / hash-exchange / carry-sort
# ---------------------------------------------------------------------------

_DENSE_G = 8192
_DENSE_G_SMALL = 1024


def _dense_branch(key, vals, valid, aggs, kmin, M, G):
    """Range-guaranteed dense MXU group-by: gid = key - kmin < G."""
    from .pallas_kernels import use_pallas, onehot_seg_sum, onehot_seg_minmax
    from .groupby import _onehot_seg_sum_f32, _seg_unsorted_dense
    from ..parallel.shuffle import _ident
    _DENSE_G = G
    gid = jnp.where(valid, (key.astype(jnp.uint32) - kmin).astype(jnp.int32),
                    -1)
    stacked = [jnp.where(valid, 1., 0.).astype(jnp.float32)]
    for v, a in zip(vals, aggs):
        if a == "sum":
            stacked.append(jnp.where(valid, v.astype(jnp.float32), 0.))
    if use_pallas():
        res = onehot_seg_sum(jnp.stack(stacked), gid, _DENSE_G)
    else:
        res = jnp.stack(_onehot_seg_sum_f32(
            stacked, gid, _DENSE_G, jnp.ones(gid.shape[0], bool)))
    cnt = res[0]
    sums = list(res[1:])
    outs = []
    si = 0
    gv = cnt > 0
    for v, a in zip(vals, aggs):
        if a == "count":
            outs.append(cnt.astype(jnp.int32))
        elif a == "sum":
            outs.append(jnp.where(gv, sums[si], 0.).astype(v.dtype))
            si += 1
        else:
            ident = float("inf") if a == "min" else float("-inf")
            x = jnp.where(valid, v.astype(jnp.float32), jnp.float32(ident))
            if use_pallas():
                r = onehot_seg_minmax(x, gid, _DENSE_G, a == "max", ident)
            else:
                r = _seg_unsorted_dense(x, gid, _DENSE_G,
                                        jnp.maximum if a == "max"
                                        else jnp.minimum, ident)
            outs.append(jnp.where(gv, r.astype(v.dtype),
                                  _ident(v.dtype, a)))
    gkey = kmin + jnp.arange(_DENSE_G, dtype=jnp.uint32)
    pad = M - _DENSE_G
    gkey = jnp.concatenate([gkey, jnp.zeros(pad, jnp.uint32)])
    outs = [jnp.concatenate([o, jnp.zeros(pad, o.dtype)]) for o in outs]
    gv = jnp.concatenate([gv, jnp.zeros(pad, bool)])
    return gkey, tuple(outs), gv


def adaptive_local_groupby(key, vals, valid, aggs, slow_fn):
    """Runtime-adaptive group-by over u32-storable keys and 4-byte
    values: dense MXU when the live key range fits _DENSE_G, else the
    hash-exchange path, else `slow_fn` (the carry sort) — selected with
    `lax.cond` on device so the whole dispatch stays inside one jit.

    slow_fn() -> (gkey u32 (n,), outs tuple, gvalid (n,)).
    Returns the same triple at capacity `out_capacity(n)`.
    """
    n = key.shape[0]
    M = out_capacity(n)
    k32 = key.astype(jnp.uint32)
    kmin = jnp.min(jnp.where(valid, k32, jnp.uint32(0xFFFFFFFF)))
    kmax = jnp.max(jnp.where(valid, k32, jnp.uint32(0)))
    any_live = jnp.any(valid)
    rng = kmax - kmin
    # dense sums/extremes accumulate in f32: ints are only exact below
    # 2^24, so int-valued sum/min/max go to the exchange path instead
    dense_static = all(
        a == "count" or jnp.issubdtype(v.dtype, jnp.floating)
        for v, a in zip(vals, aggs)) and n < (1 << 24)

    def dense_small(_):
        return _dense_branch(k32, vals, valid, aggs, kmin, M,
                             _DENSE_G_SMALL)

    def dense_big(_):
        return _dense_branch(k32, vals, valid, aggs, kmin, M, _DENSE_G)

    def fast_br(_):
        gkey, outs, gv, _ok = hash_groupby_u32(k32, vals, valid, aggs)
        return gkey, tuple(outs), gv

    def slow_br(_):
        gkey, outs, gv = slow_fn()
        pad = M - gkey.shape[0]
        gkey = jnp.concatenate(
            [gkey.astype(jnp.uint32), jnp.zeros(pad, jnp.uint32)])
        outs = tuple(jnp.concatenate([o, jnp.zeros(pad, o.dtype)])
                     for o in outs)
        gv = jnp.concatenate([gv, jnp.zeros(pad, bool)])
        return gkey, outs, gv

    def not_dense(_):
        return jax.lax.cond(precheck(k32, valid), fast_br, slow_br, None)

    if dense_static:
        return jax.lax.cond(
            any_live & (rng < _DENSE_G_SMALL), dense_small,
            lambda _: jax.lax.cond(
                any_live & (rng < _DENSE_G), dense_big, not_dense, None),
            None)
    return not_dense(None)
