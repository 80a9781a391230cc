"""Hash-collocate join — exchange-based equi-join for 31-bit keys.

The sort-free reality of this chip (tools/bucket_probe*.py): gathers run
at ~8 ns/element while 8192-row 2-operand block sorts move rows at
~0.37 ns/row, so a join must be expressed as sorts + one padded
exchange, never as hash-table probes. Pipeline:

  1. ``w = mix31(key) << 1 | side`` — a 31-bit BIJECTIVE murmur-style
     mixer (odd-multiplier + xorshift steps mod 2^31), so w-equality of
     the high 31 bits is key-equality and build rows (side=0) sort
     before probe rows within every key run. Keys >= 2^31 are refused
     (callers fall back to the carry lookup join).
  2. One 2-op block sort per payload word, one `bucket_exchange`
     (ops/exchange.py) on the top-5 mix bits, one batched per-cell
     final sort: every key's rows land contiguous, build first.
  3. Per-run fills (one multi-array doubling scan) broadcast the build
     payload to its probes; probe rows emit (probe_idx, value, hit)
     UNALIGNED — the engine's inner join materializes output rows in
     collocated order (join output order is unspecified, matching the
     reference's unordered parallel hash join,
     `polars-ops/src/frame/join/hash_join/`).

Reference analogue: `polars-expr/src/idx_table/mod.rs` probe +
`polars-stream/src/nodes/joins/equi_join.rs` partitioned build/probe.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .exchange import CAP, K, S, bucket_exchange

_M31 = (1 << 31) - 1
# odd multipliers are units mod 2^31; xorshift x ^= x >> k is an
# involution-free invertible map on 31 bits for k >= 1
_C1 = 0x65EBCA6B   # odd
_C2 = 0x42B2AE35   # odd


def mix31(x):
    """Bijective mixer on [0, 2^31): h-equality == key-equality."""
    x = x & jnp.uint32(_M31)
    x = (x ^ (x >> 16)) & jnp.uint32(_M31)
    x = (x * jnp.uint32(_C1)) & jnp.uint32(_M31)
    x = (x ^ (x >> 13)) & jnp.uint32(_M31)
    x = (x * jnp.uint32(_C2)) & jnp.uint32(_M31)
    x = (x ^ (x >> 16)) & jnp.uint32(_M31)
    return x


_C1_INV = pow(_C1, -1, 1 << 31)
_C2_INV = pow(_C2, -1, 1 << 31)


def mix31_inv(h):
    h = h & jnp.uint32(_M31)
    h = (h ^ (h >> 16)) & jnp.uint32(_M31)
    h = (h * jnp.uint32(_C2_INV)) & jnp.uint32(_M31)
    h = (h ^ (h >> 13) ^ (h >> 26)) & jnp.uint32(_M31)
    h = (h * jnp.uint32(_C1_INV)) & jnp.uint32(_M31)
    h = (h ^ (h >> 16)) & jnp.uint32(_M31)
    return h


_FILL = 0xFFFFFFFF


def collocate(bkey, pkey, bwords: Sequence[jax.Array],
              pwords: Sequence[jax.Array], bvalid=None, pvalid=None,
              fused_pay: Tuple = None):
    """Collocate build and probe rows by 31-bit key.

    bwords/pwords: u32 payload words per side (same count each side is
    NOT required — they are carried independently and re-emitted).
    fused_pay=(bw, pw): ONE carried word taking bw at build rows and pw
    at probe rows (sides are disjoint) — the cheapest transport for
    one-word-per-side payloads.
    Returns (wfin (K, L) fused sorted word, payload list [(K, L)] —
    fused word first if present, then build words, then probe words —
    plus `ok`). Slots with wfin == _FILL are pads. Per key: build rows
    first.
    """
    nb, npr = bkey.shape[0], pkey.shape[0]
    n = nb + npr
    B = -(-n // S)
    npad = B * S
    hb = mix31(bkey.astype(jnp.uint32))
    hp = mix31(pkey.astype(jnp.uint32))
    wb = hb << jnp.uint32(1)
    wp = (hp << jnp.uint32(1)) | jnp.uint32(1)
    bk31 = bkey.astype(jnp.uint32) > jnp.uint32(_M31)
    pk31 = pkey.astype(jnp.uint32) > jnp.uint32(_M31)
    if bvalid is not None:
        wb = jnp.where(bvalid, wb, jnp.uint32(_FILL))
        bk31 = bk31 & bvalid
    if pvalid is not None:
        wp = jnp.where(pvalid, wp, jnp.uint32(_FILL))
        pk31 = pk31 & pvalid
    w = jnp.concatenate([wb, wp])
    badk = jnp.any(bk31) | jnp.any(pk31)
    if npad != n:
        w = jnp.concatenate([w, jnp.full(npad - n, jnp.uint32(_FILL))])
    digit = (w >> jnp.uint32(27)).astype(jnp.int32)
    live = w != jnp.uint32(_FILL)
    oh = (digit.reshape(B, S, 1) ==
          jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
    counts = jnp.sum(oh & live.reshape(B, S, 1), axis=1, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(counts, axis=1)[:, :-1]],
        axis=1)
    ok = (jnp.max(counts) <= CAP) & ~badk

    payloads = []
    if fused_pay is not None:
        pairs = [fused_pay] if isinstance(fused_pay, tuple) else \
            list(fused_pay)
        for bw_, pw_ in pairs:
            payloads.append(jnp.concatenate(
                [bw_, pw_, jnp.zeros(npad - n, jnp.uint32)]))
    for x in list(bwords):
        payloads.append(jnp.concatenate(
            [x, jnp.zeros(npr + npad - n, jnp.uint32)]))
    for x in list(pwords):
        payloads.append(jnp.concatenate(
            [jnp.zeros(nb, jnp.uint32), x,
             jnp.zeros(npad - n, jnp.uint32)]))

    w2 = w.reshape(B, S)
    sorted_pay = []
    ws = None
    for p in payloads:
        o = jax.lax.sort((w2, p.reshape(B, S)), dimension=1, num_keys=1,
                         is_stable=False)
        ws = o[0]
        sorted_pay.append(o[1].reshape(-1))
    if ws is None:
        ws = jax.lax.sort((w2,), dimension=1, num_keys=1,
                          is_stable=False)[0]
    ex = bucket_exchange(starts, counts, [ws.reshape(-1)] + sorted_pay,
                         fills=(_FILL,) + (0,) * len(sorted_pay))
    wx = ex[0]
    px = ex[1:]
    outs = []
    wfin = None
    for p in px:
        o = jax.lax.sort((wx, p), dimension=1, num_keys=1,
                         is_stable=False)
        wfin = o[0]
        outs.append(o[1])
    if wfin is None:
        wfin = jax.lax.sort((wx,), dimension=1, num_keys=1,
                            is_stable=False)[0]
    return wfin, outs, ok


_FILL_STEPS = 8          # ladder fill reaches runs up to 2^8 rows


def run_fill(wfin, sources: Sequence[jax.Array]):
    """Broadcast each run's FIRST-row source word to the whole run (the
    m:1 build payload fill: build rows sort first within their key run).
    Returns (filled sources, run_has_build (K, L) bool, fill_ok bool).

    hit-ness is EXACT via one native `cummax(first_build ? rid+1 : 0)`
    (rid is monotone, so the latest build-run id at-or-before each row
    falls out of a single optimized XLA scan instead of 23 manual
    doubling passes). The value broadcast is two-tier: a doubling
    ladder TRUNCATED at 2^_FILL_STEPS rows (measured 3.4 ms standalone
    at the bench join shape vs 11.9 for the exact u64-cummax fill —
    tools/join_fill_probe.py), then a `lax.cond` upgrade to the exact
    cummax fill ONLY when some run outran the ladder — so a skewed
    probe side (hot key with >256 probe rows) costs one extra scan
    instead of demoting the whole join to the fallback path.
    ``fill_ok`` is therefore always True here; it is kept in the
    signature for callers that fold it into their own `ok`."""
    Kc, L = wfin.shape
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    h = wfin >> jnp.uint32(1)
    prev = jnp.concatenate([h[:, :1], h[:, :-1]], axis=1)
    flag = (h != prev) | (col == 0)
    rid = jnp.cumsum(flag.astype(jnp.int32), axis=1)     # 1-based, per cell
    is_build = ((wfin & jnp.uint32(1)) == 0) & \
        (wfin != jnp.uint32(_FILL))
    first_build = flag & is_build
    g = jax.lax.cummax(jnp.where(first_build, rid, 0), axis=1)
    has_build = g == rid
    # tier 1: truncated per-cell doubling OR-broadcast of the sources
    filled = [jnp.where(first_build, s, 0) for s in sources]
    reached = first_build
    k = 1
    for _ in range(_FILL_STEPS):
        if k >= L:
            break
        rs = jnp.roll(rid, k, axis=1)
        ok_ = (rs == rid) & (col >= k)
        filled = [jnp.where(ok_, f | jnp.roll(f, k, axis=1), f)
                  for f in filled]
        reached = reached | (ok_ & jnp.roll(reached, k, axis=1))
        k <<= 1
    ladder_ok = ~jnp.any(has_build & ~reached)

    # tier 2: exact fill for arbitrarily long runs — one emulated-u64
    # cummax per source of (rid << 32 | word) packed at the run's build
    # row (m:1 => at most one nonzero pack per run, so the running max
    # carries exactly that run's word while its rid is current)
    def _exact(_):
        rid64 = rid.astype(jnp.uint64) << jnp.uint64(32)
        out = []
        for s in sources:
            pack = jnp.where(first_build,
                             rid64 | s.astype(jnp.uint64), jnp.uint64(0))
            gm = jax.lax.cummax(pack, axis=1)
            out.append(jnp.where(
                (gm >> jnp.uint64(32)).astype(jnp.int32) == rid,
                gm.astype(jnp.uint32), jnp.uint32(0)))
        return tuple(out)

    filled = list(jax.lax.cond(ladder_ok, lambda _: tuple(filled),
                               _exact, None))
    return filled, has_build, jnp.bool_(True)


def lookup_join_collocated(bkey, bval, pkey):
    """Drop-in helper with the lookup_join_sorted CONTRACT relaxed:
    returns (pidx (M,), value (M,), hit (M,), live (M,), ok) —
    probe rows in collocated (unaligned) order; `live` marks probe
    slots. ok=False -> caller must use the fallback path.

    Build and probe rows are disjoint, so ONE payload word carries both
    sides (vbits at build rows, probe index at probe rows) — every
    pipeline stage (block sort, exchange, final cell sort) runs once."""
    npr = pkey.shape[0]
    vbits = jax.lax.bitcast_convert_type(bval.astype(jnp.float32),
                                         jnp.uint32)
    pidx = jnp.arange(npr, dtype=jnp.uint32)
    wfin, outs, ok = collocate(bkey, pkey, [], [],
                               fused_pay=(vbits, pidx))
    (filled_v,), has_build, fill_ok = run_fill(wfin, [outs[0]])
    is_probe = ((wfin & jnp.uint32(1)) == 1) & (wfin != jnp.uint32(_FILL))
    value = jax.lax.bitcast_convert_type(filled_v, jnp.float32)
    return (outs[0].reshape(-1), value.reshape(-1),
            (has_build & is_probe).reshape(-1), is_probe.reshape(-1),
            ok & fill_ok)


# ---------------------------------------------------------------------------
# engine-level collocated join (inner / left, single-word 31-bit keys)
# ---------------------------------------------------------------------------

_JOIN_JIT_CACHE: dict = {}


def collocated_join(left, right, left_on, right_on, how: str, suffix: str,
                    coalesce: bool, lv, rv, lmask, rmask):
    """Inner/left join emitting output rows in COLLOCATED order (join
    output order is unspecified, matching the reference's parallel hash
    join): every left column rides the exchange as a probe payload and
    every right column broadcast-fills from its key's build row — no
    writeback sort, no gathers, no host-synced count phase.

    Left/right payload words PAIR UP in shared transport slots (sides
    occupy disjoint rows), so the carried word count is max(Wl, Wr),
    not Wl + Wr. The whole pipeline runs as ONE cached jitted program —
    eager dispatch through the remote tunnel costs ~1-3 ms per op.

    Returns (Table, ok) — `ok` is a device scalar the caller must read
    ONCE; False means a correctness hazard (>31-bit key, bucket
    overflow, duplicate right keys [not m:1]) and the table is garbage.
    Fill depth is no longer a hazard: run_fill upgrades to the exact
    cummax fill in-kernel for >2^8-row skew runs. Returns None when
    statically ineligible."""
    from .keycode import col_to_u32_words, col_from_u32_words
    from ..batch import Column, Table, storage_numpy_dtype
    if how not in ("inner", "left") or len(lv) != 1:
        return None
    if any(c.lengths is not None or c.fields is not None
           for c in list(left.cols.values()) + list(right.cols.values())):
        return None
    capL, capR = left.capacity, right.capacity

    # 8-byte int keys ride as ONE offset u32 word when the live range
    # fits 31 bits (r4 refused them: two extra i64 payload words + the
    # `ok` readback RTT measured 174 vs 89 ms e2e; both costs are now
    # gone — the key column itself is reconstructed from the offset
    # word, and join.py memoizes the readback by input identity)
    key_base = 0
    if lv[0].data.dtype.itemsize == 8 and \
            jnp.issubdtype(lv[0].data.dtype, jnp.integer) and \
            rv[0].data.dtype.itemsize == 8 and \
            jnp.issubdtype(rv[0].data.dtype, jnp.integer):
        from .join import _int_key_stats
        lmn, lmx = _int_key_stats(left, left_on[0] if left_on else None,
                                  lv[0], lmask, capL)
        rmn, rmx = _int_key_stats(right, right_on[0] if right_on else None,
                                  rv[0], rmask, capR)
        mn, mx = min(lmn, rmn), max(lmx, rmx)
        if mn < 0 or mx > _M31:
            if mx - mn > _M31:
                return None  # range provably too wide for 31-bit mixing
            key_base = mn

    def key_data(v, cap):
        # raw-bits key word: equality joins need bijectivity only, not
        # order preservation (the order-preserving encode flips the
        # sign bit, pushing every non-negative int past the 31-bit
        # limit). Keys whose live values exceed base + 2^31-1 are
        # refused at runtime (range check in `core` folds into `ok`).
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        if data.dtype.itemsize == 4:
            return data
        if data.dtype.itemsize == 8 and \
                jnp.issubdtype(data.dtype, jnp.integer):
            return data
        return None

    pk = key_data(lv[0], capL)
    bk = key_data(rv[0], capR)
    if pk is None or bk is None:
        return None

    def side_words(t, skip, key_name):
        words, layout = [], []
        for n in t.names:
            if n in skip:
                continue
            c = t.cols[n]
            enc = None
            if n == key_name and c.data is not None \
                    and c.data.dtype.itemsize == 8 \
                    and jnp.issubdtype(c.data.dtype, jnp.integer):
                # the join key itself: one offset word instead of two
                # raw words — values are known 31-bit (range check folds
                # into `ok`), and the original column rebuilds as
                # base + word
                ws = [(c.data - c.data.dtype.type(key_base))
                      .astype(jnp.uint32)]
                enc = "off64"
            else:
                ws = col_to_u32_words(c.data)
            hasv = c.validity is not None
            if hasv:
                ws.append(c.validity.astype(jnp.uint32))
            layout.append((n, c, len(ws) - int(hasv), hasv, enc))
            words.extend(ws)
        return words, layout

    lwords, llay = side_words(left, set(), left_on[0] if left_on else None)
    rskip = set(right_on) if coalesce else set()
    rwords, rlay = side_words(right, rskip,
                              right_on[0] if right_on else None)

    # output naming (static); bail on unresolvable collisions
    names = []
    out_specs = []       # (side, layout-entry)
    seen = set()
    for n, c, nw, hasv, enc in llay:
        names.append(n); seen.add(n)
        out_specs.append(("l", n, c, nw, hasv, enc))
    for n, c, nw, hasv, enc in rlay:
        name = n if n not in seen else f"{n}{suffix}"
        if name in seen:
            return None
        names.append(name); seen.add(name)
        out_specs.append(("r", n, c, nw, hasv, enc))

    NL, NR = len(lwords), len(rwords)
    lkey_f = bool(jnp.issubdtype(pk.dtype, jnp.floating))
    rkey_f = bool(jnp.issubdtype(bk.dtype, jnp.floating))
    sig = ("cj", how, capL, capR, NL, NR, lkey_f, rkey_f, key_base,
           str(pk.dtype), str(bk.dtype),
           tuple((s, nw, hasv, enc, str(storage_numpy_dtype(c.dtype)))
                 for s, n, c, nw, hasv, enc in out_specs))
    jf = _JOIN_JIT_CACHE.get(sig)
    if jf is None:
        llay_s = [(nw, hasv, str(storage_numpy_dtype(c.dtype)), enc)
                  for n, c, nw, hasv, enc in llay]
        rlay_s = [(nw, hasv, str(storage_numpy_dtype(c.dtype)), enc)
                  for n, c, nw, hasv, enc in rlay]

        def core(bk, pk, lmask, rmask, *words):
            import numpy as _np
            ok_keys = jnp.bool_(True)

            def int_key_word(k, mask):
                # 8-byte int keys: range-check BEFORE truncation (a
                # truncated alias would silently pass collocate's
                # 31-bit check); key_base shifts stat-bounded live
                # ranges (negative / large keys) into the 31-bit window
                nonlocal ok_keys
                if k.dtype.itemsize == 8:
                    b = k.dtype.type(key_base)
                    bad = mask & ((k < b) | (k - b > k.dtype.type(_M31)))
                    ok_keys = ok_keys & ~jnp.any(bad)
                    return (k - b).astype(jnp.uint32)
                return k.astype(jnp.uint32)

            if rkey_f:
                bk2 = jnp.where(bk == 0, jnp.zeros_like(bk), bk)
                bw_ = jax.lax.bitcast_convert_type(bk2, jnp.uint32)
            else:
                bw_ = int_key_word(bk, rmask)
            if lkey_f:
                pk2 = jnp.where(pk == 0, jnp.zeros_like(pk), pk)
                pw_ = jax.lax.bitcast_convert_type(pk2, jnp.uint32)
            else:
                pw_ = int_key_word(pk, lmask)
            lws = list(words[:NL])
            rws = list(words[NL:])
            nf = min(NL, NR)
            pairs = [(rws[i], lws[i]) for i in range(nf)]
            bonly = rws[nf:]
            ponly = lws[nf:]
            wfin, outs, ok = collocate(bw_, pw_, bonly, ponly,
                                       bvalid=rmask, pvalid=lmask,
                                       fused_pay=pairs or None)
            ok = ok & ok_keys
            b_tr = list(outs[:nf]) + list(outs[nf:nf + len(bonly)])
            p_tr = list(outs[:nf]) + list(outs[nf + len(bonly):])

            is_build = ((wfin & jnp.uint32(1)) == 0) & \
                (wfin != jnp.uint32(_FILL))
            is_probe = ((wfin & jnp.uint32(1)) == 1) & \
                (wfin != jnp.uint32(_FILL))
            h = wfin >> jnp.uint32(1)
            prevh = jnp.concatenate([h[:, :1], h[:, :-1]], axis=1)
            prevb = jnp.concatenate([jnp.zeros_like(is_build[:, :1]),
                                     is_build[:, :-1]], axis=1)
            ok = ok & ~jnp.any(is_build & prevb & (h == prevh))

            filled, has_build, fill_ok = run_fill(wfin, b_tr)
            ok = ok & fill_ok
            hit_flat = (has_build & is_probe).reshape(-1)
            is_probe_f = is_probe.reshape(-1)

            def decode_words(ws, stor, enc):
                if enc == "off64":
                    d = ws[0].astype(jnp.int64) + jnp.int64(key_base)
                    return d.astype(_np.dtype(stor))
                return col_from_u32_words(ws, _np.dtype(stor))

            datas, valids = [], []
            wi = 0
            for nw, hasv, stor, enc in llay_s:
                ws = [p_tr[wi + j].reshape(-1) for j in range(nw)]
                datas.append(decode_words(ws, stor, enc))
                if hasv:
                    valids.append((p_tr[wi + nw].reshape(-1) != 0) &
                                  is_probe_f)
                else:
                    valids.append(None)
                wi += nw + int(hasv)
            wi = 0
            for nw, hasv, stor, enc in rlay_s:
                ws = [filled[wi + j].reshape(-1) for j in range(nw)]
                datas.append(decode_words(ws, stor, enc))
                if hasv:
                    valids.append(hit_flat &
                                  (filled[wi + nw].reshape(-1) != 0))
                else:
                    valids.append(hit_flat)
                wi += nw + int(hasv)
            out_valid = is_probe_f & hit_flat if how == "inner" \
                else is_probe_f
            return (ok, out_valid, tuple(datas),
                    tuple(v for v in valids if v is not None))

        jf = jax.jit(core)
        _JOIN_JIT_CACHE[sig] = jf
        if len(_JOIN_JIT_CACHE) > 256:
            _JOIN_JIT_CACHE.pop(next(iter(_JOIN_JIT_CACHE)))

    ok, out_valid, datas, valids_flat = jf(bk, pk, lmask, rmask,
                                           *(lwords + rwords))
    vi = 0
    cols = {}
    M = out_valid.shape[0]
    side_iter = list(zip(names, out_specs))
    for (name, (s, n, c, nw, hasv, enc)), data in zip(side_iter, datas):
        validity = None
        if hasv or s == "r":
            validity = valids_flat[vi]
            vi += 1
        cols[name] = Column(c.dtype, data, validity, c.sdict)
    out = Table(names, cols, M, None, out_valid)
    from .join import _propagate_join_stats
    _propagate_join_stats(out, left, right, suffix)
    return out, ok
