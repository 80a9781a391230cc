"""Hierarchical merge sort — the engine's TPU-native sort primitive.

Replaces XLA's monolithic `lax.sort` on the hot paths (the reference's
par_sort analogue, `polars-core/src/chunked_array/ops/sort/mod.rs:96`;
SURVEY §7 "Comparison par_sort → radix/merge sort" row). Measured on
v5e (tools/sort_probe.py, 2026-08-21): a full 8.4M-row 2-operand
`lax.sort` costs 21.7 ms, but the same data sorted in 8192-row blocks
costs 3.1 ms and one compare-exchange merge pass costs 0.4 ms — XLA's
sort is efficient only while a block fits VMEM. So:

  1. base: batched `lax.sort` over (B, 8192) blocks — XLA's in-VMEM
     sort at its sweet spot, directions alternated per block;
  2. in-VMEM merge: ONE Pallas pass per chunk of M rows fuses ALL
     bitonic merge levels 2*8192..M (the ~100 compare-exchange stages
     whose distance fits VMEM never touch HBM);
  3. cross-chunk levels: distance >= M stages are single fused XLA
     butterfly passes (bandwidth-bound), and each level's tail
     (distance < M) is again ONE Pallas in-VMEM cleanup pass.

The network is the alternating-direction bitonic network: every stage is
the same distance-d compare-exchange with a direction mask derived from
the element index — no reversals anywhere. Stability comes from
injecting the row index as a final key word (the combined key is then
distinct, making the bitonic network order-deterministic and the result
stable).

All operands are uint32 words (the engine's row-format, `keycode.py`);
payload words ride through every stage's select. Mosaic/v5e rules: no
64-bit scalars inside kernels — every literal is typed int32/uint32.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S0 = 8192          # base block rows (lax.sort sweet spot, measured)
_LANES = 128


def use_merge_sort() -> bool:
    """Default OFF: measured on v5e (2026-08-21) the per-level pass
    structure loses to XLA's sort (stable 2-op: 38.8 ms vs 21.6; W=6:
    85 vs 40) — the VMEM budget forces ~26 HBM passes and the chunk
    kernels run ~8x off bandwidth. Kept as an opt-in (PT_MERGESORT=1)
    until the strided multi-level fusion lands."""
    if os.environ.get("PT_MERGESORT", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _log2(x: int) -> int:
    return x.bit_length() - 1


def _chunk_rows(n: int, w: int) -> int:
    """VMEM chunk size: keep the resident chunk (w words x M rows x 4 B)
    around ~2-4 MB so the double-buffered pipeline fits comfortably."""
    if w <= 2:
        m = 1 << 18
    elif w <= 4:
        m = 1 << 17
    else:
        m = 1 << 16
    return min(m, n)


def _lex_gt(a: Sequence, b: Sequence, nk: int):
    """Lexicographic a > b over the first nk word lists."""
    gt = None
    for w in reversed(range(nk)):
        if gt is None:
            gt = a[w] > b[w]
        else:
            gt = (a[w] > b[w]) | ((a[w] == b[w]) & gt)
    return gt


# ---------------------------------------------------------------------------
# XLA stages (cross-chunk distances)
# ---------------------------------------------------------------------------

def _bfly_xla(ops: List[jax.Array], d: int, bit: int, nk: int
              ) -> List[jax.Array]:
    """One distance-d compare-exchange pass over the flat arrays; the
    direction of each 2d-subproblem is bit `bit` of its base index."""
    n = ops[0].shape[0]
    q = n // (2 * d)
    a = [o.reshape(q, 2, d)[:, 0] for o in ops]
    b = [o.reshape(q, 2, d)[:, 1] for o in ops]
    dirm = (((jnp.arange(q, dtype=jnp.uint32) * jnp.uint32(2 * d)) >>
             jnp.uint32(bit)) & jnp.uint32(1)) != 0
    swap = _lex_gt(a, b, nk) ^ dirm[:, None]
    out = []
    for ai, bi in zip(a, b):
        lo = jnp.where(swap, bi, ai)
        hi = jnp.where(swap, ai, bi)
        out.append(jnp.stack([lo, hi], axis=1).reshape(n))
    return out


def _base_alternating(ops: List[jax.Array], nk: int, s0: int
                      ) -> List[jax.Array]:
    """Sort s0-row blocks (batched lax.sort), directions alternating
    (even blocks ascending, odd descending) as the bitonic network
    requires of its base runs."""
    n = ops[0].shape[0]
    B = n // s0
    blk = [o.reshape(B, s0) for o in ops]
    blk = list(jax.lax.sort(tuple(blk), dimension=1, num_keys=nk,
                            is_stable=False))
    if B == 1:
        return [o.reshape(n) for o in blk]
    odd = (jnp.arange(B, dtype=jnp.uint32) & jnp.uint32(1)) != 0
    out = []
    for o in blk:
        out.append(jnp.where(odd[:, None], o[:, ::-1], o).reshape(n))
    return out


# ---------------------------------------------------------------------------
# Pallas in-VMEM stage kernel
# ---------------------------------------------------------------------------

def _stage_in_vmem(xs: List, d: int, bit: int, nk: int, pid_row):
    """Apply one distance-d compare-exchange to the chunk-resident
    (R, 128) word arrays. `pid_row` = global row index of the chunk's
    first row (traced scalar, int32)."""
    R = xs[0].shape[0]
    if d >= 8 * _LANES:
        # big sublane distances: pair-halves via a rank-4 reshape (one
        # compare per PAIR); dr >= 8 keeps Mosaic's (dr, 128) tiling
        # clean — smaller dr goes through the roll path below
        dr = d // _LANES
        q = R // (2 * dr)
        a4 = [x.reshape(q, 2, dr, _LANES) for x in xs]
        a = [v[:, 0] for v in a4]
        b = [v[:, 1] for v in a4]
        qi = jax.lax.broadcasted_iota(jnp.int32, (q, dr, _LANES), 0)
        # subproblem base row = pid_row + qi*2*dr; its element index is
        # row*128, so bit `bit` of the element index is bit (bit-7) of
        # the row (bit >= 8 whenever d >= 128)
        dirm = (((pid_row + qi * jnp.int32(2 * dr)) >>
                 jnp.int32(bit - 7)) & jnp.int32(1)) != 0
        swap = _lex_gt(a, b, nk) ^ dirm
        out = []
        for ai, bi in zip(a, b):
            lo = jnp.where(swap, bi, ai)
            hi = jnp.where(swap, ai, bi)
            out.append(jnp.stack([lo, hi], axis=1).reshape(R, _LANES))
        return out
    # roll stages: partner = pos XOR dist along sublanes (128 <= d <
    # 1024) or lanes (d < 128). pltpu.roll needs non-negative typed-i32
    # shifts (an untyped int traces as i64 under x64 mode and Mosaic's
    # dynamic_rotate verifier rejects it); roll by size-amt == roll
    # by -amt.
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    if d >= _LANES:
        amt, axis, size = d // _LANES, 0, R
        pos = row
    else:
        amt, axis, size = d, 1, _LANES
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    is_lo = (pos & jnp.int32(amt)) == 0
    partner = [jnp.where(is_lo,
                         pltpu.roll(x, jnp.int32(size - amt), axis=axis),
                         pltpu.roll(x, jnp.int32(amt), axis=axis))
               for x in xs]
    self_gt = _lex_gt(xs, partner, nk)
    partner_gt = _lex_gt(partner, xs, nk)
    # direction: bit of the element index; every level here has
    # 2s >= 2^14, so bit >= 8 and the mask is lane-invariant
    dirm = (((pid_row + row) >> jnp.int32(bit - 7)) & jnp.int32(1)) != 0
    keep_min = is_lo ^ dirm
    # boolean select via logic ops: jnp.where on i1 vectors lowers to an
    # i8->i1 trunc Mosaic cannot compile
    take_partner = (keep_min & self_gt) | (~keep_min & partner_gt)
    return [jnp.where(take_partner, p, x) for x, p in zip(xs, partner)]


def _chunk_kernel(*refs, stages: Tuple[Tuple[int, int], ...], nk: int,
                  n_ops: int):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:]
    R = in_refs[0].shape[0]
    pid_row = pl.program_id(0) * jnp.int32(R)
    xs = [r[:] for r in in_refs]
    for d, bit in stages:
        xs = _stage_in_vmem(xs, d, bit, nk, pid_row)
    for o, x in zip(out_refs, xs):
        o[:] = x


def _chunk_pass(ops: List[jax.Array], stages, nk: int, M: int
                ) -> List[jax.Array]:
    """One HBM pass applying all `stages` (each with distance < M) to
    every M-row chunk in VMEM."""
    n = ops[0].shape[0]
    R = M // _LANES
    grid = (n // M,)
    arrs = [o.reshape(n // _LANES, _LANES) for o in ops]
    # index_map literals must be typed i32: a bare 0 traces as i64 under
    # x64 mode and Mosaic cannot legalize the scalar return
    spec = pl.BlockSpec((R, _LANES), lambda i: (i, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chunk_kernel, stages=tuple(stages), nk=nk,
                          n_ops=len(ops)),
        grid=grid,
        in_specs=[spec] * len(ops),
        out_specs=[spec] * len(ops),
        out_shape=[jax.ShapeDtypeStruct((n // _LANES, _LANES), o.dtype)
                   for o in arrs],
        # in-place chunks: without aliasing the in+out buffer pair
        # (x pipeline double-buffering) blows the 16 MB VMEM budget
        input_output_aliases={i: i for i in range(len(ops))},
        interpret=_interpret(),
    )(*arrs)
    return [o.reshape(n) for o in out]


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def sort_ops(operands: Sequence[jax.Array], num_keys: int,
             is_stable: bool = True) -> List[jax.Array]:
    """Drop-in `lax.sort` replacement for equal-length 1-D operands.

    On TPU with power-of-two length >= 2^16, rides the hierarchical
    merge sort: key operands are mapped to order-preserving u32 words
    (`keycode.encode_orderable`), payloads bitcast to u32 words, and
    everything is decoded back after the sort. Anything else falls
    through to `lax.sort`.
    """
    n = operands[0].shape[0]
    if (not use_merge_sort()) or n < (1 << 16) or (n & (n - 1)):
        return list(jax.lax.sort(tuple(operands), num_keys=num_keys,
                                 is_stable=is_stable))
    from .keycode import (col_from_u32_words, col_to_u32_words,
                          decode_orderable, encode_orderable)
    words: List[jax.Array] = []
    layout = []  # (kind, dtype, n_words) per operand
    for i, o in enumerate(operands):
        if i < num_keys:
            u = encode_orderable(o)
            if u.dtype.itemsize == 8:
                words.append((u >> jnp.uint64(32)).astype(jnp.uint32))
                words.append((u & jnp.uint64(0xFFFFFFFF))
                             .astype(jnp.uint32))
                layout.append(("key", o.dtype, 2))
            else:
                words.append(u.astype(jnp.uint32))
                layout.append(("key", o.dtype, 1))
        else:
            ws = col_to_u32_words(o)
            words.extend(ws)
            layout.append(("pay", o.dtype, len(ws)))
    nk_words = sum(nw for kind, _, nw in layout if kind == "key")
    sorted_words = merge_sort_words(words, nk_words, stable=is_stable)
    out: List[jax.Array] = []
    wi = 0
    idx_off = 1 if is_stable else 0
    for kind, dt, nw in layout:
        ws = sorted_words[wi:wi + nw]
        # the injected stability index sits right after the key words
        if wi >= nk_words:
            ws = sorted_words[wi + idx_off:wi + idx_off + nw]
        wi += nw
        if kind == "key":
            if nw == 2:
                u = (ws[0].astype(jnp.uint64) << jnp.uint64(32)) | \
                    ws[1].astype(jnp.uint64)
            else:
                u = ws[0]
            out.append(decode_orderable(u, dt, False))
        else:
            from ..batch import storage_numpy_dtype
            out.append(col_from_u32_words(ws, jnp.dtype(dt)))
    return out


def merge_sort_words(operands: Sequence[jax.Array], num_keys: int,
                     stable: bool = True, use_pallas: bool = True
                     ) -> List[jax.Array]:
    """Sort uint32 word operands lexicographically by the first
    `num_keys` words; remaining operands ride along. Length must be a
    power of two (the engine's capacities are).

    stable=True injects the row index as a tiebreak key word (returned
    in the output, usable as the sort permutation at
    ``out[num_keys]``)."""
    ops = [o.astype(jnp.uint32) if o.dtype != jnp.uint32 else o
           for o in operands]
    n = ops[0].shape[0]
    if n & (n - 1):
        raise ValueError(f"merge_sort_words needs power-of-two length, "
                         f"got {n}")
    nk = num_keys
    if stable:
        idx = jnp.arange(n, dtype=jnp.uint32)
        ops = list(ops[:num_keys]) + [idx] + list(ops[num_keys:])
        nk = num_keys + 1
    s0 = min(_S0, n)
    ops = _base_alternating(ops, nk, s0)
    if n == s0:
        return ops
    M = _chunk_rows(n, len(ops))

    def apply_stages(ops, stages):
        if not stages:
            return ops
        if use_pallas:
            # one pallas_call per level: an unrolled many-level kernel
            # compiles for tens of minutes through the remote Mosaic
            # path; per-level kernels (<= 19 stages) compile in seconds
            # and recur across sizes, at the cost of one extra HBM pass
            # per level
            return _chunk_pass(ops, stages, nk, M)
        for d, bit in stages:
            ops = _bfly_xla(ops, d, bit, nk)
        return ops

    # in-chunk levels: 2s = 2*s0 .. M, one fused VMEM pass per level
    two_s = 2 * s0
    while two_s <= M:
        bit = _log2(two_s)
        stages = []
        d = two_s // 2
        while d >= 1:
            stages.append((d, bit))
            d //= 2
        ops = apply_stages(ops, stages)
        two_s *= 2
    # cross-chunk levels: 2s = 2M .. n
    two_s = 2 * M
    while two_s <= n:
        bit = _log2(two_s)
        d = two_s // 2
        while d >= M:
            ops = _bfly_xla(ops, d, bit, nk)
            d //= 2
        # tail: distances M/2 .. 1 in one in-VMEM pass
        stages = []
        dd = M // 2
        while dd >= 1:
            stages.append((dd, bit))
            dd //= 2
        ops = apply_stages(ops, stages)
        two_s *= 2
    return ops
