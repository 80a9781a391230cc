"""Pallas bucket exchange — the shuffle primitive of the wide group-by
(and the MSD partition machinery generally).

Each 8192-row block arrives sorted by a u32 word whose top ``LOG_K``
bits are the bucket digit, so a block's bucket-k rows form one
contiguous run [starts[b,k], starts[b,k]+counts[b,k]). The kernel
copies every run into a fixed-capacity padded cell of a [B, K, CAP]
layout (pad slots get a fill word that sorts to the tail of any later
block sort); an XLA transpose then makes each bucket contiguous:
[K, B*CAP]. Rows past a cell's capacity are NOT copied — the caller
must check ``counts.max() <= CAP`` and fall back (lax.cond) on
overflow, which keeps the kernel data-independent and the layout
static.

CAP = 384 = exactly 3 rows of 128 lanes, so every cell owns a disjoint
row-aligned output tile — one dynamic source-alignment lane roll
(verified on v5e) per cell, no read-modify-write staging anywhere.
The capacity is mean + 8 sigma of the per-(block, digit) binomial at
high group counts (320 = +4 sigma measurably overflowed ~60% of 8.4M-row
datasets across the 32k cells, silently demoting them to the fallback).

Reference analogue: `polars-expr/src/hash_keys.rs:263`
gen_idxs_per_partition + the in-process all-to-all of the streaming
group-by/join builds (SURVEY §2.3 item 3), reshaped as a
DMA-granularity-friendly padded exchange instead of per-row scatter.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_S = 13
S = 1 << LOG_S        # block rows
K = 32                # buckets per exchange round
CAP = 384             # cell capacity: mean 256 + 8 sigma; 3 full rows
_LANES = 128
_CROWS = CAP // _LANES             # rows per cell
_SRC_ROWS = S // _LANES + 8        # 72: block + 1024 pad elements
_OUT_ROWS = K * CAP // _LANES      # 96


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _aligned_run(in_ref, s, c, fill, lane3, j3):
    """(_CROWS, 128) tile holding elements [s, s+c) of the flat source
    block left-aligned; positions >= c carry `fill`."""
    r0 = s // jnp.int32(_LANES)
    sl = s % jnp.int32(_LANES)
    x = in_ref[pl.ds(r0, _CROWS + 1)]                 # (_CROWS+1, 128)
    xr = pltpu.roll(x, jnp.int32(_LANES) - sl, axis=1)
    a = jnp.where(lane3 < jnp.int32(_LANES) - sl,
                  xr[0:_CROWS], xr[1:_CROWS + 1])
    return jnp.where(j3 < c, a, fill)


def _exchange_kernel(sc_ref, *refs, n_words: int, fills: Sequence[int]):
    # sc_ref: flat (2*B*K,) i32 — starts then counts (1-D SMEM layout
    # avoids the 4x lane padding a (B, K) prefetch table gets)
    in_refs = refs[:n_words]
    out_refs = refs[n_words:]
    b = pl.program_id(0)
    nbk = sc_ref.shape[0] // 2
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (_CROWS, _LANES), 1)
    j3 = (jax.lax.broadcasted_iota(jnp.int32, (_CROWS, _LANES), 0) *
          jnp.int32(_LANES) + lane3)
    for w in range(n_words):
        fill = jnp.uint32(fills[w])
        tiles = []
        for k in range(K):
            s = sc_ref[b * K + k]
            c = jnp.minimum(sc_ref[nbk + b * K + k], jnp.int32(CAP))
            tiles.append(_aligned_run(in_refs[w], s, c, fill, lane3, j3))
        out_refs[w][:] = jnp.concatenate(tiles, axis=0)


@functools.partial(jax.jit, static_argnames=("fills",))
def bucket_exchange(starts: jax.Array, counts: jax.Array,
                    words: Sequence[jax.Array], fills: tuple
                    ) -> List[jax.Array]:
    """words: u32 arrays (B*S,), each block sorted so bucket runs are
    contiguous. starts/counts: (B, K) i32 run extents (live rows only).
    Returns [K, B*CAP]-shaped u32 arrays per word: bucket-major padded
    layout; pad slots hold fills[w]. Rows beyond CAP per cell are
    dropped — caller must cond-fallback when counts.max() > CAP."""
    n = words[0].shape[0]
    B = n // S
    padrows = _SRC_ROWS - S // _LANES
    arrs = []
    for w, fill in zip(words, fills):
        a = jnp.concatenate(
            [w.reshape(B, S),
             jnp.full((B, padrows * _LANES), jnp.uint32(fill))], axis=1)
        arrs.append(a.reshape(B * _SRC_ROWS, _LANES))
    sc = jnp.concatenate([starts.astype(jnp.int32).reshape(-1),
                          counts.astype(jnp.int32).reshape(-1)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((_SRC_ROWS, _LANES),
                               lambda b, sc_: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)
                  for _ in words],
        out_specs=[pl.BlockSpec((_OUT_ROWS, _LANES),
                                lambda b, sc_: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)
                   for _ in words],
    )
    outs = pl.pallas_call(
        functools.partial(_exchange_kernel, n_words=len(words),
                          fills=tuple(fills)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B * _OUT_ROWS, _LANES), jnp.uint32)
                   for _ in words],
        interpret=_interpret(),
    )(sc, *arrs)
    # [B, K*CAP] -> transpose -> [K, B*CAP]
    res = []
    for o in outs:
        t = o.reshape(B, K, CAP).transpose(1, 0, 2).reshape(K, B * CAP)
        res.append(t)
    return res
