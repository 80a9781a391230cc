"""Hand-written Pallas TPU kernels for the hot aggregation paths.

The scanned one-hot formulation in `ops/groupby.py` is MXU-friendly but
pays for two structural costs: each (B, G) one-hot block round-trips
through HBM, and the dot's M dimension is the value count (1-2 rows), so
~98% of every MXU tile is padding. These kernels fix both:

* the one-hot never leaves VMEM (inputs are read from HBM exactly once);
* group ids are radix-factored as ``gid = hi * 128 + lo`` so the segment
  sum becomes ``A @ B`` with ``A[c*Ghi+h, i] = v[c,i] * [hi_i == h]`` and
  ``B[i, l] = [lo_i == l]`` — M = C*G/128 and N = 128 both land on real
  MXU lanes, cutting padded MACs ~8-24x for G in the dense-path range.

Capability analogue of the reference's grouped-reduction kernels
(`polars-expr/src/reduce/*.rs`, `polars-compute/src/`): per-batch
vectorized aggregation primitives, shaped for the MXU/VPU instead of
autovectorized CPU loops.

Used on the TPU backend only; everywhere else the fused-XLA formulations
in `ops/groupby.py` remain (they are optimal on CPU). Set ``PT_PALLAS=0``
to disable. Tests run these kernels in interpreter mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LO = 128          # radix: low digit = one MXU lane tile
_SUB = 1 << 10     # rows per inner sub-tile (lane dim of A, sublanes of B)
_BLK = 1 << 15     # rows per grid step (DMA granularity)


def use_pallas() -> bool:
    if os.environ.get("PT_PALLAS", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tiles(n: int) -> tuple[int, int]:
    """(block rows, sub-tile rows): sub divides blk, and padding n up to
    a blk multiple (see `_pad_rows`) makes the grid x inner loop cover
    every row."""
    sub = min(_SUB, _round_up(n, 128))
    blk = min(_BLK, _round_up(n, sub))
    return blk, sub


def _pad_rows(arrs, n, blk):
    """Pad row count up to a multiple of blk (non-power-of-two guard).
    Returns (padded arrays, padded n). Pad gid rows with -1 (no group)."""
    if n % blk == 0:
        return [a for a, _ in arrs], n
    pad = _round_up(n, blk) - n
    out = []
    for a, fill in arrs:
        shape = a.shape[:-1] + (pad,)
        out.append(jnp.concatenate(
            [a, jnp.full(shape, fill, a.dtype)], axis=-1))
    return out, n + pad


# --------------------------------------------------------------------------
# radix one-hot segment sum: out[c, g] = sum_i vals[c, i] * (gid[i] == g)
# --------------------------------------------------------------------------

def _seg_sum_kernel(gid_ref, vals_ref, out_ref, *, ghi: int, sub: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    C = vals_ref.shape[0]
    blk = gid_ref.shape[1]

    # static Python unroll: fori_loop lowers through scan whose hidden
    # counter is i64 under x64 mode, which Mosaic cannot legalize
    for j in range(blk // sub):
        base = j * sub
        g = gid_ref[0, pl.ds(base, sub)]
        hi = jax.lax.shift_right_arithmetic(g, jnp.int32(7))
        lo = jax.lax.bitwise_and(g, jnp.int32(_LO - 1))
        hieq = hi[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (ghi, sub), 0)                       # (ghi, sub)
        parts = [jnp.where(hieq, vals_ref[c, pl.ds(base, sub)][None, :],
                           jnp.float32(0)) for c in range(C)]
        a = parts[0] if C == 1 else jnp.concatenate(parts, axis=0)
        b = (lo[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (sub, _LO), 1)).astype(jnp.float32)  # (sub, 128)
        out_ref[:] += jax.lax.dot(
            a, b, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("G",))
def onehot_seg_sum(stacked: jax.Array, gid: jax.Array, G: int) -> jax.Array:
    """Per-group sums of C value rows on the MXU, one HBM pass.

    stacked: (C, n) f32 — rows already masked (dead rows zeroed).
    gid: (n,) int32 — group ids; ids outside [0, G) contribute nothing.
    Returns (C, G) f32.
    """
    C, n = stacked.shape
    ghi = _round_up(max(G, 1), _LO) // _LO
    blk, sub = _tiles(n)
    (gid, stacked), n = _pad_rows(
        [(gid.astype(jnp.int32), -1), (stacked, 0)], n, blk)
    out = pl.pallas_call(
        functools.partial(_seg_sum_kernel, ghi=ghi, sub=sub),
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, blk), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C * ghi, _LO), lambda i: (jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * ghi, _LO), jnp.float32),
        interpret=_interpret(),
    )(gid.reshape(1, n), stacked)
    return out.reshape(C, ghi * _LO)[:, :G]


# --------------------------------------------------------------------------
# masked segment min/max: out[g] = red_i { x[i] : gid[i] == g }
# --------------------------------------------------------------------------

def _seg_minmax_kernel(gid_ref, x_ref, out_ref, *, is_max: bool,
                       identity: float, gcols: int, sub: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, identity)

    blk = gid_ref.shape[1]

    for j in range(blk // sub):  # static unroll (see _seg_sum_kernel)
        base = j * sub
        g = gid_ref[0, pl.ds(base, sub)]
        x = x_ref[0, pl.ds(base, sub)]
        hit = g[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (sub, gcols), 1)
        m = jnp.where(hit, x[:, None], jnp.float32(identity))
        if is_max:
            out_ref[:] = jnp.maximum(out_ref[:],
                                     jnp.max(m, axis=0, keepdims=True))
        else:
            out_ref[:] = jnp.minimum(out_ref[:],
                                     jnp.min(m, axis=0, keepdims=True))


@functools.partial(jax.jit, static_argnames=("G", "is_max", "identity"))
def onehot_seg_minmax(x: jax.Array, gid: jax.Array, G: int, is_max: bool,
                      identity: float) -> jax.Array:
    """Per-group min/max of an f32 row in one HBM pass. Rows whose gid is
    outside [0, G) are ignored; empty groups return `identity`."""
    n = x.shape[0]
    Gp = _round_up(max(G, 1), _LO)
    blk, sub = _tiles(n)
    # keep the (sub, Gp) compare window under ~4MB
    while sub > 128 and sub * Gp * 4 > (4 << 20):
        sub //= 2
    (gid, x), n = _pad_rows(
        [(gid.astype(jnp.int32), -1), (x.astype(jnp.float32), 0)], n, blk)
    out = pl.pallas_call(
        functools.partial(_seg_minmax_kernel, is_max=is_max,
                          identity=identity, gcols=Gp, sub=sub),
        grid=(n // blk,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Gp), lambda i: (jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Gp), jnp.float32),
        interpret=_interpret(),
    )(gid.reshape(1, n), x.reshape(1, n))
    return out[0, :G]


# --------------------------------------------------------------------------
# radix one-hot gather: out[i] = table[gid[i]] (group results -> rows)
# --------------------------------------------------------------------------

def _gather_kernel(gid_ref, table_ref, out_ref, *, sub: int):
    blk = gid_ref.shape[1]
    ghi = table_ref.shape[0]

    for j in range(blk // sub):  # static unroll (see _seg_sum_kernel)
        base = j * sub
        g = gid_ref[0, pl.ds(base, sub)]
        hi = jax.lax.shift_right_arithmetic(g, jnp.int32(7))
        lo = jax.lax.bitwise_and(g, jnp.int32(_LO - 1))
        hioh = (hi[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (sub, ghi), 1)).astype(jnp.float32)   # (sub, ghi)
        rows = jax.lax.dot(
            hioh, table_ref[:],
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (sub, 128)
        loeq = lo[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (sub, _LO), 1)
        out_ref[0, pl.ds(base, sub)] = jnp.sum(
            jnp.where(loeq, rows, jnp.float32(0)), axis=1)


@jax.jit
def onehot_gather(table: jax.Array, gid: jax.Array) -> jax.Array:
    """Per-row lookup from a small (G,) f32 table via MXU one-hot matmul
    on the radix-hi digit; gid outside [0, G) reads 0."""
    G = table.shape[0]
    n = gid.shape[0]
    ghi = _round_up(max(G, 1), _LO) // _LO
    t2 = jnp.zeros(ghi * _LO, jnp.float32).at[:G].set(
        table.astype(jnp.float32)).reshape(ghi, _LO)
    blk, sub = _tiles(n)
    (gid,), np_ = _pad_rows([(gid.astype(jnp.int32), -1)], n, blk)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, sub=sub),
        grid=(np_ // blk,),
        in_specs=[
            pl.BlockSpec((1, blk), lambda i: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ghi, _LO), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (jnp.int32(0), i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.float32),
        interpret=_interpret(),
    )(gid.reshape(1, np_), t2)
    return out[0, :n]
