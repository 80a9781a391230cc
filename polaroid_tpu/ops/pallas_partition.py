"""Pallas stable compaction (the filter kernel).

The engine compacts masked tables by carrying every column word through
one stable `lax.sort` on the dead flag (~34 ms at 8.4M x 3 cols on v5e —
a full comparison sort for what is a 1-bit partition). This module does
the partition in ~bandwidth time instead:

  1. batched `lax.sort` over (B, 8192) blocks on a single fused
     (dead<<13 | local_idx) u32 key — XLA's in-VMEM sort at its sweet
     spot (`tools/sort_probe2.py`: 6.3 ms for 4 operands, vs 29.9 for
     the same operands in one monolithic sort) — giving each block a
     stable live-prefix;
  2. ONE sequential-grid Pallas pass concatenates the live prefixes:
     block b DMAs its full S-row block to dynamic offset
     offs[b] = sum of live counts before b. Because offs[b] <= b*S and
     the TPU grid executes sequentially, block b+1's write starts
     exactly at offs[b] + live_b and overwrites block b's garbage tail —
     no dynamic-size DMA needed, and the output aliases the input
     (writes never touch unread blocks: offs[b] + S <= (b+1)*S).

Rows past the returned live count are garbage and must be masked dead
by the caller (the engine's masked-capacity contract).

Reference analogue: `polars-compute/src/filter/` — a memcpy-speed
filter; SURVEY §7 kernel-layer row ("filter/select via masked
compaction").
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = 8192  # rows per block (fits the combined key's 13 index bits)


def use_partition_kernel() -> bool:
    if os.environ.get("PT_PARTITION", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _concat_kernel(offs_ref, *refs, n_ops: int):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:n_ops * 2]
    sem = refs[-1]
    b = pl.program_id(0)
    off = offs_ref[b]
    for w in range(n_ops):
        pltpu.make_async_copy(
            in_refs[w],
            out_refs[w].at[pl.ds(off, _S)],
            sem.at[w],
        ).start()
    # wait before the next grid step: step b+1 overwrites this block's
    # garbage tail, so its writes must not overtake ours
    for w in range(n_ops):
        pltpu.make_async_copy(in_refs[w], out_refs[w].at[pl.ds(off, _S)],
                              sem.at[w]).wait()


@functools.partial(jax.jit, static_argnames=("n_ops",))
def _prefix_concat(offs, *words, n_ops: int):
    n = words[0].shape[0]
    B = n // _S
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((_S,), lambda b, offs: (b,),
                               memory_space=pltpu.VMEM)
                  for _ in range(n_ops)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)
                   for _ in range(n_ops)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_ops,))],
    )
    return pl.pallas_call(
        functools.partial(_concat_kernel, n_ops=n_ops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n,), w.dtype) for w in words],
        input_output_aliases={i + 1: i for i in range(n_ops)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(offs, *words)


def compact_words(mask: jax.Array, words: List[jax.Array]
                  ) -> Optional[Tuple[List[jax.Array], jax.Array]]:
    """Stable-compact `words` so rows where mask is True form a prefix
    (original order preserved); tail rows are garbage. Returns
    (compacted words, live count) or None when the shape doesn't fit
    the kernel (caller falls back to the carry sort)."""
    n = mask.shape[0]
    if n % _S != 0 or n < 2 * _S:
        return None
    B = n // _S
    lidx = jax.lax.broadcasted_iota(jnp.uint32, (B, _S), 1)
    key = jnp.where(mask.reshape(B, _S), jnp.uint32(0),
                    jnp.uint32(1) << jnp.uint32(13)) | lidx
    ops = (key,) + tuple(w.reshape(B, _S) for w in words)
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1,
                              is_stable=False)
    counts = jnp.sum(mask.reshape(B, _S), axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    flat = [o.reshape(n) for o in sorted_ops[1:]]
    outs = _prefix_concat(offs, *flat, n_ops=len(flat))
    return list(outs), jnp.sum(counts)
