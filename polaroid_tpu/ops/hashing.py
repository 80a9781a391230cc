"""Device-side hashing.

Capability analogue of the reference's hash infrastructure
(`polars-utils/src/hashing.rs`, `polars-expr/src/hash_keys.rs`): 32-bit
murmur-style finalizer hashes computed on the VPU, combined across key
columns, and partitioned by `hash % n` for shuffles (the
`HashPartitioner` analogue at `polars-utils/src/hashing.rs:72`).
All arithmetic is uint32 (native on TPU; wrap-around is modular).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar, NOT a jnp array: this module can be first imported inside
# a shard_map trace (lazy import in parallel/shuffle._hash_u64), and a
# module-level jnp constant created there is stamped with the trace's
# Manual-axis AbstractMesh — every later use then fails sharding
# propagation with "Mesh for all inputs should be equal".
GOLDEN = np.uint32(0x9E3779B9)


def _fmix32(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _to_u32_words(x):
    """Reinterpret an array as one or two uint32 word arrays."""
    dt = x.dtype
    if dt == jnp.bool_:
        return [x.astype(jnp.uint32)]
    if dt.itemsize <= 4:
        if jnp.issubdtype(dt, jnp.floating):
            # normalize -0.0 == 0.0 for hashing
            x = jnp.where(x == 0, jnp.zeros_like(x), x)
            u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
            return [u]
        return [x.astype(jnp.uint32)]
    # 64-bit: split into hi/lo words
    if jnp.issubdtype(dt, jnp.floating):
        x = jnp.where(x == 0, jnp.zeros_like(x), x)
        u = jax.lax.bitcast_convert_type(x, jnp.uint64)
    else:
        u = x.astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    return [hi, lo]


def hash_array(x, seed: int = 0):
    """uint32 hash of each element."""
    words = _to_u32_words(x)
    h = jnp.uint32(seed) ^ GOLDEN
    acc = None
    for w in words:
        hw = _fmix32(w ^ h)
        acc = hw if acc is None else combine_hashes(acc, hw)
    return acc


def combine_hashes(a, b):
    return a ^ (b + GOLDEN + (a << 6) + (a >> 2))


def hash_columns(arrays, validities, seed: int = 0):
    """Combined row hash over multiple key columns; nulls hash to a fixed
    tag so null == null groups together (polars join/group semantics)."""
    acc = None
    for arr, valid in zip(arrays, validities):
        h = hash_array(arr, seed)
        if valid is not None:
            h = jnp.where(valid, h, jnp.uint32(0xA5A5A5A5))
        acc = h if acc is None else combine_hashes(acc, h)
    return acc


def partition_of(h, num_partitions: int):
    """hash -> partition id in [0, num_partitions). Uses the high-bits
    multiply trick like the reference's HashPartitioner
    (`polars-utils/src/hashing.rs:72`) to avoid modulo bias/cost."""
    return ((h.astype(jnp.uint64) * jnp.uint64(num_partitions)) >> jnp.uint64(32)
            ).astype(jnp.uint32) if False else \
        jnp.remainder(h, jnp.uint32(num_partitions))
