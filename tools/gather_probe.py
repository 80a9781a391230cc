"""Pallas in-VMEM gather throughput (u32, no x64): per-column (axis=0),
per-row lane gather (axis=1), and flat within-block gather — decides
whether the radix scatter can apply block-local permutations in VMEM."""
import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PT_JAX_CACHE", "/tmp/pt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def bench(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    _sync(outs[0])
    fetch = time.perf_counter() - t1
    return max((total - fetch) / iters, 1e-9)


d = {}


def phase(name, fn, args, iters=10):
    try:
        t = bench(jax.jit(fn), args, iters=iters)
        d[name] = round(t * 1e3, 3)
    except Exception as e:
        d[name] = f"ERR {type(e).__name__}: {str(e)[:200]}"
    print(name, d[name], flush=True)


n = 1 << 23
rng = np.random.default_rng(0)
v = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
_sync(v)


# ---- in-kernel per-column gather (axis=0): out[r, l] = x[idx[r, l], l]
def colgather_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)


def make_colgather(R):
    rows = n // 128
    grid = (rows // R,)
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, idx):
        return pl.pallas_call(
            colgather_kernel, grid=grid,
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), x.dtype),
        )(x.reshape(rows, 128), idx.reshape(rows, 128))
    return f


for R in (64, 512):
    idx = jnp.asarray(rng.integers(0, R, n).astype(np.int32))
    _sync(idx)
    phase(f"pallas_colgather_R{R}", make_colgather(R), (v, idx))


# ---- in-kernel per-row gather (axis=1): out[r, l] = x[r, idx[r, l]]
def rowgather_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


lidx = jnp.asarray(rng.integers(0, 128, n).astype(np.int32))
_sync(lidx)


def make_rowgather(R):
    rows = n // 128
    grid = (rows // R,)
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, idx):
        return pl.pallas_call(
            rowgather_kernel, grid=grid,
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), x.dtype),
        )(x.reshape(rows, 128), idx.reshape(rows, 128))
    return f


phase("pallas_rowgather_R512", make_rowgather(512), (v, lidx))


# ---- in-kernel flat gather within an 8192 block:
# out[r, l] = x_flat[idx[r, l]] where idx in [0, 8192)
def flatgather_kernel(x_ref, i_ref, o_ref):
    R = x_ref.shape[0]
    x = x_ref[:]
    idx = i_ref[:]
    srow = idx >> 7
    slane = idx & 127
    rows = jnp.take_along_axis(x, srow, axis=0)  # wrong: needs 2d compose
    # compose: first gather the needed row per output element along
    # axis 0, then select the lane along axis 1
    o_ref[:] = jnp.take_along_axis(rows, slane, axis=1)


def make_flatgather(S):
    R = S // 128
    B = n // S
    grid = (B,)
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(x, idx):
        return pl.pallas_call(
            flatgather_kernel, grid=grid,
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n // 128, 128), x.dtype),
        )(x.reshape(n // 128, 128), idx.reshape(n // 128, 128))
    return f


fidx = jnp.asarray(rng.integers(0, 8192, n).astype(np.int32))
_sync(fidx)
phase("pallas_flatgather_S8192", make_flatgather(8192), (v, fidx))


# ---- XLA batched take_along_axis axis=1 (the blk_gather shape)
perm = jnp.asarray(
    np.argsort(rng.random((1024, 8192)), axis=1).astype(np.int32))
_sync(perm)
phase("xla_taa_axis1_1024x8192",
      lambda x, p: jnp.take_along_axis(x.reshape(1024, 8192), p, axis=1),
      (v, perm), iters=5)

# ---- fused u32 (bucket<<13|idx) single-op batched block sort
def fused_u32_sort(a):
    idx = jax.lax.broadcasted_iota(jnp.uint32, (1024, 8192), 1)
    bucket = a.reshape(1024, 8192) >> jnp.uint32(26)  # 6-bit bucket
    h = (bucket << jnp.uint32(13)) | idx
    hs = jax.lax.sort((h,), dimension=1, num_keys=1, is_stable=False)[0]
    return (hs >> jnp.uint32(13)), (hs & jnp.uint32(8191))


phase("blk_fused_u32_sort_unpack", fused_u32_sort, (v,))


# ---- 3-op batched block sort (key + 2 payload words)
v2 = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
v3 = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
_sync(v3)
phase("blk_sort_3op_S8192",
      lambda a, b, c: jax.lax.sort(
          (a.reshape(1024, 8192), b.reshape(1024, 8192),
           c.reshape(1024, 8192)), dimension=1, num_keys=1,
          is_stable=False), (v, v2, v3))

print(json.dumps(d))
