"""Probe 3: dynamic_gather throughput (in-kernel and XLA), stable block
sorts, fused u64 block sorts — final inputs to the r4 sort design."""
import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)
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
        d[name] = f"ERR {type(e).__name__}: {str(e)[:160]}"
    print(name, d[name], flush=True)


n = 1 << 23
rng = np.random.default_rng(0)
v = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
v2 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
_sync(v); _sync(v2)


# ---- in-kernel per-column gather (axis=0), blocks (R, 128) ----
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


for R in (8, 64, 512, 2048):
    idx = jnp.asarray(
        rng.integers(0, R, n, dtype=np.int64).astype(np.int32))
    _sync(idx)
    phase(f"pallas_colgather_R{R}", make_colgather(R), (v, idx))

# ---- in-kernel per-row gather (axis=1) ----
def rowgather_kernel(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


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


lidx = jnp.asarray(rng.integers(0, 128, n, dtype=np.int64).astype(np.int32))
_sync(lidx)
phase("pallas_rowgather_R512", make_rowgather(512), (v, lidx))

# ---- XLA-level take_along_axis axis=0: [S, B] layout ----
for S, B in ((8192, 1024), (1024, 8192)):
    idx0 = jnp.asarray(
        np.argsort(rng.random((S, B)), axis=0).astype(np.int32))
    _sync(idx0)
    phase(f"xla_taa_axis0_{S}x{B}",
          lambda x, i, S=S, B=B: jnp.take_along_axis(
              x.reshape(S, B), i, axis=0),
          (v, idx0), iters=5)

# ---- XLA small-table take ----
tbl = jnp.asarray(rng.integers(0, 64, 2048, dtype=np.int64).astype(np.int32))
bigidx = jnp.asarray(rng.integers(0, 2048, n, dtype=np.int64).astype(np.int32))
_sync(tbl); _sync(bigidx)
phase("xla_take_tbl2048", lambda t, i: jnp.take(t, i), (tbl, bigidx), iters=5)
tbl2 = jnp.asarray(rng.integers(0, 1 << 31, 1 << 20, dtype=np.int64).astype(np.int32))
idx20 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int64).astype(np.int32))
_sync(tbl2); _sync(idx20)
phase("xla_take_tbl1m", lambda t, i: jnp.take(t, i), (tbl2, idx20), iters=3)

# ---- stable 2-op block sorts (the bench shape) ----
phase("blk_sort_2op_stable_S8192",
      lambda a, b: jax.lax.sort(
          (a.reshape(1024, 8192), b.reshape(1024, 8192)),
          dimension=1, num_keys=1, is_stable=True), (v, v2))
phase("mono_sort_2op_stable",
      lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True),
      (v, v2), iters=5)

# ---- u64 fused (key<<13|idx) block sort + unpack ----
def fused_sort(a):
    idx = jax.lax.broadcasted_iota(jnp.uint64, (1024, 8192), 1)
    h = (a.reshape(1024, 8192).astype(jnp.uint64) << jnp.uint64(13)) | idx
    hs = jax.lax.sort((h,), dimension=1, num_keys=1, is_stable=False)[0]
    return (hs >> jnp.uint64(13)).astype(jnp.uint32), \
        (hs & jnp.uint64(8191)).astype(jnp.int32)


phase("blk_fused_u64_sort_unpack", fused_sort, (v,))

print(json.dumps(d))
