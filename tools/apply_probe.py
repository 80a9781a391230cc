"""Final sort-design probe: mono 1-op sorts (u32/u64), in-VMEM
permutation apply (64-shifted-select vs transpose+lane-gather), width-128
batched sorts — the remaining unknowns for the r4 radix design."""
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
        d[name] = f"ERR {type(e).__name__}: {str(e)[:160]}"
    print(name, d[name], flush=True)


n = 1 << 23
rng = np.random.default_rng(0)
v = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
v2 = jnp.asarray(rng.integers(0, 1 << 31, n).astype(np.uint32))
v64 = jnp.asarray(rng.integers(0, 1 << 62, n).astype(np.uint64))
_sync(v); _sync(v64)

# ---- mono single-op sorts ----
phase("mono_sort_1op_u32",
      lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False), (v,), iters=5)
phase("mono_sort_1op_u64",
      lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False), (v64,),
      iters=5)
phase("mono_sort_u64key_u32carry",
      lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
      (v64, v2), iters=5)

# ---- width-128 batched fused sort ----
R = n // 128


def w128_fused(a):
    lane = jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1)
    b = (a.reshape(R, 128) >> jnp.uint32(25)) << jnp.uint32(7)  # 7-bit bucket
    h = b | lane
    hs = jax.lax.sort((h,), dimension=1, num_keys=1, is_stable=False)[0]
    return hs


phase("w128_fused_sort", w128_fused, (v,))


# ---- in-VMEM apply of an arbitrary 8192-perm ----
# source: block-local perm (values in [0, 8192)) laid out (64, 128).
# out[r, l] = x[p[r,l] >> 7, p[r,l] & 127]
def make_apply_select(n_words):
    S = 8192
    RB = S // 128

    def kern(p_ref, *refs):
        ins = refs[:n_words]
        outs = refs[n_words:]
        p = p_ref[:]
        srow = (p >> 7).astype(jnp.int32)
        slane = (p & 127).astype(jnp.int32)
        for w in range(n_words):
            x = ins[w][:]
            acc = jnp.zeros((RB, 128), x.dtype)
            for k in range(RB):
                rowk = jax.lax.dynamic_slice_in_dim(x, k, 1, 0)  # (1,128)
                rowb = jnp.broadcast_to(rowk, (RB, 128))
                g = jnp.take_along_axis(rowb, slane, axis=1)
                acc = jnp.where(srow == k, g, acc)
            outs[w][:] = acc

    B = n // S
    spec = pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(p, *words):
        return pl.pallas_call(
            kern, grid=(B,),
            in_specs=[spec] * (1 + n_words), out_specs=[spec] * n_words,
            out_shape=[jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32)
                       for _ in range(n_words)],
        )(p.reshape(n // 128, 128), *[w.reshape(n // 128, 128) for w in words])
    return f


perm_h = np.argsort(rng.random((n // 8192, 8192)), axis=1).astype(np.int32)
perm = jnp.asarray(perm_h.reshape(n // 128, 128))
_sync(perm)
phase("apply_select_1w", make_apply_select(1), (perm, v))
phase("apply_select_2w", make_apply_select(2), (perm, v, v2))


# ---- transpose + lane-gather column-perm building block ----
# column-perm: out[r, l] = x[q[r, l], l] where each column's q is a perm
# of 0..63, implemented as transpose -> lane gather -> transpose.
def colperm_kern(q_ref, x_ref, o_ref):
    xt = x_ref[:].T  # (128, 64)
    qt = q_ref[:].T.astype(jnp.int32)
    g = jnp.take_along_axis(xt, qt, axis=1)
    o_ref[:] = g.T


def make_colperm():
    S = 8192
    RB = S // 128
    B = n // S
    spec = pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def f(q, x):
        return pl.pallas_call(
            colperm_kern, grid=(B,),
            in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32),
        )(q.reshape(n // 128, 128), x.reshape(n // 128, 128))
    return f


q_h = np.argsort(rng.random((n // 8192, 64, 128)), axis=1).astype(np.int32)
q = jnp.asarray(q_h.reshape(n // 128, 128))
_sync(q)
phase("colperm_transpose_1w", make_colperm(), (q, v))

# ---- blk u64 fused S=131072 1-op ----
phase("blk_u64_1op_S131072",
      lambda a: jax.lax.sort((a.reshape(64, 131072),), dimension=1,
                             num_keys=1, is_stable=False)[0], (v64,))

# ---- stable mono 2-op for reference on SAME data ----
phase("mono_sort_2op_stable_ref",
      lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True),
      (v, v2), iters=5)

print(json.dumps(d))
