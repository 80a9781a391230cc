"""Probe 2: u64 fused-operand sorts, vmapped searchsorted, and
sortedness-exploiting variants — refining the sample-sort cost model."""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

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


def main():
    d = {}
    n = 1 << 23
    rng = np.random.default_rng(0)
    w64 = [jnp.asarray(rng.integers(0, 1 << 63, n, dtype=np.uint64))
           for _ in range(2)]
    w32 = [jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                       .astype(np.uint32)) for _ in range(3)]
    _sync(w64[-1]); _sync(w32[-1])

    def phase(name, fn, args, iters=10):
        try:
            t = bench(jax.jit(fn), args, iters=iters)
            d[name] = round(t * 1e3, 3)
        except Exception as e:
            d[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, d[name], flush=True)

    # u64 fused single-operand sorts
    phase("mono_sort_u64_1op",
          lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False),
          (w64[0],), iters=5)
    phase("mono_sort_u64_2op",
          lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
          tuple(w64), iters=5)
    phase("mono_sort_u64key_u32pay",
          lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
          (w64[0], w32[0]), iters=5)
    for S in (4096, 8192, 16384):
        B = n // S
        phase(f"blk_sort_u64_1op_S{S}",
              lambda a, B=B, S=S: jax.lax.sort(
                  (a.reshape(B, S),), dimension=1, num_keys=1,
                  is_stable=False),
              (w64[0],))
    phase("blk_sort_u64_u32_S8192",
          lambda a, b: jax.lax.sort(
              (a.reshape(1024, 8192), b.reshape(1024, 8192)),
              dimension=1, num_keys=1, is_stable=False),
          (w64[0], w32[0]))
    # f64 fused sort (MXU/VPU native f64? probably same emulation)
    f64 = jnp.asarray(rng.random(n))
    phase("blk_sort_f64_1op_S8192",
          lambda a: jax.lax.sort((a.reshape(1024, 8192),), dimension=1,
                                 num_keys=1, is_stable=False), (f64,))

    # vmapped searchsorted: B sorted runs x 64 splitter queries
    S = 8192
    B = n // S
    runs = jax.lax.sort((w32[0].reshape(B, S),), dimension=1,
                        num_keys=1, is_stable=False)[0]
    q = jnp.sort(jnp.asarray(
        rng.integers(0, 1 << 32, 1023, dtype=np.uint64).astype(np.uint32)))
    _sync(runs)
    phase("vmap_searchsorted_B1024_q1023",
          lambda r, qq: jax.vmap(lambda row: jnp.searchsorted(row, qq))(r),
          (runs, q))
    q63 = q[::16][:63]
    phase("vmap_searchsorted_B1024_q63",
          lambda r, qq: jax.vmap(lambda row: jnp.searchsorted(row, qq))(r),
          (runs, q63))

    # sortedness: does lax.sort run faster on nearly-sorted input?
    srt = jax.lax.sort((w32[0],), num_keys=1, is_stable=False)[0]
    _sync(srt)
    phase("mono_sort_u32_presorted_1op",
          lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False),
          (srt,), iters=5)
    phase("blk_sort_u32_1op_S8192",
          lambda a: jax.lax.sort((a.reshape(1024, 8192),), dimension=1,
                                 num_keys=1, is_stable=False),
          (w32[0],))

    # top-k per block (for H2O q8): lax.top_k on [4096, 2048]
    phase("topk2_blocks_4096x2048",
          lambda a: jax.lax.top_k(
              jax.lax.bitcast_convert_type(a, jnp.int32)
              .reshape(4096, 2048), 2),
          (w32[0],))

    # cummax/cumsum full-length segment scan (for sorted-segment aggs)
    phase("cumsum_8m_f32",
          lambda a: jnp.cumsum(a.astype(jnp.float32) * 1e-9), (w32[0],))

    print(json.dumps(d))


if __name__ == "__main__":
    main()
