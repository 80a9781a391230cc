"""Probe the primitives of a sample-sort (MSD bucket sort) design:
block sorts at various widths, within-block gathers, padded transposes,
searchsorted bucketing — the cost model for the r4 radix/bucket sort."""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

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
    ws = [jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                      .astype(np.uint32)) for _ in range(4)]
    _sync(ws[-1])

    def phase(name, fn, args, iters=10):
        try:
            t = bench(jax.jit(fn), args, iters=iters)
            d[name] = round(t * 1e3, 3)
        except Exception as e:
            d[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, d[name], flush=True)

    # 1. monolithic sorts (baseline)
    for k in (2, 3):
        phase(f"mono_sort_{k}ops",
              lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False),
              ws[:k], iters=5)

    # 2. batched block sorts at various widths
    for S in (4096, 8192, 16384, 32768, 131072, 262144):
        B = n // S
        for k in (2, 3):
            phase(f"blk_sort_S{S}_{k}ops",
                  lambda *a: jax.lax.sort(
                      tuple(x.reshape(B, S) for x in a),
                      dimension=1, num_keys=1, is_stable=False),
                  ws[:k])

    # 3. within-block take_along_axis gather (random local permutation)
    S = 8192
    B = n // S
    perm = jnp.asarray(
        np.argsort(rng.random((B, S)), axis=1).astype(np.int32))
    _sync(perm)

    def blk_gather3(p, a, b, c):
        out = []
        for x in (a, b, c):
            out.append(jnp.take_along_axis(x.reshape(B, S), p, axis=1))
        return out
    phase("blk_gather_S8192_3ops", blk_gather3, (perm, *ws[:3]))

    # gather at larger index range (whole-bucket gather 131072)
    S2 = 131072
    B2 = n // S2
    perm2 = jnp.asarray(
        np.argsort(rng.random((B2, S2)), axis=1).astype(np.int32))
    _sync(perm2)

    def blk_gather3b(p, a, b, c):
        return [jnp.take_along_axis(x.reshape(B2, S2), p, axis=1)
                for x in (a, b, c)]
    phase("blk_gather_S131072_3ops", blk_gather3b, (perm2, *ws[:3]))

    # 4. padded transpose [B, K, cap] -> [K, B, cap]
    for K, cap in ((64, 160), (32, 320), (128, 96)):
        def tr(a, b, c, K=K, cap=cap):
            out = []
            for x in (a, b, c):
                y = jnp.resize(x, (B * K * cap,)).reshape(B, K, cap)
                out.append(jnp.transpose(y, (1, 0, 2)).reshape(K, B * cap))
            return out
        phase(f"pad_transpose_K{K}cap{cap}_3ops", tr, ws[:3])

    # 5. searchsorted bucketing: 8.4M keys vs 2047 splitters
    spl = jnp.sort(jnp.asarray(
        rng.integers(0, 1 << 32, 2047, dtype=np.uint64).astype(np.uint32)))
    _sync(spl)
    phase("searchsorted_2047", lambda s, x: jnp.searchsorted(s, x), (spl, ws[0]))
    spl2 = jnp.sort(jnp.asarray(
        rng.integers(0, 1 << 32, 63, dtype=np.uint64).astype(np.uint32)))
    phase("searchsorted_63", lambda s, x: jnp.searchsorted(s, x), (spl2, ws[0]))

    # 6. global random gather (calibration)
    gidx = jnp.asarray(rng.permutation(n).astype(np.int32))
    _sync(gidx)
    phase("global_gather_1op", lambda i, x: jnp.take(x, i), (gidx, ws[0]), iters=3)

    # 7. pure copy (bandwidth reference)
    phase("copy_3ops", lambda a, b, c: [a + 1, b + 1, c + 1], ws[:3])

    # 8. cumsum over [B, K] counts (tiny) + full-array where/select pass
    cnt = jnp.ones((B, 64), jnp.int32)
    phase("counts_cumsum", lambda c: jnp.cumsum(c.reshape(-1)), (cnt,))

    print(json.dumps(d))


if __name__ == "__main__":
    main()
