"""Measure merge_sort_words vs lax.sort on the TPU."""
import json
import os
import sys
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

from polaroid_tpu.ops.merge_sort import merge_sort_words  # noqa: E402


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


def phase(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    d = {}
    n = 1 << 23
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                      .astype(np.uint32))
    pay = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                      .astype(np.uint32))
    _sync(pay)

    # correctness first on small n (same compiled kernels shape-wise? no,
    # separate compile — but cheap)
    phase("correctness n=2^20")
    n2 = 1 << 20
    k2, p2 = key[:n2], pay[:n2]
    out = jax.jit(lambda a, b: merge_sort_words([a, b], 1, stable=True))(
        k2, p2)
    ref = jax.lax.sort((k2, p2), num_keys=1, is_stable=True)
    ok_key = bool(np.array_equal(np.asarray(out[0]), np.asarray(ref[0])))
    ok_pay = bool(np.array_equal(np.asarray(out[2]), np.asarray(ref[1])))
    d["correct_key"] = ok_key
    d["correct_pay"] = ok_pay
    phase(f"correct: key={ok_key} pay={ok_pay}")
    if not (ok_key and ok_pay):
        print(json.dumps(d), flush=True)
        os._exit(0)

    phase("compile+bench merge_sort stable (2 ops -> 3 words)")
    ms = jax.jit(lambda a, b: merge_sort_words([a, b], 1, stable=True))
    t = bench(ms, (key, pay))
    d["merge_sort_stable_8m_ms"] = round(t * 1e3, 3)
    phase(f"merge_sort stable: {t*1e3:.2f} ms")

    phase("compile+bench merge_sort unstable (2 ops)")
    msu = jax.jit(lambda a, b: merge_sort_words([a, b], 1, stable=False))
    t = bench(msu, (key, pay))
    d["merge_sort_unstable_8m_ms"] = round(t * 1e3, 3)
    phase(f"merge_sort unstable: {t*1e3:.2f} ms")

    phase("bench lax.sort stable (reference)")
    ls = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                           is_stable=True))
    t = bench(ls, (key, pay))
    d["lax_sort_stable_8m_ms"] = round(t * 1e3, 3)

    # wider: 4 payload words (the carry-sort shape)
    phase("compile+bench merge_sort W=6 stable")
    pays = [pay, key ^ pay, key + pay, key - pay]
    ms6 = jax.jit(lambda a, *ps: merge_sort_words([a] + list(ps), 1,
                                                  stable=True))
    t = bench(ms6, (key, *pays))
    d["merge_sort_w6_8m_ms"] = round(t * 1e3, 3)
    ls6 = jax.jit(lambda a, *ps: jax.lax.sort((a,) + ps, num_keys=1,
                                              is_stable=True))
    t = bench(ls6, (key, *pays))
    d["lax_sort_w5_8m_ms"] = round(t * 1e3, 3)

    print(json.dumps(d), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
