"""TPU probe: hash-exchange group-by correctness + timing at 8.4M rows
across the dispatcher tiers (dense G=1000, exchange G=1M/100k)."""
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

from polaroid_tpu.parallel.shuffle import local_groupby


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


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


def check(gk, outs, gv, key_h, val_h, m_h, tol=2e-2):
    gkn, gvn = np.asarray(gk), np.asarray(gv)
    sn, cn = np.asarray(outs[0]), np.asarray(outs[1])
    ref = {}
    for k, v, m in zip(key_h, val_h, m_h):
        if m:
            a = ref.setdefault(int(k), [0.0, 0])
            a[0] += float(v)
            a[1] += 1
    got = {int(gkn[i]): (float(sn[i]), int(cn[i]))
           for i in range(len(gkn)) if gvn[i]}
    assert set(got) == set(ref), \
        f"keys: got {len(got)} want {len(ref)}; missing {list(set(ref)-set(got))[:5]} extra {list(set(got)-set(ref))[:5]}"
    worst = 0.0
    for k in ref:
        worst = max(worst, abs(got[k][0] - ref[k][0]) /
                    max(1.0, abs(ref[k][0])))
        assert got[k][1] == ref[k][1], (k, got[k][1], ref[k][1])
    assert worst < tol, worst
    return worst


def main():
    d = {}
    n = 1 << 23
    rng = np.random.default_rng(0)
    val_h = rng.uniform(1, 200, n).astype(np.float32)
    m_h = np.ones(n, bool)
    val = jnp.asarray(val_h)
    valid = jnp.asarray(m_h)

    fn = jax.jit(lambda k, v, m: local_groupby(k, [v, v], m,
                                               ["sum", "count"]))
    for name, G in (("dense_G1000", 1000), ("exch_G100k", 100_000),
                    ("exch_G1M", 1 << 20)):
        key_h = rng.integers(0, G, n).astype(np.uint32)
        if "exch" in name:
            key_h = key_h * np.uint32(2654435761)  # arbitrary wide values
        key = jnp.asarray(key_h)
        t0 = time.perf_counter()
        gk, outs, gv = fn(key, val, valid)
        _sync(gv)
        d[name + "_first_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        worst = check(gk, outs, gv, key_h, val_h, m_h)
        d[name + "_relerr"] = float(f"{worst:.2e}")
        t = bench(fn, (key, val, valid))
        d[name + "_ms"] = round(t * 1e3, 3)
        d[name + "_rows_per_s"] = round(n / t / 1e6, 1)
        print(name, d[name + "_ms"], "ms", flush=True)
    print(json.dumps(d))


if __name__ == "__main__":
    main()
