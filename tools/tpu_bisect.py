"""Bisect which primitive hangs on the axon tunnel.

Tiny programs (arange/sum) complete; the bench's q1 (sort + segmented
scans over 8.4M rows) never returns. Run each candidate in sequence with
progress logging; the log tells us the largest-grain culprit. Run
detached (never killed externally mid-flight); exits via os._exit.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def step(name, fn, *args):
    t0 = time.time()
    log(f"START {name}")
    out = jax.jit(fn)(*args)
    sync(out)
    log(f"OK    {name}  {time.time()-t0:.1f}s")


def main():
    log("init")
    sync(jax.device_put(np.arange(8, dtype=np.int32)))
    log("init ok")

    for n in (1 << 16, 1 << 20, 1 << 23):
        rng = np.random.default_rng(0)
        k = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint32))
        v = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        i = jnp.arange(n, dtype=jnp.int32)
        sync(i)
        log(f"--- n={n} data resident")

        step(f"sum n={n}", lambda a: a.sum(), v)
        step(f"sort1 n={n}", lambda a: jax.lax.sort((a,), num_keys=1)[0], k)
        step(f"sort2 n={n}",
             lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True),
             k, v)
        step(f"sort3 n={n}",
             lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                          is_stable=True), k, i, v)
        step(f"cumsum n={n}", jnp.cumsum, v)

        def segscan(val, flags):
            def comb(x, y):
                vx, bx = x
                vy, by = y
                return jnp.where(by, vy, vx + vy), bx | by
            return jax.lax.associative_scan(comb, (val, flags))[0]
        step(f"segscan n={n}", segscan, v, k == 0)

        from polaroid_tpu.parallel.shuffle import local_groupby
        step(f"local_groupby n={n}",
             lambda kk, vv: local_groupby(kk, [vv, vv],
                                          jnp.ones(kk.shape[0], bool),
                                          ["sum", "count"]),
             k, v)
    log("ALL DONE")
    os._exit(0)


if __name__ == "__main__":
    main()
