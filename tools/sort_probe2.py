"""Second sort probe: operand-count scaling for unstable sorts, batched
block sorts, and butterfly passes — the cost model for the hierarchical
merge sort design."""
import json
import os
import sys
import time
import functools

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
                      .astype(np.uint32)) for _ in range(6)]
    _sync(ws[-1])

    def phase(name, fn, args, iters=10):
        try:
            t = bench(fn, args, iters=iters)
            d[name] = round(t * 1e3, 3)
            print(f"[probe] {name}: {t*1e3:.2f} ms", file=sys.stderr,
                  flush=True)
        except Exception as e:
            d[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[probe] {name}: {d[name]}", file=sys.stderr, flush=True)

    # unstable multi-operand full sorts (is the 21.7ms the stability tax?)
    for k in (2, 3, 4):
        phase(f"usort{k}", jax.jit(functools.partial(
            lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False))),
            tuple(ws[:k]))
    # two key words (the common packed-key case)
    phase("usort3_k2", jax.jit(lambda a, b, c: jax.lax.sort(
        (a, b, c), num_keys=2, is_stable=False)), tuple(ws[:3]))

    # batched block sorts, multi-operand
    S = 8192
    B = n // S
    bw = [w.reshape(B, S) for w in ws]
    for k in (2, 3, 4, 6):
        phase(f"bsort{k}_S8192", jax.jit(functools.partial(
            lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False,
                                    dimension=1))), tuple(bw[:k]))
    bw2 = [w.reshape(n // 65536, 65536) for w in ws]
    phase("bsort3_S65536", jax.jit(functools.partial(
        lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False,
                                dimension=1))), tuple(bw2[:3]))

    # butterfly passes with direction masks, W operands / 2 key words
    def butterfly(ops, d_, b_, nk):
        outs = []
        q = n // (2 * d_)
        dirm = ((jnp.arange(q, dtype=jnp.uint32) * 2 * d_) >>
                jnp.uint32(b_)) & jnp.uint32(1)
        dirm = dirm[:, None] != 0
        a = [o.reshape(q, 2, d_)[:, 0] for o in ops]
        b = [o.reshape(q, 2, d_)[:, 1] for o in ops]
        gt = jnp.zeros((q, d_), bool)
        for w in reversed(range(nk)):
            gt = (a[w] > b[w]) | ((a[w] == b[w]) & gt)
        swap = gt ^ dirm
        for ai, bi in zip(a, b):
            lo = jnp.where(swap, bi, ai)
            hi = jnp.where(swap, ai, bi)
            outs.append(jnp.stack([lo, hi], 1).reshape(n))
        return tuple(outs)

    for k in (2, 3, 4, 6):
        phase(f"bfly{k}_d1m", jax.jit(functools.partial(
            lambda *o: butterfly(list(o), 1 << 20, 21, min(2, k)))),
            tuple(ws[:k]), iters=20)

    print(json.dumps(d), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
