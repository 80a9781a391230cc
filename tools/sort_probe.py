"""Measure TPU sort-primitive candidates to pick the radix/merge design.

Phases (each timed steady-state, JSON line at end):
  lax.sort with 1/2/3/4 u32 operands (the incumbent)
  batched lax.sort along last axis (block-sort phase candidate)
  XLA butterfly compare-exchange pass (bitonic merge stage candidate)
  monotonic + random gather, permutation scatter (radix scatter candidates)
  u16-value sort (digit-sort candidate)
"""
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
    key = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
    pay = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
    pay2 = pay ^ jnp.uint32(0xDEADBEEF)
    pay3 = pay ^ jnp.uint32(0x12345678)
    _sync(pay3)

    def phase(name, fn, args, iters=10):
        try:
            t = bench(fn, args, iters=iters)
            d[name] = round(t * 1e3, 3)
            print(f"[probe] {name}: {t*1e3:.2f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            d[name] = f"ERR {type(e).__name__}: {e}"[:200]
            print(f"[probe] {name}: {d[name]}", file=sys.stderr, flush=True)

    # --- incumbent: lax.sort operand scaling ---
    phase("sort1", jax.jit(lambda k: jax.lax.sort((k,), num_keys=1,
                                                  is_stable=False)), (key,))
    phase("sort2", jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1,
                                                     is_stable=True)), (key, pay))
    phase("sort3", jax.jit(lambda k, p, q: jax.lax.sort(
        (k, p, q), num_keys=1, is_stable=True)), (key, pay, pay2))
    phase("sort4", jax.jit(lambda k, p, q, r: jax.lax.sort(
        (k, p, q, r), num_keys=1, is_stable=True)), (key, pay, pay2, pay3))

    # --- batched block sort (B, S): is XLA's batched sort fast? ---
    for S in (1 << 13, 1 << 15, 1 << 16):
        B = n // S
        kb = key.reshape(B, S)
        pb = pay.reshape(B, S)
        phase(f"bsort_S{S}", jax.jit(lambda k, p: jax.lax.sort(
            (k, p), num_keys=1, is_stable=False, dimension=1)), (kb, pb))

    # --- XLA butterfly pass: distance-d compare-exchange, 2 words ---
    def butterfly(k, p, d_):
        k2 = k.reshape(-1, 2, d_)
        p2 = p.reshape(-1, 2, d_)
        a, b = k2[:, 0], k2[:, 1]
        pa, pb_ = p2[:, 0], p2[:, 1]
        swap = a > b
        lo = jnp.where(swap, b, a)
        hi = jnp.where(swap, a, b)
        plo = jnp.where(swap, pb_, pa)
        phi = jnp.where(swap, pa, pb_)
        return (jnp.stack([lo, hi], 1).reshape(-1),
                jnp.stack([plo, phi], 1).reshape(-1))

    import functools
    phase("butterfly_d64k", jax.jit(functools.partial(butterfly, d_=1 << 16)),
          (key, pay), iters=20)
    phase("butterfly_d1m", jax.jit(functools.partial(butterfly, d_=1 << 20)),
          (key, pay), iters=20)

    # 7 chained butterfly passes (one merge level worth of cross stages)
    def chain7(k, p):
        for j in range(22, 15, -1):
            k, p = butterfly(k, p, 1 << j)
        return k, p
    phase("butterfly_chain7", jax.jit(chain7), (key, pay), iters=5)

    # --- gather / scatter ---
    idx_mono = jnp.asarray(np.sort(rng.integers(0, n, n)).astype(np.int32))
    idx_rand = jnp.asarray(rng.permutation(n).astype(np.int32))
    _sync(idx_rand)
    phase("gather_mono", jax.jit(lambda x, i: jnp.take(x, i)), (pay, idx_mono))
    phase("gather_rand", jax.jit(lambda x, i: jnp.take(x, i)), (pay, idx_rand))
    phase("scatter_perm", jax.jit(
        lambda x, i: jnp.zeros_like(x).at[i].set(x)), (pay, idx_rand))

    # --- u16 digit sort (radix building block?) ---
    k16 = (key >> jnp.uint32(16)).astype(jnp.uint16)
    _sync(k16)
    phase("sort_u16key_u32pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (k16, pay))
    k8 = (key >> jnp.uint32(24)).astype(jnp.uint8)
    _sync(k8)
    phase("sort_u8key_u32pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (k8, pay))

    # --- cumsum pass cost (prefix-sum building block) ---
    phase("cumsum_u32", jax.jit(lambda x: jnp.cumsum(x)), (pay,))

    print(json.dumps(d), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
