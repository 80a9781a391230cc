"""Prototype: fused block argsort + perm inversion + split-fused payload
permute. Validates correctness on CPU-sized data, then times on TPU."""
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

LOG_S = 13
S = 1 << LOG_S          # 8192 rows per block
MASK = jnp.uint32(S - 1)


def fused_argsort(key, key_bits):
    """Per-block stable argsort of u32 keys with key_bits <= 32-LOG_S.
    Returns (sorted_key, perm) where perm[b, j] = source row of sorted
    position j. One 1-op u32 sort."""
    n = key.shape[0]
    B = n // S
    k = key.reshape(B, S)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (B, S), 1)
    w = (k << jnp.uint32(LOG_S)) | idx
    ws = jax.lax.sort((w,), dimension=1, num_keys=1, is_stable=False)[0]
    return (ws >> jnp.uint32(LOG_S)), (ws & MASK)


def invert_perm(perm):
    """rank[b, i] = position of source row i in the sorted order.
    One 1-op u32 sort."""
    B, _ = perm.shape
    j = jax.lax.broadcasted_iota(jnp.uint32, (B, S), 1)
    w = (perm << jnp.uint32(LOG_S)) | j
    ws = jax.lax.sort((w,), dimension=1, num_keys=1, is_stable=False)[0]
    return ws & MASK


def permute_word(rank, v):
    """out[b, j] = v[b, src] where rank[b, src] = j — i.e. applies the
    block permutation whose INVERSE is given by rank (rank = dest of
    each source row). Two 1-op u32 sorts (split-fused: 19+13 bits)."""
    v = v if v.dtype == jnp.uint32 else jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi = v >> jnp.uint32(13)            # 19 bits
    lo = v & jnp.uint32(0x1FFF)         # 13 bits
    w1 = (rank << jnp.uint32(19)) | hi
    w2 = (rank << jnp.uint32(13)) | lo
    s1 = jax.lax.sort((w1,), dimension=1, num_keys=1, is_stable=False)[0]
    s2 = jax.lax.sort((w2,), dimension=1, num_keys=1, is_stable=False)[0]
    return ((s1 & jnp.uint32(0x7FFFF)) << jnp.uint32(13)) | \
        (s2 & jnp.uint32(0x1FFF))


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


def main():
    rng = np.random.default_rng(0)
    # correctness at 2 blocks
    n = 2 * S
    key_h = rng.integers(0, 1000, n).astype(np.uint32)
    val_h = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    key = jnp.asarray(key_h)
    val = jnp.asarray(val_h)

    @jax.jit
    def pipeline(key, val):
        sk, perm = fused_argsort(key, 19)
        rank = invert_perm(perm)
        sv = permute_word(rank, val.reshape(-1, S))
        return sk, perm, sv

    sk, perm, sv = pipeline(key, val)
    sk_h, perm_h, sv_h = map(np.asarray, (sk, perm, sv))
    for b in range(2):
        ref_order = np.argsort(key_h[b * S:(b + 1) * S], kind="stable")
        assert np.array_equal(perm_h[b], ref_order), "perm mismatch"
        assert np.array_equal(sk_h[b], key_h[b * S:(b + 1) * S][ref_order])
        assert np.array_equal(sv_h[b], val_h[b * S:(b + 1) * S][ref_order]), \
            "payload permute mismatch"
    print("correctness OK", flush=True)

    if jax.default_backend() != "tpu":
        return
    # timing at 8.4M
    n = 1 << 23
    key = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint32))
    val = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                      .astype(np.uint32))
    _sync(val)
    d = {}
    d["argsort_ms"] = round(bench(
        jax.jit(lambda k: fused_argsort(k, 19)), (key,)) * 1e3, 3)
    sk, perm = jax.jit(lambda k: fused_argsort(k, 19))(key)
    _sync(perm)
    d["invert_ms"] = round(bench(jax.jit(invert_perm), (perm,)) * 1e3, 3)
    rank = jax.jit(invert_perm)(perm)
    _sync(rank)
    d["permute_word_ms"] = round(bench(
        jax.jit(lambda r, v: permute_word(r, v.reshape(-1, S))),
        (rank, val)) * 1e3, 3)
    d["full_kv_ms"] = round(bench(jax.jit(pipeline), (key, val)) * 1e3, 3)
    print(json.dumps(d))


if __name__ == "__main__":
    main()
