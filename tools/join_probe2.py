"""Join probe, round 2: scan-free two-sort join.

The associative_scan-based formulation never returns from the axon
remote compiler. This variant uses only primitive cumulative ops:

  sort (key, tag, val-bits, idx)          # build rows before probe rows
  lastk = cummax(where(is_build, key+1, 0))     # keys sorted => monotone
  hit_i = lastk == key_i + 1                    # same run has a build row
  cnt  = cumsum(is_build)                        # monotone build counter
  pack = where(is_build, (cnt << 32) | val_bits, 0)
  fill = cummax(pack) & 0xFFFFFFFF               # value of latest build row
  sort by probe idx                              # writeback, no scatter

No gathers, no scatters, no associative_scan — sorts and cumops only,
which this TPU probe shows are the fast primitives (gather 4M<-1M =
34.7ms vs sort 1Mx2 = 1.25ms).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("PT_PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # match package conditions

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PT_JAX_CACHE", "/tmp/pt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

NB = 1 << 20
NP_ = 1 << 22


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


def bench(name, fn, args, iters=8, warmup=2):
    t0 = time.perf_counter()
    for _ in range(warmup):
        _sync(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    _sync(outs[0])
    fetch = time.perf_counter() - t1
    ms = max((total - fetch) / iters, 1e-9) * 1e3
    print(f"[probe2] {name}: {ms:.2f} ms (compile+warm {tc:.1f}s)",
          flush=True)
    return ms


def two_sort_join_scanfree(bkey, bval, pkey):
    """Inner-join value lookup (unique build keys), scan-free."""
    nb, npr = bkey.shape[0], pkey.shape[0]
    tot = nb + npr
    key = jnp.concatenate([bkey.astype(jnp.uint64),
                           pkey.astype(jnp.uint64)])
    tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                           jnp.ones(npr, jnp.int32)])
    vbits = jnp.concatenate([
        jax.lax.bitcast_convert_type(bval, jnp.uint32),
        jnp.zeros(npr, jnp.uint32)])
    idx = jnp.concatenate([jnp.full(nb, tot, jnp.int32),
                           jnp.arange(npr, dtype=jnp.int32)])
    sk, st, sv, si = jax.lax.sort((key, tag, vbits, idx), num_keys=2)
    isb = st == 0
    lastk = jax.lax.cummax(jnp.where(isb, sk + jnp.uint64(1),
                                     jnp.uint64(0)))
    hit = (lastk == sk + jnp.uint64(1)) & ~isb
    cnt = jnp.cumsum(isb.astype(jnp.uint32)).astype(jnp.uint64)
    pack = jnp.where(isb, (cnt << jnp.uint64(32)) | sv.astype(jnp.uint64),
                     jnp.uint64(0))
    fill = jax.lax.cummax(pack)
    outv = jax.lax.bitcast_convert_type(
        (fill & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
    outv = jnp.where(hit, outv, jnp.float32(0))
    _, rv, rh = jax.lax.sort((si, outv, hit.astype(jnp.int32)), num_keys=1)
    return rv[:npr], rh[:npr]


def main():
    print(f"[probe2] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    bkey = jnp.asarray(rng.permutation(NB).astype(np.uint32))
    bval = jnp.asarray(rng.uniform(0, 1, NB).astype(np.float32))
    pkey = jnp.asarray(rng.integers(0, NB, NP_).astype(np.uint32))
    _sync(pkey)
    print("[probe2] inputs resident", flush=True)
    fn = jax.jit(two_sort_join_scanfree)
    ms = bench("two_sort_join_scanfree 4Mx1M", fn, (bkey, bval, pkey))
    print(f"[probe2] RESULT rows/s={NP_ / (ms / 1e3):.3e}", flush=True)


if __name__ == "__main__":
    main()
