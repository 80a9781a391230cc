"""Collocate stage breakdown: where do 10 ms go in the join kernel?

collocate (ops/hjoin.py) = prelude (mix + concats + histogram)
  -> one 2-op block sort -> bucket_exchange (2 words)
  -> one 2-op final per-bucket sort.
hash_groupby_u32 (ops/hgroup.py) has the same structure and runs 8.4M
rows in ~5.1 ms; the join is 5.24M padded rows in ~10 ms. This probe
times each stage as its own jit program, plus the hgroup pipeline at
the join's row count for calibration.

Run WITHOUT timeout wrappers (an external kill wedges the axon tunnel).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("PT_PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PT_JAX_CACHE", "/tmp/pt_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    print(f"[probe] {name}: {ms:.2f} ms (compile+warm {tc:.1f}s)",
          flush=True)
    return ms


def main():
    from polaroid_tpu.ops.exchange import CAP, K, S, bucket_exchange
    from polaroid_tpu.ops.hjoin import mix31, _FILL

    rng = np.random.default_rng(0)
    bkey = jnp.asarray(rng.permutation(NB).astype(np.uint32))
    bval = jnp.asarray(rng.uniform(0, 1, NB).astype(np.float32))
    pkey = jnp.asarray(rng.integers(0, NB, NP_).astype(np.uint32))

    n = NB + NP_
    B = -(-n // S)
    npad = B * S

    @jax.jit
    def prelude(bkey, bval, pkey):
        hb = mix31(bkey)
        hp = mix31(pkey)
        wb = hb << jnp.uint32(1)
        wp = (hp << jnp.uint32(1)) | jnp.uint32(1)
        w = jnp.concatenate([wb, wp,
                             jnp.full(npad - n, jnp.uint32(_FILL))])
        vbits = jax.lax.bitcast_convert_type(bval, jnp.uint32)
        pidx = jnp.arange(NP_, dtype=jnp.uint32)
        p = jnp.concatenate([vbits, pidx, jnp.zeros(npad - n, jnp.uint32)])
        digit = (w >> jnp.uint32(27)).astype(jnp.int32)
        live = w != jnp.uint32(_FILL)
        oh = (digit.reshape(B, S, 1) ==
              jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
        counts = jnp.sum(oh & live.reshape(B, S, 1), axis=1,
                         dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.cumsum(counts, axis=1)[:, :-1]], axis=1)
        ok = jnp.max(counts) <= CAP
        return w, p, starts, counts, ok

    w, p, starts, counts, ok = jax.block_until_ready(
        prelude(bkey, bval, pkey))
    print(f"[probe] B={B} npad={npad} ok={bool(ok)}", flush=True)
    bench("prelude", prelude, (bkey, bval, pkey))

    @jax.jit
    def blocksort(w, p):
        return jax.lax.sort((w.reshape(B, S), p.reshape(B, S)),
                            dimension=1, num_keys=1, is_stable=False)

    ws, ps = jax.block_until_ready(blocksort(w, p))
    bench("blocksort_2op", blocksort, (w, p))

    @jax.jit
    def exch(starts, counts, ws, ps):
        return bucket_exchange(starts, counts,
                               [ws.reshape(-1), ps.reshape(-1)],
                               fills=(_FILL, 0))

    wx, px = jax.block_until_ready(exch(starts, counts, ws, ps))
    bench("exchange_2w", exch, (starts, counts, ws, ps))
    print(f"[probe] bucket layout {wx.shape}", flush=True)

    @jax.jit
    def finalsort(wx, px):
        return jax.lax.sort((wx, px), dimension=1, num_keys=1,
                            is_stable=False)

    bench("finalsort_2op", finalsort, (wx, px))

    # 1-op final sort for scaling reference
    @jax.jit
    def finalsort1(wx):
        return jax.lax.sort((wx,), dimension=1, num_keys=1,
                            is_stable=False)[0]

    bench("finalsort_1op", finalsort1, (wx,))

    # hgroup calibration at the same row count
    from polaroid_tpu.ops.hgroup import hash_groupby_u32
    key = jnp.asarray(rng.integers(0, NB, n).astype(np.uint32))
    val = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    vmask = jnp.ones(n, bool)

    @jax.jit
    def hg(key, val, vmask):
        return hash_groupby_u32(key, [val], vmask, ["sum"])

    bench("hgroup_same_n", hg, (key, val, vmask))


if __name__ == "__main__":
    main()
