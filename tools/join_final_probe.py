"""Final-stage formulations for the collocated join's per-bucket sort.

join_stage_probe.py: the [32, 245760] 2-op u32 final sort costs 9.28 ms
of the join's 11.9 total (block sort 1.36, exchange 0.04). Candidates:

  sortlen_*      2-op u32 sort cost vs segment length, same total elems
  fused64        1-op u64 (w<<32|payload) sort of [32, 245760]
  fused64_len*   1-op u64 sort at shorter segment lengths
  round2         second 5-bit exchange (block sort + exchange) then
                 2-op sort of [1024, 11520] sub-buckets

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
    rng = np.random.default_rng(0)
    TOT = 32 * 245760                       # 7.86M, the join's layout
    w = jnp.asarray(rng.integers(0, 1 << 32, TOT, dtype=np.uint64)
                    .astype(np.uint32))
    p = jnp.asarray(rng.integers(0, 1 << 32, TOT, dtype=np.uint64)
                    .astype(np.uint32))

    for L in (8192, 16384, 49152, 245760):
        R = TOT // L

        def f(w, p, R=R, L=L):
            return jax.lax.sort((w.reshape(R, L), p.reshape(R, L)),
                                dimension=1, num_keys=1, is_stable=False)

        bench(f"sort2op_len{L}", jax.jit(f), (w, p))

    for L in (8192, 16384, 49152, 245760):
        R = TOT // L

        def f(w, p, R=R, L=L):
            u = (w.astype(jnp.uint64) << jnp.uint64(32)) | \
                p.astype(jnp.uint64)
            s = jax.lax.sort((u.reshape(R, L),), dimension=1,
                             num_keys=1, is_stable=False)[0]
            return (s >> jnp.uint64(32)).astype(jnp.uint32), \
                s.astype(jnp.uint32)

        bench(f"fused64_len{L}", jax.jit(f), (w, p))

    # round-2 exchange pipeline: block sort the bucket-major layout,
    # histogram digit2 (bits 22..26), exchange, then sort [1024, 11520]
    from polaroid_tpu.ops.exchange import CAP, K, S, bucket_exchange
    B2 = TOT // S                                          # 960

    @jax.jit
    def round2(w, p):
        w2 = w.reshape(B2, S)
        o = jax.lax.sort((w2, p.reshape(B2, S)), dimension=1,
                         num_keys=1, is_stable=False)
        ws, ps = o
        digit = ((ws.reshape(-1) >> jnp.uint32(22)) &
                 jnp.uint32(31)).astype(jnp.int32)
        live = ws.reshape(-1) != jnp.uint32(0xFFFFFFFF)
        oh = (digit.reshape(B2, S, 1) ==
              jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
        counts = jnp.sum(oh & live.reshape(B2, S, 1), axis=1,
                         dtype=jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros((B2, 1), jnp.int32),
             jnp.cumsum(counts, axis=1)[:, :-1]], axis=1)
        ex = bucket_exchange(starts, counts,
                             [ws.reshape(-1), ps.reshape(-1)],
                             fills=(0xFFFFFFFF, 0))
        wx, px = ex                     # (K, B2*CAP) = (32, 368640)
        seg = 30 * CAP                  # cells per k1 within one k2 row
        R = K * (B2 * CAP // seg)
        o = jax.lax.sort((wx.reshape(R, seg), px.reshape(R, seg)),
                         dimension=1, num_keys=1, is_stable=False)
        return o

    bench("round2_full", round2, (w, p))


if __name__ == "__main__":
    main()
