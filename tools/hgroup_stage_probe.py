"""Stage-level profile of the hash-exchange group-by at 8.4M rows."""
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

from polaroid_tpu.ops.exchange import CAP, K, S, bucket_exchange
from polaroid_tpu.ops.hashing import _fmix32
from polaroid_tpu.ops.groupby import _seg_scan_doubling


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def bench(fn, args, iters=10, warmup=2):
    fn = jax.jit(fn)
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
    B = n // S
    rng = np.random.default_rng(0)
    key = jnp.asarray((rng.integers(0, 1 << 20, n) * 2654435761)
                      .astype(np.uint32))
    val = jnp.asarray(rng.uniform(1, 200, n).astype(np.float32))
    _sync(val)

    h = jax.jit(lambda k: _fmix32(k))(key)
    _sync(h)
    d["fmix_ms"] = round(bench(_fmix32, (key,)) * 1e3, 3)

    def hist(h):
        digit = (h >> jnp.uint32(27)).astype(jnp.int32)
        oh = (digit.reshape(B, S, 1) ==
              jnp.arange(K, dtype=jnp.int32).reshape(1, 1, K))
        return jnp.sum(oh, axis=1, dtype=jnp.int32)
    d["hist_ms"] = round(bench(hist, (h,)) * 1e3, 3)
    counts = jax.jit(hist)(h)
    starts = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(counts, axis=1)[:, :-1]],
        axis=1)
    _sync(starts)

    def blksort(h, v):
        return jax.lax.sort((h.reshape(B, S), v.reshape(B, S)),
                            dimension=1, num_keys=1, is_stable=False)
    d["blksort_ms"] = round(bench(blksort, (h, val)) * 1e3, 3)
    hs, vs = jax.jit(blksort)(h, val)
    vbits = jax.lax.bitcast_convert_type(vs, jnp.uint32)
    _sync(vbits)

    def exch(hs, vb):
        return bucket_exchange(starts, counts,
                               [hs.reshape(-1), vb.reshape(-1)],
                               fills=(0xFFFFFFFF, 0))
    d["exchange2w_ms"] = round(bench(exch, (hs, vbits)) * 1e3, 3)
    hx, vx = jax.jit(exch)(hs, vbits)
    _sync(hx)
    L = hx.shape[1]

    def finsort(hx, vx):
        return jax.lax.sort((hx, vx), dimension=1, num_keys=1,
                            is_stable=False)
    d["finsort_ms"] = round(bench(finsort, (hx, vx)) * 1e3, 3)
    hf, vf = jax.jit(finsort)(hx, vx)
    _sync(hf)

    def flags_gid(hf):
        col = jnp.arange(L, dtype=jnp.int32)[None, :]
        prev = jnp.concatenate([hf[:, :1], hf[:, :-1]], axis=1)
        flag = (hf != prev) | (col == 0)
        rid = (jnp.cumsum(flag.astype(jnp.int32), axis=1) - 1 +
               jnp.arange(K, dtype=jnp.int32)[:, None] * (L + 1))
        return rid
    d["flags_gid_ms"] = round(bench(flags_gid, (hf,)) * 1e3, 3)
    rid = jax.jit(flags_gid)(hf)
    gid = rid.reshape(-1)
    _sync(gid)

    vff = jax.lax.bitcast_convert_type(vf, jnp.float32).reshape(-1)
    _sync(vff)
    d["segscan_ms"] = round(bench(
        lambda v, g: _seg_scan_doubling(v, g, jnp.add), (vff, gid)) * 1e3, 3)

    # alternative: 2-D per-cell segscan (roll along axis 1 only)
    def segscan2d(v2, rid):
        v = v2
        kk = 1
        idx = jnp.arange(L, dtype=jnp.int32)[None, :]
        while kk < L:
            vs = jnp.roll(v, kk, axis=1)
            gs = jnp.roll(rid, kk, axis=1)
            ok = (gs == rid) & (idx >= kk)
            v = jnp.where(ok, v + vs, v)
            kk <<= 1
        return v
    d["segscan2d_ms"] = round(bench(
        segscan2d, (vff.reshape(K, L), rid)) * 1e3, 3)

    print(json.dumps(d))


if __name__ == "__main__":
    main()
