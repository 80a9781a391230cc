"""Join-probe formulation lab: measure the primitive costs that decide
how the single-chip join probe should be expressed on this backend.

Phases (each its own small jit program; cheap/diagnostic first so a
tunnel stall can't mask earlier results; results print incrementally):

  gather4m      y = table[idx]           4M random idx into 1M f32
  scatter4m     out.at[idx].set(x)       4M random scatter into 4M
  ss_sort       searchsorted method=sort 4M queries / 1M sorted keys
  ss_scan       searchsorted method=scan (20-step binary search)
  build_sort    lax.sort 1M x 2 operands
  op_join_cur   the current bench formulation (build sort + ss + gathers)
  two_sort_join merged-sort join with sort-as-scatter writeback

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
    print(f"[probe] {name}: {ms:.2f} ms (compile+warm {tc:.1f}s)",
          flush=True)
    return ms


def two_sort_join(bkey, bval, pkey):
    """Inner-join lookup: one merged sort + segmented last-build fill +
    sort-as-scatter writeback (no random gathers/scatters)."""
    nb, npr = bkey.shape[0], pkey.shape[0]
    tot = nb + npr
    keys = jnp.concatenate([bkey, pkey])
    tag = jnp.concatenate([jnp.zeros(nb, jnp.int32),
                           jnp.ones(npr, jnp.int32)])
    val = jnp.concatenate([bval, jnp.zeros(npr, bval.dtype)])
    idx = jnp.concatenate([jnp.full(nb, tot, jnp.int32),
                           jnp.arange(npr, dtype=jnp.int32)])
    sk, st, sv, si = jax.lax.sort((keys, tag, val, idx), num_keys=2)
    pos = jnp.arange(tot)
    newk = (pos == 0) | (sk != jnp.roll(sk, 1))
    isb = st == 0

    def comb(a, b):
        ra, ha, va = a
        rb, hb, vb = b
        h = jnp.where(rb, hb, ha | hb)
        v = jnp.where(hb, vb, jnp.where(rb, vb, va))
        return (ra | rb, h, v)

    _, has, fill = jax.lax.associative_scan(
        comb, (newk, isb, jnp.where(isb, sv, jnp.zeros_like(sv))))
    outv = jnp.where(~isb & has, fill, jnp.zeros_like(fill))
    hit = ~isb & has
    # writeback via sort by probe idx (build rows have idx=tot -> tail)
    _, rv, rh = jax.lax.sort(
        (si, outv, hit.astype(jnp.int32)), num_keys=1)
    return rv[:npr], rh[:npr]


def main():
    backend = jax.default_backend()
    print(f"[probe] backend={backend}", flush=True)
    rng = np.random.default_rng(0)
    bkey = jnp.asarray(rng.permutation(NB).astype(np.uint32))
    bval = jnp.asarray(rng.uniform(0, 1, NB).astype(np.float32))
    pkey = jnp.asarray(rng.integers(0, NB, NP_).astype(np.uint32))
    pidx = jnp.asarray(rng.integers(0, NB, NP_).astype(np.int32))
    sidx = jnp.asarray(rng.permutation(NP_).astype(np.int32))
    x4 = jnp.asarray(rng.uniform(0, 1, NP_).astype(np.float32))
    _sync(x4)
    print("[probe] inputs resident", flush=True)

    r = {}
    r["gather4m"] = bench("gather 4M<-1M", jax.jit(lambda t, i: t[i]),
                          (bval, pidx))
    r["scatter4m"] = bench(
        "scatter 4M->4M",
        jax.jit(lambda i, x: jnp.zeros(NP_, jnp.float32).at[i].set(x)),
        (sidx, x4))
    sk = jnp.sort(bkey)
    _sync(sk)
    r["ss_sort"] = bench(
        "searchsorted(sort) 4M/1M",
        jax.jit(lambda a, v: jnp.searchsorted(a, v, method="sort")),
        (sk, pkey))
    r["ss_scan"] = bench(
        "searchsorted(scan) 4M/1M",
        jax.jit(lambda a, v: jnp.searchsorted(a, v, method="scan")),
        (sk, pkey))
    r["build_sort"] = bench(
        "lax.sort 1Mx2", jax.jit(lambda k, v: jax.lax.sort(
            (k, v), num_keys=1, is_stable=True)), (bkey, bval))

    from polaroid_tpu.ops.search import searchsorted as _ss

    @jax.jit
    def op_join_cur(bkey, bval, pkey):
        sk, sv = jax.lax.sort((bkey, bval), num_keys=1, is_stable=True)
        pos = _ss(sk, pkey)
        posc = jnp.clip(pos, 0, NB - 1)
        hit = sk[posc] == pkey
        return jnp.where(hit, sv[posc], 0.0), hit

    r["op_join_cur"] = bench("op_join current", op_join_cur,
                             (bkey, bval, pkey))

    if os.environ.get("PT_PROBE_FUSED", "1") == "1":
        r["two_sort_join"] = bench("two-sort join", jax.jit(two_sort_join),
                                   (bkey, bval, pkey))

    print("[probe] RESULTS " + " ".join(f"{k}={v:.2f}ms"
                                        for k, v in r.items()), flush=True)


if __name__ == "__main__":
    main()
