"""Diagnose the 688 ms sort-path group-by: which phase burns the time,
and what 64-bit emulation costs inside sorts/cumsums on v5e."""
import json
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)  # match the engine's config

import jax.numpy as jnp  # noqa: E402

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
    sym = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint32))
    price = jnp.asarray(rng.uniform(1, 200, n).astype(np.float32))
    valid = jnp.ones(n, dtype=bool)
    u64 = jnp.asarray(rng.integers(0, 1 << 62, n, dtype=np.uint64))
    i64 = u64.astype(jnp.int64)
    f64 = price.astype(jnp.float64)
    u32 = sym
    _sync(f64)

    def phase(name, fn, args, iters=8):
        try:
            t = bench(fn, args, iters=iters)
            d[name] = round(t * 1e3, 3)
            print(f"[probe] {name}: {t*1e3:.2f} ms", file=sys.stderr,
                  flush=True)
        except Exception as e:
            d[name] = f"ERR {type(e).__name__}: {e}"[:160]
            print(f"[probe] {name}: {d[name]}", file=sys.stderr, flush=True)

    # 64-bit emulation tax inside sorts
    phase("sort_u32key_u32pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (u32, price))
    phase("sort_u32key_u64pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (u32, u64))
    phase("sort_u32key_i64pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (u32, i64))
    phase("sort_u32key_f64pay", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (u32, f64))
    phase("sort_u64key", jax.jit(lambda k, p: jax.lax.sort(
        (k, p), num_keys=1, is_stable=True)), (u64, price))

    # cumsum dtype tax
    phase("cumsum_i32", jax.jit(lambda x: jnp.cumsum(x)),
          (sym.astype(jnp.int32),))
    phase("cumsum_i64", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int64))),
          (sym,))
    phase("cumsum_f32", jax.jit(lambda x: jnp.cumsum(x)), (price,))
    phase("cumsum_f64", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.float64))),
          (price,))
    phase("cummax_u64_pack", jax.jit(lambda x: jax.lax.cummax(
        x.astype(jnp.uint64))), (sym,))

    # the actual local_groupby phases
    from polaroid_tpu.parallel.shuffle import (_group_bounds, local_groupby)

    phase("local_groupby_full", jax.jit(lambda k, v, m: local_groupby(
        k, [v, v], m, ["sum", "count"])), (sym, price, valid))

    def main_sort(k, v, m):
        dead = (~m).astype(jnp.uint32)
        return jax.lax.sort((dead, k, v, v), num_keys=2, is_stable=True)
    phase("main_sort_4ops", jax.jit(main_sort), (sym, price, valid))

    def bounds(k, m):
        dead = (~m).astype(jnp.uint32)
        out = jax.lax.sort((dead, k), num_keys=2, is_stable=True)
        live = out[0] == 0
        idx = jnp.arange(n, dtype=jnp.int32)
        newg = ((idx == 0) | (out[1] != jnp.roll(out[1], 1))) & live
        return _group_bounds(newg, live, (out[1],))
    phase("group_bounds_incl_sort", jax.jit(bounds), (sym, valid))

    from polaroid_tpu.ops.groupby import _seg_sum
    gid = jnp.asarray(np.sort(rng.integers(0, 1000, n)).astype(np.int32))
    _sync(gid)
    phase("seg_sum_f32_under_x64", jax.jit(
        lambda v, g: _seg_sum(v, g, n)), (price, gid))
    phase("seg_sum_i64", jax.jit(
        lambda v, g: _seg_sum(v.astype(jnp.int64), g, n)), (sym, gid))

    print(json.dumps(d), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
