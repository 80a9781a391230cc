"""f64 <-> u32-words transport probe.

col_to_u32_words squashed f64 to ONE f32 word on TPU, claiming the
chip demotes f64 compute anyway. That claim is stale: jax emulates f64
exactly on v5e (hash-path f64 scan sums match numpy to 15 digits), so
the squash silently destroyed f64 agg outputs in every transport
(compaction, carry sorts) — caught as ~2% std errors on small groups.

The direct `bitcast f64 -> u32[n,2]` cannot legalize through the X64
rewriter, but an ARITHMETIC split can: frexp -> 53-bit mantissa as i64
(native 2-word bitcast) + exponent/class packed in one i32 word.
This probe checks legality, exact roundtrip (normals, subnormals,
+-0, +-inf, nan, extremes), and cost on the live backend.

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


def split_f64(x):
    # pure f64 arithmetic + value converts: 64-bit BITCASTS in either
    # direction fail the X64 rewriter, but f64 ops are emulated exactly
    finite = jnp.isfinite(x)
    xs = jnp.where(finite, x, jnp.float64(0))
    m, e = jnp.frexp(xs)
    sign = jnp.signbit(x)
    mi = jnp.abs(m) * jnp.float64(1 << 53)       # [2^52, 2^53) or 0
    hi = jnp.floor(mi * jnp.float64(2.0 ** -32))
    lo = mi - hi * jnp.float64(1 << 32)
    cls = jnp.where(jnp.isnan(x), 1,
                    jnp.where(x == jnp.inf, 2,
                              jnp.where(x == -jnp.inf, 3, 0)))
    meta = ((e + jnp.int32(2048)) & jnp.int32(0x3FFF)) | \
        (cls.astype(jnp.int32) << jnp.int32(14)) | \
        (sign.astype(jnp.int32) << jnp.int32(16))
    return [hi.astype(jnp.uint32), lo.astype(jnp.uint32),
            meta.astype(jnp.uint32)]


def join_f64(words):
    hi, lo, meta = words
    mi = hi.astype(jnp.float64) * jnp.float64(1 << 32) + \
        lo.astype(jnp.float64)
    e = (meta & jnp.uint32(0x3FFF)).astype(jnp.int32) - jnp.int32(2048)
    cls = (meta >> jnp.uint32(14)) & jnp.uint32(3)
    sign = (meta >> jnp.uint32(16)) & jnp.uint32(1)
    m = mi * jnp.float64(2.0 ** -53)
    x = jnp.ldexp(m, e)
    x = jnp.where(sign == 1, -x, x)
    x = jnp.where(cls == 1, jnp.float64(jnp.nan), x)
    x = jnp.where(cls == 2, jnp.float64(jnp.inf), x)
    x = jnp.where(cls == 3, jnp.float64(-jnp.inf), x)
    return x


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    x = rng.standard_normal(n) * np.exp(rng.uniform(-300, 300, n))
    x[:8] = [0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, -5e-324,
             1.7976931348623157e308]
    xj = jnp.asarray(x)

    rt = jax.jit(lambda a: join_f64(split_f64(a)))
    y = np.asarray(jax.block_until_ready(rt(xj)))
    same = (np.array_equal(
        x.view(np.uint64), y.view(np.uint64)))
    print(f"[probe] bit-exact roundtrip (incl nan/inf/±0/subnormal): "
          f"{same}", flush=True)
    if not same:
        bad = np.nonzero(x.view(np.uint64) != y.view(np.uint64))[0][:5]
        for i in bad:
            print(f"  x={x[i]!r} -> {y[i]!r}", flush=True)

    t0 = time.perf_counter()
    for _ in range(2):
        _sync(rt(xj))
    outs = [rt(xj) for _ in range(8)]
    _sync(outs[-1])
    t0 = time.perf_counter()
    outs = [rt(xj) for _ in range(8)]
    _sync(outs[-1])
    print(f"[probe] roundtrip 1M f64: "
          f"{(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
