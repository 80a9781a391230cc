"""MXU M-fill probe (VERDICT r4 #7): would batching 8 sub-tiles into
the dot's M dimension lift the dense q1 kernel?

The q1 one-hot dot emits M = C*ghi = 16 of 128 MXU rows. The proposed
fix — tile 8 sub-tiles' group-stashes into M=128 — requires a
block-diagonal A (each sub-tile's rows are nonzero only against its own
slice of the contraction), and the MXU does not skip zero MACs.

Measured on v5e (this probe, f32 HIGHEST, K = 2^20):
    M=16 : 3.14 ms  (1.37 TF/s)
    M=128: 3.82 ms  (8.99 TF/s)
A dot is K-bound: growing M 16 -> 128 costs only 1.22x. Therefore the
block-diagonal M-fill issues 8x the MACs (7/8 of them zeros) to save
that 1.22x — a net ~6.5x LOSS per useful row. The sub-tile pipelining
already in the kernel (ops/pallas_kernels.py _seg_sum_kernel) is the
right formulation; the 16/128 shape bound is inherent to one-hot
segment sums with C*G << 128*128.

Run on TPU: python tools/mxu_mfill_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
K0 = 1 << 20
b = jnp.asarray(rng.random((K0, 128), np.float32))


def bench(m):
    a = jnp.asarray(rng.random((m, K0), np.float32))
    f = jax.jit(lambda a, b: jax.lax.dot(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32))
    o = f(a, b)
    np.asarray(o[:1, :1])
    t0 = time.perf_counter()
    outs = [f(a, b) for _ in range(10)]
    np.asarray(outs[-1][:1, :1])
    return (time.perf_counter() - t0) / 10


if __name__ == "__main__":
    for m in (16, 128):
        t = bench(m)
        print(f"M={m:4d}: {t*1e3:.3f} ms  ({m*K0*128*2/t/1e12:.2f} TF/s)")
