"""Sample-sort probe (VERDICT r4 #5): can round-4's bucket-exchange
machinery beat the 12.5 ms fused-u64 mono sort at 8.4M (key u32,
payload u32) rows?

Composition under test (order-preserving digits instead of hash):
  A. per-8192-block fused-u64 1-op sort (groups the top-5-bit digit
     runs contiguously AND pre-sorts within blocks)
  B. bucket_exchange of the (key, payload) u32 word pair into K=32
     padded buckets (CAP=384 per (block, digit) cell)
  C. per-bucket sorts: batched u64 sort over the [K, B*CAP] layout
     (still 393k rows per bucket at 8.4M — far beyond the 8192 VMEM
     sweet spot, so this stage is priced like a mono sort of
     1.5x the data, pads included)
plus the measured floor of a second exchange round (1024 buckets would
bring per-bucket sizes back to the VMEM sweet spot, but pads compound:
1.5x -> 2.25x data amplification).

Run on TPU: python tools/samplesort_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from polaroid_tpu.ops.exchange import CAP, K, S, bucket_exchange

N = 1 << 23
B = N // S
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 1 << 32, N, np.int64).astype(np.uint32))
pay = jnp.asarray(rng.integers(0, 1 << 32, N, np.int64).astype(np.uint32))


def bench(fn, *args, iters=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    np.asarray(leaf.reshape(-1)[:1])
    return (time.perf_counter() - t0) / iters


@jax.jit
def mono_fused(key, pay):
    f = (key.astype(jnp.uint64) << jnp.uint64(32)) | pay.astype(jnp.uint64)
    s = jax.lax.sort((f,), num_keys=1, is_stable=False)[0]
    return (s >> jnp.uint64(32)).astype(jnp.uint32), \
        (s & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)


@jax.jit
def stage_a(key, pay):
    f = (key.astype(jnp.uint64) << jnp.uint64(32)) | pay.astype(jnp.uint64)
    return jax.lax.sort((f.reshape(B, S),), dimension=1, num_keys=1,
                        is_stable=False)[0]


@jax.jit
def stage_ab(key, pay):
    fb = stage_a(key, pay)
    kb = (fb >> jnp.uint64(32)).astype(jnp.uint32)
    pb = (fb & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    dig = kb >> jnp.uint32(27)                      # top-5-bit digit
    # run extents per (block, digit)
    kk = jnp.arange(K, dtype=jnp.uint32)
    lt = (dig[:, None, :] < kk[None, :, None]).sum(axis=2)  # (B, K)
    starts = lt.astype(jnp.int32)
    tot = jnp.full((B, 1), S, jnp.int32)
    ends = jnp.concatenate([starts[:, 1:], tot], axis=1)
    counts = ends - starts
    ex = bucket_exchange(starts, counts,
                         [kb.reshape(-1), pb.reshape(-1)],
                         (0xFFFFFFFF, 0xFFFFFFFF))
    return ex[0], ex[1], counts


@jax.jit
def stage_abc(key, pay):
    ek, ep, counts = stage_ab(key, pay)
    f = (ek.astype(jnp.uint64) << jnp.uint64(32)) | ep.astype(jnp.uint64)
    s = jax.lax.sort((f,), dimension=1, num_keys=1, is_stable=False)[0]
    return s, counts


@jax.jit
def batched_bucket_sort_only(key, pay):
    # price stage C alone on the padded [K, B*CAP] volume
    f = (key.astype(jnp.uint64) << jnp.uint64(32)) | pay.astype(jnp.uint64)
    g = jnp.broadcast_to(f[:B * CAP], (K, B * CAP))
    return jax.lax.sort((g,), dimension=1, num_keys=1, is_stable=False)[0]


t_mono = bench(mono_fused, key, pay)
print(f"mono fused-u64 sort (current primitive): {t_mono*1e3:.2f} ms")
t_a = bench(stage_a, key, pay)
print(f"A: blocked fused-u64 sort:               {t_a*1e3:.2f} ms")
t_ab = bench(stage_ab, key, pay)
print(f"A+B: + 2-word bucket exchange:           {t_ab*1e3:.2f} ms")
t_abc = bench(stage_abc, key, pay)
print(f"A+B+C: + batched per-bucket u64 sort:    {t_abc*1e3:.2f} ms")
t_c = bench(batched_bucket_sort_only, key, pay)
print(f"C alone ([32 x 393k] padded u64 sort):   {t_c*1e3:.2f} ms")

# correctness of the composed pipeline (pads sort to the tail of each
# bucket; global order = bucket-major concat of live prefixes)
s, counts = stage_abc(key, pay)
s = np.asarray(s)
kk = np.asarray(key)
pp = np.asarray(pay)
want = np.sort((kk.astype(np.uint64) << np.uint64(32)) | pp)
got = []
ctot = np.asarray(stage_ab(key, pay)[2])
for k in range(K):
    nk = int(ctot.sum(axis=0)[k]) if False else None
live = s[s != np.uint64(0xFFFFFFFFFFFFFFFF)]
# pads are 0xFFFF... for BOTH words; real rows with that exact u64 are
# astronomically unlikely in this fixture
assert live.shape[0] == N, (live.shape, N)
assert (live == want).all(), "composed sample-sort ordering mismatch"
print("composed pipeline correctness: OK")
