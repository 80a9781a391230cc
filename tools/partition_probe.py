"""Stage-level probe of the filter compaction kernel (VERDICT r4 #6).

filter_ms has sat at ~8.5 ms (0.03 of roofline) for two rounds with no
artifact explaining why. The pipeline is
  (1) per-8192-block 4-operand lax.sort on (dead<<13|idx, 3 payloads)
  (2) sequential-grid Pallas prefix-concat of the live prefixes
This measures each stage in isolation plus candidate reformulations:
  key-only sort + per-block take_along_axis gathers, and u64
  key+payload fused per-block sorts.

Run on TPU (NOT under timeout): python tools/partition_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from polaroid_tpu.ops.pallas_partition import (_S, _prefix_concat,
                                               compact_words,
                                               use_partition_kernel)

N = 1 << 23
B = N // _S
rng = np.random.default_rng(0)
price = jnp.asarray(rng.uniform(1, 200, N).astype(np.float32))
volume = jnp.asarray(rng.integers(0, 5000, N).astype(np.int32))
sym = jnp.asarray(rng.integers(0, 1000, N).astype(np.uint32))
mask = jnp.asarray((rng.random(N) < 0.37))

print("partition kernel available:", use_partition_kernel())


def bench(fn, *args, iters=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    np.asarray(leaf.reshape(-1)[:1])
    t = (time.perf_counter() - t0) / iters
    return t


words = [jax.lax.bitcast_convert_type(price, jnp.uint32),
         jax.lax.bitcast_convert_type(volume, jnp.uint32), sym]


@jax.jit
def full(mask, *ws):
    outs, cnt = compact_words(mask, list(ws))
    return outs, cnt


@jax.jit
def stage1_sort4(mask, *ws):
    lidx = jax.lax.broadcasted_iota(jnp.uint32, (B, _S), 1)
    key = jnp.where(mask.reshape(B, _S), jnp.uint32(0),
                    jnp.uint32(1) << jnp.uint32(13)) | lidx
    ops = (key,) + tuple(w.reshape(B, _S) for w in ws)
    return jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)


@jax.jit
def stage1_sort1(mask):
    lidx = jax.lax.broadcasted_iota(jnp.uint32, (B, _S), 1)
    key = jnp.where(mask.reshape(B, _S), jnp.uint32(0),
                    jnp.uint32(1) << jnp.uint32(13)) | lidx
    return jax.lax.sort((key,), dimension=1, num_keys=1, is_stable=False)[0]


@jax.jit
def keysort_gather(mask, *ws):
    skey = stage1_sort1(mask)
    perm = (skey & jnp.uint32(0x1FFF)).astype(jnp.int32)
    return [jnp.take_along_axis(w.reshape(B, _S), perm, axis=1)
            for w in ws]


@jax.jit
def fused_u64_blocked(mask, *ws):
    # one u64 (key14 << 32 | payload) sort per payload word
    lidx = jax.lax.broadcasted_iota(jnp.uint32, (B, _S), 1)
    key = jnp.where(mask.reshape(B, _S), jnp.uint32(0),
                    jnp.uint32(1) << jnp.uint32(13)) | lidx
    k64 = key.astype(jnp.uint64) << jnp.uint64(32)
    outs = []
    for w in ws:
        f = k64 | w.reshape(B, _S).astype(jnp.uint64)
        s = jax.lax.sort((f,), dimension=1, num_keys=1, is_stable=False)[0]
        outs.append((s & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    return outs


@jax.jit
def stage2_only(mask, *ws):
    counts = jnp.sum(mask.reshape(B, _S), axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return _prefix_concat(offs, *ws, n_ops=len(ws))


for name, fn, args in [
        ("full compact (4-op sort + concat)", full, (mask,) + tuple(words)),
        ("stage1: 4-op blocked sort", stage1_sort4, (mask,) + tuple(words)),
        ("stage1: 1-op key-only sort", stage1_sort1, (mask,)),
        ("stage2: prefix concat only", stage2_only, (mask,) + tuple(words)),
        ("keysort + take_along_axis x3", keysort_gather,
         (mask,) + tuple(words)),
        ("3x fused u64 1-op blocked sorts", fused_u64_blocked,
         (mask,) + tuple(words)),
]:
    try:
        t = bench(fn, *args)
        print(f"{name}: {t*1e3:.2f} ms")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}"[:200])

# correctness of keysort+gather vs full
outs, cnt = full(mask, *words)
kg = keysort_gather(mask, *words)
m = np.asarray(mask)
for i in range(3):
    a = np.asarray(stage1_sort4(mask, *words)[1 + i])
    b = np.asarray(kg[i])
    assert (a == b).all(), f"word {i} mismatch"
print("keysort+gather == 4-op sort: OK")
