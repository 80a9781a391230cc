"""Sort cost ground truth under x64 (the engine reality): mono 1/2-op
sorts, the fused-u64 path, argsort variants — the numbers cited in
ops/fused_sort.py. Earlier probes without jax_enable_x64 silently
truncated u64 to u32 and measured fantasy numbers.
"""
import sys, os, time, json
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/pt_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception: pass
def _sync(o): return np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
def bench(fn, args, iters=10, warmup=2):
    for _ in range(warmup): _sync(fn(*args))
    t0=time.perf_counter(); outs=[fn(*args) for _ in range(iters)]; _sync(outs[-1])
    total=time.perf_counter()-t0; t1=time.perf_counter(); _sync(outs[0])
    return max((total-(time.perf_counter()-t1))/iters,1e-9)
def phase(nm, fn, args, iters=10):
    try: print(nm, round(bench(jax.jit(fn), args, iters)*1e3,3), flush=True)
    except Exception as e: print(nm, "ERR", str(e)[:140], flush=True)
n=1<<23; rng=np.random.default_rng(0)
k = jnp.asarray(rng.integers(0,1000,n).astype(np.uint32))
c = jnp.asarray(rng.integers(0,1<<32,n,dtype=np.uint64).astype(np.uint32))
w64 = jnp.asarray(rng.integers(0,1<<62,n,dtype=np.uint64))
assert w64.dtype == jnp.uint64
_sync(k); _sync(c); _sync(w64)
phase("mono_1op_u32", lambda a: jax.lax.sort((a,),num_keys=1,is_stable=False), (c,), 5)
phase("mono_1op_u64", lambda a: jax.lax.sort((a,),num_keys=1,is_stable=False), (w64,), 5)
phase("mono_2op_unstable", lambda a,b: jax.lax.sort((a,b),num_keys=1,is_stable=False), (k,c), 5)
phase("mono_2op_stable", lambda a,b: jax.lax.sort((a,b),num_keys=1,is_stable=True), (k,c), 5)
from polaroid_tpu.ops.fused_sort import fused_sort_kv, fused_argsort
phase("fused_kv_full", lambda a,b: fused_sort_kv(a,b), (k,c), 5)
phase("fused_argsort_full", lambda a: fused_argsort(a), (k,), 5)
# 2-key stable sort the old way for argsort comparison (key + idx via stable flag):
phase("argsort_2op_stable", lambda a: jax.lax.sort((a, jnp.arange(n,dtype=jnp.int32)),num_keys=1,is_stable=True), (k,), 5)
