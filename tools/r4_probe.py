"""Round-4 spot-check on hardware: fused sort primitive + engine sort
path + H2O q6/q8/q9 at 4M rows."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

import polaroid_tpu as pl
from polaroid_tpu.ops.fused_sort import fused_argsort, fused_sort_kv


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


def _fence_df(dfr):
    t = dfr._table
    if t.nrows_dev is not None:
        np.asarray(t.nrows_dev).reshape(-1)[:1]
    col = t.cols[t.names[0]]
    leaf = col.data if col.data is not None else col.validity
    if leaf is not None:
        np.asarray(leaf.reshape(-1)[:1])


def bench_collect(lfr, iters=3):
    _fence_df(lfr.collect())
    t0 = time.perf_counter()
    outs = [lfr.collect() for _ in range(iters)]
    _fence_df(outs[-1])
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    _fence_df(outs[0])
    fetch = time.perf_counter() - t1
    return max((total - fetch) / iters, 1e-9)


d = {}
n = 1 << 23
rng = np.random.default_rng(0)
sym = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint32))
price = jnp.asarray(rng.uniform(1, 200, n).astype(np.float32))
_sync(price)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "sort"):
    @jax.jit
    def op_sort(sym, price):
        pw = jax.lax.bitcast_convert_type(price, jnp.uint32)
        sk, sc = fused_sort_kv(sym, pw)
        return sk, jax.lax.bitcast_convert_type(sc, jnp.float32)

    d["sort_fused_ms"] = round(bench(op_sort, (sym, price)) * 1e3, 3)
    print("sort_fused", d["sort_fused_ms"], flush=True)

    d["argsort_ms"] = round(bench(jax.jit(fused_argsort), (sym,)) * 1e3, 3)
    print("argsort", d["argsort_ms"], flush=True)

    # engine-level table sort (DataFrame.sort through the fused path)
    df = pl.DataFrame({"symbol": np.asarray(sym), "price": np.asarray(price)})
    lf = df.lazy().sort("symbol")
    d["engine_sort_e2e_ms"] = round(bench_collect(lf) * 1e3, 3)
    print("engine_sort_e2e", d["engine_sort_e2e_ms"], flush=True)

if which in ("all", "h2o"):
    nh = 1 << 22
    k = 100
    id3_u = nh // 10
    hdf = pl.DataFrame({
        "id2": np.asarray(rng.integers(0, k, nh), np.int32),
        "id4": np.asarray(rng.integers(0, k, nh), np.int32),
        "id5": np.asarray(rng.integers(0, k, nh), np.int32),
        "id6": np.asarray(rng.integers(0, id3_u, nh), np.int32),
        "v1": np.asarray(rng.integers(1, 6, nh), np.int32),
        "v2": np.asarray(rng.integers(1, 16, nh), np.int32),
        "v3": np.asarray(rng.uniform(0, 100, nh), np.float32)})
    qs = {
        "q6": hdf.lazy().group_by("id4", "id5").agg(
            pl.col("v3").median().alias("median_v3"),
            pl.col("v3").std().alias("sd_v3")),
        "q8": hdf.lazy().with_columns(
            pl.col("v3").rank("ordinal", descending=True).over("id6")
            .alias("r")).filter(pl.col("r") <= 2).select("id6", "v3"),
        "q9": hdf.lazy().group_by("id2", "id4").agg(
            (pl.corr("v1", "v2") ** 2).alias("r2")),
    }
    for qn, lfq in qs.items():
        t0 = time.perf_counter()
        try:
            lfq.collect()
            d[f"h2o_{qn}_compile_s"] = round(time.perf_counter() - t0, 1)
            d[f"h2o_{qn}_ms"] = round(bench_collect(lfq) * 1e3, 3)
        except Exception as e:
            d[f"h2o_{qn}_ms"] = f"ERR {type(e).__name__}: {str(e)[:200]}"
        print(qn, d.get(f"h2o_{qn}_ms"), flush=True)

if which in ("all", "strings"):
    import tempfile
    tmp = tempfile.mkdtemp()
    uniq = np.char.add("id", rng.integers(0, 1 << 20, 1 << 20).astype("U7"))
    codes_h = rng.integers(0, len(uniq), n).astype(np.int32)
    strs = uniq[codes_h]
    v1h = np.asarray(rng.integers(0, 5, n), np.int32)
    t0 = time.perf_counter()
    sdf = pl.DataFrame({"id3": strs, "v1": v1h})
    d["string_dict_build_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
    print("numpy build", d["string_dict_build_ms"], flush=True)
    spq = os.path.join(tmp, "strings.parquet")
    sdf.write_parquet(spq, compression="zstd", compression_level=1)
    t0 = time.perf_counter()
    rdf = pl.read_parquet(spq)
    d["string_parquet_read_ms"] = round((time.perf_counter() - t0) * 1e3, 3)
    print("parquet read", d["string_parquet_read_ms"], flush=True)
    slf = (rdf.lazy().group_by("id3").agg(pl.col("v1").sum().alias("s")))
    slf.collect()
    d["string_groupby_ms"] = round(bench_collect(slf) * 1e3, 3)
    print("string groupby", d["string_groupby_ms"], flush=True)

print(json.dumps(d))
