"""Why does the 1M-unique string group-by degrade in bench context?

Fresh process: ~53 ms via the hash route (bench.py comment). In bench
context r4 measured 131.7 ms, and one r5 run measured 361 ms. This probe
measures the collect loop with host-side phase timers, optionally after
replaying the memory-heavy phases that precede it in bench.py.

Run: python tools/string_probe_r5.py [--context]
"""
import cProfile
import io
import pstats
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import polaroid_tpu as pl

n = 1 << 23
rng = np.random.default_rng(0)

if "--context" in sys.argv:
    # replay the allocation-heavy shape of the phases that precede the
    # string phase in bench.py (q1 arrays, parquet frame, sorts)
    price = jnp.asarray(rng.uniform(1, 200, n).astype(np.float32))
    volume = jnp.asarray(rng.integers(0, 5000, n).astype(np.int32))
    sym = jnp.asarray(rng.integers(0, 1000, n).astype(np.uint32))
    df = pl.DataFrame({"symbol": np.asarray(sym), "price": np.asarray(price),
                       "volume": np.asarray(volume)})
    lf = (df.lazy().filter(pl.col("volume") > 1000)
          .group_by("symbol").agg(pl.len().alias("n")))
    lf.collect()
    from polaroid_tpu.ops.sort import sort_table
    sdf0 = df.sort("price")
    np.asarray(sdf0._table.cols["price"].data[:1])

uniq = np.char.add("id", rng.integers(0, 1 << 20, 1 << 20).astype("U7"))
codes_h = rng.integers(0, len(uniq), n).astype(np.int32)
strs = uniq[codes_h]
v1h = np.asarray(rng.integers(0, 5, n), np.int32)

t0 = time.perf_counter()
sdf = pl.DataFrame({"id3": strs, "v1": v1h})
print(f"dict build: {(time.perf_counter()-t0)*1e3:.1f} ms")

slf = sdf.lazy().group_by("id3").agg(pl.col("v1").sum().alias("s"))


def fence(dfr):
    t = dfr._table
    col = t.cols[t.names[0]]
    leaf = col.data if col.data is not None else col.validity
    np.asarray(leaf.reshape(-1)[:1])


t0 = time.perf_counter()
fence(slf.collect())
print(f"compile+first: {(time.perf_counter()-t0)*1e3:.1f} ms")

# steady state, 3 iters, with host-time split
for trial in range(3):
    t0 = time.perf_counter()
    outs = [slf.collect() for _ in range(3)]
    dispatch = time.perf_counter() - t0
    fence(outs[-1])
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    fence(outs[0])
    fetch = time.perf_counter() - t1
    print(f"trial {trial}: host dispatch {dispatch*1e3:.1f} ms, "
          f"total {total*1e3:.1f} ms, refetch {fetch*1e3:.1f} ms, "
          f"per-query {(total-fetch)/3*1e3:.1f} ms")

# host-side profile of the dispatch path
pr = cProfile.Profile()
pr.enable()
out = slf.collect()
pr.disable()
fence(out)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
print(s.getvalue())
