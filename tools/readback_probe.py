"""Count device->host readbacks in one engine q1 collect (VERDICT r4 weak #1).

Each readback over the axon tunnel costs a full ~25 ms RTT; the single-query
latency regression (net 8.4 -> 38.6 ms) smells like exactly one extra sync.
Run on TPU: python tools/readback_probe.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import polaroid_tpu as pl

rng = np.random.default_rng(0)
n = 1 << 23
sym = rng.integers(0, 16, n).astype(np.int32)
price = rng.random(n).astype(np.float32) * 100
volume = rng.integers(0, 2000, n).astype(np.int32)

df = pl.DataFrame({"symbol": sym, "price": price, "volume": volume})
lf = (df.lazy().filter(pl.col("volume") > 1000)
      .with_columns((pl.col("price") * pl.col("volume")).alias("notional"))
      .group_by("symbol")
      .agg(pl.len().alias("n"), pl.col("notional").sum().alias("total"),
           pl.col("price").mean().alias("avg")))

out = lf.collect()  # warm/compile
t = out._table
col = t.cols[t.names[0]]
leaf = col.data if col.data is not None else col.validity
np.asarray(leaf.reshape(-1)[:1])

# --- instrument: wrap the low-level device_get to count + traceback ---
import traceback
import jax._src.api as _api

counts = []
orig = jax.device_get


def spy(x):
    counts.append(traceback.format_stack()[-8:-1])
    return orig(x)


# np.asarray on a jax.Array goes through __array__ -> _value -> copy_to_host
from jax._src.array import ArrayImpl
orig_arr = ArrayImpl.__array__


def spy_arr(self, *a, **k):
    counts.append("".join(traceback.format_stack()[-10:-1]))
    return orig_arr(self, *a, **k)


ArrayImpl.__array__ = spy_arr

t0 = time.perf_counter()
out = lf.collect()
mid = time.perf_counter()
t = out._table
col = t.cols[t.names[0]]
leaf = col.data if col.data is not None else col.validity
np.asarray(leaf.reshape(-1)[:1])
t1 = time.perf_counter()
ArrayImpl.__array__ = orig_arr

print(f"collect() host time: {(mid-t0)*1e3:.2f} ms; "
      f"fence: {(t1-mid)*1e3:.2f} ms; readbacks during collect+fence: "
      f"{len(counts)}")
for i, c in enumerate(counts):
    print(f"--- readback {i} ---")
    print(c if isinstance(c, str) else "".join(c))
