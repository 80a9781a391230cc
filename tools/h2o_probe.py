"""h2o q1-q10 on the real chip: per-query timing after the r5 combo +
fused-rank work (compare BENCH_r04 / .bench_last_good details)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import polaroid_tpu as pl


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    nh = 1 << 22
    k = 100
    id3_u = nh // 10
    hdf = pl.DataFrame({
        "id1": np.asarray(rng.integers(0, k, nh), np.int32),
        "id2": np.asarray(rng.integers(0, k, nh), np.int32),
        "id3": np.asarray(rng.integers(0, id3_u, nh), np.int32),
        "id4": np.asarray(rng.integers(0, k, nh), np.int32),
        "id5": np.asarray(rng.integers(0, k, nh), np.int32),
        "id6": np.asarray(rng.integers(0, id3_u, nh), np.int32),
        "v1": np.asarray(rng.integers(1, 6, nh), np.int32),
        "v2": np.asarray(rng.integers(1, 16, nh), np.int32),
        "v3": np.asarray(rng.uniform(0, 100, nh), np.float32)})
    qs = {
        "q1": hdf.lazy().group_by("id1").agg(pl.col("v1").sum()),
        "q2": hdf.lazy().group_by("id1", "id2").agg(pl.col("v1").sum()),
        "q3": hdf.lazy().group_by("id3").agg(
            pl.col("v1").sum(), pl.col("v3").mean()),
        "q4": hdf.lazy().group_by("id4").agg(
            pl.col("v1").mean(), pl.col("v2").mean(), pl.col("v3").mean()),
        "q5": hdf.lazy().group_by("id6").agg(
            pl.col("v1").sum(), pl.col("v2").sum(), pl.col("v3").sum()),
        "q6": hdf.lazy().group_by("id4", "id5").agg(
            pl.col("v3").median().alias("median_v3"),
            pl.col("v3").std().alias("sd_v3")),
        "q7": hdf.lazy().group_by("id3").agg(
            (pl.col("v1").max() - pl.col("v2").min()).alias("range_v1_v2")),
        "q8": hdf.lazy().with_columns(
            pl.col("v3").rank("ordinal", descending=True).over("id6")
            .alias("r")).filter(pl.col("r") <= 2).select("id6", "v3"),
        "q9": hdf.lazy().group_by("id2", "id4").agg(
            (pl.corr("v1", "v2") ** 2).alias("r2")),
        "q10": hdf.lazy().group_by("id1", "id2", "id4").agg(
            pl.col("v3").sum().alias("v3"), pl.len().alias("count")),
    }

    def fence(df):
        t = df._table
        for nm in t.names:
            c = t.cols[nm]
            if c.data is not None and getattr(c.data, "ndim", 0) >= 1:
                np.asarray(jax.device_get(c.data[:1]))
                break

    out = {}
    total = 0.0
    for qn, lfq in qs.items():
        try:
            fence(lfq.collect())  # compile + warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                outs = [lfq.collect() for _ in range(3)]
                fence(outs[-1])
                best = min(best, (time.perf_counter() - t0) / 3)
            out[qn] = round(best * 1e3, 3)
            total += best
        except Exception as exc:  # noqa: BLE001
            out[qn] = f"{type(exc).__name__}: {exc}"[:120]
        print(qn, out[qn], flush=True)
    out["total_ms"] = round(total * 1e3, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
