"""Grouped windows: expr.over(partition) vs pandas groupby oracle."""

import numpy as np
import pandas as pd
import pytest

import polaroid_tpu as pl


def test_agg_over_broadcast():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.select(
        pl.col("k"),
        pl.col("v").sum().over("k").alias("s"),
        pl.col("v").mean().over("k").alias("m"),
        pl.col("v").max().over("k").alias("mx"),
        pl.len().over("k").alias("n"),
    )
    assert out.to_dict() == {
        "k": ["a", "b", "a", "b", "a"],
        "s": [9, 6, 9, 6, 9],
        "m": [3.0, 3.0, 3.0, 3.0, 3.0],
        "mx": [5, 4, 5, 4, 5],
        "n": [3, 2, 3, 2, 3]}


def test_agg_combo_over():
    df = pl.DataFrame({"k": [1, 1, 2], "v": [1.0, 3.0, 10.0]})
    out = df.select(
        ((pl.col("v") - pl.col("v").mean().over("k"))).alias("centered"))
    assert out.to_dict() == {"centered": [-1.0, 1.0, 0.0]}


def test_shift_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.select(pl.col("v").shift(1).over("k").alias("s"))
    assert out.to_dict() == {"s": [None, None, 1, 2, 3]}


def test_diff_pct_change_over():
    df = pl.DataFrame({"k": ["a", "a", "b", "a", "b"],
                       "v": [1.0, 3.0, 10.0, 6.0, 30.0]})
    d = df.select(pl.col("v").diff().over("k").alias("d"),
                  pl.col("v").pct_change().over("k").alias("p")).to_dict()
    assert d["d"] == [None, 2.0, None, 3.0, 20.0]
    assert d["p"][1] == 2.0 and d["p"][4] == 2.0


def test_cum_sum_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.select(pl.col("v").cum_sum().over("k").alias("c"),
                    pl.col("v").cum_max().over("k").alias("cm"),
                    pl.col("v").cum_count().over("k").alias("cc"))
    assert out.to_dict() == {"c": [1, 2, 4, 6], "cm": [1, 2, 3, 4],
                             "cc": [1, 1, 2, 2]}


def test_rank_over():
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [10, 30, 10, 5, 1]})
    d = df.select(pl.col("v").rank("ordinal").over("k").alias("o"),
                  pl.col("v").rank("min").over("k").alias("mn"),
                  pl.col("v").rank("dense").over("k").alias("dn"),
                  pl.col("v").rank().over("k").alias("avg")).to_dict()
    assert d["o"] == [1, 3, 2, 2, 1]
    assert d["mn"] == [1, 3, 1, 2, 1]
    assert d["dn"] == [1, 2, 1, 2, 1]
    assert d["avg"] == [1.5, 3.0, 1.5, 2.0, 1.0]


def test_forward_fill_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, None, None, 4, None]})
    d = df.select(pl.col("v").forward_fill().over("k").alias("f"),
                  pl.col("v").backward_fill().over("k").alias("b")).to_dict()
    assert d["f"] == [1, None, 1, 4, 1]
    assert d["b"] == [1, 4, None, 4, None]


def test_over_with_nulls_in_values():
    df = pl.DataFrame({"k": [1, 1, 1, 2], "v": [1, None, 3, 4]})
    d = df.select(pl.col("v").sum().over("k").alias("s"),
                  pl.col("v").count().over("k").alias("c")).to_dict()
    assert d["s"] == [4, 4, 4, 4]
    assert d["c"] == [2, 2, 2, 1]


def test_over_multiple_partitions():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "y", "x", "x", "x"],
                       "v": [10, 20, 30, 40, 50]})
    out = df.select(pl.col("v").sum().over("a", "b").alias("s"))
    assert out.to_dict() == {"s": [60, 20, 70, 70, 60]}


def test_over_random_oracle(rng):
    n = 2000
    k = rng.integers(0, 20, n)
    v = rng.normal(size=n)
    df = pl.DataFrame({"k": k, "v": v})
    got = df.select(pl.col("v").sum().over("k").alias("s"),
                    pl.col("v").cum_sum().over("k").alias("cs"),
                    pl.col("v").shift(1).over("k").alias("sh")).to_dict()
    pdf = pd.DataFrame({"k": k, "v": v})
    g = pdf.groupby("k")["v"]
    assert np.allclose(got["s"], g.transform("sum").values)
    assert np.allclose(got["cs"], g.cumsum().values)
    sh = g.shift(1).values
    for a, b in zip(got["sh"], sh):
        if b != b:
            assert a is None
        else:
            assert abs(a - b) < 1e-9


def test_over_after_filter():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.filter(pl.col("v") > 1).select(
        pl.col("v").cum_sum().over("k").alias("c"))
    assert out.to_dict() == {"c": [2, 3, 6, 8]}


def test_rolling_ewm_reverse_over_groups():
    import pandas as pd
    import pytest as _pytest
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [1.0, 2.0, 4.0, 10.0, 20.0]})
    sel = lambda e: df.select(e.alias("x")).to_dict()["x"]  # noqa: E731
    ref = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                        "v": [1.0, 2, 4, 10, 20]})
    rm = ref.groupby("k").v.rolling(2, min_periods=1).mean() \
        .reset_index(drop=True).tolist()
    assert sel(pl.col("v").rolling_mean(2, min_samples=1).over("k")) == \
        _pytest.approx(rm)
    assert sel(pl.col("v").rolling_sum(2, min_samples=1).over("k")) == \
        [1.0, 3.0, 6.0, 10.0, 30.0]
    assert sel(pl.col("v").rolling_min(2, min_samples=1).over("k")) == \
        [1.0, 1.0, 2.0, 10.0, 10.0]
    assert sel(pl.col("v").rolling_max(2, min_samples=1).over("k")) == \
        [1.0, 2.0, 4.0, 10.0, 20.0]
    re = ref.groupby("k").v.apply(lambda s: s.ewm(alpha=0.5).mean()).tolist()
    assert sel(pl.col("v").ewm_mean(alpha=0.5).over("k")) == \
        _pytest.approx(re)
    assert sel(pl.col("v").reverse().over("k")) == \
        [4.0, 2.0, 1.0, 20.0, 10.0]


def test_rolling_by_over_groups():
    import pandas as pd
    rng = np.random.default_rng(5)
    n = 150
    g = rng.choice(["a", "b"], n)
    t = np.empty(n, "datetime64[ns]")
    for k in ("a", "b"):
        m = g == k
        t[m] = (pd.to_datetime("2024-01-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 900, m.sum())), unit="m")).values
    x = rng.normal(0, 10, n).round(2)
    df = pl.DataFrame({"g": g.tolist(),
                       "t": [pd.Timestamp(v).to_pydatetime() for v in t],
                       "x": x.tolist()})
    out = df.select(
        pl.col("x").rolling_sum_by("t", "2h").over("g").alias("s"),
        pl.col("x").rolling_median_by("t", "2h").over("g").alias("m"),
    ).to_dict()
    tv = t.astype(np.int64)
    p = int(pd.Timedelta("2h").value)
    for i in range(n):
        w = x[(g == g[i]) & (tv > tv[i] - p) & (tv <= tv[i])]
        assert np.isclose(out["s"][i], w.sum())
        assert np.isclose(out["m"][i], np.median(w))
