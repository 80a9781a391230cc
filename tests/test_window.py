"""Order-dependent ops: shift/diff/cum/rolling/rank/fill."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_shift_diff():
    df = pl.DataFrame({"a": [1, 3, 6, 10]})
    d = df.select(pl.col("a").shift(1).alias("s"),
                  pl.col("a").shift(-1).alias("sn"),
                  pl.col("a").shift(1, fill_value=0).alias("sf"),
                  pl.col("a").diff().alias("d")).to_dict()
    assert d["s"] == [None, 1, 3, 6]
    assert d["sn"] == [3, 6, 10, None]
    assert d["sf"] == [0, 1, 3, 6]
    assert d["d"] == [None, 2, 3, 4]


def test_pct_change():
    df = pl.DataFrame({"a": [100.0, 110.0, 99.0]})
    d = df.select(pl.col("a").pct_change().alias("p")).to_dict()["p"]
    assert d[0] is None
    assert abs(d[1] - 0.1) < 1e-9
    assert abs(d[2] + 0.1) < 1e-9


def test_cum_ops():
    df = pl.DataFrame({"a": [1, 2, None, 4]})
    d = df.select(pl.col("a").cum_sum().alias("cs"),
                  pl.col("a").cum_max().alias("cm"),
                  pl.col("a").cum_count().alias("cc")).to_dict()
    assert d["cs"] == [1, 3, None, 7]
    assert d["cm"] == [1, 2, None, 4]
    assert d["cc"] == [1, 2, 2, 3]


def test_cum_sum_reverse():
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.select(pl.col("a").cum_sum(reverse=True).alias("c")) \
        .to_dict() == {"c": [6, 5, 3]}


def test_window_after_filter():
    df = pl.DataFrame({"a": [1, 2, 3, 4, 5]})
    out = df.filter(pl.col("a") % 2 == 1).select(
        pl.col("a").shift(1).alias("s"), pl.col("a").cum_sum().alias("c"))
    assert out.to_dict() == {"s": [None, 1, 3], "c": [1, 4, 9]}


def test_rolling_sum_mean():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 5.0]})
    d = df.select(pl.col("a").rolling_sum(3).alias("rs"),
                  pl.col("a").rolling_mean(3).alias("rm"),
                  pl.col("a").rolling_min(2).alias("rmin"),
                  pl.col("a").rolling_max(2).alias("rmax")).to_dict()
    assert d["rs"] == [None, None, 6.0, 9.0, 12.0]
    assert d["rm"] == [None, None, 2.0, 3.0, 4.0]
    assert d["rmin"] == [None, 1.0, 2.0, 3.0, 4.0]
    assert d["rmax"] == [None, 2.0, 3.0, 4.0, 5.0]


def test_rolling_min_samples():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0]})
    d = df.select(pl.col("a").rolling_sum(3, min_samples=1).alias("r")) \
        .to_dict()["r"]
    assert d == [1.0, 3.0, 6.0]


def test_rolling_std_oracle(rng):
    import pandas as pd
    v = rng.normal(size=50)
    df = pl.DataFrame({"a": v})
    got = df.select(pl.col("a").rolling_std(7).alias("r")).to_dict()["r"]
    ref = pd.Series(v).rolling(7).std().tolist()
    for g, r in zip(got, ref):
        if r != r:
            assert g is None
        else:
            assert abs(g - r) < 1e-6


def test_rank():
    df = pl.DataFrame({"a": [3, 1, 3, 2]})
    d = df.select(pl.col("a").rank().alias("avg"),
                  pl.col("a").rank("min").alias("mn"),
                  pl.col("a").rank("dense").alias("dn"),
                  pl.col("a").rank("ordinal").alias("orde")).to_dict()
    assert d["avg"] == [3.5, 1.0, 3.5, 2.0]
    assert d["mn"] == [3, 1, 3, 2]
    assert d["dn"] == [3, 1, 3, 2]
    assert d["orde"] == [3, 1, 4, 2]


def test_forward_backward_fill():
    df = pl.DataFrame({"a": [None, 1, None, None, 4, None]})
    d = df.select(pl.col("a").forward_fill().alias("f"),
                  pl.col("a").backward_fill().alias("b")).to_dict()
    assert d["f"] == [None, 1, 1, 1, 4, 4]
    assert d["b"] == [1, 1, 4, 4, 4, None]


def test_fill_null_strategies():
    df = pl.DataFrame({"a": [None, 1, None, 3]})
    d = df.select(
        pl.col("a").fill_null(strategy="forward").alias("f"),
        pl.col("a").fill_null(strategy="mean").alias("m"),
        pl.col("a").fill_null(strategy="zero").alias("z")).to_dict()
    assert d["f"] == [None, 1, 1, 3]
    assert d["m"] == [2, 1, 2, 3]
    assert d["z"] == [0, 1, 0, 3]


def test_interpolate():
    df = pl.DataFrame({"a": [1.0, None, 3.0]})
    d = df.select(pl.col("a").interpolate().alias("i")).to_dict()["i"]
    assert d == [1.0, 2.0, 3.0]


def test_ewm_mean_adjust():
    import pandas as pd
    v = [1.0, 2.0, 3.0, 4.0]
    df = pl.DataFrame({"a": v})
    got = df.select(pl.col("a").ewm_mean(alpha=0.5).alias("e")).to_dict()["e"]
    ref = pd.Series(v).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert np.allclose(got, ref)


def test_reverse_expr():
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.select(pl.col("a").reverse()).to_dict() == {"a": [3, 2, 1]}


def test_is_duplicated_unique_first():
    df = pl.DataFrame({"a": [1, 2, 1, 3]})
    d = df.select(pl.col("a").is_duplicated().alias("d"),
                  pl.col("a").is_unique().alias("u"),
                  pl.col("a").is_first_distinct().alias("f")).to_dict()
    assert d["d"] == [True, False, True, False]
    assert d["u"] == [False, True, False, True]
    assert d["f"] == [True, True, False, True]


def test_sort_expr_within_select():
    df = pl.DataFrame({"a": [3, 1, 2]})
    assert df.select(pl.col("a").sort().alias("s")).to_dict() == \
        {"s": [1, 2, 3]}
    assert df.select(pl.col("a").sort(descending=True).alias("s")) \
        .to_dict() == {"s": [3, 2, 1]}


def _brute_by_window(tv, lo_bound, hi_bound, closed):
    if closed == "right":
        return (tv > lo_bound) & (tv <= hi_bound)
    if closed == "both":
        return (tv >= lo_bound) & (tv <= hi_bound)
    if closed == "left":
        return (tv >= lo_bound) & (tv < hi_bound)
    return (tv > lo_bound) & (tv < hi_bound)


@pytest.mark.parametrize("closed", ["right", "both", "left", "none"])
def test_rolling_order_stats_by(closed):
    import pandas as pd
    rng = np.random.default_rng(3)
    n = 200
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 1200, n)), unit="m")  # duplicates likely
    x = rng.normal(0, 10, n).round(2)
    nulls = rng.random(n) < 0.1
    xs = [None if m else float(v) for v, m in zip(x, nulls)]
    x[nulls] = np.nan
    df = pl.DataFrame({"t": list(ts.to_pydatetime()), "x": xs})
    out = df.select(
        pl.col("x").rolling_median_by("t", "3h", closed=closed).alias("med"),
        pl.col("x").rolling_quantile_by(
            "t", "3h", quantile=0.25, interpolation="linear",
            closed=closed).alias("q"),
        pl.col("x").rolling_rank_by("t", "3h", closed=closed).alias("rk"),
        pl.col("x").rolling_sum_by("t", "3h", closed=closed).alias("s"),
    ).to_dict()
    med = np.array([np.nan if v is None else v for v in out["med"]], float)
    q = np.array([np.nan if v is None else v for v in out["q"]], float)
    rk = np.array([np.nan if v is None else v for v in out["rk"]], float)
    s = np.array([np.nan if v is None else v for v in out["s"]], float)
    tv = ts.values.astype("datetime64[ns]").astype(np.int64)
    p = int(pd.Timedelta("3h").value)
    for i in range(n):
        w = x[_brute_by_window(tv, tv[i] - p, tv[i], closed)]
        w = w[~np.isnan(w)]
        if len(w) == 0:
            assert np.isnan(med[i]) and np.isnan(s[i])
            continue
        assert np.isclose(med[i], np.median(w))
        assert np.isclose(q[i], np.quantile(w, 0.25))
        assert np.isclose(s[i], w.sum())
        if not np.isnan(x[i]):
            ref = (w < x[i]).sum() + ((w == x[i]).sum() + 1) / 2.0
            assert np.isclose(rk[i], ref)


def test_rolling_by_month_periods():
    import pandas as pd
    rng = np.random.default_rng(4)
    tv = (pd.to_datetime("2024-01-15") + pd.to_timedelta(
        np.sort(rng.integers(0, 200, 150)), unit="D")).values
    x = rng.normal(0, 5, 150).round(2)
    df = pl.DataFrame({"t": [pd.Timestamp(d).to_pydatetime() for d in tv],
                       "x": x.tolist()})
    out = df.select(
        pl.col("x").rolling_sum_by("t", "1mo").alias("s"),
        pl.col("x").rolling_median_by("t", "2mo").alias("m")).to_dict()
    for i in range(150):
        lo1 = np.datetime64(pd.Timestamp(tv[i]) - pd.DateOffset(months=1))
        lo2 = np.datetime64(pd.Timestamp(tv[i]) - pd.DateOffset(months=2))
        assert np.isclose(out["s"][i], x[(tv > lo1) & (tv <= tv[i])].sum())
        assert np.isclose(out["m"][i],
                          np.median(x[(tv > lo2) & (tv <= tv[i])]))
    # Date-typed by column
    dfd = pl.DataFrame({"t": [pd.Timestamp(d).date() for d in tv],
                        "x": x.tolist()})
    outd = dfd.select(
        pl.col("x").rolling_mean_by("t", "1mo").alias("mn")).to_dict()
    for i in range(150):
        lo1 = np.datetime64(pd.Timestamp(tv[i]) - pd.DateOffset(months=1))
        assert np.isclose(outd["mn"][i],
                          x[(tv > lo1) & (tv <= tv[i])].mean())
