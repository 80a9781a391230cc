"""group_by_dynamic, rolling windows, timeseries ops."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

import polaroid_tpu as pl
from polaroid_tpu import timeseries as ts


def ts_range(start, n, step_s):
    return [start + dt.timedelta(seconds=i * step_s) for i in range(n)]


def test_group_by_dynamic_hourly():
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    times = ts_range(t0, 8, 30 * 60)  # every 30 min -> 4 hourly buckets
    df = pl.DataFrame({"t": times, "v": [1, 2, 3, 4, 5, 6, 7, 8]})
    out = df.group_by_dynamic("t", every="1h").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n"))
    assert out.to_dict()["s"] == [3, 7, 11, 15]
    assert out.to_dict()["n"] == [2, 2, 2, 2]
    assert out.to_dict()["t"][0] == t0


def test_group_by_dynamic_with_group():
    t0 = dt.datetime(2024, 1, 1)
    df = pl.DataFrame({
        "t": ts_range(t0, 6, 30 * 60),
        "sym": ["a", "b", "a", "b", "a", "b"],
        "v": [1.0, 10.0, 2.0, 20.0, 3.0, 30.0]})
    out = df.group_by_dynamic("t", every="1h", group_by="sym").agg(
        pl.col("v").sum().alias("s"))
    d = out.to_dict()
    assert d["sym"] == ["a", "a", "a", "b", "b", "b"]
    assert d["s"] == [1.0, 2.0, 3.0, 10.0, 20.0, 30.0]


def test_group_by_dynamic_int_index():
    df = pl.DataFrame({"i": [0, 1, 2, 3, 4, 5, 9], "v": [1] * 7})
    out = df.group_by_dynamic("i", every="3i").agg(pl.len().alias("n"))
    assert out.to_dict() == {"i": [0, 3, 9], "n": [3, 3, 1]}


def test_rolling_sum_time_window():
    t0 = dt.datetime(2024, 1, 1)
    df = pl.DataFrame({
        "t": ts_range(t0, 5, 60),  # 1 minute apart
        "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = df.rolling("t", period="2m").agg(pl.col("v").sum().alias("s"),
                                           pl.col("v").min().alias("mn"),
                                           pl.col("v").max().alias("mx"),
                                           pl.col("v").mean().alias("m"))
    d = out.to_dict()
    # window (t-2m, t]: rows within the last 2 minutes
    assert d["s"] == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert d["mn"] == [1.0, 1.0, 2.0, 3.0, 4.0]
    assert d["mx"] == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rolling_grouped():
    t0 = dt.datetime(2024, 1, 1)
    df = pl.DataFrame({
        "t": ts_range(t0, 6, 60),
        "k": ["a", "b", "a", "b", "a", "b"],
        "v": [1.0, 10.0, 2.0, 20.0, 3.0, 30.0]})
    out = df.rolling("t", period="5m", group_by="k").agg(
        pl.col("v").sum().alias("s"))
    d = out.to_dict()
    # original row order preserved; windows within each group
    assert d["k"] == ["a", "b", "a", "b", "a", "b"]
    assert d["s"] == [1.0, 10.0, 3.0, 30.0, 6.0, 60.0]


def test_rolling_oracle_random(rng):
    n = 300
    secs = np.sort(rng.choice(np.arange(0, 3000), n, replace=False))
    t0 = dt.datetime(2024, 1, 1)
    times = [t0 + dt.timedelta(seconds=int(s)) for s in secs]
    vals = rng.normal(size=n)
    df = pl.DataFrame({"t": times, "v": vals})
    out = df.rolling("t", period="5m").agg(
        pl.col("v").sum().alias("s"), pl.col("v").max().alias("mx"),
        pl.col("v").count().alias("c"))
    pdf = pd.DataFrame({"v": vals}, index=pd.to_datetime(times))
    r = pdf.rolling("300s")
    got = out.to_dict()
    assert np.allclose(got["s"], r.sum()["v"].values)
    assert np.allclose(got["mx"], r.max()["v"].values)
    assert got["c"] == [int(x) for x in r.count()["v"].values]


def test_vwap():
    df = pl.DataFrame({"price": [10.0, 20.0, 30.0],
                       "volume": [1, 1, 2],
                       "sym": ["x", "x", "y"]})
    out = ts.vwap(df, by="sym").sort("sym")
    assert out.to_dict()["vwap"] == [15.0, 30.0]
    flat = ts.vwap(df)
    assert flat.to_dict()["vwap"] == [22.5]


def test_twap():
    t0 = dt.datetime(2024, 1, 1)
    df = pl.DataFrame({
        "timestamp": [t0, t0 + dt.timedelta(minutes=1),
                      t0 + dt.timedelta(minutes=3)],
        "price": [10.0, 20.0, 99.0]})
    out = ts.twap(df)
    # p=10 held 1min, p=20 held 2min, last row no interval
    assert abs(out.to_dict()["twap"][0] - (10 * 1 + 20 * 2) / 3) < 1e-9


def test_resample_ohlcv():
    t0 = dt.datetime(2024, 1, 1)
    df = pl.DataFrame({
        "timestamp": ts_range(t0, 6, 30),
        "price": [5.0, 9.0, 1.0, 7.0, 3.0, 8.0],
        "volume": [1, 2, 3, 4, 5, 6]})
    out = ts.resample_ohlcv(df, "1m")
    d = out.to_dict()
    assert d["open"] == [5.0, 1.0, 3.0]
    assert d["high"] == [9.0, 7.0, 8.0]
    assert d["low"] == [5.0, 1.0, 3.0]
    assert d["close"] == [9.0, 7.0, 8.0]
    assert d["volume"] == [3, 7, 11]


def test_sessions():
    times = [dt.datetime(2024, 1, 1, h) for h in (2, 9, 15, 22)]
    df = pl.DataFrame({"timestamp": times, "v": [1, 2, 3, 4]})
    out = df.with_columns(ts.session_id())
    assert out.to_dict()["session"] == ["asia", "europe", "us", "asia"]
    us = ts.filter_trading_hours(df, "us")
    assert us.to_dict()["v"] == [3]


def test_lazy_group_by_dynamic():
    t0 = dt.datetime(2024, 1, 1)
    lf = pl.LazyFrame({"t": ts_range(t0, 4, 30 * 60), "v": [1, 2, 3, 4]})
    out = lf.group_by_dynamic("t", every="1h").agg(
        pl.col("v").sum().alias("s")).collect()
    assert out.to_dict()["s"] == [3, 7]


def test_upsample():
    df = pl.DataFrame({"t": [dt.date(2024, 1, 1), dt.date(2024, 1, 4)],
                       "v": [1, 4]})
    out = df.upsample("t", every="1d").sort("t")
    assert out.height == 4
    assert out.to_dict()["v"] == [1, None, None, 4]


def test_dynamic_overlapping_windows():
    from datetime import datetime
    times = [datetime(2024, 1, 1, 0, m) for m in [0, 10, 20, 30, 45, 55]]
    vals = [1, 2, 3, 4, 5, 6]
    df = pl.DataFrame({"t": times, "v": vals})
    out = df.group_by_dynamic("t", every="30m", period="1h").agg(
        pl.col("v").sum().alias("s"))
    assert out.to_dict()["s"] == [6, 21, 15]
    assert out.to_dict()["t"][1] == datetime(2024, 1, 1, 0, 0)


def test_dynamic_closed_right():
    from datetime import datetime
    times = [datetime(2024, 1, 1, 0, m) for m in [0, 10, 20, 30, 45, 55]]
    df = pl.DataFrame({"t": times, "v": [1, 2, 3, 4, 5, 6]})
    out = df.group_by_dynamic("t", every="30m", closed="right").agg(
        pl.col("v").sum().alias("s"))
    assert out.to_dict()["s"] == [1, 9, 11]


def test_dynamic_overlap_grouped():
    from datetime import datetime
    times = [datetime(2024, 1, 1, 0, m) for m in [0, 10, 20, 30, 45, 55]]
    vals = [1, 2, 3, 4, 5, 6]
    df = pl.DataFrame({"t": times * 2, "g": ["a"] * 6 + ["b"] * 6,
                       "v": vals + [10 * v for v in vals]})
    out = df.group_by_dynamic("t", every="30m", period="1h",
                              group_by="g").agg(pl.col("v").sum().alias("s"))
    assert out.to_dict()["s"] == [6, 21, 15, 60, 210, 150]


def test_dynamic_overlap_integer_index():
    df = pl.DataFrame({"i": list(range(10)), "v": [1] * 10})
    out = df.group_by_dynamic("i", every="2i", period="4i").agg(
        pl.col("v").sum().alias("s"))
    assert out.to_dict()["i"] == [-2, 0, 2, 4, 6, 8]
    assert out.to_dict()["s"] == [2, 4, 4, 4, 4, 2]


def test_dynamic_overlap_month_windows():
    times = [dt.datetime(2024, m, 15) for m in range(1, 7)]
    df = pl.DataFrame({"t": times, "v": [1, 2, 3, 4, 5, 6]})
    out = df.group_by_dynamic("t", every="1mo", period="3mo").agg(
        pl.col("v").sum().alias("s"))
    d = out.to_dict()
    assert d["s"] == [1, 3, 6, 9, 12, 15, 11, 6]
    assert d["t"][0] == dt.datetime(2023, 11, 1)


def test_dynamic_overlap_month_date_index():
    days = np.array(["2024-01-15", "2024-02-15", "2024-03-15"],
                    dtype="datetime64[D]")
    dd = pl.DataFrame({"t": days, "v": [1, 2, 3]})
    o2 = dd.group_by_dynamic("t", every="1mo", period="2mo").agg(
        pl.col("v").sum().alias("s"))
    assert o2.to_dict()["s"] == [1, 3, 5, 3]


def test_dynamic_month_every_fixed_period():
    times = [dt.datetime(2024, m, 15) for m in range(1, 7)]
    df = pl.DataFrame({"t": times, "v": [1, 2, 3, 4, 5, 6]})
    o3 = df.group_by_dynamic("t", every="1mo", period="45d").agg(
        pl.col("v").sum().alias("s"))
    assert o3.to_dict()["s"] == [1, 5, 3, 9, 5, 6]
