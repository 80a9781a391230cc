"""String namespace (dict transforms) and temporal namespace (civil math)."""

import datetime as dt

import numpy as np
import pytest

import polaroid_tpu as pl


def test_str_basic():
    df = pl.DataFrame({"s": ["Hello", "world", None]})
    d = df.select(
        pl.col("s").str.to_uppercase().alias("up"),
        pl.col("s").str.to_lowercase().alias("lo"),
        pl.col("s").str.len_chars().alias("n"),
    ).to_dict()
    assert d["up"] == ["HELLO", "WORLD", None]
    assert d["lo"] == ["hello", "world", None]
    assert d["n"] == [5, 5, None]


def test_str_contains_starts_ends():
    df = pl.DataFrame({"s": ["apple pie", "banana", "grape"]})
    d = df.select(
        pl.col("s").str.contains("an").alias("c"),
        pl.col("s").str.contains(r"^a", literal=False).alias("re"),
        pl.col("s").str.starts_with("gr").alias("st"),
        pl.col("s").str.ends_with("e").alias("en"),
    ).to_dict()
    assert d["c"] == [False, True, False]
    assert d["re"] == [True, False, False]
    assert d["st"] == [False, False, True]
    assert d["en"] == [True, False, True]


def test_str_slice_replace_strip():
    df = pl.DataFrame({"s": ["  pad  ", "abcdef", "xx"]})
    d = df.select(
        pl.col("s").str.strip_chars().alias("strip"),
        pl.col("s").str.slice(1, 3).alias("sl"),
        pl.col("s").str.replace("x", "y").alias("rep"),
        pl.col("s").str.replace_all("x", "y").alias("repa"),
    ).to_dict()
    assert d["strip"] == ["pad", "abcdef", "xx"]
    assert d["sl"] == [" pa", "bcd", "x"]
    assert d["rep"] == ["  pad  ", "abcdef", "yx"]
    assert d["repa"] == ["  pad  ", "abcdef", "yy"]


def test_str_to_integer():
    df = pl.DataFrame({"s": ["12", "x", "-5"]})
    d = df.select(pl.col("s").str.to_integer(strict=False).alias("i")).to_dict()
    assert d["i"] == [12, None, -5]


def test_str_extract_and_count():
    df = pl.DataFrame({"s": ["a1b2", "c3", "zz"]})
    d = df.select(
        pl.col("s").str.extract(r"(\d)", 1).alias("e"),
        pl.col("s").str.count_matches(r"\d").alias("n")).to_dict()
    assert d["e"] == ["1", "3", None]
    assert d["n"] == [2, 1, 0]


def test_str_filter_then_groupby():
    df = pl.DataFrame({"s": ["aa", "ab", "ba", "bb"], "v": [1, 2, 3, 4]})
    out = df.filter(pl.col("s").str.starts_with("a")) \
        .group_by(pl.col("s").str.slice(1, 1).alias("suf")) \
        .agg(pl.col("v").sum().alias("t")).sort("suf")
    assert out.to_dict() == {"suf": ["a", "b"], "t": [1, 2]}


def test_date_parts():
    d1 = dt.date(2024, 3, 15)
    d2 = dt.date(1999, 12, 31)
    df = pl.DataFrame({"d": [d1, d2]})
    got = df.select(
        pl.col("d").dt.year().alias("y"),
        pl.col("d").dt.month().alias("m"),
        pl.col("d").dt.day().alias("dd"),
        pl.col("d").dt.weekday().alias("wd"),
        pl.col("d").dt.ordinal_day().alias("od"),
        pl.col("d").dt.quarter().alias("q"),
    ).to_dict()
    assert got["y"] == [2024, 1999]
    assert got["m"] == [3, 12]
    assert got["dd"] == [15, 31]
    assert got["wd"] == [d1.isoweekday(), d2.isoweekday()]
    assert got["od"] == [d1.timetuple().tm_yday, d2.timetuple().tm_yday]
    assert got["q"] == [1, 4]


def test_iso_week_oracle():
    dates = [dt.date(2020, 1, 1), dt.date(2021, 1, 1), dt.date(2016, 1, 3),
             dt.date(2015, 12, 28), dt.date(2024, 12, 30)]
    df = pl.DataFrame({"d": dates})
    got = df.select(pl.col("d").dt.week().alias("w")).to_dict()["w"]
    ref = [d.isocalendar()[1] for d in dates]
    assert got == ref


def test_datetime_parts():
    t = dt.datetime(2024, 3, 15, 14, 30, 45, 123456)
    df = pl.DataFrame({"t": [t]})
    got = df.select(
        pl.col("t").dt.hour().alias("h"),
        pl.col("t").dt.minute().alias("m"),
        pl.col("t").dt.second().alias("s"),
        pl.col("t").dt.microsecond().alias("us"),
        pl.col("t").dt.date().alias("d"),
    ).to_dict()
    assert got["h"] == [14]
    assert got["m"] == [30]
    assert got["s"] == [45]
    assert got["us"] == [123456]
    assert got["d"] == [dt.date(2024, 3, 15)]


def test_datetime_arithmetic():
    a = dt.datetime(2024, 1, 2, 12, 0, 0)
    b = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = pl.DataFrame({"a": [a], "b": [b]})
    d = df.select(
        (pl.col("a") - pl.col("b")).alias("diff"),
        (pl.col("a") - pl.col("b")).dt.total_hours().alias("h"),
    ).to_dict()
    assert d["h"] == [36]


def test_date_comparison_literal():
    df = pl.DataFrame({"d": [dt.date(2024, 1, 1), dt.date(2024, 6, 1)]})
    out = df.filter(pl.col("d") > dt.date(2024, 3, 1))
    assert out.to_dict() == {"d": [dt.date(2024, 6, 1)]}


def test_truncate():
    t = dt.datetime(2024, 3, 15, 14, 37, 45)
    df = pl.DataFrame({"t": [t]})
    got = df.select(pl.col("t").dt.truncate("1h").alias("h"),
                    pl.col("t").dt.truncate("15m").alias("m")).to_dict()
    assert got["h"] == [np.datetime64("2024-03-15T14:00:00", "us")] or \
        got["h"][0] == dt.datetime(2024, 3, 15, 14, 0, 0)
    assert got["m"][0] == dt.datetime(2024, 3, 15, 14, 30, 0)


def test_str_to_datetime():
    df = pl.DataFrame({"s": ["2024-01-02", "2023-12-31"]})
    got = df.select(pl.col("s").str.to_date("%Y-%m-%d").alias("d")).to_dict()
    assert got["d"] == [dt.date(2024, 1, 2), dt.date(2023, 12, 31)]


def test_duration_totals():
    df = pl.DataFrame({"d": [dt.timedelta(days=1, hours=2)]})
    got = df.select(pl.col("d").dt.total_hours().alias("h"),
                    pl.col("d").dt.total_minutes().alias("m")).to_dict()
    assert got["h"] == [26]
    assert got["m"] == [26 * 60]


def test_groupby_date_key():
    df = pl.DataFrame({
        "d": [dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 1)],
        "v": [1, 2, 3]})
    out = df.group_by("d").agg(pl.col("v").sum().alias("s")).sort("d")
    assert out.to_dict() == {"d": [dt.date(2024, 1, 1), dt.date(2024, 1, 2)],
                             "s": [4, 2]}


def test_replace_values():
    df = pl.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "x"]})
    d = df.select(pl.col("a").replace([1, 3], [10, 30]).alias("a"),
                  pl.col("s").replace(["x"], ["z"]).alias("s")).to_dict()
    assert d["a"] == [10, 2, 30]
    assert d["s"] == ["z", "y", "z"]


def test_hash_deterministic():
    df = pl.DataFrame({"a": [1, 2, 1]})
    h = df.select(pl.col("a").hash().alias("h")).to_dict()["h"]
    assert h[0] == h[2] and h[0] != h[1]


def test_categorical_dtype_roundtrip():
    df = pl.DataFrame({"c": ["b", "a", "b", None]})
    cc = df.select(pl.col("c").cast(pl.Categorical))
    assert repr(cc.schema["c"]) == "Categorical"
    assert cc.to_dict()["c"] == ["b", "a", "b", None]
    back = cc.select(pl.col("c").cast(pl.String))
    assert repr(back.schema["c"]) == "String"
    assert back.to_dict()["c"] == ["b", "a", "b", None]


def test_categorical_schema_and_categories():
    d2 = pl.DataFrame({"c": ["x", "y", "x"]}, schema={"c": pl.Categorical})
    assert repr(d2.schema["c"]) == "Categorical"
    cats = d2.select(pl.col("c").cat.get_categories())
    assert cats.to_dict()["c"] == ["x", "y"]
    assert d2.get_column("c").cat.get_categories().to_list() == ["x", "y"]


def test_categorical_groupby_join():
    cc = pl.DataFrame({"c": ["b", "a", "b", None]}).select(
        pl.col("c").cast(pl.Categorical))
    g = cc.with_columns(v=pl.lit(1)).group_by("c").agg(
        pl.len().alias("n")).sort("c")
    assert g.to_dict()["n"] == [1, 1, 2]
    j = cc.join(pl.DataFrame({"c": ["a", "b"], "w": [1, 2]}), on="c")
    assert sorted(j.to_dict()["w"]) == [1, 2, 2]


def test_dt_extensions():
    from datetime import datetime, date
    df = pl.DataFrame({"t": [datetime(2024, 2, 15, 10, 30),
                             datetime(2023, 12, 31, 5, 0)]})
    d = df.select(
        leap=pl.col("t").dt.is_leap_year(),
        isoy=pl.col("t").dt.iso_year(),
        s=pl.col("t").dt.strftime("%Y/%m/%d"),
    ).to_dict()
    assert d["leap"] == [True, False]
    assert d["isoy"] == [2024, 2023]
    assert d["s"] == ["2024/02/15", "2023/12/31"]
    dd = pl.DataFrame({"d": [date(2024, 1, 15)]})
    d2 = dd.select(ms=pl.col("d").dt.month_start(),
                   me=pl.col("d").dt.month_end()).to_dict()
    assert d2["ms"] == [date(2024, 1, 1)]
    assert d2["me"] == [date(2024, 1, 31)]
    # ISO-year edges: Jan 1 2021 belongs to 2020; Dec 30 2019 to 2020
    a = pl.DataFrame({"t": [datetime(2021, 1, 1)]}).select(
        pl.col("t").dt.iso_year()).to_dict()["t"]
    b = pl.DataFrame({"t": [datetime(2019, 12, 30)]}).select(
        pl.col("t").dt.iso_year()).to_dict()["t"]
    assert a == [2020] and b == [2020]


def test_str_json_decode():
    df = pl.DataFrame({"s": ['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}',
                             None]})
    out = df.select(pl.col("s").str.json_decode())
    assert out.to_dict()["s"] == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"},
                                  None]
    l = pl.DataFrame({"s": ["[1,2]", "[3]"]}).select(
        pl.col("s").str.json_decode())
    assert l.to_dict()["s"] == [[1, 2], [3]]
