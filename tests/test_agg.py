"""Select-context aggregations with polars null semantics."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_basic_aggs():
    df = pl.DataFrame({"a": [1, 2, 3, 4], "b": [1.0, 2.0, 3.0, 4.0]})
    out = df.select(
        pl.col("a").sum().alias("s"),
        pl.col("a").mean().alias("m"),
        pl.col("a").min().alias("mn"),
        pl.col("a").max().alias("mx"),
        pl.col("b").std().alias("sd"),
        pl.col("b").var().alias("v"),
    )
    d = out.to_dict()
    assert d["s"] == [10]
    assert d["m"] == [2.5]
    assert d["mn"] == [1] and d["mx"] == [4]
    assert abs(d["sd"][0] - np.std([1, 2, 3, 4], ddof=1)) < 1e-9
    assert abs(d["v"][0] - np.var([1, 2, 3, 4], ddof=1)) < 1e-9


def test_aggs_ignore_nulls():
    df = pl.DataFrame({"a": [1, None, 3, None]})
    out = df.select(
        pl.col("a").sum().alias("s"),
        pl.col("a").mean().alias("m"),
        pl.col("a").count().alias("c"),
        pl.col("a").len().alias("l"),
        pl.col("a").null_count().alias("nc"),
        pl.col("a").min().alias("mn"),
    )
    assert out.to_dict() == {"s": [4], "m": [2.0], "c": [2], "l": [4],
                             "nc": [2], "mn": [1]}


def test_all_null_aggs():
    df = pl.DataFrame({"a": [None, None]}, schema={"a": pl.Int64})
    d = df.select(pl.col("a").sum().alias("s"),
                  pl.col("a").mean().alias("m"),
                  pl.col("a").max().alias("mx")).to_dict()
    assert d == {"s": [0], "m": [None], "mx": [None]}


def test_first_last():
    df = pl.DataFrame({"a": [5, 6, 7]})
    d = df.select(pl.col("a").first().alias("f"),
                  pl.col("a").last().alias("l")).to_dict()
    assert d == {"f": [5], "l": [7]}


def test_agg_after_filter_rows():
    df = pl.DataFrame({"a": [1, 2, 3, 4, 5]})
    out = df.filter(pl.col("a") > 2).select(pl.col("a").sum().alias("s"),
                                            pl.col("a").first().alias("f"),
                                            pl.col("a").last().alias("l"))
    assert out.to_dict() == {"s": [12], "f": [3], "l": [5]}


def test_expr_level_filter_in_agg():
    df = pl.DataFrame({"a": [1, 2, 3, 4]})
    out = df.select(pl.col("a").filter(pl.col("a") > 2).sum().alias("s"))
    assert out.to_dict() == {"s": [7]}


def test_median_quantile():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 100.0]})
    d = df.select(pl.col("a").median().alias("med"),
                  pl.col("a").quantile(0.5).alias("q5"),
                  pl.col("a").quantile(1.0).alias("q1")).to_dict()
    assert d["med"] == [3.0]
    assert d["q5"] == [3.0]
    assert d["q1"] == [100.0]


def test_n_unique_counts_null():
    df = pl.DataFrame({"a": [1, 1, 2, None, None]})
    assert df.select(pl.col("a").n_unique().alias("n")).to_dict() == {"n": [3]}


def test_any_all():
    df = pl.DataFrame({"a": [True, False, None], "b": [True, True, None]})
    d = df.select(pl.col("a").any().alias("aa"), pl.col("a").all().alias("al"),
                  pl.col("b").all().alias("bl")).to_dict()
    assert d == {"aa": [True], "al": [False], "bl": [True]}


def test_arg_min_max():
    df = pl.DataFrame({"a": [3, 1, 4, 1, 5]})
    d = df.select(pl.col("a").arg_min().alias("mn"),
                  pl.col("a").arg_max().alias("mx")).to_dict()
    assert d == {"mn": [1], "mx": [4]}


def test_min_max_strings():
    df = pl.DataFrame({"s": ["pear", "apple", "zebra"]})
    d = df.select(pl.col("s").min().alias("mn"),
                  pl.col("s").max().alias("mx")).to_dict()
    assert d == {"mn": ["apple"], "mx": ["zebra"]}


def test_frame_level_aggs():
    df = pl.DataFrame({"a": [1, 2], "b": [3.0, 5.0], "s": ["x", "y"]})
    assert df.sum().to_dict() == {"a": [3], "b": [8.0]}
    assert df.null_count().to_dict() == {"a": [0], "b": [0], "s": [0]}


def test_product():
    df = pl.DataFrame({"a": [2.0, 3.0, 4.0]})
    assert df.select(pl.col("a").product().alias("p")).to_dict() == {"p": [24.0]}


def test_horizontal():
    df = pl.DataFrame({"a": [1, 5, None], "b": [4, 2, 7]})
    d = df.select(
        pl.min_horizontal("a", "b"),
        pl.max_horizontal("a", "b"),
        pl.sum_horizontal("a", "b"),
    ).to_dict()
    assert d["min"] == [1, 2, 7]
    assert d["max"] == [4, 5, 7]
    assert d["sum"] == [5, 7, 7]


def test_series_aggs():
    s = pl.Series("x", [1, 2, 3, None])
    assert s.sum() == 6
    assert s.mean() == 2.0
    assert s.null_count() == 1
    assert s.n_unique() == 4


def test_mode_select_and_group():
    md = pl.DataFrame({"x": [1, 2, 2, 3, 3, 3]})
    assert md.select(pl.col("x").mode()).to_dict()["x"] == [3]
    ms = pl.DataFrame({"s": ["a", "b", "b"]})
    assert ms.select(pl.col("s").mode()).to_dict()["s"] == ["b"]
    g = pl.DataFrame({"k": [1, 1, 1, 2, 2], "v": [5, 7, 7, 9, 3]})
    r = g.group_by("k", maintain_order=True).agg(
        pl.col("v").mode().alias("m"),
        pl.col("v").arg_min().alias("am"),
        pl.col("v").arg_max().alias("ax"))
    assert r.to_dict()["m"] == [7, 3]
    assert r.to_dict()["am"] == [0, 1]
    assert r.to_dict()["ax"] == [1, 0]


def test_cut_qcut_search_sorted():
    df = pl.DataFrame({"x": [-2.0, 1.0, 3.0, 6.0]})
    c = df.select(pl.col("x").cut([0, 2, 5]))
    assert repr(c.schema["x"]) == "Categorical"
    assert c.to_dict()["x"] == ["(-inf, 0]", "(0, 2]", "(2, 5]", "(5, inf]"]
    c2 = df.select(pl.col("x").cut([0, 2], labels=["low", "mid", "high"]))
    assert c2.to_dict()["x"] == ["low", "mid", "high", "high"]
    q = df.select(pl.col("x").qcut(2).alias("q"))
    assert q.to_dict()["q"] == ["(-inf, 2]", "(-inf, 2]", "(2, inf]",
                                "(2, inf]"]
    s = pl.DataFrame({"x": [1, 3, 5, 7]})
    assert s.select(pl.col("x").search_sorted(5)).to_dict()["x"] == [3]
    assert s.select(
        pl.col("x").search_sorted(5, side="left")).to_dict()["x"] == [2]
