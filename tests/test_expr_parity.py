"""Expr-surface parity batch: method aliases, bitwise, moments, arg_*,
rolling quantile/moments/_by variants, ewm std/var(+by), host UDFs,
extend/append, replace_strict, exclude, meta namespace, expr serde.

Oracles are numpy/pandas (reference behavior documented in
py-polars/src/polars/expr/expr.py)."""

import math

import numpy as np
import pandas as pd
import pytest

import polaroid_tpu as pl


@pytest.fixture()
def df():
    return pl.DataFrame({"a": [3.0, 1.0, None, 2.0, 5.0],
                         "b": [1, 2, 3, 4, 5],
                         "s": ["x", "y", "x", None, "z"]})


def one(frame, e):
    return frame.select(e.alias("v")).to_dict()["v"]


def test_method_aliases(df):
    assert one(df, pl.col("b").add(1)) == [2, 3, 4, 5, 6]
    assert one(df, pl.col("b").mul(2)) == [2, 4, 6, 8, 10]
    assert one(df, pl.col("b").sub(1)) == [0, 1, 2, 3, 4]
    assert one(df, pl.col("b").floordiv(2)) == [0, 1, 1, 2, 2]
    assert one(df, pl.col("b").mod(2)) == [1, 0, 1, 0, 1]
    assert one(df, pl.col("b").pow(2)) == [1, 4, 9, 16, 25]
    assert one(df, (pl.col("b") > 2).and_(pl.col("b") < 5)) == \
        [False, False, True, True, False]
    assert one(df, (pl.col("b") > 4).or_(pl.col("b") < 2)) == \
        [True, False, False, False, True]


def test_eq_missing(df):
    assert one(df, pl.col("a").eq_missing(pl.col("a"))) == [True] * 5
    assert one(df, pl.col("a").eq_missing(None)) == \
        [False, False, True, False, False]
    assert one(df, pl.col("a").ne_missing(None)) == \
        [True, True, False, True, True]


def test_trig_and_rounding(df):
    v = one(df, pl.col("b").cast(pl.Float64).arcsinh())
    assert v == pytest.approx(np.arcsinh([1, 2, 3, 4, 5]).tolist())
    v = one(df, pl.col("b").degrees())
    assert v == pytest.approx(np.degrees([1, 2, 3, 4, 5]).tolist())
    v = one(df, pl.col("b").cast(pl.Float64).cot())
    assert v == pytest.approx((1 / np.tan([1, 2, 3, 4, 5.0])).tolist())
    assert one(pl.DataFrame({"f": [1234.0, 0.012345, 0.0]}),
               pl.col("f").round_sig_figs(2)) == [1200.0, 0.012, 0.0]


def test_bitwise(df):
    assert one(df, pl.col("b").bitwise_count_ones()) == [1, 1, 2, 1, 2]
    assert one(df, pl.col("b").bitwise_trailing_zeros()) == [0, 1, 0, 2, 0]
    assert one(df, pl.col("b").bitwise_leading_zeros()) == \
        [63, 62, 62, 61, 61]  # Int64 width
    assert df.select(pl.col("b").bitwise_and().alias("v")).item() == 0
    assert df.select(pl.col("b").bitwise_or().alias("v")).item() == 7
    assert df.select(pl.col("b").bitwise_xor().alias("v")).item() == 1


def test_moments(df):
    x = np.array([1, 2, 3, 4, 5.0])
    d = x - x.mean()
    sk = (d ** 3).mean() / (d ** 2).mean() ** 1.5
    assert df.select(pl.col("b").skew().alias("v")).item() == \
        pytest.approx(sk)
    ku = (d ** 4).mean() / (d ** 2).mean() ** 2 - 3
    assert df.select(pl.col("b").kurtosis().alias("v")).item() == \
        pytest.approx(ku)


def test_nan_minmax():
    df2 = pl.DataFrame({"f": [1.0, float("nan"), 3.0]})
    assert math.isnan(df2.select(pl.col("f").nan_max().alias("v")).item())
    d3 = pl.DataFrame({"f": [1.0, 2.0, 3.0]})
    assert d3.select(pl.col("f").nan_max().alias("v")).item() == 3.0
    assert d3.select(pl.col("f").nan_min().alias("v")).item() == 1.0


def test_arg_family(df):
    assert one(df, pl.col("a").arg_sort()) == [2, 1, 3, 0, 4]  # nulls first
    assert one(df, (pl.col("b") > 2).arg_true()) == [2, 3, 4]
    assert one(df, pl.col("s").arg_unique()) == [0, 1, 3, 4]
    assert one(df, pl.col("s").is_last_distinct()) == \
        [False, True, True, True, True]


def test_top_bottom_k(df):
    assert one(df, pl.col("b").top_k(2)) == [5, 4]
    assert one(df, pl.col("b").bottom_k(2)) == [1, 2]
    assert one(df, pl.col("b").top_k_by("a", 2)) == [5, 1]  # a desc: 5,3
    assert one(df, pl.col("b").head(2)) == [1, 2]
    assert one(df, pl.col("b").tail(2)) == [4, 5]


def test_dot_index_of(df):
    assert df.select(pl.col("b").dot(pl.col("b")).alias("v")).item() == 55
    assert df.select(pl.col("b").index_of(4).alias("v")).item() == 3
    assert df.select(pl.col("a").index_of(None).alias("v")).item() == 2
    assert df.select(pl.col("b").has_nulls().alias("v")).item() is False
    assert df.select(pl.col("a").has_nulls().alias("v")).item() is True


def test_is_close(df):
    assert one(df, pl.col("a").is_close(pl.col("a"))) == \
        [True, True, None, True, True]
    d = pl.DataFrame({"x": [1.0, 2.0], "y": [1.0 + 1e-13, 2.5]})
    assert one(d, pl.col("x").is_close(pl.col("y"))) == [True, False]


def test_bounds_reinterpret_physical(df):
    assert df.select(pl.col("b").upper_bound().alias("v")).item() == 2**63 - 1
    assert df.select(pl.col("b").lower_bound().alias("v")).item() == -2**63
    u = pl.DataFrame({"u": [1, 2]})
    assert one(u, pl.col("u").cast(pl.UInt64).reinterpret(signed=True)) == \
        [1, 2]
    # dictionary holds exactly the distinct non-null strings, sorted —
    # codes are dense from 0 (nulls carry no dict entry)
    assert one(df, pl.col("s").to_physical()) == [0, 1, 0, None, 2]


def test_sample_shuffle(df):
    v = one(df, pl.col("b").sample(3, seed=1))
    assert len(v) == 3 and set(v) <= {1, 2, 3, 4, 5}
    v = one(df, pl.col("b").shuffle(seed=1))
    assert sorted(v) == [1, 2, 3, 4, 5]


def test_extend_append(df):
    assert one(df, pl.col("b").extend_constant(9, 2)) == \
        [1, 2, 3, 4, 5, 9, 9]
    assert one(df, pl.col("b").extend_constant(None, 1)) == \
        [1, 2, 3, 4, 5, None]
    assert one(df, pl.col("b").append(pl.col("b"))) == [1, 2, 3, 4, 5] * 2
    # grown select after a filter keeps only live rows
    out = df.filter(pl.col("b") > 3).select(
        pl.col("b").extend_constant(0, 1).alias("v"))
    assert out.to_dict()["v"] == [4, 5, 0]


def test_host_udfs(df):
    assert one(df, pl.col("s").map_elements(lambda s: s + "!")) == \
        ["x!", "y!", "x!", None, "z!"]
    assert one(df, pl.col("b").map_elements(lambda x: x * 2)) == \
        [2, 4, 6, 8, 10]
    assert one(df, pl.col("b").cumulative_eval(pl.element().max())) == \
        [1, 2, 3, 4, 5]
    assert one(df, pl.col("b").cumulative_eval(pl.element().mean())) == \
        pytest.approx([1.0, 1.5, 2.0, 2.5, 3.0])


def test_exclude_pipe(df):
    out = df.select(pl.col("*").exclude("s", "a"))
    assert out.columns == ["b"]
    assert one(df, pl.col("b").pipe(lambda e: e + 1)) == [2, 3, 4, 5, 6]


def test_replace_strict(df):
    assert one(df, pl.col("b").replace_strict(
        {1: 10, 2: 20, 3: 30, 4: 40, 5: 50})) == [10, 20, 30, 40, 50]
    assert one(df, pl.col("b").replace_strict({1: 10}, default=-1)) == \
        [10, -1, -1, -1, -1]
    assert one(df, pl.col("s").replace_strict(
        {"x": "X", "y": "Y", "z": "Z"})) == ["X", "Y", "X", None, "Z"]
    with pytest.raises(pl.InvalidOperationError):
        df.select(pl.col("b").replace_strict({1: 10}).alias("v"))


def test_meta_and_serde():
    e = (pl.col("a") + 1).alias("z")
    assert e.meta.output_name() == "z"
    assert (pl.col("a") + pl.col("b")).meta.root_names() == ["a", "b"]
    assert pl.col("a").meta.is_column()
    assert not pl.col("a").meta.has_multiple_outputs()
    assert pl.col("*").meta.has_multiple_outputs()
    assert e.meta.undo_aliases().meta.output_name() == "a"
    s = (pl.col("a") * 2).alias("q").serialize()
    e2 = pl.Expr.deserialize(s)
    assert e2.meta.output_name() == "q"
    assert "col" in e.meta.tree_format()


def test_rolling_quantile_median():
    t = pl.DataFrame({"x": [1.0, 2.0, 4.0, 3.0, 5.0, None, 7.0]})
    got = one(t, pl.col("x").rolling_median(3, min_samples=1))
    ref = pd.Series([1.0, 2, 4, 3, 5, None, 7]).rolling(3, min_periods=1) \
        .median().tolist()
    assert got == pytest.approx(ref, nan_ok=True)
    got = one(t, pl.col("x").rolling_quantile(0.5, "linear", 3,
                                              min_samples=1))
    assert got == pytest.approx(ref, nan_ok=True)


def test_rolling_moments_oracle():
    rng = np.random.default_rng(3)
    x = rng.normal(size=40)
    t = pl.DataFrame({"x": x})
    got = one(t, pl.col("x").rolling_skew(7, min_samples=7))
    s = pd.Series(x)
    m = s.rolling(7)
    # biased skew from raw rolling moments
    ref = []
    for i in range(len(x)):
        if i < 6:
            ref.append(None)
            continue
        w = x[i - 6:i + 1]
        d = w - w.mean()
        ref.append((d ** 3).mean() / (d ** 2).mean() ** 1.5)
    for g, r in zip(got, ref):
        if r is None:
            assert g is None
        else:
            assert g == pytest.approx(r, abs=1e-9)


def test_rolling_map():
    t = pl.DataFrame({"x": [1.0, 2.0, 4.0, 3.0]})
    got = one(t, pl.col("x").rolling_map(lambda s: s.sum(), 2,
                                         min_samples=1))
    assert got == [1.0, 3.0, 6.0, 7.0]


def test_ewm_var_std_oracle():
    x = [1.0, 2.0, 4.0, 3.0, 5.0]
    t = pl.DataFrame({"x": x})
    got = one(t, pl.col("x").ewm_var(alpha=0.5))
    ref = pd.Series(x).ewm(alpha=0.5).var().tolist()
    # first element: pandas gives NaN (0/0 debias); ours gives 0.0
    assert got[1:] == pytest.approx(ref[1:], abs=1e-9)
    got = one(t, pl.col("x").ewm_std(alpha=0.5))
    ref = pd.Series(x).ewm(alpha=0.5).std().tolist()
    # first element: pandas gives NaN (0/0 debias); ours gives 0.0
    assert got[1:] == pytest.approx(ref[1:], abs=1e-9)


def test_rolling_by_family():
    u = pl.DataFrame({"t": [1, 2, 3, 5, 8, 9],
                      "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    assert one(u, pl.col("x").rolling_sum_by("t", 2)) == \
        [1.0, 3.0, 5.0, 4.0, 5.0, 11.0]
    assert one(u, pl.col("x").rolling_mean_by("t", 3)) == \
        [1.0, 1.5, 2.0, 3.5, 5.0, 5.5]
    assert one(u, pl.col("x").rolling_max_by("t", 3)) == \
        [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert one(u, pl.col("x").rolling_min_by("t", 3)) == \
        [1.0, 1.0, 1.0, 3.0, 5.0, 5.0]
    # duration-string periods over datetimes
    d = pl.DataFrame({"ts": ["2024-01-01", "2024-01-02", "2024-01-05"],
                      "x": [1.0, 2.0, 3.0]}).with_columns(
        pl.col("ts").str.to_datetime(format="%Y-%m-%d"))
    assert one(d, pl.col("x").rolling_sum_by("ts", "2d")) == [1.0, 3.0, 3.0]


def test_interpolate_by():
    w = pl.DataFrame({"t": [0, 1, 10, 11], "x": [0.0, None, None, 11.0]})
    assert one(w, pl.col("x").interpolate_by("t")) == \
        pytest.approx([0.0, 1.0, 10.0, 11.0])


def test_ewm_mean_by():
    u = pl.DataFrame({"t": [0, 2, 4], "x": [0.0, 2.0, 4.0]})
    got = one(u, pl.col("x").ewm_mean_by("t", 2))
    # alpha per step = 1 - 2^(-dt/hl) = 0.5 for dt=2,hl=2
    assert got == pytest.approx([0.0, 1.0, 2.5])


def test_where_limit_flatten(df):
    assert one(df, pl.col("b").where(pl.col("b") > 3)) == [4, 5]
    assert one(df, pl.col("b").limit(2)) == [1, 2]
    n = pl.DataFrame({"l": [[1, 2], [3]]})
    assert one(n, pl.col("l").flatten()) == [1, 2, 3]


def test_expr_hist():
    d = pl.DataFrame({"v": [1.0, 2.0, 2.5, 3.0, 9.0]})
    # right-closed bins (a, b] like polars
    assert one(d, pl.col("v").hist(bins=[0, 2, 4, 10])) == [2, 2, 1]
    got = d.select(pl.col("v").hist(bins=[0, 2, 4, 10],
                                    include_breakpoint=True).alias("h")) \
        .to_dict()["h"]
    assert got[0] == {"breakpoint": 2.0, "count": 2}
    assert sum(one(d, pl.col("v").hist(bin_count=4))) == 5
