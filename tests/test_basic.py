"""Core eager API: construction, select/with_columns/filter, nulls."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_construct_and_shape():
    df = pl.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, 3.5],
                       "c": ["x", "y", "z"], "d": [True, False, True]})
    assert df.shape == (3, 4)
    assert df.columns == ["a", "b", "c", "d"]
    assert df.schema["a"] == pl.Int64
    assert df.schema["b"] == pl.Float64
    assert df.schema["c"] == pl.String
    assert df.schema["d"] == pl.Boolean


def test_to_dict_roundtrip():
    data = {"a": [1, 2, 3], "b": ["x", None, "z"]}
    df = pl.DataFrame(data)
    assert df.to_dict() == data


def test_select_arithmetic(assert_frames):
    df = pl.DataFrame({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
    out = df.select(
        (pl.col("a") + 1).alias("a1"),
        (pl.col("a") * pl.col("b")).alias("ab"),
        (pl.col("b") / 2).alias("b2"),
        (pl.col("a") % 2).alias("amod"),
        (pl.col("a") ** 2).alias("asq"),
    )
    assert_frames(out.to_dict(), {
        "a1": [2, 3, 4], "ab": [10.0, 40.0, 90.0], "b2": [5.0, 10.0, 15.0],
        "amod": [1, 0, 1], "asq": [1, 4, 9]})


def test_filter(assert_frames):
    df = pl.DataFrame({"a": [1, 2, 3, 4, 5], "b": ["x", "y", "x", "y", "x"]})
    out = df.filter(pl.col("a") > 2)
    assert_frames(out.to_dict(), {"a": [3, 4, 5], "b": ["x", "y", "x"]})
    out2 = df.filter((pl.col("a") > 1) & (pl.col("b") == "x"))
    assert_frames(out2.to_dict(), {"a": [3, 5], "b": ["x", "x"]})


def test_filter_keyword():
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    assert df.filter(b="y").to_dict() == {"a": [2], "b": ["y"]}


def test_with_columns():
    df = pl.DataFrame({"a": [1, 2]})
    out = df.with_columns((pl.col("a") * 2).alias("b"), c=pl.col("a") + 10)
    assert out.to_dict() == {"a": [1, 2], "b": [2, 4], "c": [11, 12]}


def test_null_propagation():
    df = pl.DataFrame({"a": [1, None, 3], "b": [10, 20, None]})
    out = df.select(
        (pl.col("a") + pl.col("b")).alias("s"),
        pl.col("a").is_null().alias("an"),
        pl.col("a").fill_null(0).alias("af"),
    )
    assert out.to_dict() == {
        "s": [11, None, None], "an": [False, True, False], "af": [1, 0, 3]}


def test_kleene_logic():
    df = pl.DataFrame({"a": [True, True, False, None],
                       "b": [None, False, None, None]})
    out = df.select(
        (pl.col("a") & pl.col("b")).alias("and"),
        (pl.col("a") | pl.col("b")).alias("or"),
    )
    assert out.to_dict() == {
        "and": [None, False, False, None],
        "or": [True, True, None, None]}


def test_comparison_with_string_literal():
    df = pl.DataFrame({"s": ["apple", "banana", "cherry"]})
    assert df.filter(pl.col("s") >= "banana").to_dict() == {
        "s": ["banana", "cherry"]}
    assert df.filter(pl.col("s") == "apple").to_dict() == {"s": ["apple"]}
    assert df.filter(pl.col("s") < "b").to_dict() == {"s": ["apple"]}


def test_when_then():
    df = pl.DataFrame({"a": [1, 2, 3, 4]})
    out = df.select(
        pl.when(pl.col("a") > 2).then(pl.lit("big"))
        .when(pl.col("a") > 1).then(pl.lit("mid"))
        .otherwise(pl.lit("small")).alias("c"))
    assert out.to_dict() == {"c": ["small", "mid", "big", "big"]}


def test_when_then_null_otherwise():
    df = pl.DataFrame({"a": [1, 2, 3]})
    out = df.select(pl.when(pl.col("a") > 1).then(pl.col("a")).alias("b"))
    assert out.to_dict() == {"b": [None, 2, 3]}


def test_head_tail_slice():
    df = pl.DataFrame({"a": list(range(10))})
    assert df.head(3).to_dict() == {"a": [0, 1, 2]}
    assert df.tail(2).to_dict() == {"a": [8, 9]}
    assert df.slice(2, 3).to_dict() == {"a": [2, 3, 4]}
    assert df.slice(-3, 2).to_dict() == {"a": [7, 8]}


def test_filtered_then_ops():
    df = pl.DataFrame({"a": [5, 1, 4, 2, 3]})
    out = df.filter(pl.col("a") >= 3).head(2)
    assert out.to_dict() == {"a": [5, 4]}


def test_cast():
    df = pl.DataFrame({"a": [1.7, 2.2], "b": [1, 0]})
    out = df.select(pl.col("a").cast(pl.Int64).alias("ai"),
                    pl.col("b").cast(pl.Boolean).alias("bb"),
                    pl.col("b").cast(pl.Float32).alias("bf"))
    assert out.to_dict()["ai"] == [1, 2]
    assert out.to_dict()["bb"] == [True, False]
    assert out.schema["bf"] == pl.Float32


def test_is_in_is_between():
    df = pl.DataFrame({"a": [1, 2, 3, 4], "s": ["x", "y", "z", "w"]})
    assert df.filter(pl.col("a").is_in([2, 4])).to_dict()["a"] == [2, 4]
    assert df.filter(pl.col("s").is_in(["x", "w"])).to_dict()["s"] == ["x", "w"]
    assert df.filter(pl.col("a").is_between(2, 3)).to_dict()["a"] == [2, 3]
    assert df.filter(
        pl.col("a").is_between(2, 4, closed="left")).to_dict()["a"] == [2, 3]


def test_rename_drop():
    df = pl.DataFrame({"a": [1], "b": [2], "c": [3]})
    assert df.rename({"a": "x"}).columns == ["x", "b", "c"]
    assert df.drop("b").columns == ["a", "c"]
    with pytest.raises(pl.ColumnNotFoundError):
        df.drop("zz")


def test_unary_math(assert_frames):
    df = pl.DataFrame({"a": [-1.0, 4.0, 9.0]})
    out = df.select(pl.col("a").abs().alias("abs"),
                    pl.col("a").sqrt().alias("sqrt"),
                    (-pl.col("a")).alias("neg"))
    d = out.to_dict()
    assert d["abs"] == [1.0, 4.0, 9.0]
    assert d["neg"] == [1.0, -4.0, -9.0]
    assert d["sqrt"][1] == 2.0 and d["sqrt"][2] == 3.0
    assert np.isnan(d["sqrt"][0])


def test_int_division_by_zero_is_null():
    df = pl.DataFrame({"a": [6, 7], "b": [2, 0]})
    out = df.select((pl.col("a") // pl.col("b")).alias("d"),
                    (pl.col("a") % pl.col("b")).alias("m"))
    assert out.to_dict() == {"d": [3, None], "m": [0, None]}


def test_wildcard_expansion():
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = df.select(pl.col("*").sum())
    assert out.to_dict() == {"a": [3], "b": [7]}


def test_vstack_and_concat():
    a = pl.DataFrame({"x": [1, 2], "s": ["a", "b"]})
    b = pl.DataFrame({"x": [3], "s": ["c"]})
    out = pl.concat([a, b])
    assert out.to_dict() == {"x": [1, 2, 3], "s": ["a", "b", "c"]}


def test_reverse_and_row_index():
    df = pl.DataFrame({"a": [10, 20, 30]})
    assert df.reverse().to_dict() == {"a": [30, 20, 10]}
    out = df.with_row_index("i")
    assert out.to_dict() == {"i": [0, 1, 2], "a": [10, 20, 30]}


def test_gather_every():
    df = pl.DataFrame({"a": list(range(10))})
    assert df.gather_every(3).to_dict() == {"a": [0, 3, 6, 9]}
    assert df.gather_every(3, offset=1).to_dict() == {"a": [1, 4, 7]}
