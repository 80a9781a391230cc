"""Behavior-parity regressions from the round-1 edge-semantics sweep:
null-key joins, over() mapping strategies, regex replacement refs,
pivot missing-combo nulls, strict string casts."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_join_nulls_equal():
    a = pl.DataFrame({"k": [1, None, 3], "x": [1, 2, 3]})
    b = pl.DataFrame({"k": [1, None, 4], "y": [10, 20, 30]})
    # default: null keys never match (polars semantics)
    assert a.join(b, on="k", how="inner").to_dict()["x"] == [1]
    out = a.join(b, on="k", how="inner", nulls_equal=True).sort("x").to_dict()
    assert out["x"] == [1, 2] and out["y"] == [10, 20]
    lz = a.lazy().join(b.lazy(), on="k", nulls_equal=True).collect()
    assert sorted(lz.to_dict()["x"]) == [1, 2]


def test_over_mapping_strategy_join():
    df = pl.DataFrame({"g": [1, 1, 2], "v": [1, 2, 3]})
    out = df.with_columns(
        pl.col("v").implode().over("g", mapping_strategy="join")
        .alias("l")).to_dict()
    assert out["l"] == [[1, 2], [1, 2], [3]]
    # bare column implodes implicitly
    out2 = df.with_columns(
        pl.col("v").over("g", mapping_strategy="join").alias("l")).to_dict()
    assert out2["l"] == [[1, 2], [1, 2], [3]]
    # scalar aggregate -> 1-element list per row
    out3 = df.with_columns(
        pl.col("v").sum().over("g", mapping_strategy="join")
        .alias("l")).to_dict()
    assert out3["l"] == [[3], [3], [3]]


def test_over_mapping_strategy_explode():
    df = pl.DataFrame({"g": [2, 1, 1], "v": [3, 1, 2]})
    out = df.select(pl.col("v").over("g", mapping_strategy="explode")
                    .alias("e")).to_dict()
    assert out["e"] == [1, 2, 3]  # group-major (key-sorted) order


def test_str_replace_dollar_refs():
    s = pl.Series("s", ["ab12", "cd34"])
    assert s.str.replace(r"(\d+)", "<$1>").to_list() == ["ab<12>", "cd<34>"]
    assert s.str.replace(r"(?P<d>\d+)", "${d}!").to_list() == ["ab12!",
                                                               "cd34!"]
    assert pl.Series("s", ["a1"]).str.replace(r"\d", "$$").to_list() == ["a$"]


def test_pivot_missing_combos_are_null():
    df = pl.DataFrame({"g": ["a", "a", "b"], "k": ["x", "y", "x"],
                       "v": [1, 2, 3]})
    out = df.pivot(index="g", on="k", values="v",
                   aggregate_function="sum").sort("g").to_dict()
    assert out["x"] == [1, 3]
    assert out["y"] == [2, None]
    out2 = df.pivot(index="g", on="k", values="v",
                    aggregate_function="len").sort("g").to_dict()
    assert out2["y"] == [1, None]


def test_when_then_in_group_agg():
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
    out = df.group_by("g").agg(
        pl.when(pl.col("v").sum() > 2).then(pl.lit("big"))
        .otherwise(pl.lit("small")).alias("c")).sort("g").to_dict()
    assert out["c"] == ["big", "big"]


def test_strict_cast_str_raises():
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.Series("a", ["x"]).cast(pl.Int64)
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.DataFrame({"s": ["1", "no"]}).select(pl.col("s").cast(pl.Int64))
    # non-strict nulls failures; float-looking strings are not ints
    assert pl.Series("a", ["12", "x", "2.5"]).cast(
        pl.Int64, strict=False).to_list() == [12, None, None]
    # filtered-away bad rows don't raise (stale dictionary codes)
    df = pl.DataFrame({"s": ["1", "zzz", "3"]})
    out = df.filter(pl.col("s") != "zzz").with_columns(
        pl.col("s").cast(pl.Int64).alias("i")).to_dict()
    assert out["i"] == [1, 3]


def test_struct_rename_and_getitem():
    df = pl.DataFrame({"s": [{"a": 1, "b": 2}, {"a": 3, "b": 4}]})
    out = df.select(pl.col("s").struct.rename_fields(["x", "y"])).to_dict()
    assert out["s"] == [{"x": 1, "y": 2}, {"x": 3, "y": 4}]
    assert df.select(pl.col("s").struct["a"]).to_dict()["a"] == [1, 3]
    pre = df.select(pl.col("s").struct.prefix_fields("p_")).to_dict()
    assert pre["s"][0] == {"p_a": 1, "p_b": 2}


def test_module_level_sql():
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
    out = pl.sql("SELECT g, SUM(v) AS s FROM df GROUP BY g "
                 "HAVING SUM(v) > 2 ORDER BY g", eager=True).to_dict()
    assert out["g"] == ["a", "b"] and out["s"] == [3, 3]
    lazy = pl.sql("SELECT COUNT(*) AS n FROM df")
    assert lazy.collect().to_dict()["n"] == [3]


def test_horizontal_output_names():
    df = pl.DataFrame({"a": [1, None], "b": [3, 2]})
    assert df.select(pl.sum_horizontal("a", "b")).to_dict()["sum"] == [4, 2]
    assert df.select(pl.max_horizontal("a", "b")).to_dict()["max"] == [3, 2]
    # coalesce keeps the first input's name
    assert df.select(pl.coalesce("a", "b")).to_dict()["a"] == [1, 2]


def test_join_maintain_order_param_accepted():
    a = pl.DataFrame({"k": [3, 1, 2], "x": [1, 2, 3]})
    b = pl.DataFrame({"k": [2, 3, 1], "y": [9, 8, 7]})
    out = a.join(b, on="k", maintain_order="left").to_dict()
    assert out["k"] == [3, 1, 2] and out["y"] == [8, 7, 9]


def test_fold_reduce_selector_inputs():
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = df.select(pl.fold(acc=pl.lit(0), function=lambda a, x: a + x,
                            exprs=pl.all()).alias("s")).to_dict()
    assert out["s"] == [4, 6]
    out2 = df.select(pl.reduce(lambda a, x: a * x, pl.all())).to_dict()
    assert out2["reduce"] == [3, 8]
    lz = df.lazy().select(pl.fold(0, lambda a, x: a + x, pl.all())).collect()
    assert lz.to_dict()["fold"] == [4, 6]


def test_config_context_manager():
    with pl.Config(tbl_rows=2):
        assert pl.CONFIG.fmt_max_rows == 2
    assert pl.CONFIG.fmt_max_rows == 10
    pl.Config.set_tbl_rows(4)
    assert pl.CONFIG.fmt_max_rows == 4
    pl.Config.restore_defaults()


def test_csv_options(tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("a;b\n1;x\n#comment\n2;y\n")
    out = pl.read_csv(p, separator=";", comment_prefix="#").to_dict()
    assert out["a"] == [1, 2]
    df = pl.DataFrame({"a": [1.5, 2.0], "b": ["x", None]})
    txt = df.write_csv(separator=";", null_value="NA")
    assert txt.splitlines()[1] == "1.5;x"
    assert txt.splitlines()[2] == "2.0;NA"
    assert "1.500" in df.write_csv(float_precision=3)
    # minimal quoting + roundtrip
    d2 = pl.DataFrame({"s": ["a,b", "plain"]})
    assert d2.write_csv().splitlines()[1] == '"a,b"'
    assert pl.read_csv(d2.write_csv()).to_dict()["s"] == ["a,b", "plain"]


def test_list_eval_filter():
    df = pl.DataFrame({"a": [[1, 5, 2], [8, 1]]})
    out = df.select(pl.col("a").list.eval(
        pl.element().filter(pl.element() > 1))).to_dict()
    assert out["a"] == [[5, 2], [8]]
    out2 = df.select(pl.col("a").list.eval(
        (pl.element() * 2).filter(pl.element() > 1))).to_dict()
    assert out2["a"] == [[10, 4], [16]]


def test_join_validate():
    a = pl.DataFrame({"k": [1, 1], "x": [1, 2]})
    b = pl.DataFrame({"k": [1], "y": [9]})
    with pytest.raises(pl.exceptions.ComputeError):
        a.join(b, on="k", validate="1:1")
    with pytest.raises(pl.exceptions.ComputeError):
        a.join(b, on="k", validate="1:m")
    a.join(b, on="k", validate="m:1")  # right unique: fine
    with pytest.raises(pl.exceptions.ComputeError):
        b.join(a, on="k", validate="m:1")


def test_upsample():
    from datetime import datetime
    df = pl.DataFrame({"t": [datetime(2024, 1, 1), datetime(2024, 1, 3)],
                       "v": [1, 2]}).set_sorted("t")
    out = df.upsample("t", every="1d").to_dict()
    assert out["v"] == [1, None, 2]


def test_extend_mutates():
    a = pl.DataFrame({"x": [1]})
    ret = a.extend(pl.DataFrame({"x": [2]}))
    assert a.to_dict()["x"] == [1, 2]
    assert ret is a
