"""List/Struct nested dtype tests.

Reference behavior: py-polars/tests/unit/operations/test_explode.py,
namespaces `.list`/`.struct` (py-polars/src/polars/expr/list.py,
struct.py). Oracles are hand-computed or pandas where applicable.
"""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_list_construction_and_roundtrip():
    df = pl.DataFrame({"a": [[1, 2, 3], [4, 5], [], None, [7]],
                       "k": [1, 2, 3, 4, 5]})
    assert repr(df.schema["a"]) == "List(Int64)"
    assert df.to_dict()["a"] == [[1, 2, 3], [4, 5], [], None, [7]]


def test_list_inner_nulls():
    df = pl.DataFrame({"a": [[1, None, 3], None, [None]]})
    assert df.to_dict()["a"] == [[1, None, 3], None, [None]]


def test_explode_frame():
    df = pl.DataFrame({"a": [[1, 2, 3], [4, 5], [], None, [7]],
                       "k": [1, 2, 3, 4, 5]})
    out = df.explode("a")
    assert out.to_dict()["a"] == [1, 2, 3, 4, 5, None, None, 7]
    assert out.to_dict()["k"] == [1, 1, 1, 2, 2, 3, 4, 5]


def test_explode_lazy_and_expr():
    df = pl.DataFrame({"a": [[1, 2], [3]], "k": [1, 2]})
    out = df.lazy().explode("a").collect()
    assert out.to_dict()["a"] == [1, 2, 3]
    out2 = df.select(pl.col("a").explode())
    assert out2.to_dict()["a"] == [1, 2, 3]
    out3 = df.lazy().select(pl.col("a").explode()).collect()
    assert out3.to_dict()["a"] == [1, 2, 3]


def test_explode_mismatched_lengths_errors():
    df = pl.DataFrame({"a": [[1, 2], [3]], "b": [[1], [2, 3]]})
    with pytest.raises(pl.ShapeError):
        df.explode("a", "b")


def test_explode_multiple_columns():
    df = pl.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]]})
    out = df.explode("a", "b")
    assert out.to_dict() == {"a": [1, 2, 3], "b": ["x", "y", "z"]}


def test_list_namespace_reductions():
    df = pl.DataFrame({"a": [[1, 2, 3], [4, 5], [], None]})
    out = df.select(
        n=pl.col("a").list.len(),
        s=pl.col("a").list.sum(),
        m=pl.col("a").list.mean(),
        mn=pl.col("a").list.min(),
        mx=pl.col("a").list.max(),
    )
    d = out.to_dict()
    assert d["n"] == [3, 2, 0, None]
    assert d["s"] == [6, 9, 0, None]
    assert d["m"] == [2.0, 4.5, None, None]
    assert d["mn"] == [1, 4, None, None]
    assert d["mx"] == [3, 5, None, None]


def test_list_namespace_access():
    df = pl.DataFrame({"a": [[1, 2, 3], [4], []]})
    d = df.select(
        f=pl.col("a").list.first(),
        l=pl.col("a").list.last(),
        g=pl.col("a").list.get(1),
        gm=pl.col("a").list.get(-1),
        c=pl.col("a").list.contains(4),
    ).to_dict()
    assert d["f"] == [1, 4, None]
    assert d["l"] == [3, 4, None]
    assert d["g"] == [2, None, None]
    assert d["gm"] == [3, 4, None]
    assert d["c"] == [False, True, False]


def test_list_transforms():
    df = pl.DataFrame({"a": [[3, 1, 2], [5, 4], []]})
    d = df.select(
        r=pl.col("a").list.reverse(),
        s=pl.col("a").list.sort(),
        sd=pl.col("a").list.sort(descending=True),
        h=pl.col("a").list.head(2),
        t=pl.col("a").list.tail(2),
        sl=pl.col("a").list.slice(1, 1),
    ).to_dict()
    assert d["r"] == [[2, 1, 3], [4, 5], []]
    assert d["s"] == [[1, 2, 3], [4, 5], []]
    assert d["sd"] == [[3, 2, 1], [5, 4], []]
    assert d["h"] == [[3, 1], [5, 4], []]
    assert d["t"] == [[1, 2], [5, 4], []]
    assert d["sl"] == [[1], [4], []]


def test_list_unique():
    df = pl.DataFrame({"a": [[3, 1, 3, 1], [2, 2], []]})
    d = df.select(u=pl.col("a").list.unique()).to_dict()
    assert d["u"] == [[1, 3], [2], []]


def test_list_bool_ops():
    df = pl.DataFrame({"a": [[True, False], [True, True], []]})
    d = df.select(any_=pl.col("a").list.any(),
                  all_=pl.col("a").list.all()).to_dict()
    assert d["any_"] == [True, True, False]
    assert d["all_"] == [False, True, True]  # vacuous all = True


def test_str_split_and_join():
    df = pl.DataFrame({"t": ["a,b,c", "x", "", None]})
    sp = df.select(pl.col("t").str.split(","))
    assert repr(sp.schema["t"]) == "List(String)"
    assert sp.to_dict()["t"] == [["a", "b", "c"], ["x"], [""], None]
    j = sp.select(pl.col("t").list.join("-"))
    assert j.to_dict()["t"] == ["a-b-c", "x", "", None]


def test_implode_full_column():
    df = pl.DataFrame({"v": [1, None, 3]})
    out = df.select(pl.col("v").implode())
    assert out.to_dict()["v"] == [[1, None, 3]]


def test_group_by_implicit_implode():
    df = pl.DataFrame({"k": [1, 1, 2, 2, 2], "v": [10, 20, 30, None, 50]})
    out = df.group_by("k", maintain_order=True).agg(pl.col("v"))
    assert repr(out.schema["v"]) == "List(Int64)"
    assert out.to_dict()["v"] == [[10, 20], [30, None, 50]]
    # explicit implode agrees
    out2 = df.group_by("k", maintain_order=True).agg(pl.col("v").implode())
    assert out2.to_dict()["v"] == out.to_dict()["v"]


def test_group_by_implode_then_list_op():
    df = pl.DataFrame({"k": [1, 1, 2], "v": [3, 1, 2]})
    out = df.group_by("k", maintain_order=True).agg(
        pl.col("v").implode().list.sort())
    assert out.to_dict()["v"] == [[1, 3], [2]]


def test_struct_construction():
    df = pl.DataFrame({"s": [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}, None]})
    assert df.to_dict()["s"] == [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}, None]
    d = df.select(pl.col("s").struct.field("y")).to_dict()
    assert d["y"] == ["a", "b", None]


def test_struct_build_and_unnest():
    df = pl.DataFrame({"a": [1, 2], "b": [3.5, 4.5]})
    st = df.select(pl.struct("a", "b").alias("ab"))
    assert st.to_dict()["ab"] == [{"a": 1, "b": 3.5}, {"a": 2, "b": 4.5}]
    un = st.unnest("ab")
    assert un.to_dict() == {"a": [1, 2], "b": [3.5, 4.5]}
    lz = st.lazy().unnest("ab").collect()
    assert lz.to_dict() == un.to_dict()


def test_nested_survives_filter_sort_join_concat():
    df = pl.DataFrame({"a": [[1, 2], [3], [4, 5, 6]],
                       "s": [{"x": 1}, {"x": 2}, {"x": 3}],
                       "k": [1, 2, 3]})
    f = df.filter(pl.col("k") >= 2)
    assert f.to_dict()["a"] == [[3], [4, 5, 6]]
    srt = df.sort("k", descending=True)
    assert srt.to_dict()["a"] == [[4, 5, 6], [3], [1, 2]]
    other = pl.DataFrame({"k": [1, 3], "w": ["p", "q"]})
    j = df.join(other, on="k", how="inner").sort("k")
    assert j.to_dict()["a"] == [[1, 2], [4, 5, 6]]
    assert j.to_dict()["s"] == [{"x": 1}, {"x": 3}]
    c = pl.concat([df, df])
    assert c.height == 6
    assert c.to_dict()["a"][3:] == [[1, 2], [3], [4, 5, 6]]


def test_nested_parquet_roundtrip(tmp_path):
    df = pl.DataFrame({"a": [[1, 2, 3], [4, None], None, []],
                       "s": [{"x": 1, "y": "p"}, {"x": 2, "y": "q"},
                             None, {"x": 4, "y": "r"}],
                       "ls": [["u", "v"], [], ["w"], None],
                       "k": [1, 2, 3, 4]})
    p = str(tmp_path / "n.parquet")
    df.write_parquet(p)
    back = pl.read_parquet(p)
    assert back.to_dict() == df.to_dict()
    assert pl.scan_parquet(p).collect().to_dict() == df.to_dict()


def test_explode_schema_lazy():
    df = pl.DataFrame({"a": [[1, 2]], "k": [1]})
    lf = df.lazy().explode("a")
    assert repr(lf.schema["a"]) == "Int64"


def test_nested_survives_fused_sort_chain():
    # regression: the fused-executor flatten/unflatten dropped list lengths
    df = pl.DataFrame({"symbol": (["A"] * 3 + ["B"] * 2) * 10,
                       "price": list(range(50))})
    lf = (df.lazy().group_by("symbol")
          .agg(pl.len().alias("n"), pl.col("price").implode().alias("ps"))
          .sort("symbol"))
    for eng in ("in-memory", "streaming"):
        d = lf.collect(engine=eng).to_dict()
        assert d["n"] == [len(x) for x in d["ps"]]
        assert d["n"] == [30, 20]
    d3 = pl.DataFrame({"k": [2, 1, 3], "s": [{"x": 1}, {"x": 2}, {"x": 3}]})
    r = d3.lazy().sort("k").collect().to_dict()
    assert r["s"] == [{"x": 2}, {"x": 1}, {"x": 3}]


def test_list_eval_element():
    df = pl.DataFrame({"a": [[1, 2, 3], [4, None], []]})
    out = df.select(pl.col("a").list.eval(pl.element() * 10))
    assert out.to_dict()["a"] == [[10, 20, 30], [40, None], []]
    out2 = df.select(pl.col("a").list.eval(pl.element() > 2))
    assert out2.to_dict()["a"] == [[False, False, True], [True, None], []]
    sf = pl.DataFrame({"s": [["ab", "c"], ["d"]]})
    o3 = sf.select(pl.col("s").list.eval(pl.element().str.to_uppercase()))
    assert o3.to_dict()["s"] == [["AB", "C"], ["D"]]


def test_testing_module():
    from polaroid_tpu.testing import (assert_frame_equal,
                                      assert_frame_not_equal,
                                      assert_series_equal)
    df = pl.DataFrame({"a": [1.0, 2.0]})
    assert_frame_equal(df, df)
    assert_series_equal(pl.Series("x", [1.0]), pl.Series("x", [1.0 + 1e-9]))
    assert_frame_not_equal(df, pl.DataFrame({"a": [1.0, 3.0]}))
    import pytest
    with pytest.raises(AssertionError):
        assert_frame_equal(df, pl.DataFrame({"a": [1.0, 3.0]}))


def test_repeat_by_and_int_ranges():
    df = pl.DataFrame({"a": [1, 2], "n": [2, 3]})
    r = df.select(pl.col("a").repeat_by(pl.col("n")))
    assert r.to_dict()["a"] == [[1, 1], [2, 2, 2]]
    ir = df.select(pl.int_ranges(pl.lit(0), pl.col("n")).alias("r"))
    assert ir.to_dict()["r"] == [[0, 1], [0, 1, 2]]
    ex = df.select(pl.col("a").repeat_by("n").explode())
    assert ex.to_dict()["a"] == [1, 1, 2, 2, 2]


def test_concat_list():
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = df.select(pl.concat_list("a", "b").alias("l"))
    assert out.to_dict()["l"] == [[1, 3], [2, 4]]
    d2 = pl.DataFrame({"l": [[1, 2], [5]], "c": [9, 9]})
    o2 = d2.select(pl.concat_list("l", "c").alias("x"))
    assert o2.to_dict()["x"] == [[1, 2, 9], [5, 9]]
    d3 = pl.DataFrame({"a": [1, None], "b": [2, 3]})
    o3 = d3.select(pl.concat_list("a", "b").alias("x"))
    assert o3.to_dict()["x"] == [[1, 2], [None, 3]]
