"""Depth-2 nested dtypes: List(Struct) and List(List).

List(Struct) stores per-field List columns sharing the outer lengths
(struct-of-list-of-arrays); List(List) stores a lifted child List column
whose arrays carry a leading width axis (data (cap, W1, W2), inner
lengths (cap, W1)). Reference capability: arbitrary nesting in
polars-arrow ListArray/StructArray.
"""

import numpy as np
import pytest

import polaroid_tpu as pl

LS_ROWS = [[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], None, [],
           [None, {"a": 5, "b": None}]]
LL_ROWS = [[[1, 2], [3]], None, [[], [4, None, 6]], [None]]


@pytest.fixture
def ndf():
    return pl.DataFrame({"ls": LS_ROWS, "ll": LL_ROWS, "i": [1, 2, 3, 4]})


def test_nested_construct_decode(ndf):
    assert repr(ndf.schema["ls"]) == "List(Struct({'a': Int64, 'b': String}))"
    assert repr(ndf.schema["ll"]) == "List(List(Int64))"
    d = ndf.to_dict()
    assert d["ls"] == LS_ROWS
    assert d["ll"] == LL_ROWS


def test_nested_structural_ops(ndf):
    s = ndf.sort("i", descending=True).to_dict()
    assert s["ls"] == LS_ROWS[::-1] and s["ll"] == LL_ROWS[::-1]
    f = ndf.filter(pl.col("i") >= 3).to_dict()
    assert f["ls"] == LS_ROWS[2:] and f["ll"] == LL_ROWS[2:]
    h = ndf.head(2).to_dict()
    assert h["ls"] == LS_ROWS[:2] and h["ll"] == LL_ROWS[:2]


def test_nested_explode(ndf):
    e1 = ndf.select(pl.col("ls")).explode("ls").to_dict()
    assert e1["ls"] == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, None, None,
                        None, {"a": 5, "b": None}]
    e2 = ndf.select(pl.col("ll")).explode("ll").to_dict()
    assert e2["ll"] == [[1, 2], [3], None, [], [4, None, 6], None]


def test_nested_list_namespace(ndf):
    n = ndf.select(pl.col("ls").list.len().alias("n"),
                   pl.col("ll").list.len().alias("m")).to_dict()
    assert n["n"] == [2, None, 0, 2]
    assert n["m"] == [2, None, 2, 1]
    g = ndf.select(pl.col("ls").list.get(0).alias("g")).to_dict()
    assert g["g"] == [{"a": 1, "b": "x"}, None, None, None]
    fa = ndf.select(pl.col("ls").list.first().struct.field("a")).to_dict()
    assert fa["a"] == [1, None, None, None]
    g2 = ndf.select(pl.col("ll").list.last().alias("g")).to_dict()
    assert g2["g"] == [[3], None, [4, None, 6], None]
    # chain into inner list reductions
    s2 = ndf.select(pl.col("ll").list.get(0).list.sum().alias("s")).to_dict()
    assert s2["s"] == [3, None, 0, None]


def test_nested_io_roundtrip(ndf, tmp_path):
    p = tmp_path / "n.parquet"
    ndf.write_parquet(str(p))
    rd = pl.read_parquet(str(p)).to_dict()
    assert rd["ls"] == LS_ROWS and rd["ll"] == LL_ROWS
    a = tmp_path / "n.arrow"
    ndf.write_ipc(str(a))
    rd2 = pl.read_ipc(str(a)).to_dict()
    assert rd2["ls"] == LS_ROWS and rd2["ll"] == LL_ROWS


def test_nested_concat_and_empty_schema():
    a = pl.DataFrame({"ls": [[{"a": 1}]], "ll": [[[1, 2]]]})
    b = pl.DataFrame({"ls": [[{"a": 9}]], "ll": [[[7, 8, 9, 10, 11]]]})
    c = pl.concat([a, b]).to_dict()
    assert c["ls"] == [[{"a": 1}], [{"a": 9}]]
    assert c["ll"] == [[[1, 2]], [[7, 8, 9, 10, 11]]]
    e = pl.DataFrame(schema={"x": pl.Int64,
                             "ls": pl.List(pl.Struct({"a": pl.Int64})),
                             "ll": pl.List(pl.List(pl.Int64))})
    assert len(e) == 0
    assert repr(e.schema["ll"]) == "List(List(Int64))"


D3_ROWS = [[[[1, 2], [3]], [[4]]], None, [[[5], [6, 7, 8]]], [[]], []]


def test_depth_three_roundtrip_and_structural():
    df = pl.DataFrame({"x": D3_ROWS})
    assert repr(df.schema["x"]) == "List(List(List(Int64)))"
    assert df.to_dict()["x"] == D3_ROWS
    df2 = pl.DataFrame({"k": [3, 1, 2, 5, 4], "x": D3_ROWS})
    got = df2.sort("k").to_dict()["x"]
    exp = [x for _, x in sorted(zip([3, 1, 2, 5, 4], D3_ROWS),
                                key=lambda p: p[0])]
    assert got == exp
    got = df2.filter(pl.col("k") > 2).to_dict()["x"]
    assert got == [D3_ROWS[0], D3_ROWS[3], D3_ROWS[4]]


def test_depth_three_explode_and_list_ops():
    df = pl.DataFrame({"x": D3_ROWS})
    assert df.explode("x").to_dict()["x"] == \
        [[[1, 2], [3]], [[4]], None, [[5], [6, 7, 8]], [], None]
    assert df.select(pl.col("x").list.len().alias("n")).to_dict()["n"] == \
        [2, None, 1, 1, 0]
    assert df.select(pl.col("x").list.first().alias("f")).to_dict()["f"] == \
        [[[1, 2], [3]], None, [[5], [6, 7, 8]], [], None]
    assert df.select(pl.col("x").list.get(1).alias("g")).to_dict()["g"] == \
        [[[4]], None, None, None, None]


def test_depth_three_io_and_concat(tmp_path):
    df = pl.DataFrame({"x": D3_ROWS})
    p = tmp_path / "d3.parquet"
    df.write_parquet(str(p))
    assert pl.read_parquet(str(p)).to_dict()["x"] == D3_ROWS
    a = tmp_path / "d3.arrow"
    df.write_ipc(str(a))
    assert pl.read_ipc(str(a)).to_dict()["x"] == D3_ROWS
    assert pl.concat([df, df]).to_dict()["x"] == D3_ROWS + D3_ROWS
    e = pl.DataFrame(schema={"x": pl.List(pl.List(pl.List(pl.Int64)))})
    assert len(e) == 0
    assert repr(e.schema["x"]) == "List(List(List(Int64)))"


def test_list_list_struct_and_depth_four():
    rows = [[[{"a": 1}, {"a": 2}]], [[{"a": 3}], [{"a": 4}, {"a": 5}]],
            None]
    df = pl.DataFrame({"y": rows})
    assert df.to_dict()["y"] == rows
    assert df.explode("y").to_dict()["y"] == \
        [[{"a": 1}, {"a": 2}], [{"a": 3}], [{"a": 4}, {"a": 5}], None]
    rows4 = [[[[[1], [2, 3]]]], [[[[4]]]], None]
    df4 = pl.DataFrame({"z": rows4})
    assert df4.to_dict()["z"] == rows4


def test_group_agg_implode_nested():
    df = pl.DataFrame({"k": [1, 1, 2], "x": [[[1], [2]], [[3]], [[4, 5]]]})
    g = df.group_by("k", maintain_order=True).agg(pl.col("x")).to_dict()["x"]
    assert g == [[[[1], [2]], [[3]]], [[[4, 5]]]]
    df = pl.DataFrame({"k": [1, 2, 1], "x": [[1, 2], None, [3]]})
    g = df.group_by("k", maintain_order=True).agg(pl.col("x")).to_dict()["x"]
    assert g == [[[1, 2], [3]], [None]]
    df = pl.DataFrame({"k": [1, 1, 2], "s": [{"a": 1}, {"a": 2}, {"a": 3}]})
    g = df.group_by("k", maintain_order=True).agg(pl.col("s")).to_dict()["s"]
    assert g == [[{"a": 1}, {"a": 2}], [{"a": 3}]]
