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


def test_depth_three_raises():
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.DataFrame({"x": [[[[1]]]]})
    with pytest.raises(pl.exceptions.InvalidOperationError):
        pl.DataFrame({"x": [[[{"a": 1}]]]})
