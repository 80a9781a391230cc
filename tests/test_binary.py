"""Binary dtype: dictionary-coded bytes columns + the .bin namespace.

Reference surface: py-polars binary namespace
(py-polars/src/polars/expr/binary.py, series/binary.py) and the Binary
dtype plumbed through polars-arrow binview arrays.
"""

import base64

import numpy as np
import pytest

import polaroid_tpu as pl


@pytest.fixture
def bdf():
    return pl.DataFrame({
        "b": [b"hello", b"world\x00x", None, b"abc", b"hello"],
        "x": [1, 2, 3, 4, 5]})


def test_binary_construct_roundtrip(bdf):
    assert repr(bdf.schema["b"]) == "Binary"
    assert bdf.to_dict()["b"] == \
        [b"hello", b"world\x00x", None, b"abc", b"hello"]


def test_binary_sort_filter_groupby_join(bdf):
    s = bdf.sort("b", nulls_last=True).to_dict()["b"]
    assert s[:4] == [b"abc", b"hello", b"hello", b"world\x00x"]
    f = bdf.filter(pl.col("b") == b"hello").to_dict()
    assert f["x"] == [1, 5]
    g = bdf.drop_nulls().group_by("b").agg(
        pl.col("x").sum().alias("sx")).sort("b").to_dict()
    assert g["b"] == [b"abc", b"hello", b"world\x00x"]
    assert g["sx"] == [4, 6, 2]
    left = pl.DataFrame({"k": [b"a", b"b", b"c"], "v": [1, 2, 3]})
    right = pl.DataFrame({"k": [b"b", b"c", b"d"], "w": [9, 8, 7]})
    j = left.join(right, on="k", how="inner").sort("v").to_dict()
    assert j["k"] == [b"b", b"c"] and j["w"] == [9, 8]


def test_bin_namespace_predicates_size(bdf):
    out = bdf.select(
        pl.col("b").bin.contains(b"ell").alias("c"),
        pl.col("b").bin.starts_with(b"he").alias("sw"),
        pl.col("b").bin.ends_with(b"x").alias("ew"),
        pl.col("b").bin.size().alias("sz"),
    ).to_dict()
    assert out["c"] == [True, False, None, False, True]
    assert out["sw"] == [True, False, None, False, True]
    assert out["ew"] == [False, True, None, False, False]
    assert out["sz"] == [5, 7, None, 3, 5]


def test_bin_encode_decode_roundtrip(bdf):
    out = bdf.select(
        pl.col("b").bin.encode("hex").alias("hx"),
        pl.col("b").bin.encode("base64").alias("b64")).to_dict()
    assert out["hx"] == ["68656c6c6f", "776f726c640078", None, "616263",
                         "68656c6c6f"]
    assert out["b64"][0] == base64.b64encode(b"hello").decode()
    rt = bdf.select(pl.col("b").bin.encode("hex").cast(pl.Binary)
                    .bin.decode("hex").alias("r")).to_dict()
    assert rt["r"] == bdf.to_dict()["b"]
    # non-strict decode nulls invalid input
    bad = pl.DataFrame({"b": [b"zz-not-hex", b"61"]})
    r = bad.select(pl.col("b").bin.decode("hex", strict=False)
                   .alias("r")).to_dict()
    assert r["r"] == [None, b"a"]


def test_binary_string_casts():
    sdf = pl.DataFrame({"s": ["foo", "bär", None]})
    b = sdf.select(pl.col("s").cast(pl.Binary).alias("b")).to_dict()
    assert b["b"] == [b"foo", "bär".encode(), None]
    s = sdf.select(pl.col("s").cast(pl.Binary).cast(pl.String)
                   .alias("s")).to_dict()
    assert s["s"] == ["foo", "bär", None]
    # invalid utf8 -> null when strict=False
    bb = pl.DataFrame({"b": [b"\xff\xfe", b"ok"]})
    out = bb.select(pl.col("b").cast(pl.String, strict=False)
                    .alias("s")).to_dict()
    assert out["s"] == [None, "ok"]


def test_bin_reinterpret():
    rdf = pl.DataFrame({"b": [np.int32(7).tobytes(),
                              np.int32(-3).tobytes()]})
    r = rdf.select(pl.col("b").bin.reinterpret(pl.Int32).alias("i"))
    assert r.to_dict()["i"] == [7, -3]
    f = pl.DataFrame({"b": [np.float64(2.5).tobytes()]})
    assert f.select(pl.col("b").bin.reinterpret(pl.Float64)
                    .alias("f")).to_dict()["f"] == [2.5]


def test_binary_io_roundtrip(bdf, tmp_path):
    p = tmp_path / "b.parquet"
    bdf.write_parquet(str(p))
    assert pl.read_parquet(str(p)).to_dict()["b"] == bdf.to_dict()["b"]
    a = tmp_path / "b.arrow"
    bdf.write_ipc(str(a))
    assert pl.read_ipc(str(a)).to_dict()["b"] == bdf.to_dict()["b"]


def test_binary_selectors_and_guards(bdf):
    import polaroid_tpu.selectors as cs
    assert bdf.select(cs.binary()).columns == ["b"]
    assert bdf.select(cs.string()).columns == []
    with pytest.raises(pl.exceptions.InvalidOperationError):
        bdf.select(pl.col("b").str.to_uppercase())
    sr = pl.Series("b", [b"aa", b"bbb"])
    assert sr.bin.size().to_list() == [2, 3]
