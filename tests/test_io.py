"""IO: parquet/csv/ipc/ndjson round trips, multi-file scans, streaming."""

import datetime as dt

import numpy as np
import pytest

import polaroid_tpu as pl


@pytest.fixture
def df0():
    return pl.DataFrame({
        "i": [1, 2, 3, None],
        "f": [1.5, None, 3.5, 4.5],
        "s": ["a", "b", None, "d"],
        "b": [True, False, True, None],
        "d": [dt.date(2024, 1, 1), None, dt.date(2024, 3, 1),
              dt.date(2024, 4, 1)],
    })


def test_parquet_roundtrip(tmp_path, df0):
    p = tmp_path / "x.parquet"
    df0.write_parquet(p)
    back = pl.read_parquet(p)
    assert back.to_dict() == df0.to_dict()
    assert [repr(d) for d in back.dtypes] == [repr(d) for d in df0.dtypes]


def test_ipc_roundtrip(tmp_path, df0):
    p = tmp_path / "x.arrow"
    df0.write_ipc(p)
    back = pl.read_ipc(p)
    assert back.to_dict() == df0.to_dict()


def test_csv_roundtrip(tmp_path):
    df = pl.DataFrame({"a": [1, 2], "s": ["x", "y"]})
    p = tmp_path / "x.csv"
    df.write_csv(p)
    back = pl.read_csv(p)
    assert back.to_dict() == df.to_dict()
    txt = df.write_csv()
    assert txt.splitlines()[0].replace('"', "") == "a,s"


def test_ndjson_roundtrip(tmp_path):
    df = pl.DataFrame({"a": [1, 2], "s": ["x", None]})
    p = tmp_path / "x.ndjson"
    df.write_ndjson(p)
    back = pl.read_ndjson(p)
    assert back.to_dict() == df.to_dict()


def test_read_parquet_columns_nrows(tmp_path, df0):
    p = tmp_path / "x.parquet"
    df0.write_parquet(p)
    back = pl.read_parquet(p, columns=["i", "s"], n_rows=2)
    assert back.columns == ["i", "s"]
    assert back.height == 2


def test_multifile_glob_scan(tmp_path):
    for i in range(4):
        pl.DataFrame({"part": [i] * 10, "v": list(range(10))}) \
            .write_parquet(tmp_path / f"f{i}.parquet")
    out = pl.scan_parquet(str(tmp_path / "*.parquet")).collect()
    assert out.height == 40
    agg = (pl.scan_parquet(str(tmp_path / "*.parquet"))
           .group_by("part").agg(pl.col("v").sum().alias("s"))
           .sort("part").collect())
    assert agg.to_dict() == {"part": [0, 1, 2, 3], "s": [45] * 4}


def test_streaming_scan_multifile(tmp_path):
    for i in range(3):
        pl.DataFrame({"k": [i % 2] * 20, "v": list(range(20))}) \
            .write_parquet(tmp_path / f"s{i}.parquet")
    lf = (pl.scan_parquet(str(tmp_path / "s*.parquet"))
          .group_by("k").agg(pl.col("v").sum().alias("s"), pl.len().alias("n")))
    a = lf.collect().sort("k").to_dict()
    b = lf.collect(engine="streaming").sort("k").to_dict()
    assert a == b


def test_from_pandas_and_arrow():
    import pandas as pd
    import pyarrow as pa
    pdf = pd.DataFrame({"a": [1, 2], "s": ["x", "y"]})
    assert pl.from_pandas(pdf).to_dict() == {"a": [1, 2], "s": ["x", "y"]}
    at = pa.table({"a": [1, 2], "s": ["x", "y"]})
    assert pl.from_arrow(at).to_dict() == {"a": [1, 2], "s": ["x", "y"]}


def test_to_arrow_to_pandas(df0):
    at = df0.to_arrow()
    assert at.num_rows == 4
    pdf = df0.to_pandas()
    assert list(pdf.columns) == df0.columns


def test_csv_string_io():
    csv = "a,b\n1,x\n2,y\n"
    df = pl.read_csv(csv)
    assert df.to_dict() == {"a": [1, 2], "b": ["x", "y"]}


def test_sink_csv(tmp_path):
    lf = pl.LazyFrame({"a": [3, 1, 2]})
    out = tmp_path / "o.csv"
    lf.sort("a").sink_csv(str(out))
    assert pl.read_csv(str(out)).to_dict() == {"a": [1, 2, 3]}


def test_remote_filesystem_parquet_memory():
    # fsspec memory:// exercises the same resolution path as s3://
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df.write_parquet("memory://bucket/t.parquet")
    back = pl.read_parquet("memory://bucket/t.parquet")
    assert back.to_dict() == df.to_dict()
    lz = pl.scan_parquet("memory://bucket/t.parquet") \
        .filter(pl.col("a") > 1).collect()
    assert lz.to_dict()["a"] == [2, 3]
    df.write_parquet("memory://bucket/t2.parquet")
    assert pl.read_parquet("memory://bucket/*.parquet").height == 6


def test_remote_filesystem_parquet_file_uri(tmp_path):
    df = pl.DataFrame({"a": [1, 2]})
    df.write_parquet(f"file://{tmp_path}/x.parquet")
    assert pl.read_parquet(f"file://{tmp_path}/x.parquet").to_dict() == \
        df.to_dict()
    st = pl.scan_parquet(f"file://{tmp_path}/x.parquet") \
        .collect(engine="streaming")
    assert st.height == 2


def test_partitioned_parquet_roundtrip(tmp_path):
    d = str(tmp_path / "part")
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 3]})
    df.write_parquet(d, partition_by="g")
    import os
    assert sorted(os.listdir(d)) == ["g=a", "g=b"]
    back = pl.read_parquet(d)
    assert back.sort("v").to_dict()["v"] == [1, 2, 3]
    sc = pl.scan_parquet(d).filter(pl.col("g") == "b").collect()
    assert sc.to_dict()["v"] == [3]


def test_io_schema_metadata_batched(tmp_path):
    import io as _io
    import polaroid_tpu as pl
    df = pl.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    p = str(tmp_path / "t.parquet")
    df.write_parquet(p)
    assert repr(pl.read_parquet_schema(p)["a"]) == "Int64"
    assert pl.read_parquet_metadata(p)["num_rows"] == 3
    i = str(tmp_path / "t.ipc")
    df.write_ipc(i)
    assert repr(pl.read_ipc_schema(i)["s"]) == "String"
    buf = _io.BytesIO()
    df.write_ipc_stream(buf)
    assert pl.read_ipc_stream(buf.getvalue()).to_dict() == df.to_dict()
    c = str(tmp_path / "t.csv")
    df.write_csv(c)
    r = pl.read_csv_batched(c, batch_size=2)
    assert sum(b.height for b in r.next_batches(10)) == 3
    assert r.next_batches(1) is None


def test_io_delta_dataset_source(tmp_path):
    import pyarrow.dataset as pads
    import polaroid_tpu as pl
    df = pl.DataFrame({"a": [1, 2, 3]})
    lake = str(tmp_path / "lake")
    df.write_delta(lake, mode="overwrite")
    assert pl.read_delta(lake).to_dict()["a"] == [1, 2, 3]
    assert pl.scan_delta(lake).collect().height == 3
    p = str(tmp_path / "t.parquet")
    df.write_parquet(p)
    assert pl.scan_pyarrow_dataset(pads.dataset(p)).collect().height == 3

    def src(wc, pred, nr, bs):
        yield pl.DataFrame({"a": [1, 2]})
        yield pl.DataFrame({"a": [3]})
    assert pl.register_io_source(src, schema={"a": pl.Int64}) \
        .collect().to_dict()["a"] == [1, 2, 3]


def test_io_gated_formats(tmp_path):
    import pytest as _pytest
    import polaroid_tpu as pl
    with _pytest.raises(ModuleNotFoundError):
        pl.read_excel("x")
    with _pytest.raises(ModuleNotFoundError):
        pl.read_database("q", None)


@pytest.mark.parametrize("compression", ["uncompressed", "deflate"])
def test_avro_roundtrip(tmp_path, df0, compression):
    p = tmp_path / "t.avro"
    df0.write_avro(p, compression=compression)
    back = pl.read_avro(p)
    assert back.to_dict() == df0.to_dict()


def test_avro_projection_nrows_datetime(tmp_path):
    df = pl.DataFrame({
        "t": [dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 6, 1, 7), None],
        "x": [1, 2, 3],
        "s": ["aa", "bb", "cc"],
    })
    p = tmp_path / "t.avro"
    df.write_avro(p, compression="deflate")
    back = pl.read_avro(p, columns=["t", "x"], n_rows=2)
    assert back.columns == ["t", "x"]
    assert back.to_dict() == {
        "t": [dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 6, 1, 7)],
        "x": [1, 2]}


def test_avro_spec_conformance_handbuilt():
    # A block hand-encoded per the Avro 1.11 spec (zigzag varints,
    # little-endian doubles, ["null",T] unions) — guards the decoder
    # against symmetric reader/writer bugs that a round trip would hide.
    import json as _json
    import struct as _struct
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "double"]},
        {"name": "c", "type": "string"},
    ]}
    body = bytearray()
    # row 1: a=-3 -> zigzag 5; b=null -> branch 0; c="hi"
    body += bytes([5, 0, 4]) + b"hi"
    # row 2: a=1 -> zigzag 2; b=2.5 branch 1; c=""
    body += bytes([2, 2]) + _struct.pack("<d", 2.5) + bytes([0])
    hdr = bytearray(b"Obj\x01")
    meta = _json.dumps(schema).encode()

    def wl(buf, v):
        v = (v << 1) ^ (v >> 63)
        while True:
            b = v & 0x7F
            v >>= 7
            buf.append(b | 0x80 if v else b)
            if not v:
                return
    wl(hdr, 1)
    wl(hdr, len(b"avro.schema"))
    hdr += b"avro.schema"
    wl(hdr, len(meta))
    hdr += meta
    wl(hdr, 0)
    sync = b"0123456789abcdef"
    hdr += sync
    wl(hdr, 2)          # rows in block
    wl(hdr, len(body))  # block byte size
    hdr += body + sync
    back = pl.read_avro(bytes(hdr))
    assert back.to_dict() == {"a": [-3, 1], "b": [None, 2.5],
                              "c": ["hi", ""]}


def test_streaming_csv_scan(tmp_path, monkeypatch):
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 400)
    n = 3000
    rng = np.random.default_rng(0)
    df = pl.DataFrame({"a": rng.integers(0, 50, n).tolist(),
                       "b": rng.normal(0, 1, n).round(4).tolist(),
                       "s": rng.choice(["x", "y", "z"], n).tolist()})
    p = str(tmp_path / "s.csv")
    df.write_csv(p)
    lf = pl.scan_csv(p).filter(pl.col("a") > 25).group_by("s").agg(
        pl.len().alias("n"), pl.col("b").sum().alias("t")).sort("s")
    a = lf.collect(engine="streaming").to_dict()
    b = lf.collect(engine="in-memory").to_dict()
    assert a["n"] == b["n"]
    assert np.allclose(a["t"], b["t"])
    assert pl.scan_csv(p).head(777).collect(engine="streaming").height == 777


def test_parquet_csv_filelike_roundtrip():
    import io
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", None, "z"]})
    buf = io.BytesIO()
    df.write_parquet(buf)
    buf.seek(0)
    assert pl.read_parquet(buf).to_dict() == df.to_dict()
    assert pl.read_parquet(buf.getvalue()).to_dict() == df.to_dict()
    cbuf = io.BytesIO()
    df.write_csv(cbuf)
    assert b"a,b" in cbuf.getvalue()
    sbuf = io.StringIO()
    df.write_csv(sbuf)
    assert "a,b" in sbuf.getvalue()
