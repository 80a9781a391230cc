"""Avro Object Container File reader/writer (host side, self-contained).

Capability analogue of `crates/polars-io/src/avro/{read.rs,write.rs}`:
the reference implements its own Avro codec (via `avro-schema`) rather
than delegating to an external library, and so do we — this module is a
from-scratch implementation of the OCF spec (magic, metadata map, sync
markers, zigzag-varint primitives, deflate codec) that decodes straight
into numpy columns for the host->HBM batch pipeline.

Supported schema surface mirrors the reference reader: records of
null/boolean/int/long/float/double/bytes/string/enum/fixed, nullable
unions (["null", T] in either order), logical types date / time-millis /
time-micros / timestamp-millis / timestamp-micros, and arrays of
primitives (decoded to list columns). Codecs: null and deflate (zlib);
snappy is gated on the optional `snappy` module like the reference
gates its codec features.
"""

from __future__ import annotations

import io as _io
import json
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..errors import ComputeError, SchemaError

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive binary codec (Avro spec 1.11, "Binary encoding")


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: bytearray, v: int) -> None:
    n = _zigzag_encode(int(v)) & ((1 << 64) - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


class _Reader:
    __slots__ = ("b", "pos")

    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0

    def long(self) -> int:
        shift = 0
        acc = 0
        b = self.b
        pos = self.pos
        while True:
            byte = b[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = pos
        return _zigzag_decode(acc)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def boolean(self) -> bool:
        v = self.b[self.pos]
        self.pos += 1
        return v != 0

    def float_(self) -> float:
        (v,) = struct.unpack_from("<f", self.b, self.pos)
        self.pos += 4
        return v

    def double(self) -> float:
        (v,) = struct.unpack_from("<d", self.b, self.pos)
        self.pos += 8
        return v

    def fixed(self, n: int) -> bytes:
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def map_(self) -> Dict[str, bytes]:
        out: Dict[str, bytes] = {}
        while True:
            n = self.long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                self.long()
            for _ in range(n):
                k = self.string()
                out[k] = self.bytes_()


# ---------------------------------------------------------------------------
# schema model


class _Field:
    __slots__ = ("name", "kind", "nullable", "null_first", "logical",
                 "symbols", "size", "items")

    def __init__(self, name, kind, nullable=False, null_first=True,
                 logical=None, symbols=None, size=0, items=None):
        self.name = name
        self.kind = kind          # avro primitive name / "enum" / "fixed" / "array"
        self.nullable = nullable  # union ["null", kind]
        self.null_first = null_first
        self.logical = logical    # date/time-millis/.../timestamp-micros
        self.symbols = symbols    # enum symbols
        self.size = size          # fixed size
        self.items = items        # _Field for array element


def _parse_type(name: str, t: Any) -> _Field:
    nullable = False
    null_first = True
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        if len(branches) != 1 or "null" not in t:
            raise SchemaError(f"unsupported avro union for {name!r}: {t}")
        nullable = True
        null_first = (t[0] == "null")
        t = branches[0]
    logical = None
    if isinstance(t, dict):
        logical = t.get("logicalType")
        kind = t["type"]
        if kind == "enum":
            return _Field(name, "enum", nullable, null_first,
                          symbols=list(t["symbols"]))
        if kind == "fixed":
            return _Field(name, "fixed", nullable, null_first,
                          size=int(t["size"]))
        if kind == "array":
            return _Field(name, "array", nullable, null_first,
                          items=_parse_type(name + "[]", t["items"]))
        t = kind
    if t not in ("null", "boolean", "int", "long", "float", "double",
                 "bytes", "string"):
        raise SchemaError(f"unsupported avro type for {name!r}: {t}")
    return _Field(name, t, nullable, null_first, logical=logical)


def _parse_schema(js: Any) -> List[_Field]:
    if isinstance(js, (str, bytes)):
        js = json.loads(js)
    if js.get("type") != "record":
        raise SchemaError("avro top-level schema must be a record")
    return [_parse_type(f["name"], f["type"]) for f in js["fields"]]


# ---------------------------------------------------------------------------
# read


def _decode_value(r: _Reader, f: _Field):
    k = f.kind
    if k == "boolean":
        return r.boolean()
    if k in ("int", "long"):
        return r.long()
    if k == "float":
        return r.float_()
    if k == "double":
        return r.double()
    if k == "string":
        return r.string()
    if k == "bytes":
        return r.bytes_()
    if k == "enum":
        return f.symbols[r.long()]
    if k == "fixed":
        return r.fixed(f.size)
    if k == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()  # skip block byte size
            for _ in range(n):
                out.append(_decode_cell(r, f.items))
    if k == "null":
        return None
    raise SchemaError(f"unsupported avro kind {k!r}")


def _decode_cell(r: _Reader, f: _Field):
    if f.nullable:
        branch = r.long()
        is_null = (branch == 0) if f.null_first else (branch == 1)
        if is_null:
            return None
    return _decode_value(r, f)


def _decompress(block: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":
        return zlib.decompress(block, -15)
    if codec == "snappy":
        try:
            import snappy  # type: ignore
        except ImportError as e:
            raise ComputeError(
                "avro file uses snappy codec; snappy module not available"
            ) from e
        return snappy.decompress(block[:-4])  # trailing crc32
    raise ComputeError(f"unsupported avro codec {codec!r}")


def read_avro_columns(source, columns: Optional[List[str]] = None,
                      n_rows: Optional[int] = None
                      ) -> Tuple[List[str], Dict[str, list], List[_Field]]:
    """Decode an OCF into per-column Python lists + parsed fields."""
    if hasattr(source, "read"):
        data = source.read()
    elif isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    else:
        with open(str(source), "rb") as fh:
            data = fh.read()
    if data[:4] != MAGIC:
        raise ComputeError("not an avro object container file")
    r = _Reader(data)
    r.pos = 4
    meta = r.map_()
    sync = r.fixed(16)
    codec = meta.get("avro.codec", b"null").decode()
    fields = _parse_schema(meta["avro.schema"])
    want = set(columns) if columns is not None else None
    cols: Dict[str, list] = {f.name: [] for f in fields
                             if want is None or f.name in want}
    total = 0
    while r.pos < len(r.b):
        count = r.long()
        size = r.long()
        block = _decompress(r.fixed(size), codec)
        if r.fixed(16) != sync:
            raise ComputeError("avro sync marker mismatch (corrupt file)")
        br = _Reader(block)
        for _ in range(count):
            for f in fields:
                v = _decode_cell(br, f)
                if want is None or f.name in want:
                    cols[f.name].append(v)
            total += 1
            if n_rows is not None and total >= n_rows:
                ordered = [f.name for f in fields
                           if want is None or f.name in want]
                return ordered, cols, fields
    ordered = [f.name for f in fields if want is None or f.name in want]
    return ordered, cols, fields


_LOGICAL_DT = {
    "date": ("Date", "i4", 1),
    "time-millis": ("Time", "i8", 1_000_000),      # ms -> ns
    "time-micros": ("Time", "i8", 1_000),          # us -> ns
    "timestamp-millis": ("Datetime:ms", "i8", 1),
    "timestamp-micros": ("Datetime:us", "i8", 1),
}


def read_avro(source, columns: Optional[List[str]] = None,
              n_rows: Optional[int] = None):
    """Read an Avro OCF into a DataFrame (reference:
    `polars-io/src/avro/read.rs`)."""
    import pyarrow as pa

    from .arrow_interop import table_from_arrow

    names, cols, fields = read_avro_columns(source, columns, n_rows)
    by_name = {f.name: f for f in fields}
    arrays = []
    pafields = []
    for nm in names:
        f = by_name[nm]
        vals = cols[nm]
        pat = _arrow_type(f)
        if f.logical in _LOGICAL_DT and f.kind in ("int", "long"):
            _, _, scale = _LOGICAL_DT[f.logical]
            vals = [None if v is None else v * scale for v in vals]
        arrays.append(pa.array(vals, type=pat))
        pafields.append(pa.field(nm, pat))
    at = pa.Table.from_arrays(arrays, schema=pa.schema(pafields))
    from ..api.frame import DataFrame
    return DataFrame._from_table(table_from_arrow(at))


def _arrow_type(f: _Field):
    import pyarrow as pa
    if f.logical == "date":
        return pa.date32()
    if f.logical == "time-millis":
        return pa.time64("ns")
    if f.logical == "time-micros":
        return pa.time64("ns")
    if f.logical == "timestamp-millis":
        return pa.timestamp("ms")
    if f.logical == "timestamp-micros":
        return pa.timestamp("us")
    prim = {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
            "float": pa.float32(), "double": pa.float64(),
            "string": pa.large_string(), "enum": pa.large_string(),
            "bytes": pa.large_binary(), "fixed": pa.large_binary(),
            "null": pa.bool_()}
    if f.kind == "array":
        return pa.large_list(_arrow_type(f.items))
    return prim[f.kind]


# ---------------------------------------------------------------------------
# write


def _avro_schema_for(df) -> Tuple[dict, List[_Field]]:
    from ..dtypes import Datetime, Duration
    fields_js = []
    for nm in df.columns:
        dt = repr(df._table.cols[nm].dtype)
        col = df._table.cols[nm]
        nullable = col.validity is not None
        if dt in ("Int8", "Int16", "Int32", "UInt8", "UInt16"):
            t: Any = "int"
        elif dt in ("Int64", "UInt32", "UInt64"):
            t = "long"
        elif dt == "Float32":
            t = "float"
        elif dt == "Float64":
            t = "double"
        elif dt == "Boolean":
            t = "boolean"
        elif dt in ("String", "Categorical"):
            t = "string"
        elif dt == "Binary":
            t = "bytes"
        elif dt == "Date":
            t = {"type": "int", "logicalType": "date"}
        elif dt == "Time":
            t = {"type": "long", "logicalType": "time-micros"}
        elif isinstance(col.dtype, Datetime):
            lt = "timestamp-millis" if col.dtype.time_unit == "ms" \
                else "timestamp-micros"
            t = {"type": "long", "logicalType": lt}
        elif isinstance(col.dtype, Duration):
            t = "long"
        else:
            raise SchemaError(f"cannot write dtype {dt} to avro")
        fields_js.append({"name": nm, "type": ["null", t] if nullable else t})
    js = {"type": "record", "name": "polaroid", "fields": fields_js}
    return js, _parse_schema(js)


def _encode_cell(buf: bytearray, f: _Field, v) -> None:
    if f.nullable:
        if v is None:
            _write_long(buf, 0 if f.null_first else 1)
            return
        _write_long(buf, 1 if f.null_first else 0)
    k = f.kind
    if k == "boolean":
        buf.append(1 if v else 0)
    elif k in ("int", "long"):
        _write_long(buf, int(v))
    elif k == "float":
        buf += struct.pack("<f", float(v))
    elif k == "double":
        buf += struct.pack("<d", float(v))
    elif k == "string":
        enc = str(v).encode("utf-8")
        _write_long(buf, len(enc))
        buf += enc
    elif k in ("bytes", "fixed"):
        bv = bytes(v)
        if k == "fixed":
            buf += bv
        else:
            _write_long(buf, len(bv))
            buf += bv
    else:
        raise SchemaError(f"cannot encode avro kind {f.kind!r}")


def write_avro(df, file, compression: str = "uncompressed",
               sync: bytes = b"polaroid-tpu-ocf") -> None:
    """Write a DataFrame as an Avro OCF (reference:
    `polars-io/src/avro/write.rs`; codecs null/deflate as there)."""
    from ..dtypes import Datetime
    codec = {"uncompressed": "null", "null": "null", "deflate": "deflate",
             "snappy": "snappy"}.get(compression)
    if codec is None:
        raise ComputeError(f"unsupported avro compression {compression!r}")
    js, fields = _avro_schema_for(df)
    rows = df.rows()  # list of tuples, nulls as None
    by_idx = list(fields)

    # scale logical types back to avro's units
    col_scale = []
    for nm in df.columns:
        dt = df._table.cols[nm].dtype
        if repr(dt) == "Time":
            col_scale.append(1 / 1000)  # ns -> us
        else:
            col_scale.append(None)

    header = bytearray()
    header += MAGIC
    meta = {"avro.schema": json.dumps(js).encode(),
            "avro.codec": codec.encode()}
    _write_long(header, len(meta))
    for k, v in meta.items():
        ke = k.encode()
        _write_long(header, len(ke))
        header += ke
        _write_long(header, len(v))
        header += v
    _write_long(header, 0)
    assert len(sync) == 16
    header += sync

    body = bytearray()
    for row in rows:
        for f, scale, v in zip(by_idx, col_scale, row):
            if scale is not None and v is not None:
                import datetime as _dt
                if isinstance(v, _dt.time):
                    v = ((v.hour * 3600 + v.minute * 60 + v.second)
                         * 1_000_000 + v.microsecond)
                else:
                    v = int(v * scale)
            if isinstance(v, float) and f.kind in ("int", "long"):
                v = int(v)
            import datetime as _dt
            if isinstance(v, _dt.datetime):
                epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                us = int((v - epoch).total_seconds() * 1_000_000)
                v = us // 1000 if f.logical == "timestamp-millis" else us
            elif isinstance(v, _dt.date):
                v = (v - _dt.date(1970, 1, 1)).days
            _encode_cell(body, f, v)

    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    elif codec == "snappy":
        try:
            import snappy  # type: ignore
        except ImportError as e:
            raise ComputeError("snappy module not available") from e
        comp = snappy.compress(payload)
        payload = comp + struct.pack(">I", zlib.crc32(bytes(body)))

    out = bytearray(header)
    _write_long(out, len(rows))
    _write_long(out, len(payload))
    out += payload
    out += sync
    if hasattr(file, "write"):
        file.write(bytes(out))
    else:
        with open(str(file), "wb") as fh:
            fh.write(bytes(out))
