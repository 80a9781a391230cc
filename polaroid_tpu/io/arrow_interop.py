"""Arrow <-> device-table conversion (host boundary).

The reference IS Arrow-native (`polars-arrow`); for us Arrow is only the
host interchange format: pyarrow (C++) handles variable-length layouts and
file decoding, and this module turns record batches into fixed-capacity
device columns (strings dictionary-encoded on host, see `strings.py`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import jax
import jax.numpy as jnp

from ..batch import Column, Table, storage_numpy_dtype
from ..config import capacity_for
from ..dtypes import (Boolean, DataType, Date, Datetime, Duration, Float32,
                      Float64, Int8, Int16, Int32, Int64, String, Time,
                      UInt8, UInt16, UInt32, UInt64)
from ..errors import SchemaError
from ..strings import NULL_CODE, StringDict

_PA_TO_DT = {
    pa.int8(): Int8, pa.int16(): Int16, pa.int32(): Int32, pa.int64(): Int64,
    pa.uint8(): UInt8, pa.uint16(): UInt16, pa.uint32(): UInt32,
    pa.uint64(): UInt64, pa.float32(): Float32, pa.float64(): Float64,
    pa.bool_(): Boolean, pa.date32(): Date,
}


def dtype_from_arrow(t: pa.DataType) -> DataType:
    if t in _PA_TO_DT:
        return _PA_TO_DT[t]
    if pa.types.is_string(t) or pa.types.is_large_string(t) or \
            pa.types.is_string_view(t):
        return String
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or \
            pa.types.is_fixed_size_binary(t) or \
            getattr(pa.types, "is_binary_view", lambda _: False)(t):
        from ..dtypes import Binary
        return Binary()
    if pa.types.is_dictionary(t):
        from ..dtypes import Categorical as _Cat
        return _Cat()
    if pa.types.is_timestamp(t):
        unit = t.unit if t.unit in ("ms", "us", "ns") else "us"
        return Datetime(unit, t.tz)
    if pa.types.is_duration(t):
        unit = t.unit if t.unit in ("ms", "us", "ns") else "us"
        return Duration(unit)
    if pa.types.is_date64(t):
        return Datetime("ms")
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return Time
    if pa.types.is_decimal(t):
        return Float64
    if pa.types.is_null(t):
        return Boolean
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        from ..dtypes import List as ListT
        return ListT(dtype_from_arrow(t.value_type))
    if pa.types.is_struct(t):
        from ..dtypes import Struct as StructT
        return StructT([(t.field(i).name, dtype_from_arrow(t.field(i).type))
                        for i in range(t.num_fields)])
    raise SchemaError(f"unsupported arrow type: {t}")


def dtype_to_arrow(dt: DataType) -> pa.DataType:
    name = repr(dt)
    simple = {"Int8": pa.int8(), "Int16": pa.int16(), "Int32": pa.int32(),
              "Int64": pa.int64(), "UInt8": pa.uint8(), "UInt16": pa.uint16(),
              "UInt32": pa.uint32(), "UInt64": pa.uint64(),
              "Float32": pa.float32(), "Float64": pa.float64(),
              "Boolean": pa.bool_(), "String": pa.large_string(),
              "Categorical": pa.large_string(),
              "Binary": pa.large_binary(), "Date": pa.date32(),
              "Time": pa.time64("ns")}
    if name in simple:
        return simple[name]
    if isinstance(dt, Datetime):
        return pa.timestamp(dt.time_unit, dt.time_zone)
    if isinstance(dt, Duration):
        return pa.duration(dt.time_unit)
    from ..dtypes import List as ListT, Struct as StructT
    if isinstance(dt, ListT):
        return pa.large_list(dtype_to_arrow(dt.inner))
    if isinstance(dt, StructT):
        return pa.struct([pa.field(n, dtype_to_arrow(d))
                          for n, d in dt.fields])
    raise SchemaError(f"cannot convert {dt!r} to arrow")


def _dput(host) -> "jax.Array":
    """Async host->device upload of an OWNED contiguous buffer.

    jax.device_put enqueues and returns (~23ms for 32MB through the
    remote tunnel) while jnp.asarray of a borrowed arrow view can
    transfer synchronously; reads must never block on the wire
    (reference: decode/upload overlap in polars-io pl_async)."""
    a = np.ascontiguousarray(host)
    if not a.flags.owndata:
        a = a.copy()
    return jax.device_put(a)


def _plain_numeric_fast(arr, dt: DataType, capacity: int) -> Column:
    """One-copy host materialization for null-free int/float columns:
    per-chunk zero-copy arrow views written straight into the padded
    staging buffer (skips combine_chunks + to_numpy + pad copies — the
    hot path for large scans; reference decodes straight into its own
    buffers, `polars-parquet/src/arrow/read/`)."""
    n = len(arr)
    if capacity == n and n:
        # zero host copies: arrow's C++ combine (if chunked) then a
        # zero-copy numpy view; jnp.asarray is the only (async) copy
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks() if arr.num_chunks != 1 \
                else arr.chunk(0)
        return Column(dt, _dput(arr.to_numpy(zero_copy_only=True)),
                      None, None)
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    stor = storage_numpy_dtype(dt)
    out = np.empty(capacity, dtype=stor)
    pos = 0
    for ch in chunks:
        if len(ch):
            out[pos:pos + len(ch)] = ch.to_numpy(zero_copy_only=True)
            pos += len(ch)
    out[pos:] = 0
    return Column(dt, _dput(out), None, None)


def column_from_arrow(arr: pa.ChunkedArray | pa.Array, capacity: int,
                      as_string: bool = False) -> Column:
    t = arr.type
    if arr.null_count == 0 and t in _PA_TO_DT and \
            (pa.types.is_floating(t) or pa.types.is_integer(t)):
        return _plain_numeric_fast(arr, _PA_TO_DT[t], capacity)
    if isinstance(arr, pa.ChunkedArray) and \
            not pa.types.is_dictionary(arr.type):
        # dictionary columns stay chunked: encode_dictionary merges
        # chunks by dictionary identity (combine_chunks here would
        # re-unify 64 per-batch dictionaries, ~3.5 s at 1M unique)
        arr = arr.combine_chunks()
    if as_string and pa.types.is_dictionary(arr.type):
        # dictionary encoding FORCED by the parquet reader (read_
        # dictionary) on a plain string/binary column: the logical
        # dtype stays String/Binary — only the transport is dict-coded
        from ..dtypes import Binary as _Bin, String as _Str
        vt = arr.type.value_type
        dt = _Bin() if (pa.types.is_binary(vt) or pa.types.is_large_binary(vt)
                        or pa.types.is_fixed_size_binary(vt)) else _Str
    else:
        dt = dtype_from_arrow(arr.type)
    n = len(arr)
    mask = None
    if arr.null_count:
        mask = ~np.asarray(arr.is_null())
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        return _list_column_from_arrow(arr, dt, n, mask, capacity)
    if pa.types.is_struct(arr.type):
        fields = {}
        for i in range(arr.type.num_fields):
            fname = arr.type.field(i).name
            fields[fname] = column_from_arrow(arr.field(i), capacity)
        validity = None
        if mask is not None:
            v = np.zeros(capacity, bool)
            v[:n] = mask
            validity = _dput(v)
        return Column(dt, None, validity, fields=fields)
    if dt.is_string:
        if pa.types.is_fixed_size_binary(arr.type):
            arr = arr.cast(pa.large_binary())
        if pa.types.is_dictionary(arr.type):
            # parquet dictionary pages come back pre-encoded: sort only
            # the O(unique) dictionary, remap codes — no row re-hash
            codes, sdict = StringDict.encode_dictionary(arr)
        else:
            # no host object round-trip: C++ dict-encode + dict sort
            codes, sdict = StringDict.encode_arrow(arr)
        out = np.full(capacity, NULL_CODE, np.int32)
        out[:n] = codes
        validity = None
        if mask is not None:
            v = np.zeros(capacity, bool)
            v[:n] = mask
            validity = _dput(v)
        return Column(dt, _dput(out), validity, sdict)
    stor = storage_numpy_dtype(dt)
    if pa.types.is_timestamp(arr.type) or pa.types.is_duration(arr.type) or \
            pa.types.is_date32(arr.type) or pa.types.is_time64(arr.type) or \
            pa.types.is_time32(arr.type) or pa.types.is_date64(arr.type):
        vals = arr.cast(_physical_arrow(arr.type)).to_numpy(zero_copy_only=False)
    elif pa.types.is_decimal(arr.type):
        vals = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
    elif pa.types.is_null(arr.type):
        vals = np.zeros(n, bool)
        mask = np.zeros(n, bool)
    else:
        vals = arr.to_numpy(zero_copy_only=False)
    vals = np.asarray(vals)
    if vals.dtype == object or (mask is not None and vals.dtype.kind == "f"
                                and not np.issubdtype(stor, np.floating)):
        filled = np.zeros(n, dtype=stor)
        if mask is not None:
            filled[mask] = np.asarray(vals[mask]).astype(stor)
        else:
            filled = vals.astype(stor)
        vals = filled
    elif mask is not None and vals.dtype.kind == "f" and stor.kind != "f":
        vals = np.where(mask, vals, 0).astype(stor)
    elif mask is not None and vals.dtype.kind == "f" and np.isnan(vals).any() \
            and stor.kind == "f":
        # arrow nulls came through as NaN; zero them to keep NaN≠null
        vals = np.where(mask, vals, 0.0).astype(stor)
    out = np.zeros(capacity, dtype=stor)
    out[:n] = np.asarray(vals).astype(stor, copy=False)
    validity = None
    if mask is not None:
        v = np.zeros(capacity, bool)
        v[:n] = mask
        validity = _dput(v)
    return Column(dt, _dput(out), validity, None)


def _list_column_from_arrow(arr, dt, n: int, mask, capacity: int) -> Column:
    """Arrow List -> padded 2-D device column: gather the flat child by
    (row base + lane) index, masked past each row's length."""
    from ..batch import width_for
    if pa.types.is_list(arr.type.value_type) or \
            pa.types.is_large_list(arr.type.value_type) or \
            pa.types.is_struct(arr.type.value_type):
        # nested inner types: decode through host objects (correctness
        # first; columnar fast path is a future optimization)
        from ..batch import _list_column_from_host
        return _list_column_from_host(arr.to_pylist(), dt, capacity)
    offs = np.asarray(arr.offsets)
    child = arr.values
    lens = np.diff(offs).astype(np.int32)
    if mask is not None:
        lens = np.where(mask, lens, 0).astype(np.int32)
    W = width_for(int(lens.max()) if n else 1)
    ccap = max(len(child), 1)
    ccol = column_from_arrow(child, ccap)
    base = offs[:-1].astype(np.int64)
    idx = np.minimum(base[:, None] + np.arange(W)[None, :], ccap - 1)
    in_len = np.arange(W)[None, :] < lens[:, None]
    cdata = np.asarray(ccol.data)
    g = cdata[idx]  # (n, W)
    out = np.zeros((capacity, W), dtype=cdata.dtype)
    out[:n] = np.where(in_len, g, 0)
    lens_full = np.zeros(capacity, dtype=np.int32)
    lens_full[:n] = lens
    elem_valid = None
    if ccol.validity is not None:
        cv = np.asarray(ccol.validity)[idx]
        ev = np.zeros((capacity, W), dtype=bool)
        ev[:n] = cv & in_len
        elem_valid = _dput(ev)
    validity = None
    if mask is not None:
        v = np.zeros(capacity, bool)
        v[:n] = mask
        validity = _dput(v)
    return Column(dt, _dput(out), validity, ccol.sdict,
                  lengths=_dput(lens_full), elem_valid=elem_valid)


def _physical_arrow(t: pa.DataType) -> pa.DataType:
    if pa.types.is_date32(t):
        return pa.int32()
    return pa.int64()


def table_from_arrow(at: pa.Table, capacity: Optional[int] = None,
                     string_cols: frozenset = frozenset()) -> Table:
    n = at.num_rows
    cap = capacity or capacity_for(n)
    names = list(at.column_names)
    if n >= (1 << 20) and len(names) > 1:
        # big scans: convert columns in parallel — pyarrow decode/combine
        # releases the GIL and device uploads are async enqueues
        import concurrent.futures as _f
        with _f.ThreadPoolExecutor(max_workers=min(len(names), 8)) as ex:
            conv = list(ex.map(lambda nm: column_from_arrow(
                at.column(nm), cap, nm in string_cols), names))
        cols = dict(zip(names, conv))
    else:
        cols = {nm: column_from_arrow(at.column(nm), cap,
                                      nm in string_cols) for nm in names}
    return Table(names, cols, cap, n, None)


def table_to_arrow(t: Table) -> pa.Table:
    d = {}
    n = t.count_rows()
    vmask = np.asarray(t.valid) if t.valid is not None else None
    fields = []
    arrays = []
    for name in t.names:
        c = t.cols[name]
        patype = dtype_to_arrow(c.dtype)
        if c.dtype.is_nested:
            obj = c.to_numpy(t.capacity if vmask is not None else n, vmask)
            arr = pa.array(list(obj), type=patype)
            fields.append(pa.field(name, patype))
            arrays.append(arr)
            continue
        data = np.asarray(c.data)
        validity = np.asarray(c.validity) if c.validity is not None else None
        if vmask is not None:
            data = data[vmask]
            if validity is not None:
                validity = validity[vmask]
        else:
            data = data[:n]
            if validity is not None:
                validity = validity[:n]
        if c.dtype.is_string:
            obj = (c.sdict.decode(np.where(validity, data, NULL_CODE))
                   if validity is not None else
                   (c.sdict.decode(data) if c.sdict else data))
            arr = pa.array(obj, type=patype)
        else:
            m = None if validity is None else ~validity
            if repr(c.dtype) == "Date":
                arr = pa.array(data.astype(np.int32), pa.int32(), mask=m).cast(patype)
            elif isinstance(c.dtype, (Datetime, Duration)) or repr(c.dtype) == "Time":
                arr = pa.array(data.astype(np.int64), pa.int64(), mask=m).cast(patype)
            else:
                arr = pa.array(data, type=patype, mask=m)
        fields.append(pa.field(name, patype))
        arrays.append(arr)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
