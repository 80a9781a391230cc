"""Fixed-capacity columnar batches on device.

TPU-native replacement for the reference's Arrow chunked arrays
(`crates/polars-arrow/src/array/`, `crates/polars-core/src/chunked_array/`):
a `Table` is a set of same-capacity 1-D device arrays (one per column) plus
validity masks, with the *capacity* static (a power-of-two bucket, see
`config.capacity_for`) so every kernel compiles once per bucket, and the
*live row set* dynamic — either a static prefix `[0, nrows)` ("compact"
state) or an arbitrary boolean `valid` mask ("masked" state, e.g. after a
filter, avoiding host syncs and device compaction).

Strings are dictionary codes (`strings.py`); temporal types are integer
epochs. Everything the device touches is a flat numeric array — there is
no dyn-dispatch Series object on the hot path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from .config import CONFIG, capacity_for
from .dtypes import (
    Boolean, DataType, Date, Datetime, Duration, Float64, Int64, Null,
    String, dtype_from_numpy, physical_numpy_dtype,
)
from .errors import ColumnNotFoundError, DuplicateError, ShapeError
from .strings import NULL_CODE, StringDict

__all__ = ["Column", "Table", "storage_numpy_dtype"]


def storage_numpy_dtype(dt: DataType) -> np.dtype:
    """Physical storage dtype, downgrading f64->f32 on accelerators unless
    PT_STRICT_F64 (TPUs emulate f64 in software; f32 storage + compensated
    accumulation is the TPU-idiomatic choice)."""
    phys = physical_numpy_dtype(dt)
    if phys == np.float64 and not CONFIG.strict_f64:
        if jax.default_backend() not in ("cpu",):
            return np.dtype(np.float32)
    return phys


class Column:
    """One column: device data + optional validity + optional string dict.

    `data` has shape (capacity,); rows outside the table's live set hold
    zeros/-1 and must be ignored by all kernels.
    `validity` is True where the value is non-null (None => all non-null).

    Nested layouts (TPU-native, see `dtypes.List`/`dtypes.Struct`):
      * List: `data` is (capacity, width) of the inner physical dtype,
        `lengths` is (capacity,) int32 per-row list length, `elem_valid`
        an optional (capacity, width) inner-null mask. `sdict` is the
        inner dictionary when the inner dtype is a string.
      * Struct: `fields` is an ordered {name: Column} of child columns
        (struct-of-arrays); `data` is None.
    """

    __slots__ = ("dtype", "data", "validity", "sdict", "stats", "lengths",
                 "elem_valid", "fields")

    def __init__(self, dtype: DataType, data: Optional[jax.Array],
                 validity: Optional[jax.Array] = None,
                 sdict: Optional[StringDict] = None,
                 stats: Optional[dict] = None,
                 lengths: Optional[jax.Array] = None,
                 elem_valid: Optional[jax.Array] = None,
                 fields: Optional[Dict[str, "Column"]] = None):
        self.dtype = dtype
        self.data = data
        self.validity = validity
        self.sdict = sdict
        # host-cached column statistics ({"min","max"}): unlock the dense
        # O(n) group-by for integer keys (computed lazily, one sync)
        self.stats = stats
        self.lengths = lengths
        self.elem_valid = elem_valid
        self.fields = fields

    @property
    def capacity(self) -> int:
        if self.data is not None:
            return self.data.shape[0]
        return next(iter(self.fields.values())).capacity

    def with_data(self, data: jax.Array,
                  validity: Optional[jax.Array] = "__keep__") -> "Column":
        v = self.validity if isinstance(validity, str) else validity
        return Column(self.dtype, data, v, self.sdict,
                      lengths=self.lengths, elem_valid=self.elem_valid,
                      fields=self.fields)

    def validity_or_true(self) -> jax.Array:
        if self.validity is None:
            return jnp.ones(self.capacity, dtype=jnp.bool_)
        return self.validity

    def take(self, perm: jax.Array) -> "Column":
        """Gather rows by index (axis 0); the one structural op every
        kernel uses — handles flat, list (2-D + lengths), struct
        (recursive) and nested list-of-struct/list-of-list (lengths +
        fields together) layouts uniformly."""
        return Column(
            self.dtype,
            self.data[perm] if self.data is not None else None,
            self.validity[perm] if self.validity is not None else None,
            self.sdict,
            lengths=self.lengths[perm] if self.lengths is not None else None,
            elem_valid=self.elem_valid[perm]
            if self.elem_valid is not None else None,
            fields={k: f.take(perm) for k, f in self.fields.items()}
            if self.fields is not None else None)

    # ------------------------------------------------------------------
    @staticmethod
    def from_numpy(values, dtype: Optional[DataType] = None,
                   capacity: Optional[int] = None) -> "Column":
        """Build a device column from host values, padding to capacity."""
        if isinstance(dtype, type) and issubclass(dtype, DataType):
            dtype = dtype()
        nested = _detect_nested(values, dtype)
        if nested == "list":
            return _list_column_from_host(values, dtype, capacity)
        if nested == "struct":
            return _struct_column_from_host(values, dtype, capacity)
        values, mask, dt, sdict = _coerce_host_values(values, dtype)
        n = len(values)
        cap = capacity_for(n) if capacity is None else capacity
        if cap < n:
            raise ShapeError(f"capacity {cap} < row count {n}")
        stor = storage_numpy_dtype(dt)
        pad_val = NULL_CODE if dt.is_string else stor.type(0)
        out = np.full(cap, pad_val, dtype=stor)
        out[:n] = values.astype(stor, copy=False)
        data = jnp.asarray(out)
        validity = None
        if mask is not None and not mask.all():
            m = np.zeros(cap, dtype=bool)
            m[:n] = mask
            validity = jnp.asarray(m)
        return Column(dt, data, validity, sdict)

    def to_numpy(self, nrows: int, valid_mask: Optional[np.ndarray] = None):
        """Host copy of the live rows (object array when nulls/strings)."""
        if self.fields is not None and self.lengths is not None:
            return _nested_list_to_numpy(self, nrows, valid_mask)
        if self.fields is not None:
            # struct -> object array of dicts
            parts = {k: f.to_numpy(nrows, valid_mask)
                     for k, f in self.fields.items()}
            m = len(next(iter(parts.values()))) if parts else 0
            vmask = np.ones(m, dtype=bool)
            if self.validity is not None:
                vm = np.asarray(self.validity)[:nrows]
                vmask = vm[valid_mask[:nrows]] if valid_mask is not None else vm
            out = np.empty(m, dtype=object)

            def _py(x):
                return x.item() if isinstance(x, np.generic) else x

            for i in range(m):
                out[i] = ({k: _py(parts[k][i]) for k in parts}
                          if vmask[i] else None)
            return out
        if self.lengths is not None:
            return _list_to_numpy_impl(self, nrows, valid_mask)
        data = np.asarray(self.data)[:nrows]
        vmask = None
        if self.validity is not None:
            vmask = np.asarray(self.validity)[:nrows]
        if valid_mask is not None:
            data = data[valid_mask[:nrows]]
            if vmask is not None:
                vmask = vmask[valid_mask[:nrows]]
        if self.dtype.is_string:
            codes = data.copy()
            if vmask is not None:
                codes[~vmask] = NULL_CODE
            return self.sdict.decode(codes) if self.sdict else codes
        if repr(self.dtype) == "Date":
            out = data.astype("datetime64[D]").astype(object)
        elif isinstance(self.dtype, Datetime):
            out = data.astype(f"datetime64[{self.dtype.time_unit}]")
            if self.dtype.time_zone:
                out = _aware_objects(out, self.dtype.time_zone)
        elif isinstance(self.dtype, Duration):
            out = data.astype(f"timedelta64[{self.dtype.time_unit}]")
        else:
            out = data
        if vmask is not None and not vmask.all():
            out = np.asarray(out, dtype=object)
            out[~vmask] = None
        return out


def _empty_column(dt: DataType, cap: int) -> Column:
    from .dtypes import List as ListT, Struct as StructT
    if isinstance(dt, ListT) and isinstance(dt.inner, StructT):
        fields = {nm: _empty_column(ListT(fd), cap)
                  for nm, fd in dt.inner.fields}
        return Column(dt, None, None,
                      lengths=jnp.zeros(cap, dtype=jnp.int32),
                      fields=fields)
    if isinstance(dt, ListT) and isinstance(dt.inner, ListT):
        # any depth: build the child list column flat, lift it to width 1
        child = _reshape_leading(_empty_column(dt.inner, cap), cap, 1)
        return Column(dt, None, None,
                      lengths=jnp.zeros(cap, dtype=jnp.int32),
                      fields={"item": child})
    if isinstance(dt, ListT):
        stor = storage_numpy_dtype(dt.inner)
        return Column(dt, jnp.zeros((cap, 1), dtype=stor), None,
                      StringDict(np.array([], dtype=object))
                      if dt.inner.is_string else None,
                      lengths=jnp.zeros(cap, dtype=jnp.int32))
    if isinstance(dt, StructT):
        return Column(dt, None, None,
                      fields={n: _empty_column(d, cap) for n, d in dt.fields})
    stor = storage_numpy_dtype(dt)
    return Column(dt, jnp.zeros(cap, dtype=stor), None,
                  StringDict(np.array([], dtype=object))
                  if dt.is_string else None)


def width_for(n: int) -> int:
    """List-width bucket: power of two >= n (min 1). Small floor keeps tiny
    lists cheap; powers of two bound the distinct XLA shapes."""
    c = max(int(n), 1)
    b = 1
    while b < c:
        b <<= 1
    return b


def _detect_nested(values, dtype: Optional[DataType]) -> Optional[str]:
    from .dtypes import List as ListT, Struct as StructT
    if isinstance(dtype, ListT):
        return "list"
    if isinstance(dtype, StructT):
        return "struct"
    if isinstance(values, np.ndarray):
        if values.ndim == 2:
            return "list"
        if values.dtype.kind != "O":
            return None
    try:
        it = iter(values)
    except TypeError:
        return None
    for v in it:
        if v is None:
            continue
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, dict):
            return "struct"
        return None
    return None


def _list_column_from_host(values, dtype: Optional[DataType],
                           capacity: Optional[int],
                           width: Optional[int] = None) -> Column:
    from .dtypes import List as ListT, Struct as StructT
    if isinstance(values, np.ndarray) and values.ndim == 2:
        seq = [list(r) for r in values]
    else:
        seq = list(values)
    n = len(seq)
    cap = capacity_for(n) if capacity is None else capacity
    if cap < n:
        raise ShapeError(f"capacity {cap} < row count {n}")
    mask = np.array([v is not None for v in seq], dtype=bool)
    lens = np.array([len(v) if v is not None else 0 for v in seq],
                    dtype=np.int32)
    W = width if width is not None else \
        width_for(int(lens.max()) if n else 1)
    inner_dt = dtype.inner if isinstance(dtype, ListT) else None
    e0 = _first_list_elem(seq)
    if isinstance(inner_dt, StructT) or \
            (inner_dt is None and isinstance(e0, dict)):
        return _list_of_struct_from_host(seq, mask, lens, W, inner_dt, cap)
    if isinstance(inner_dt, ListT) or \
            (inner_dt is None and isinstance(e0, (list, tuple))) or \
            (inner_dt is None and isinstance(e0, np.ndarray)
             and e0.ndim >= 1):
        return _list_of_list_from_host(seq, mask, lens, W, inner_dt, cap)
    # one flat coercion over the padded (cap, W) grid reuses the scalar
    # coercion logic (strings/temporal/bool) unchanged
    flat: list = [None] * (cap * W)
    for i, row in enumerate(seq):
        if row is None:
            continue
        base = i * W
        for j, e in enumerate(row):
            flat[base + j] = e
    for e in flat:
        if isinstance(e, (list, tuple, dict)) or (
                isinstance(e, np.ndarray) and e.ndim > 0):
            from .errors import InvalidOperationError
            raise InvalidOperationError(
                "nested lists deeper than one level (List(List)/"
                "List(Struct)) are not supported yet")
        if e is not None:
            break
    vals, emask, dt, sdict = _coerce_host_values(flat, inner_dt)
    if repr(dt) == "Null":
        dt = Boolean
    stor = storage_numpy_dtype(dt)
    data2 = np.asarray(vals).astype(stor, copy=False).reshape(cap, W)
    em2 = emask.reshape(cap, W)
    lens_full = np.zeros(cap, dtype=np.int32)
    lens_full[:n] = lens
    in_len = np.arange(W)[None, :] < lens_full[:, None]
    elem_valid = None
    if not (em2 == in_len).all():
        elem_valid = jnp.asarray(em2 & in_len)
    validity = None
    if not mask.all():
        m = np.zeros(cap, dtype=bool)
        m[:n] = mask
        validity = jnp.asarray(m)
    return Column(ListT(dt), jnp.asarray(data2), validity, sdict,
                  lengths=jnp.asarray(lens_full), elem_valid=elem_valid)


def _first_list_elem(seq):
    for row in seq:
        if row is None:
            continue
        for e in row:
            if e is not None:
                return e
    return None


def _list_of_struct_from_host(seq, mask, lens, W, inner_dt, cap) -> Column:
    """List(Struct): lengths + per-field List columns sharing the width
    (struct-of-list-of-arrays — the transposed analogue of the
    reference's ListArray-over-StructArray, polars-arrow/src/array/)."""
    from .dtypes import List as ListT, Struct as StructT
    n = len(seq)
    if isinstance(inner_dt, StructT):
        names = [nm for nm, _ in inner_dt.fields]
        fdts = dict(inner_dt.fields)
    else:
        names, seen = [], set()
        for row in seq:
            for e in (row or ()):
                if isinstance(e, dict):
                    for k in e:
                        if k not in seen:
                            seen.add(k)
                            names.append(k)
        fdts = {}
    ev = np.zeros((cap, W), dtype=bool)  # element (struct) non-null
    for i, row in enumerate(seq):
        if row is None:
            continue
        for j, e in enumerate(row):
            ev[i, j] = e is not None
    fields = {}
    for nm in names:
        frows = [None if row is None else
                 [None if e is None else
                  (e.get(nm) if isinstance(e, dict) else None)
                  for e in row]
                 for row in seq]
        fields[nm] = _list_column_from_host(
            frows, ListT(fdts[nm]) if nm in fdts else None, cap, width=W)
    inner = StructT([(nm, fields[nm].dtype.inner) for nm in names])
    lens_full = np.zeros(cap, dtype=np.int32)
    lens_full[:n] = lens
    validity = None
    if not mask.all():
        m = np.zeros(cap, dtype=bool)
        m[:n] = mask
        validity = jnp.asarray(m)
    in_len = np.arange(W)[None, :] < lens_full[:, None]
    elem_valid = jnp.asarray(ev) if not (ev == in_len).all() else None
    return Column(ListT(inner), None, validity, None,
                  lengths=jnp.asarray(lens_full), elem_valid=elem_valid,
                  fields=fields)


def _reshape_leading(col: Column, cap: int, W: int) -> Column:
    """Lift a flat-leading column ((cap*W, ...) arrays) to a nested child
    layout ((cap, W, ...) arrays), recursing into struct/list fields."""
    def re(a):
        return None if a is None else a.reshape((cap, W) + a.shape[1:])
    return Column(
        col.dtype, re(col.data), re(col.validity), col.sdict,
        lengths=re(col.lengths), elem_valid=re(col.elem_valid),
        fields={k: _reshape_leading(f, cap, W)
                for k, f in col.fields.items()}
        if col.fields is not None else None)


def _flatten_leading(col: Column) -> Column:
    """Inverse of `_reshape_leading`: collapse the first two axes of every
    array ((cap, W, ...) -> (cap*W, ...)), recursing into fields."""
    def fl(a):
        return None if a is None else \
            a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
    return Column(
        col.dtype, fl(col.data), fl(col.validity), col.sdict,
        lengths=fl(col.lengths), elem_valid=fl(col.elem_valid),
        fields={k: _flatten_leading(f) for k, f in col.fields.items()}
        if col.fields is not None else None)


def _list_of_list_from_host(seq, mask, lens, W1, inner_dt, cap) -> Column:
    """List(List(T)) at ANY depth: outer lengths + a lifted child List
    column whose arrays carry a leading (cap, W1) axis — e.g. data
    (cap, W1, W2), inner lengths (cap, W1); deeper nesting recurses
    (List(List(List)) children are themselves lifted list columns).
    The flattened child is built by the ordinary row constructor, so
    List(Struct)/Struct inners compose for free."""
    from .dtypes import List as ListT
    from .errors import InvalidOperationError
    n = len(seq)
    child_seq: list = [None] * (cap * W1)
    for i, row in enumerate(seq):
        if row is None:
            continue
        for j, e in enumerate(row):
            if e is None:
                continue
            if isinstance(e, np.ndarray):
                e = e.tolist()
            if not isinstance(e, (list, tuple)):
                raise InvalidOperationError(
                    f"List(List): inner elements must be lists, got "
                    f"{type(e).__name__}")
            child_seq[i * W1 + j] = e
    child = _list_column_from_host(child_seq, inner_dt, cap * W1)
    lens_full = np.zeros(cap, dtype=np.int32)
    lens_full[:n] = lens
    in_len1 = np.arange(W1)[None, :] < lens_full[:, None]
    # the child's row validity marks present (non-null) inner lists; it
    # becomes the outer elem_valid and the lifted child carries none
    if child.validity is not None:
        ev = np.asarray(child.validity).reshape(cap, W1)
    else:
        ev = in_len1
    child = Column(child.dtype, child.data, None, child.sdict,
                   lengths=child.lengths, elem_valid=child.elem_valid,
                   fields=child.fields)
    child = _reshape_leading(child, cap, W1)
    elem_valid = jnp.asarray(ev) if not (ev == in_len1).all() else None
    validity = None
    if not mask.all():
        m = np.zeros(cap, dtype=bool)
        m[:n] = mask
        validity = jnp.asarray(m)
    return Column(ListT(child.dtype), None, validity, None,
                  lengths=jnp.asarray(lens_full), elem_valid=elem_valid,
                  fields={"item": child})


def _nested_list_to_numpy(col: Column, nrows: int,
                          valid_mask: Optional[np.ndarray]):
    """Decode List(Struct)/List(List) rows to host objects."""
    from .dtypes import Struct as StructT
    lens = np.asarray(col.lengths)[:nrows]
    ev = np.asarray(col.elem_valid)[:nrows] \
        if col.elem_valid is not None else None
    vmask = np.asarray(col.validity)[:nrows] \
        if col.validity is not None else None
    if valid_mask is not None:
        sel = valid_mask[:nrows]
        lens = lens[sel]
        if ev is not None:
            ev = ev[sel]
        if vmask is not None:
            vmask = vmask[sel]
    inner = col.dtype.inner
    m = len(lens)
    out = np.empty(m, dtype=object)
    if isinstance(inner, StructT):
        parts = {nm: f.to_numpy(nrows, valid_mask)
                 for nm, f in col.fields.items()}
        for i in range(m):
            if vmask is not None and not vmask[i]:
                out[i] = None
                continue
            row = []
            for j in range(int(lens[i])):
                if ev is not None and not ev[i, j]:
                    row.append(None)
                    continue
                row.append({nm: (parts[nm][i][j]
                                 if parts[nm][i] is not None else None)
                            for nm in parts})
            out[i] = row
        return out
    # List(List...): decode the lifted child at its flat leading layout
    # (recursion handles any depth / struct inners), then regroup by the
    # outer lengths
    child = col.fields["item"]
    W1 = np.asarray(col.fields["item"].lengths).shape[1] \
        if child.lengths is not None else np.asarray(child.data).shape[1]
    flat_child = _flatten_leading(child)
    childrows = flat_child.to_numpy(nrows * W1)
    if valid_mask is not None:
        orig = np.nonzero(valid_mask[:nrows])[0]
    else:
        orig = np.arange(m)
    for i in range(m):
        if vmask is not None and not vmask[i]:
            out[i] = None
            continue
        oi = int(orig[i])
        row = []
        for j in range(int(lens[i])):
            if ev is not None and not ev[i, j]:
                row.append(None)
                continue
            vals = childrows[oi * W1 + j]
            row.append(vals.tolist() if isinstance(vals, np.ndarray)
                       else vals)
        out[i] = row
    return out


def _struct_column_from_host(values, dtype: Optional[DataType],
                             capacity: Optional[int]) -> Column:
    from .dtypes import Struct as StructT
    seq = list(values)
    n = len(seq)
    cap = capacity_for(n) if capacity is None else capacity
    if cap < n:
        raise ShapeError(f"capacity {cap} < row count {n}")
    mask = np.array([v is not None for v in seq], dtype=bool)
    if isinstance(dtype, StructT):
        keys = [k for k, _ in dtype.fields]
        fdts = dict(dtype.fields)
    else:
        keys, fdts = [], {}
        for row in seq:
            if row is not None:
                for k in row:
                    if k not in fdts:
                        keys.append(k)
                        fdts[k] = None
    fields = {}
    out_fields = []
    for k in keys:
        child_vals = [row.get(k) if row is not None else None for row in seq]
        child = Column.from_numpy(child_vals, dtype=fdts.get(k), capacity=cap)
        fields[k] = child
        out_fields.append((k, child.dtype))
    validity = None
    if not mask.all():
        m = np.zeros(cap, dtype=bool)
        m[:n] = mask
        validity = jnp.asarray(m)
    return Column(StructT(out_fields), None, validity, fields=fields)


def _decode_flat_host(dt: DataType, arr: np.ndarray, sdict):
    """Decode a flat physical host array to user-facing values (mirror of
    the scalar branch in Column.to_numpy)."""
    if dt.is_string:
        return sdict.decode(arr.astype(np.int32)) if sdict is not None else arr
    name = repr(dt)
    if name == "Date":
        return arr.astype("datetime64[D]").astype(object)
    if isinstance(dt, Datetime):
        out = arr.astype(f"datetime64[{dt.time_unit}]")
        return _aware_objects(out, dt.time_zone) if dt.time_zone else out
    if isinstance(dt, Duration):
        return arr.astype(f"timedelta64[{dt.time_unit}]")
    return arr


def _list_to_numpy_impl(col: Column, nrows: int,
                        valid_mask: Optional[np.ndarray]):
    data = np.asarray(col.data)[:nrows]
    lens = np.asarray(col.lengths)[:nrows]
    ev = np.asarray(col.elem_valid)[:nrows] \
        if col.elem_valid is not None else None
    vmask = np.asarray(col.validity)[:nrows] \
        if col.validity is not None else None
    if valid_mask is not None:
        sel = valid_mask[:nrows]
        data, lens = data[sel], lens[sel]
        if ev is not None:
            ev = ev[sel]
        if vmask is not None:
            vmask = vmask[sel]
    inner = col.dtype.inner
    out = np.empty(len(data), dtype=object)
    for i in range(len(data)):
        if vmask is not None and not vmask[i]:
            out[i] = None
            continue
        L = int(lens[i])
        vals = _decode_flat_host(inner, data[i, :L], col.sdict)
        vals = vals.tolist() if isinstance(vals, np.ndarray) else list(vals)
        if ev is not None:
            out[i] = [v if ev[i, j] else None for j, v in enumerate(vals)]
        else:
            out[i] = vals
    return out


def _coerce_host_values(values, dtype: Optional[DataType]):
    """Normalize arbitrary host input -> (np array, mask|None, DataType, sdict)."""
    import datetime as _dt

    sdict = None
    if isinstance(values, np.ndarray) and values.dtype.kind not in ("O", "U", "S"):
        mask = None
        if values.dtype.kind == "f":
            pass  # NaN is a value, not a null (polars semantics)
        dt = dtype or dtype_from_numpy(values.dtype)
        if values.dtype.kind in ("M", "m"):
            unit = np.datetime_data(values.dtype)[0]
            if values.dtype.kind == "M":
                if unit == "D":
                    values = values.astype(np.int64).astype(np.int32)
                else:
                    tu = dt.time_unit if isinstance(dt, Datetime) else "us"
                    values = values.astype(f"datetime64[{tu}]").astype(np.int64)
            else:
                tu = dt.time_unit if isinstance(dt, Duration) else "us"
                values = values.astype(f"timedelta64[{tu}]").astype(np.int64)
        return values, mask, dt, None

    if isinstance(values, np.ndarray) and values.dtype.kind in ("U", "S"):
        # fixed-width numpy string arrays: straight to the zero-copy
        # dictionary encode — list(values) would build millions of
        # PyUnicode objects before the slow object-array path
        from .dtypes import Binary as _Bin, String as _Str
        dt = dtype or (_Str if values.dtype.kind == "U" else _Bin())
        if dt.is_string or isinstance(dt, _Bin):
            codes, sdict = StringDict.encode(values, None)
            return codes, None, dt, sdict

    seq = list(values) if not isinstance(values, np.ndarray) else list(values)
    mask = np.array([v is not None and v is not np.nan or isinstance(v, float)
                     for v in seq], dtype=bool)
    mask = np.array([v is not None for v in seq], dtype=bool)
    non_null = [v for v in seq if v is not None]
    if dtype is not None:
        dt = dtype
    elif not non_null:
        dt = Null
    else:
        v0 = non_null[0]
        if isinstance(v0, bool) or isinstance(v0, np.bool_):
            dt = Boolean
        elif isinstance(v0, (int, np.integer)):
            dt = Int64
        elif isinstance(v0, (float, np.floating)):
            dt = Float64
        elif isinstance(v0, str):
            dt = String
        elif isinstance(v0, (bytes, bytearray)):
            from .dtypes import Binary
            dt = Binary()
        elif isinstance(v0, _dt.datetime):
            tzi = v0.tzinfo
            if tzi is None:
                dt = Datetime("us")
            else:
                key = getattr(tzi, "key", None)
                if key is None:
                    off = v0.utcoffset() or _dt.timedelta()
                    mins = int(off.total_seconds() // 60)
                    key = "UTC" if mins == 0 else \
                        f"{'+' if mins >= 0 else '-'}" \
                        f"{abs(mins) // 60:02d}:{abs(mins) % 60:02d}"
                dt = Datetime("us", key)
        elif isinstance(v0, _dt.date):
            dt = Date
        elif isinstance(v0, _dt.timedelta):
            dt = Duration("us")
        else:
            raise ShapeError(f"cannot infer dtype from value {v0!r}")

    if dt.is_string:
        codes, sdict = StringDict.encode(np.asarray(seq, dtype=object), mask)
        return codes, mask, dt, sdict
    if dt == Null:
        return np.zeros(len(seq), dtype=bool), mask, Boolean, None
    if dt == Date:
        epoch = _dt.date(1970, 1, 1)
        vals = np.array([(v - epoch).days if v is not None else 0
                         for v in seq], dtype=np.int32)
        return vals, mask, dt, None
    if isinstance(dt, Datetime):
        scale = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[dt.time_unit]
        vals = np.array([int(v.timestamp() * scale) if v is not None else 0
                         for v in seq], dtype=np.int64)
        return vals, mask, dt, None
    if isinstance(dt, Duration):
        scale = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[dt.time_unit]
        vals = np.array([int(v.total_seconds() * scale) if v is not None else 0
                         for v in seq], dtype=np.int64)
        return vals, mask, dt, None
    stor = physical_numpy_dtype(dt)
    vals = np.array([v if v is not None else 0 for v in seq]).astype(stor)
    return vals, mask, dt, None


class Table:
    """An ordered set of equal-capacity columns + the live-row state.

    Live rows: if `valid` is None, rows [0, nrows) are live ("compact").
    Otherwise `valid` (bool, shape (capacity,)) marks live rows and `nrows`
    may be None (unknown until a host sync) — the masked state lets filter
    and friends stay on device with static shapes.

    Deferred count: when `valid` is None and the host count is unknown,
    `nrows_dev` (a device scalar) holds the live prefix length. Reading
    `.nrows` syncs it lazily (ONE scalar readback — on the remote-TPU
    tunnel a round trip costs ~24ms, so collect() never forces it;
    height/repr/host export do). Ops stay device-only via `row_mask()`.
    """

    __slots__ = ("names", "cols", "capacity", "_nrows", "valid",
                 "nrows_dev")

    def __init__(self, names: List[str], cols: Dict[str, Column],
                 capacity: int, nrows: Optional[int],
                 valid: Optional[jax.Array] = None,
                 nrows_dev: Optional[jax.Array] = None):
        self.names = names
        self.cols = cols
        self.capacity = capacity
        self._nrows = nrows
        self.valid = valid
        self.nrows_dev = nrows_dev

    @property
    def nrows(self) -> Optional[int]:
        """Host row count; syncs a deferred device count on first read."""
        if self._nrows is None and self.valid is None and \
                self.nrows_dev is not None:
            self._nrows = int(np.asarray(self.nrows_dev))
        return self._nrows

    @nrows.setter
    def nrows(self, value: Optional[int]) -> None:
        self._nrows = value

    # --- constructors ---------------------------------------------------
    @staticmethod
    def from_dict(data: Dict[str, object],
                  schema: Optional[Dict[str, DataType]] = None) -> "Table":
        names = list(data.keys())
        lengths = {k: (len(v) if hasattr(v, "__len__") else 1) for k, v in data.items()}
        n = max(lengths.values()) if lengths else 0
        for k, ln in lengths.items():
            if ln != n and ln != 1:
                raise ShapeError(f"column {k!r} has length {ln}, expected {n}")
        cap = capacity_for(n)
        cols = {}
        for k in names:
            v = data[k]
            if hasattr(v, "__len__") and lengths[k] == 1 and n != 1:
                v = list(v) * n
            elif not hasattr(v, "__len__"):
                v = [v] * n
            dt = schema.get(k) if schema else None
            col = getattr(v, "_col", None)
            if isinstance(col, Column) and \
                    (dt is None or dt == col.dtype) and \
                    col.capacity == cap:
                # a Series: adopt its Column as-is — round-tripping
                # through Python values would re-infer the dtype
                # (widening an explicit Float32 to Float64)
                cols[k] = col
                continue
            if isinstance(col, Column) and \
                    (dt is None or dt == col.dtype) and \
                    col.capacity < cap:
                from .ops import compact as _C
                tt = Table([k], {k: col}, col.capacity, lengths[k], None)
                cols[k] = _C.grow_to(tt, cap).cols[k]
                continue
            cols[k] = Column.from_numpy(v, dtype=dt, capacity=cap)
        return Table(names, cols, cap, n, None)

    @staticmethod
    def empty(schema: Sequence) -> "Table":
        cap = CONFIG.min_capacity
        names, cols = [], {}
        for name, dt in schema:
            names.append(name)
            cols[name] = _empty_column(dt, cap)
        return Table(names, cols, cap, 0, None)

    # --- basic introspection -------------------------------------------
    @property
    def schema(self) -> Dict[str, DataType]:
        return {n: self.cols[n].dtype for n in self.names}

    @property
    def width(self) -> int:
        return len(self.names)

    def __contains__(self, name: str) -> bool:
        return name in self.cols

    def column(self, name: str) -> Column:
        try:
            return self.cols[name]
        except KeyError:
            raise ColumnNotFoundError(
                f"{name!r} not found; available: {self.names}") from None

    # --- live-row helpers ----------------------------------------------
    def row_mask(self) -> jax.Array:
        """Bool (capacity,) mask of live rows (device-only, never syncs)."""
        if self.valid is not None:
            return self.valid
        if self._nrows is not None:
            return jnp.arange(self.capacity) < self._nrows
        if self.nrows_dev is not None:
            return jnp.arange(self.capacity) < self.nrows_dev
        return jnp.arange(self.capacity) < 0

    def count_rows(self) -> int:
        """Host-synced live row count (caches into nrows)."""
        if self._nrows is None:
            if self.valid is not None:
                self._nrows = int(jnp.sum(self.valid))
            elif self.nrows_dev is not None:
                self._nrows = int(np.asarray(self.nrows_dev))
        return self._nrows

    # --- structural ops (no device compute) ----------------------------
    def select_columns(self, names: Sequence[str]) -> "Table":
        for n in names:
            if n not in self.cols:
                raise ColumnNotFoundError(f"{n!r} not found; available: {self.names}")
        return Table(list(names), {n: self.cols[n] for n in names},
                     self.capacity, self._nrows, self.valid,
                     nrows_dev=self.nrows_dev)

    def drop_columns(self, names: Sequence[str]) -> "Table":
        drop = set(names)
        keep = [n for n in self.names if n not in drop]
        return self.select_columns(keep)

    def with_column(self, name: str, col: Column) -> "Table":
        if col.capacity != self.capacity and self.width > 0:
            raise ShapeError(
                f"column capacity {col.capacity} != table capacity {self.capacity}")
        cols = dict(self.cols)
        names = list(self.names)
        if name not in cols:
            names.append(name)
        cols[name] = col
        return Table(names, cols, self.capacity, self._nrows, self.valid,
                     nrows_dev=self.nrows_dev)

    def rename(self, mapping: Dict[str, str], strict: bool = True) -> "Table":
        for old in mapping:
            if old not in self.cols and strict:
                raise ColumnNotFoundError(f"{old!r} not found")
        new_names = [mapping.get(n, n) for n in self.names]
        if len(set(new_names)) != len(new_names):
            raise DuplicateError(f"duplicate column names after rename: {new_names}")
        cols = {mapping.get(n, n): c for n, c in self.cols.items()}
        return Table(new_names, cols, self.capacity, self._nrows, self.valid,
                     nrows_dev=self.nrows_dev)

    def with_valid(self, valid: Optional[jax.Array],
                   nrows: Optional[int],
                   nrows_dev: Optional[jax.Array] = None) -> "Table":
        return Table(self.names, self.cols, self.capacity, nrows, valid,
                     nrows_dev=nrows_dev)

    # --- host materialization ------------------------------------------
    def to_numpy_dict(self) -> Dict[str, np.ndarray]:
        n = self.count_rows()
        vmask = None
        if self.valid is not None:
            vmask = np.asarray(self.valid)
        out = {}
        for name in self.names:
            c = self.cols[name]
            if vmask is not None:
                out[name] = c.to_numpy(self.capacity, vmask)
            else:
                out[name] = c.to_numpy(n)
        return out

    def __repr__(self) -> str:
        n = self._nrows if self._nrows is not None else \
            ("deferred" if self.nrows_dev is not None else "?")
        body = ", ".join(f"{k}: {v!r}" for k, v in self.schema.items())
        return f"Table[{n} rows, cap {self.capacity}]({body})"

def _aware_objects(arr64, tz_name: str):
    """datetime64 (UTC) -> object array of tz-aware python datetimes."""
    from datetime import timezone as _tz
    from zoneinfo import ZoneInfo as _ZI
    z = _ZI(tz_name)
    out = np.empty(arr64.shape, dtype=object)
    flat = arr64.astype("datetime64[us]").astype(object)
    for i, d in np.ndenumerate(flat):
        out[i] = d.replace(tzinfo=_tz.utc).astimezone(z) \
            if d is not None else None
    return out
