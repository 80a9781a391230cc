"""Nested (list/struct) kernels.

TPU-native replacement for the reference's nested-array machinery
(`polars-arrow/src/array/list/`, `polars-ops/src/chunked_array/list/`):
lists are fixed-width padded 2-D device arrays + a per-row length vector
(see `dtypes.List`), so every per-list op is a masked axis-1 reduction or
gather that XLA vectorizes across rows — no offsets, no ragged loops.

explode (`polars-ops/src/frame/explode.rs` capability) maps each output
row to its (source row, element) pair with a device `searchsorted` over
the output offsets; the only host sync is the output row count, which the
plan layer needs anyway to pick the result capacity bucket.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Column, Table, storage_numpy_dtype
from ..config import capacity_for
from ..dtypes import (Boolean, DataType, Float64, Int64, UInt32,
                      List as ListT)
from ..errors import ComputeError, InvalidOperationError, ShapeError
from . import compact as C
from .search import searchsorted

__all__ = ["explode_table", "implode_all", "list_namespace_op"]


# ---------------------------------------------------------------------------
# explode
# ---------------------------------------------------------------------------

def explode_table(table: Table, columns: Sequence[str]) -> Table:
    """Expand list rows to one row per element (empty/null lists produce a
    single null row, matching polars). Non-exploded columns repeat."""
    t = C.compact(table)
    n = t.nrows or 0
    for name in columns:
        c = t.cols[name] if name in t.cols else t.column(name)
        if c.lengths is None:
            raise InvalidOperationError(
                f"explode: column {name!r} is {c.dtype!r}, not a List")
    c0 = t.cols[columns[0]]
    lens_h = np.asarray(c0.lengths)[:n].astype(np.int64)
    for name in columns[1:]:
        other = np.asarray(t.cols[name].lengths)[:n]
        if not (other == lens_h).all():
            raise ShapeError(
                "exploded columns must have matching element counts")
    counts = np.maximum(lens_h, 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    ocap = capacity_for(total)

    offs_d = jnp.asarray(offsets)
    j = jnp.arange(ocap, dtype=jnp.int64)
    r = jnp.clip(searchsorted(offs_d, j, side="right") - 1, 0,
                 max(n - 1, 0)).astype(jnp.int32)
    e = (j - offs_d[r]).astype(jnp.int32)
    live = j < total

    expl = set(columns)
    cols = {}
    for name in t.names:
        c = t.cols[name]
        if name not in expl:
            cols[name] = c.take(r)
            continue
        lens_r = c.lengths[r]
        validity = e < lens_r  # empty/null list -> null element row
        if c.elem_valid is not None:
            W0 = c.elem_valid.shape[1]
            validity = validity & c.elem_valid[r, jnp.clip(e, 0, W0 - 1)]
        if c.validity is not None:
            validity = validity & c.validity[r]
        if c.fields is not None:
            # List(Struct) -> Struct; List(List) -> List
            from ..dtypes import Struct as StructT
            if isinstance(c.dtype.inner, StructT):
                fcols = {}
                for nm, f in c.fields.items():
                    Wf = f.data.shape[1]
                    ecf = jnp.clip(e, 0, Wf - 1)
                    fval = validity
                    if f.elem_valid is not None:
                        fval = fval & f.elem_valid[r, ecf]
                    fcols[nm] = Column(f.dtype.inner, f.data[r, ecf],
                                       fval, f.sdict)
                cols[name] = Column(c.dtype.inner, None, validity,
                                    fields=fcols)
            else:
                ch = _index_level(c.fields["item"], r, e)
                cols[name] = Column(
                    c.dtype.inner, ch.data, validity, ch.sdict,
                    lengths=ch.lengths, elem_valid=ch.elem_valid,
                    fields=ch.fields)
            continue
        W = c.data.shape[1]
        ec = jnp.clip(e, 0, W - 1)
        data = c.data[r, ec]
        cols[name] = Column(c.dtype.inner, data, validity, c.sdict)
    out = Table(list(t.names), cols, ocap, total, None)
    if total < ocap:
        out = out.with_valid(jnp.arange(ocap) < total, total)
    return out


# ---------------------------------------------------------------------------
# implode (whole-column -> one list row)
# ---------------------------------------------------------------------------

def implode_all(data: jax.Array, validity: Optional[jax.Array],
                mask: jax.Array, inner_dtype: DataType, sdict):
    """Gather live rows (in order, nulls kept) into a single list row.
    Returns (data2, lengths, elem_valid, dtype)."""
    cap = data.shape[0]
    perm = jnp.argsort(~mask, stable=True)
    packed = data[perm][None, :]  # (1, cap)
    count = jnp.sum(mask).astype(jnp.int32)[None]
    in_len = jnp.arange(cap)[None, :] < count[:, None]
    elem_valid = None
    if validity is not None:
        elem_valid = validity[perm][None, :] & in_len
    return packed, count, elem_valid, ListT(inner_dtype)


# ---------------------------------------------------------------------------
# .list namespace
# ---------------------------------------------------------------------------

def _index_level(col: Column, r: jax.Array, e: jax.Array) -> Column:
    """Select element `e` of row `r` from a lifted nested child column:
    applies `[r, e]` to every (outer_cap, W, ...) array, recursing into
    struct/list fields, yielding a column one list level shallower.
    Out-of-range `e` is clipped per-array (callers mask validity)."""
    def ix(a):
        if a is None:
            return None
        return a[r, jnp.clip(e, 0, a.shape[1] - 1)]
    return Column(col.dtype, ix(col.data), ix(col.validity), col.sdict,
                  lengths=ix(col.lengths), elem_valid=ix(col.elem_valid),
                  fields={k: _index_level(f, r, e)
                          for k, f in col.fields.items()}
                  if col.fields is not None else None)


def _nested_list_namespace_op(op: str, v, attrs: dict):
    """`.list.<op>` on List(Struct)/List(List) columns (data lives in
    `fields`; see batch._list_of_struct_from_host/_list_of_list_from_host).
    Supports the structural subset; element-wise reductions on nested
    inners raise clearly."""
    from ..dtypes import Struct as StructT
    lens = v.lengths
    cap = lens.shape[0]
    row_valid = v.validity
    inner = v.dtype.inner
    if op in ("len", "n_elements"):
        return dict(dtype=UInt32, data=lens.astype(jnp.uint32),
                    validity=row_valid)
    if op in ("get", "first", "last"):
        if op == "first":
            j = jnp.zeros(cap, dtype=jnp.int32)
        elif op == "last":
            j = jnp.maximum(lens - 1, 0)
        else:
            idx = int(attrs.get("index", 0))
            j = jnp.full(cap, idx, dtype=jnp.int32) if idx >= 0 \
                else (lens + idx)
        inb = (j >= 0) & (j < lens)
        jc = jnp.clip(j, 0, None)
        rows = jnp.arange(cap)
        ok = inb
        if v.elem_valid is not None:
            ok = ok & v.elem_valid[rows, jnp.minimum(
                jc, v.elem_valid.shape[1] - 1)]
        ok = _and(ok, row_valid)
        if isinstance(inner, StructT):
            fields = {}
            for nm, f in v.fields.items():
                W = f.data.shape[1]
                jj = jnp.minimum(jc, W - 1)
                fd = f.data[rows, jj]
                fv = ok
                if f.elem_valid is not None:
                    fv = fv & f.elem_valid[rows, jj]
                fields[nm] = dict(dtype=f.dtype.inner, data=fd,
                                  validity=fv, sdict=f.sdict)
            from ..expr.eval import Val as _Val
            fvals = {nm: _Val(d["dtype"], d["data"], d["validity"],
                              d["sdict"]) for nm, d in fields.items()}
            return dict(dtype=inner, data=None, validity=ok,
                        fields=fvals)
        ch = _index_level(v.fields["item"], rows, jc)
        return dict(dtype=inner, data=ch.data, validity=ok,
                    sdict=ch.sdict, lengths=ch.lengths,
                    elem_valid=ch.elem_valid, fields=ch.fields)
    raise InvalidOperationError(
        f".list.{op} is not supported on {v.dtype!r} "
        "(nested inner types support len/get/first/last)")


def _elem_mask(v) -> jax.Array:
    """(cap, W) mask of present (in-length AND non-null) elements."""
    W = v.data.shape[1]
    m = jnp.arange(W)[None, :] < v.lengths[:, None]
    if v.elem_valid is not None:
        m = m & v.elem_valid
    return m


def list_namespace_op(op: str, v, attrs: dict):
    """Evaluate a `.list.<op>` on a list Val. Returns a dict with keys
    dtype/data/validity/sdict/lengths/elem_valid for the result Val."""
    if v.lengths is None:
        raise InvalidOperationError(
            f".list.{op} on non-list dtype {v.dtype!r}")
    if v.data is None and v.fields is not None:
        return _nested_list_namespace_op(op, v, attrs)
    inner: DataType = v.dtype.inner
    data, lens = v.data, v.lengths
    cap, W = data.shape
    row_valid = v.validity
    m = _elem_mask(v)

    def flat(dtype, out, validity=None):
        validity = _and(validity, row_valid)
        return dict(dtype=dtype, data=out, validity=validity,
                    sdict=None)

    def flat_inner(out, validity=None):
        validity = _and(validity, row_valid)
        return dict(dtype=inner, data=out, validity=validity, sdict=v.sdict)

    def listy(data2, lens2, ev2):
        return dict(dtype=v.dtype, data=data2, validity=row_valid,
                    sdict=v.sdict, lengths=lens2, elem_valid=ev2)

    if op in ("len", "n_elements"):
        return flat(UInt32, lens.astype(jnp.uint32))
    if op == "sum":
        if inner.is_bool:
            out = jnp.sum(jnp.where(m, data, False).astype(jnp.uint32),
                          axis=1)
            return flat(UInt32, out)
        acc = jnp.float32 if inner.is_float else jnp.int64
        out = jnp.sum(jnp.where(m, data, 0).astype(acc), axis=1)
        out_dt = inner if inner.is_float else Int64
        return flat(out_dt, out.astype(jnp.dtype(storage_numpy_dtype(out_dt))))
    if op == "mean":
        cnt = jnp.sum(m, axis=1)
        s = jnp.sum(jnp.where(m, data, 0).astype(jnp.float32), axis=1)
        out = s / jnp.maximum(cnt, 1)
        return flat(Float64, out.astype(jnp.dtype(storage_numpy_dtype(Float64))),
                    cnt > 0)
    if op in ("min", "max"):
        if inner.is_string:
            # sorted dictionary: code order == string order
            sent = jnp.iinfo(jnp.int32).max if op == "min" \
                else jnp.iinfo(jnp.int32).min
            red = jnp.min if op == "min" else jnp.max
            out = red(jnp.where(m, data, sent), axis=1)
            has = jnp.any(m, axis=1)
            return flat_inner(jnp.where(has, out, 0).astype(data.dtype), has)
        if inner.is_float:
            sent = jnp.inf if op == "min" else -jnp.inf
        elif inner.is_bool:
            sent = op == "min"
        else:
            info = jnp.iinfo(data.dtype)
            sent = info.max if op == "min" else info.min
        red = jnp.min if op == "min" else jnp.max
        out = red(jnp.where(m, data, sent), axis=1)
        has = jnp.any(m, axis=1)
        return flat_inner(jnp.where(has, out,
                                    jnp.zeros((), data.dtype)), has)
    if op in ("any", "all"):
        if not inner.is_bool:
            raise InvalidOperationError(f".list.{op} requires Boolean inner")
        if op == "any":
            out = jnp.any(m & data.astype(bool), axis=1)
        else:
            out = jnp.all(~m | data.astype(bool), axis=1)
        return flat(Boolean, out)
    if op in ("first", "last", "get"):
        if op == "first":
            idx = jnp.zeros(cap, jnp.int32)
        elif op == "last":
            idx = jnp.maximum(lens - 1, 0)
        else:
            i = int(attrs.get("index", 0))
            idx = jnp.full(cap, i, jnp.int32) if i >= 0 \
                else (lens + i).astype(jnp.int32)
        inb = (idx >= 0) & (idx < lens)
        ic = jnp.clip(idx, 0, W - 1)
        out = data[jnp.arange(cap), ic]
        validity = inb
        if v.elem_valid is not None:
            validity = validity & v.elem_valid[jnp.arange(cap), ic]
        return flat_inner(out, validity)
    if op == "contains":
        item = attrs["item"]
        if inner.is_string:
            code = v.sdict.find(item) if v.sdict is not None else None
            code = -2 if code is None else code
            out = jnp.any(m & (data == code), axis=1)
        else:
            out = jnp.any(m & (data == item), axis=1)
        return flat(Boolean, out)
    if op == "arg_min" or op == "arg_max":
        if inner.is_float:
            sent = jnp.inf if op == "arg_min" else -jnp.inf
        else:
            info = jnp.iinfo(data.dtype)
            sent = info.max if op == "arg_min" else info.min
        masked = jnp.where(m, data, sent)
        out = (jnp.argmin(masked, axis=1) if op == "arg_min"
               else jnp.argmax(masked, axis=1)).astype(jnp.uint32)
        has = jnp.any(m, axis=1)
        return flat(UInt32, out, has)
    if op == "reverse":
        jidx = jnp.arange(W)[None, :]
        src = jnp.clip(lens[:, None] - 1 - jidx, 0, W - 1)
        data2 = jnp.take_along_axis(data, src, axis=1)
        ev2 = None
        if v.elem_valid is not None:
            ev2 = jnp.take_along_axis(v.elem_valid, src, axis=1) \
                & (jidx < lens[:, None])
        return listy(data2, lens, ev2)
    if op == "sort":
        desc = bool(attrs.get("descending", False))
        in_len = jnp.arange(W)[None, :] < lens[:, None]
        is_null = in_len & ~m
        # key order: present values first (by value), nulls last, padding
        # after that — all inside one lax.sort along axis 1
        rank = jnp.where(~in_len, jnp.int32(2), jnp.where(is_null, 1, 0))
        if inner.is_float:
            kv = jnp.where(m, data, 0.0)
            kv = -kv if desc else kv
        else:
            kv = jnp.where(m, data, jnp.zeros((), data.dtype))
            if desc:
                kv = -kv.astype(jnp.int64) if not inner.is_bool else ~kv
        sorted_ = jax.lax.sort((rank, kv, data), num_keys=2, dimension=1,
                               is_stable=True)
        data2 = sorted_[2]
        ev2 = None
        if v.elem_valid is not None:
            ev2 = (jnp.arange(W)[None, :] <
                   jnp.sum(m, axis=1)[:, None])
        return listy(data2, lens, ev2)
    if op in ("head", "slice", "tail"):
        if op == "head":
            off = jnp.zeros(cap, jnp.int32)
            ln = jnp.minimum(lens, int(attrs["n"]))
        elif op == "tail":
            nn = int(attrs["n"])
            ln = jnp.minimum(lens, nn)
            off = lens - ln
        else:
            o = int(attrs.get("offset", 0))
            length = attrs.get("length")
            off = jnp.where(o >= 0, jnp.minimum(o, lens),
                            jnp.maximum(lens + o, 0)).astype(jnp.int32)
            avail = lens - off
            ln = avail if length is None else jnp.minimum(avail, int(length))
        jidx = jnp.arange(W)[None, :]
        src = jnp.clip(off[:, None] + jidx, 0, W - 1)
        data2 = jnp.take_along_axis(data, src, axis=1)
        ev2 = None
        if v.elem_valid is not None:
            ev2 = jnp.take_along_axis(v.elem_valid, src, axis=1) \
                & (jidx < ln[:, None])
        return listy(data2, ln.astype(jnp.int32), ev2)
    if op == "unique":
        # sort within row then keep first of each run (order not maintained,
        # matching polars' default maintain_order=False)
        res = list_namespace_op("sort", v, {})
        sd, ln = res["data"], lens
        in_len = jnp.arange(W)[None, :] < ln[:, None]
        prev = jnp.roll(sd, 1, axis=1)
        isfirst = jnp.arange(W)[None, :] == 0
        newrun = (isfirst | (sd != prev)) & in_len
        # elem_valid: nulls sorted to the end count as one value in polars
        nvalid = jnp.sum(_elem_mask(v), axis=1)
        has_null = in_len & (jnp.arange(W)[None, :] >= nvalid[:, None])
        newrun = newrun & ~has_null | (has_null &
                                       (jnp.arange(W)[None, :] ==
                                        nvalid[:, None]))
        keep = newrun
        # compact kept elements to the front per row via axis-1 sort on ~keep
        order = jax.lax.sort((jnp.where(keep, 0, 1).astype(jnp.int32),
                              jnp.arange(W, dtype=jnp.int32)
                              * jnp.ones((cap, 1), jnp.int32)),
                             num_keys=1, dimension=1, is_stable=True)[1]
        data2 = jnp.take_along_axis(sd, order, axis=1)
        ln2 = jnp.sum(keep, axis=1).astype(jnp.int32)
        ev2 = None
        if v.elem_valid is not None:
            nuniq_valid = jnp.sum(keep & ~has_null, axis=1)
            ev2 = jnp.arange(W)[None, :] < nuniq_valid[:, None]
        return listy(data2, ln2, ev2)
    if op == "join":
        raise InvalidOperationError(
            ".list.join is evaluated host-side (see eval.py)")
    if op in ("std", "var"):
        ddof = attrs.get("ddof", 1)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        cnt = jnp.sum(m, axis=1)
        s = jnp.sum(jnp.where(m, data, 0).astype(acc), axis=1)
        s2 = jnp.sum(jnp.where(m, data.astype(acc) ** 2, 0), axis=1)
        n = jnp.maximum(cnt, 1)
        var = (s2 - s * s / n) / jnp.maximum(n - ddof, 1)
        var = jnp.maximum(var, 0)
        outv = jnp.sqrt(var) if op == "std" else var
        stor = jnp.dtype(storage_numpy_dtype(Float64))
        return flat(Float64, outv.astype(stor), cnt > ddof)
    if op == "median":
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        res = list_namespace_op("sort", v, {})
        sd = res["data"].astype(acc)
        cnt = jnp.sum(m, axis=1)
        pos = (cnt.astype(acc) - 1) * 0.5
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, W - 1)
        i1 = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, W - 1)
        lo = jnp.take_along_axis(sd, i0[:, None], axis=1)[:, 0]
        hi = jnp.take_along_axis(sd, i1[:, None], axis=1)[:, 0]
        stor = jnp.dtype(storage_numpy_dtype(Float64))
        return flat(Float64, ((lo + hi) / 2).astype(stor), cnt > 0)
    if op == "n_unique":
        res = list_namespace_op("unique", v, {})
        return flat(UInt32, res["lengths"].astype(jnp.uint32))
    if op == "count_matches":
        elem = attrs["element"]
        if inner.is_string:
            c = v.sdict.find(str(elem)) if v.sdict is not None else None
            tgt = jnp.int32(c if c is not None else -2)
        else:
            tgt = jnp.asarray(elem, data.dtype)
        out = jnp.sum(m & (data == tgt), axis=1)
        return flat(UInt32, out.astype(jnp.uint32))
    if op == "diff":
        n = int(attrs.get("n", 1))
        behavior = attrs.get("null_behavior", "ignore")
        jidx = jnp.arange(W)[None, :]
        src = jnp.clip(jidx - n, 0, W - 1)
        prev = jnp.take_along_axis(data, src, axis=1)
        prev_ok = (jidx - n >= 0) & jnp.take_along_axis(m, src, axis=1)
        out = data - prev
        ev2 = m & prev_ok
        if behavior == "drop":
            # shift left by n: element j of output = diff at j+n
            src2 = jnp.clip(jidx + n, 0, W - 1)
            out = jnp.take_along_axis(out, src2, axis=1)
            ev2 = jnp.take_along_axis(ev2, src2, axis=1) & \
                (jidx < jnp.maximum(lens - n, 0)[:, None])
            return listy(out, jnp.maximum(lens - n, 0).astype(jnp.int32),
                         ev2)
        return listy(out, lens, ev2)
    if op == "shift":
        n = int(attrs.get("n", 1))
        jidx = jnp.arange(W)[None, :]
        src = jnp.clip(jidx - n, 0, W - 1)
        inb = (jidx - n >= 0) & (jidx - n < lens[:, None])
        out = jnp.take_along_axis(data, src, axis=1)
        ev2 = inb & jnp.take_along_axis(m, src, axis=1) & \
            (jidx < lens[:, None])
        return listy(out, lens, ev2)
    if op == "drop_nulls":
        jidx = jnp.arange(W)[None, :]
        keep = m  # valid elements only
        order = jax.lax.sort((jnp.where(keep, 0, 1).astype(jnp.int32),
                              jnp.broadcast_to(
                                  jnp.arange(W, dtype=jnp.int32)[None, :],
                                  (cap, W))),
                             num_keys=1, dimension=1, is_stable=True)[1]
        data2 = jnp.take_along_axis(data, order, axis=1)
        ln2 = jnp.sum(keep, axis=1).astype(jnp.int32)
        ev2 = jidx < ln2[:, None]
        return listy(data2, ln2, ev2)
    if op == "gather":
        idxs = attrs["indices"]
        null_on_oob = attrs.get("null_on_oob", False)
        take = np.asarray(idxs, dtype=np.int32)
        W2 = max(len(take), 1)
        src_pos = jnp.asarray(take)[None, :] + jnp.zeros((cap, 1), jnp.int32)
        src_pos = jnp.where(src_pos < 0, lens[:, None] + src_pos, src_pos)
        inb = (src_pos >= 0) & (src_pos < lens[:, None])
        srcc = jnp.clip(src_pos, 0, W - 1)
        data2 = jnp.take_along_axis(data, srcc, axis=1)
        ev2 = inb & jnp.take_along_axis(m, srcc, axis=1)
        ln2 = jnp.full((cap,), W2, jnp.int32)
        return listy(data2, ln2, ev2)
    if op == "gather_every":
        n = int(attrs.get("n", 1))
        off = int(attrs.get("offset", 0))
        jidx = jnp.arange(W)[None, :]
        src_pos = off + jidx * n
        inb = src_pos < lens[:, None]
        srcc = jnp.clip(src_pos, 0, W - 1)
        data2 = jnp.take_along_axis(data, srcc, axis=1)
        ev2 = inb & jnp.take_along_axis(m, srcc, axis=1)
        ln2 = jnp.maximum(-(-(lens - off) // n), 0).astype(jnp.int32)
        return listy(data2, ln2, ev2)
    if op == "sample":
        n = int(attrs.get("n", 1))
        seed = attrs.get("seed")
        key = jax.random.PRNGKey(0 if seed is None else int(seed))
        u = jax.random.uniform(key, (cap, W))
        in_len = jnp.arange(W)[None, :] < lens[:, None]
        ku = jnp.where(in_len, u, 2.0)
        _, shuf, mv2 = jax.lax.sort((ku, data, m.astype(jnp.int32)),
                                    num_keys=1, dimension=1, is_stable=True)
        ln2 = jnp.minimum(lens, n).astype(jnp.int32)
        ev2 = mv2.astype(jnp.bool_) & \
            (jnp.arange(W)[None, :] < ln2[:, None])
        return listy(shuf, ln2, ev2)
    raise InvalidOperationError(f"unsupported .list op {op!r}")


def _and(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a & b
