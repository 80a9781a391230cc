"""vstack / vertical concatenation.

Reference analogue: `polars-core` vstack + `polars-plan` Union lowering.
Schemas are unified by supertype (diagonal concat fills missing columns
with nulls); string columns are recoded onto merged dictionaries.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Column, Table, storage_numpy_dtype
from ..config import capacity_for
from ..dtypes import DataType, Null, String, supertype
from ..errors import SchemaError, ShapeError
from ..expr.eval import Val, cast_val
from ..strings import NULL_CODE, StringDict
from . import compact as C


def _unify_schema(tables: Sequence[Table], how: str):
    if how in ("vertical", "vertical_relaxed"):
        names = list(tables[0].names)
        for t in tables[1:]:
            if list(t.names) != names and how == "vertical":
                raise SchemaError(
                    f"vstack schemas differ: {names} vs {list(t.names)}")
        dtypes = {}
        for n in names:
            dt: Optional[DataType] = None
            for t in tables:
                if n not in t.cols:
                    raise SchemaError(f"column {n!r} missing in vstack input")
                cdt = t.cols[n].dtype
                dt = cdt if dt is None else supertype(dt, cdt)
            dtypes[n] = dt
        return names, dtypes
    # diagonal: union of columns
    names: List[str] = []
    for t in tables:
        for n in t.names:
            if n not in names:
                names.append(n)
    dtypes = {}
    for n in names:
        dt = None
        for t in tables:
            if n in t.cols:
                cdt = t.cols[n].dtype
                dt = cdt if dt is None else supertype(dt, cdt)
        dtypes[n] = dt
    return names, dtypes


def _concat_nested(tables: Sequence[Table], n: str, dt: DataType,
                   cap: int, total: int) -> Column:
    """Vertical concat of list/struct columns (inputs already compact)."""
    from ..dtypes import List as ListT, Struct as StructT

    if isinstance(dt, ListT) and isinstance(dt.inner, (ListT, StructT)):
        # nested-inner lists: correctness-first host rebuild (deep concat
        # is rare; columnar fast path is a future optimization)
        from ..batch import _list_column_from_host
        rows: list = []
        for t in tables:
            nt = t.nrows or 0
            c = t.cols.get(n)
            if c is None:
                rows.extend([None] * nt)
            else:
                rows.extend(list(c.to_numpy(nt)))
        return _list_column_from_host(rows, dt, cap)

    if isinstance(dt, StructT):
        # recurse per field by wrapping child columns in 1-col tables;
        # tables missing the struct (or a field) diagonal-fill with nulls
        fields = {}
        for fname, fdt in dt.fields:
            sub = []
            for t in tables:
                nt = t.nrows or 0
                c = t.cols.get(n)
                if c is not None and c.fields is not None \
                        and fname in c.fields:
                    sub.append(Table([fname], {fname: c.fields[fname]},
                                     t.capacity, nt, None))
                else:
                    sub.append(Table([], {}, t.capacity, nt, None))
            fields[fname] = vstack_tables(sub, how="diagonal").cols[fname]
        parts_valid, any_valid = [], False
        for t in tables:
            nt = t.nrows or 0
            c = t.cols.get(n)
            if c is None:
                parts_valid.append(jnp.zeros(nt, jnp.bool_))
                any_valid = True
            elif c.validity is not None:
                parts_valid.append(jax.lax.slice_in_dim(c.validity, 0, nt))
                any_valid = True
            else:
                parts_valid.append(jnp.ones(nt, jnp.bool_))
        validity = None
        if any_valid:
            parts_valid.append(jnp.zeros(cap - total, jnp.bool_))
            validity = jnp.concatenate(parts_valid)
        return Column(dt, None, validity, fields=fields)

    assert isinstance(dt, ListT)
    inner = dt.inner
    stor = jnp.dtype(storage_numpy_dtype(inner))
    W = 1
    any_ev = False
    for t in tables:
        c = t.cols.get(n)
        if c is not None:
            W = max(W, c.data.shape[1])
            if c.elem_valid is not None:
                any_ev = True
    # merge inner string dictionaries
    sdict = None
    remaps = [None] * len(tables)
    if inner.is_string:
        sdict = StringDict(np.array([], dtype=object))
        for i, t in enumerate(tables):
            c = t.cols.get(n)
            if c is not None and c.sdict is not None:
                sdict, rm_merged, rm_new = sdict.merge(c.sdict)
                for j in range(i):
                    if remaps[j] is not None:
                        remaps[j] = rm_merged[remaps[j]]
                remaps[i] = rm_new
    parts_d, parts_len, parts_ev, parts_valid = [], [], [], []
    any_valid = False
    for i, t in enumerate(tables):
        nt = t.nrows or 0
        c = t.cols.get(n)
        if c is not None:
            d = jax.lax.slice_in_dim(c.data, 0, nt, axis=0)
            ln = jax.lax.slice_in_dim(c.lengths, 0, nt)
            if inner.is_string:
                if remaps[i] is not None and len(remaps[i]):
                    rm = jnp.asarray(remaps[i])
                    d = jnp.where(d >= 0,
                                  rm[jnp.clip(d, 0, len(remaps[i]) - 1)],
                                  NULL_CODE)
            elif d.dtype != stor:
                d = d.astype(stor)
            if d.shape[1] < W:
                d = jnp.pad(d, ((0, 0), (0, W - d.shape[1])))
            parts_d.append(d)
            parts_len.append(ln)
            if any_ev:
                if c.elem_valid is not None:
                    ev = jax.lax.slice_in_dim(c.elem_valid, 0, nt, axis=0)
                    if ev.shape[1] < W:
                        ev = jnp.pad(ev, ((0, 0), (0, W - ev.shape[1])))
                else:
                    ev = jnp.arange(W)[None, :] < ln[:, None]
                parts_ev.append(ev)
            if c.validity is not None:
                parts_valid.append(jax.lax.slice_in_dim(c.validity, 0, nt))
                any_valid = True
            else:
                parts_valid.append(jnp.ones(nt, jnp.bool_))
        else:
            parts_d.append(jnp.zeros((nt, W), stor))
            parts_len.append(jnp.zeros(nt, jnp.int32))
            if any_ev:
                parts_ev.append(jnp.zeros((nt, W), jnp.bool_))
            parts_valid.append(jnp.zeros(nt, jnp.bool_))
            any_valid = True
    pad = cap - total
    parts_d.append(jnp.zeros((pad, W), stor))
    parts_len.append(jnp.zeros(pad, jnp.int32))
    data = jnp.concatenate(parts_d, axis=0)
    lengths = jnp.concatenate(parts_len)
    elem_valid = None
    if any_ev:
        parts_ev.append(jnp.zeros((pad, W), jnp.bool_))
        elem_valid = jnp.concatenate(parts_ev, axis=0)
    validity = None
    if any_valid:
        parts_valid.append(jnp.zeros(pad, jnp.bool_))
        validity = jnp.concatenate(parts_valid)
    return Column(dt, data, validity, sdict, lengths=lengths,
                  elem_valid=elem_valid)


def vstack_tables(tables: Sequence[Table], how: str = "vertical") -> Table:
    """Concatenate tables vertically. Inputs are compacted first (one host
    sync per input to learn counts), the result is a fresh compact table."""
    tables = [C.compact(t) for t in tables]
    names, dtypes = _unify_schema(tables, how)
    total = sum(t.nrows or 0 for t in tables)
    cap = capacity_for(total)
    cols = {}
    for n in names:
        dt = dtypes[n]
        if dt.is_nested:
            cols[n] = _concat_nested(tables, n, dt, cap, total)
            continue
        stor = jnp.dtype(storage_numpy_dtype(dt))
        # merge string dictionaries across inputs
        sdict = None
        remaps = [None] * len(tables)
        if dt.is_string:
            sdict = StringDict(np.array([], dtype=object))
            for i, t in enumerate(tables):
                if n in t.cols and t.cols[n].sdict is not None:
                    sdict, rm_merged, rm_new = sdict.merge(t.cols[n].sdict)
                    # previous remaps must be composed with rm_merged
                    for j in range(i):
                        if remaps[j] is not None:
                            remaps[j] = rm_merged[remaps[j]]
                    remaps[i] = rm_new
        parts_data = []
        parts_valid = []
        any_valid = False
        for i, t in enumerate(tables):
            nt = t.nrows or 0
            if n in t.cols:
                c = t.cols[n]
                v = Val(c.dtype, c.data, c.validity, c.sdict, False)
                if dt.is_string:
                    data = c.data
                    if remaps[i] is not None and len(remaps[i]):
                        rm = jnp.asarray(remaps[i])
                        data = jnp.where(data >= 0,
                                         rm[jnp.clip(data, 0, len(remaps[i]) - 1)],
                                         NULL_CODE)
                else:
                    v = cast_val(v, dt)
                    data = v.data
                d = jax.lax.slice_in_dim(data, 0, min(nt, data.shape[0]))
                if d.shape[0] < nt:
                    d = jnp.pad(d, (0, nt - d.shape[0]))
                parts_data.append(d)
                if c.validity is not None:
                    pv = jax.lax.slice_in_dim(c.validity, 0, nt)
                    parts_valid.append(pv)
                    any_valid = True
                else:
                    parts_valid.append(jnp.ones(nt, jnp.bool_))
            else:  # diagonal fill with nulls
                fill = NULL_CODE if dt.is_string else 0
                parts_data.append(jnp.full(nt, fill, stor if not dt.is_string
                                           else jnp.int32))
                parts_valid.append(jnp.zeros(nt, jnp.bool_))
                any_valid = True
        pad = cap - total
        dtype_ = parts_data[0].dtype if parts_data else stor
        parts_data.append(jnp.zeros(pad, dtype_))
        data = jnp.concatenate(parts_data) if parts_data else jnp.zeros(cap, stor)
        validity = None
        if any_valid:
            parts_valid.append(jnp.zeros(pad, jnp.bool_))
            validity = jnp.concatenate(parts_valid)
        cols[n] = Column(dt, data, validity, sdict)
    return Table(names, cols, cap, total, None)
