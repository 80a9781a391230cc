"""Eager DataFrame.

Parity target: `py-polars/src/polars/dataframe/frame.py` — the eager API
is a thin driver over the same device kernels the lazy engine uses
(select/with_columns/filter evaluate expressions immediately; relational
ops call the kernel layer in `ops/`).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..batch import Column, Table
from ..config import capacity_for
from ..dtypes import Boolean, DataType, Float64, UInt8
from ..errors import (ColumnNotFoundError, ComputeError, DuplicateError,
                      InvalidOperationError, ShapeError)
from ..expr import meta
from ..expr.eval import (Val, cse_rewrite, cse_scope, eval_expr,
                         val_to_column)
from ..expr.expr import Expr, WhenThen, col as _col, when as _when
from ..ops import compact as C
from ..ops import sort as S
from .series import Series


def _to_exprs(args, kwargs=None) -> List[Expr]:
    flat = []

    def rec(a):
        if isinstance(a, (list, tuple)):
            for x in a:
                rec(x)
        elif isinstance(a, WhenThen):
            flat.append(a._as_expr())
        elif isinstance(a, Expr):
            flat.append(a)
        elif isinstance(a, str):
            flat.append(_col(a))
        else:
            from ..expr.expr import lit
            flat.append(lit(a))
    for a in args:
        rec(a)
    if kwargs:
        for name, a in kwargs.items():
            e = a if isinstance(a, Expr) else (
                a._as_expr() if isinstance(a, WhenThen) else
                (_col(a) if isinstance(a, str) else None))
            if e is None:
                from ..expr.expr import lit
                e = lit(a)
            flat.append(e.alias(name))
    return flat


class DataFrame:
    def __init__(self, data=None, schema=None, strict: bool = True):
        if data is None:
            if schema:
                # 0-row frame that keeps the declared schema (polars
                # semantics: pl.DataFrame(schema={...}))
                from ..batch import _empty_column
                from ..dtypes import DataType as _DT
                items = schema.items() if isinstance(schema, dict) \
                    else [(n, d) for n, d in schema]
                cap = capacity_for(0)
                cols, names = {}, []
                for nm, d in items:
                    if isinstance(d, type) and issubclass(d, _DT):
                        d = d()
                    names.append(nm)
                    cols[nm] = _empty_column(d, cap)
                self._table = Table(names, cols, cap, 0, None)
                return
            self._table = Table([], {}, capacity_for(0), 0, None)
            return
        if isinstance(data, Table):
            self._table = data
            return
        if isinstance(data, DataFrame):
            self._table = data._table
            return
        try:
            import pandas as pd
            if isinstance(data, pd.DataFrame):
                data = {c: data[c].to_numpy() for c in data.columns}
        except ImportError:
            pass
        try:
            import pyarrow as pa
            if isinstance(data, pa.Table):
                from ..io.arrow_interop import table_from_arrow
                self._table = table_from_arrow(data)
                return
        except ImportError:
            pass
        if isinstance(data, dict):
            sch = None
            if schema is not None and isinstance(schema, dict):
                sch = schema
            self._table = Table.from_dict(data, sch)
            return
        if isinstance(data, (list, tuple)):
            if not data:
                self._table = Table([], {}, capacity_for(0), 0, None)
                return
            if isinstance(data[0], dict):  # row-major dicts
                keys = list(data[0].keys())
                cols = {k: [r.get(k) for r in data] for k in keys}
                self._table = Table.from_dict(cols,
                                              schema if isinstance(schema, dict) else None)
                return
            if isinstance(data[0], Series):
                d = {s.name or f"column_{i}": s for i, s in enumerate(data)}
                t = None
                names, colmap = [], {}
                cap = max(capacity_for(len(s)) for s in data)
                n = len(data[0])
                for name, s in d.items():
                    names.append(name)
                    cgrown = s._col
                    if cgrown.capacity < cap:
                        tt = Table([name], {name: cgrown}, cgrown.capacity, len(s), None)
                        tt = C.grow_to(tt, cap)
                        cgrown = tt.cols[name]
                    colmap[name] = cgrown
                self._table = Table(names, colmap, cap, n, None)
                return
        raise ComputeError(f"cannot construct DataFrame from {type(data)}")

    @classmethod
    def _from_table(cls, t: Table) -> "DataFrame":
        df = cls.__new__(cls)
        df._table = t
        return df

    # --- introspection --------------------------------------------------
    @property
    def height(self) -> int:
        return self._table.count_rows()

    @property
    def width(self) -> int:
        return self._table.width

    @property
    def shape(self):
        return (self.height, self.width)

    @property
    def columns(self) -> List[str]:
        return list(self._table.names)

    @property
    def schema(self) -> Dict[str, DataType]:
        return self._table.schema

    @property
    def dtypes(self) -> List[DataType]:
        return [self._table.cols[n].dtype for n in self._table.names]

    def is_empty(self) -> bool:
        return self.height == 0

    def __len__(self) -> int:
        return self.height

    def __repr__(self) -> str:
        from .fmt import format_frame
        return format_frame(self)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.get_column(key)
        if isinstance(key, (list, tuple)) and key and isinstance(key[0], str):
            return self.select(list(key))
        if isinstance(key, slice):
            start = key.start or 0
            stop = key.stop if key.stop is not None else self.height
            return self.slice(start, stop - start)
        if isinstance(key, int):
            return self.row(key)
        raise ComputeError(f"unsupported index {key!r}")

    # --- expression contexts --------------------------------------------
    def select(self, *exprs, **named_exprs) -> "DataFrame":
        es = meta.expand_exprs(_to_exprs(exprs, named_exprs), self.schema)
        stripped, explode_names = [], []
        for e in es:
            e2, hit = meta.strip_top_explode(e)
            stripped.append(e2)
            if hit:
                explode_names.append(meta.output_name(e2))
        if explode_names:
            out = self.select(*stripped)
            return out.explode(explode_names)
        if len(stripped) == 1:
            e0 = stripped[0]
            name0 = meta.output_name(e0)
            while e0.kind == "alias":
                e0 = e0.children[0]
            if e0.kind == "cat_categories":
                # row-count-changing: the categories themselves
                v = eval_expr(e0.children[0], self._table, "select")
                if not v.dtype.is_string:
                    raise ComputeError(
                        f".cat.get_categories on {v.dtype!r}")
                import numpy as np
                cap = self._table.capacity
                col = val_to_column(v, cap)
                mask = np.asarray(self._table.row_mask())
                if col.validity is not None:
                    mask = mask & np.asarray(col.validity)
                codes = np.asarray(col.data)
                used = np.unique(codes[mask & (codes >= 0)])
                cats = list(col.sdict.values[used]) \
                    if col.sdict is not None else []
                return DataFrame({name0: cats})
            if e0.kind == "rle":
                return self._select_rle(e0, name0)
            if e0.kind == "struct_unnest":
                # expand the struct's fields into separate columns
                inner = self.select(e0.children[0])
                return inner.unnest(inner.columns[0])
        es, _ = cse_rewrite(stripped)
        t = self._table
        results = []
        any_row = False
        with cse_scope():
            for e in es:
                name = meta.output_name(e)
                if e.kind == "col" and e.attrs["name"] in t.cols:
                    # bare column: pass the Column object through (keeps stats)
                    results.append((name, t.cols[name]))
                    any_row = True
                    continue
                v = eval_expr(e, t, "select")
                results.append((name, v))
                any_row = any_row or not v.is_scalar
        names, cols = [], {}
        if not results:
            return DataFrame._from_table(Table([], {}, capacity_for(0), 0, None))
        # expr-level filters/drop_nulls/gather_every shrink the result:
        # compact live-masked Vals to a prefix (polars: the column shortens;
        # mixed lengths error)
        if any_row and any(isinstance(v, Val) and not v.is_scalar
                           and v.data is not None
                           and v.data.shape[0] > t.capacity
                           for _, v in results):
            return self._select_grown(results)
        if any_row and any(isinstance(v, Val) and v.live is not None
                           for _, v in results):
            return self._select_compacted(results)
        if any_row:
            cap = t.capacity
            for name, v in results:
                if name in cols:
                    raise DuplicateError(f"duplicate column name {name!r}")
                names.append(name)
                if isinstance(v, Column):
                    cols[name] = v
                    continue
                cols[name] = val_to_column(v, cap)
            return DataFrame._from_table(
                Table(names, cols, cap, t._nrows, t.valid,
                      nrows_dev=t.nrows_dev))
        cap = capacity_for(1)
        for name, v in results:
            if name in cols:
                raise DuplicateError(f"duplicate column name {name!r}")
            names.append(name)
            cols[name] = val_to_column(v, cap)
        return DataFrame._from_table(Table(names, cols, cap, 1, None))

    def _select_rle(self, e0, name0: str) -> "DataFrame":
        """Run-length encode a column into a Struct{len, value} frame
        (reference: `polars-stream/src/nodes/rle` capability)."""
        from ..dtypes import Struct as StructT, UInt32
        t = self._table
        cap = t.capacity
        v = eval_expr(e0.children[0], t, "select")
        mask = t.row_mask() if v.live is None else (t.row_mask() & v.live)
        # live rows to the front, original order kept
        perm = jnp.argsort(~mask, stable=True)
        x = v.data[perm]
        xv = v.valid_or_true()[perm]
        n = int(jnp.sum(mask))
        idx = jnp.arange(cap)
        newrun = ((idx == 0) | (x != jnp.roll(x, 1)) |
                  (xv != jnp.roll(xv, 1))) & (idx < n)
        nruns = int(jnp.sum(newrun))
        border = (~newrun).astype(jnp.uint32)
        _, starts = jax.lax.sort(
            (border, idx.astype(jnp.int32)), num_keys=1, is_stable=True)
        next_start = jnp.concatenate(
            [starts[1:], jnp.full((1,), cap, jnp.int32)])
        ends = jnp.where(jnp.arange(cap) < nruns - 1, next_start, n)
        lens = (ends - starts).astype(jnp.uint32)
        sc = jnp.clip(starts, 0, cap - 1)
        vals = x[sc]
        vvalid = xv[sc] if v.validity is not None else None
        fields = {
            "len": Column(UInt32, lens),
            "value": Column(v.dtype, vals, vvalid, v.sdict),
        }
        sdt = StructT([("len", UInt32), ("value", v.dtype)])
        col = Column(sdt, None, None, fields=fields)
        out = Table([name0], {name0: col}, cap, nruns, None)
        from ..ops.compact import shrink_to
        return DataFrame._from_table(shrink_to(out, nruns))

    def _select_grown(self, results) -> "DataFrame":
        """Select where an expr grew past the table capacity
        (extend_constant/append): compact every column to a live prefix and
        rebuild at the grown length; lengths must agree (polars errors on
        mismatched select lengths too)."""
        t = self._table
        comp = []
        length = None
        for name, v in results:
            if isinstance(v, Column):
                v = Val(v.dtype, v.data, v.validity, v.sdict, False, None,
                        lengths=v.lengths, elem_valid=v.elem_valid,
                        fields=v.fields)
                live = t.row_mask()
            elif v.is_scalar:
                comp.append((name, v, None))
                continue
            else:
                if v.fields is not None or v.lengths is not None:
                    raise InvalidOperationError(
                        "extend/append on nested dtypes not supported")
                phys = v.data.shape[0]
                if phys == t.capacity:
                    live = t.row_mask() if v.live is None \
                        else (t.row_mask() & v.live)
                else:
                    live = v.live if v.live is not None \
                        else jnp.ones(phys, jnp.bool_)
            n = int(jnp.sum(live))
            if length is None:
                length = n
            elif n != length:
                raise ShapeError(
                    f"select outputs have different lengths: {length} vs {n}")
            comp.append((name, v, live))
        length = length or 0
        cap = capacity_for(length)
        names, cols = [], {}
        for name, v, live in comp:
            if name in cols:
                raise DuplicateError(f"duplicate column name {name!r}")
            names.append(name)
            if live is None:  # scalar broadcast
                cols[name] = val_to_column(v, cap)
                continue
            perm = jnp.argsort(~live, stable=True)
            data = v.data[perm]
            validity = v.validity[perm] if v.validity is not None else None
            phys = data.shape[0]
            if phys >= cap:
                data = data[:cap]
                validity = validity[:cap] if validity is not None else None
            else:
                data = jnp.concatenate(
                    [data, jnp.zeros((cap - phys,), data.dtype)])
                if validity is not None:
                    validity = jnp.concatenate(
                        [validity, jnp.zeros((cap - phys,), jnp.bool_)])
            cols[name] = Column(v.dtype, data, validity, v.sdict)
        return DataFrame._from_table(Table(names, cols, cap, length, None))

    def _select_compacted(self, results) -> "DataFrame":
        """Select with expr-level filters: compact each live-masked column
        to a prefix; all shrunken columns must agree on length."""
        t = self._table
        cap = t.capacity
        base = t.row_mask()
        masks = []
        for name, v in results:
            if isinstance(v, Column):
                masks.append(base)
            elif v.is_scalar:
                masks.append(None)
            else:
                masks.append(base & v.live if v.live is not None else base)
        n_out = None
        for m in masks:
            if m is None:
                continue
            c = int(jnp.sum(m))
            if n_out is None:
                n_out = c
            elif c != n_out:
                raise ShapeError(
                    f"select: filtered column lengths differ ({c} vs {n_out})")
        n_out = 1 if n_out is None else n_out
        names, cols = [], {}
        for (name, v), m in zip(results, masks):
            if name in cols:
                raise DuplicateError(f"duplicate column name {name!r}")
            names.append(name)
            col = v if isinstance(v, Column) else val_to_column(v, cap)
            if m is not None:
                col = col.take(jnp.argsort(~m, stable=True))
            cols[name] = col
        out = Table(names, cols, cap, n_out, None)
        from ..ops.compact import shrink_to
        return DataFrame._from_table(shrink_to(out, n_out))

    def with_columns(self, *exprs, **named_exprs) -> "DataFrame":
        es = meta.expand_exprs(_to_exprs(exprs, named_exprs), self.schema)
        # CSE is safe when no expr reads a column another expr (re)defines
        # (polars semantics: all exprs see the input schema anyway)
        out_names = {meta.output_name(e) for e in es}
        reads = set()
        for e in es:
            reads |= meta.root_names(e)
        if not (out_names & reads):
            es, _ = cse_rewrite(es)
        t = self._table
        with cse_scope():
            for e in es:
                name = meta.output_name(e)
                v = eval_expr(e, t, "select")
                t = t.with_column(name, val_to_column(v, t.capacity))
        return DataFrame._from_table(t)

    def with_row_index(self, name: str = "index", offset: int = 0) -> "DataFrame":
        t = C.compact(self._table)
        idx = (jnp.arange(t.capacity) + offset).astype(jnp.uint32)
        from ..dtypes import UInt32
        t = Table(list(t.names), dict(t.cols), t.capacity, t._nrows, t.valid,
                  nrows_dev=t.nrows_dev)
        out = t.with_column(name, Column(UInt32, idx, None, None))
        # index first, like polars
        out = out.select_columns([name] + [n for n in out.names if n != name])
        return DataFrame._from_table(out)

    def filter(self, *predicates, **constraints) -> "DataFrame":
        preds = _to_exprs(predicates)
        for k, v in constraints.items():
            preds.append(_col(k) == v)
        t = self._table
        mask = t.row_mask()
        for p in preds:
            v = eval_expr(p, t, "filter")
            if not v.dtype.is_bool:
                raise ComputeError(f"filter predicate must be Boolean, got {v.dtype!r}")
            data = jnp.broadcast_to(v.data, (t.capacity,))
            pm = data & jnp.broadcast_to(v.valid_or_true(), (t.capacity,))
            mask = mask & pm
        return DataFrame._from_table(t.with_valid(mask, None))

    def drop(self, *names, strict: bool = True) -> "DataFrame":
        flat = []
        for n in names:
            flat.extend(n if isinstance(n, (list, tuple)) else [n])
        if strict:
            for n in flat:
                if n not in self._table.cols:
                    raise ColumnNotFoundError(f"{n!r} not found")
        return DataFrame._from_table(self._table.drop_columns(flat))

    def rename(self, mapping: Dict[str, str], strict: bool = True) -> "DataFrame":
        return DataFrame._from_table(self._table.rename(mapping, strict))

    def join_where(self, other: "DataFrame", *predicates,
                   suffix: str = "_right") -> "DataFrame":
        return self.lazy().join_where(other.lazy(), *predicates,
                                      suffix=suffix).collect()

    def merge_sorted(self, other: "DataFrame", key: str) -> "DataFrame":
        return self.lazy().merge_sorted(other.lazy(), key).collect()

    def explode(self, *columns) -> "DataFrame":
        from ..ops.nested import explode_table
        flat = []
        for c in columns:
            flat.extend(c if isinstance(c, (list, tuple)) else [c])
        names = [c.attrs["name"] if isinstance(c, Expr) else c for c in flat]
        return DataFrame._from_table(explode_table(self._table, names))

    def unnest(self, *columns) -> "DataFrame":
        from .lazyframe import _unnest_table
        flat = []
        for c in columns:
            flat.extend(c if isinstance(c, (list, tuple)) else [c])
        return DataFrame._from_table(_unnest_table(self._table, flat))

    def cast(self, dtypes, strict: bool = True) -> "DataFrame":
        if isinstance(dtypes, dict):
            exprs = [_col(k).cast(v) for k, v in dtypes.items()]
        else:
            exprs = [_col(n).cast(dtypes) for n in self.columns]
        return self.with_columns(exprs)

    # --- row ops --------------------------------------------------------
    def head(self, n: int = 5) -> "DataFrame":
        return DataFrame._from_table(C.slice_rows(self._table, 0, max(n, 0)))

    def limit(self, n: int = 5) -> "DataFrame":
        return self.head(n)

    def tail(self, n: int = 5) -> "DataFrame":
        return DataFrame._from_table(C.slice_rows(self._table, -n, n))

    def slice(self, offset: int, length: Optional[int] = None) -> "DataFrame":
        return DataFrame._from_table(C.slice_rows(self._table, offset, length))

    def reverse(self) -> "DataFrame":
        t = C.compact(self._table)
        n = t.nrows or 0
        idx = jnp.arange(t.capacity)
        perm = jnp.where(idx < n, n - 1 - idx, idx)
        return DataFrame._from_table(C.gather_table(t, perm, n, None))

    def gather_every(self, n: int, offset: int = 0) -> "DataFrame":
        t = C.compact(self._table)
        total = t.nrows or 0
        mask = (jnp.arange(t.capacity) >= offset) & \
               (jnp.remainder(jnp.arange(t.capacity) - offset, n) == 0) & \
               (jnp.arange(t.capacity) < total)
        return DataFrame._from_table(C.compact(t.with_valid(mask, None)))

    def sort(self, by, *more_by, descending=False, nulls_last=False,
             maintain_order: bool = False) -> "DataFrame":
        keys = _to_exprs((by,) + more_by)
        keys = meta.expand_exprs(keys, self.schema)
        nk = len(keys)
        desc = descending if isinstance(descending, (list, tuple)) else [descending] * nk
        nl = nulls_last if isinstance(nulls_last, (list, tuple)) else [nulls_last] * nk
        t = self._table
        vals = [eval_expr(k, t, "select") for k in keys]
        return DataFrame._from_table(
            S.sort_table(t, vals, desc, nl, maintain_order))

    def top_k(self, k: int, by, descending=False) -> "DataFrame":
        keys = _to_exprs((by,) if not isinstance(by, (list, tuple)) else tuple(by))
        nk = len(keys)
        desc = descending if isinstance(descending, (list, tuple)) else [descending] * nk
        # top_k returns the k largest -> sort descending on each key
        desc = [not d for d in desc]
        t = self._table
        vals = [eval_expr(kk, t, "select") for kk in keys]
        return DataFrame._from_table(S.top_k_table(t, vals, k, desc, [True] * nk))

    def bottom_k(self, k: int, by, descending=False) -> "DataFrame":
        keys = _to_exprs((by,) if not isinstance(by, (list, tuple)) else tuple(by))
        nk = len(keys)
        desc = descending if isinstance(descending, (list, tuple)) else [descending] * nk
        t = self._table
        vals = [eval_expr(kk, t, "select") for kk in keys]
        return DataFrame._from_table(S.top_k_table(t, vals, k, desc, [True] * nk))

    # --- relational ops (kernels) ---------------------------------------
    def unique(self, subset=None, keep: str = "any",
               maintain_order: bool = False) -> "DataFrame":
        from ..ops.groupby import unique_table
        subset_names = None
        if subset is not None:
            subset_names = [subset] if isinstance(subset, str) else list(subset)
        return DataFrame._from_table(
            unique_table(self._table, subset_names, keep, maintain_order))

    def n_unique(self, subset=None) -> int:
        return self.unique(subset).height

    def group_by(self, *by, maintain_order: bool = False, **named_by):
        from .groupby import GroupBy
        keys = _to_exprs(by, named_by)
        keys = meta.expand_exprs(keys, self.schema)
        return GroupBy(self, keys, maintain_order)

    def group_by_dynamic(self, index_column: str, *, every: str,
                         period: Optional[str] = None,
                         offset: Optional[str] = None, closed: str = "left",
                         group_by=None, start_by: str = "window"):
        from ..ops.temporal_window import dynamic_group_by
        keys = _to_exprs((group_by,)) if group_by is not None else []

        class _Dyn:
            def agg(_s, *aggs, **named):
                es = meta.expand_exprs(_to_exprs(aggs, named), self.schema)
                return DataFrame._from_table(dynamic_group_by(
                    self._table, index_column, every, period, offset, closed,
                    keys, es, start_by))
        return _Dyn()

    def rolling(self, index_column: str, *, period: str, group_by=None,
                closed: str = "right"):
        from ..ops.temporal_window import rolling_agg
        keys = _to_exprs((group_by,)) if group_by is not None else []

        class _Roll:
            def agg(_s, *aggs, **named):
                es = meta.expand_exprs(_to_exprs(aggs, named), self.schema)
                return DataFrame._from_table(rolling_agg(
                    self._table, index_column, period, keys, es, closed))
        return _Roll()

    def upsample(self, time_column: str, *, every: str) -> "DataFrame":
        """Insert rows at regular intervals (nulls elsewhere); reference:
        polars-time upsample."""
        import numpy as np
        t = C.compact(self._table)
        cvals = t.column(time_column).to_numpy(t.nrows or 0)
        if len(cvals) == 0:
            return self
        from ..ops.temporal import parse_every
        kind, n = parse_every(every)
        dt = t.column(time_column).dtype
        import datetime as _dt
        lo, hi = min(cvals), max(cvals)
        if repr(dt) == "Date":
            step = _dt.timedelta(days=max(n // (86_400 * 1_000_000_000), 1))
            grid = []
            cur = lo
            while cur <= hi:
                grid.append(cur)
                cur = cur + step
        else:
            step = np.timedelta64(max(int(n // 1000), 1), "us")
            lo = np.datetime64(lo, "us")
            hi = np.datetime64(hi, "us")
            grid = []
            cur = lo
            while cur <= hi:
                grid.append(cur)
                cur = cur + step
        gdf = DataFrame({time_column: np.asarray(grid)})
        return gdf.join(self, on=time_column, how="left")

    def join(self, other: "DataFrame", on=None, how: str = "inner", *,
             left_on=None, right_on=None, suffix: str = "_right",
             join_nulls: bool = False, nulls_equal: bool = False,
             coalesce: Optional[bool] = None,
             maintain_order: Optional[str] = None,
             validate: str = "m:m") -> "DataFrame":
        from ..ops.join import join_tables
        if on is not None:
            left_on = right_on = [on] if isinstance(on, str) else list(on)
        elif how != "cross":
            if left_on is None or right_on is None:
                raise ComputeError("join requires `on` or `left_on`+`right_on`")
            left_on = [left_on] if isinstance(left_on, str) else list(left_on)
            right_on = [right_on] if isinstance(right_on, str) else list(right_on)
        out = join_tables(self._table, other._table, left_on, right_on, how,
                          suffix, join_nulls or nulls_equal, coalesce,
                          maintain_order, validate)
        return DataFrame._from_table(out)

    # --- reshaping ------------------------------------------------------
    def pivot(self, on, *, index=None, values=None,
              aggregate_function: str = "first", on_columns=None,
              separator: str = "_") -> "DataFrame":
        """Wide pivot (reference: polars-ops pivot): one output column per
        distinct `on` value, filled by the chosen aggregation.
        `on_columns` pins the output columns explicitly (the lazy-pivot
        contract, `py-polars/src/polars/lazyframe/frame.py:7753`)."""
        on_names = [on] if isinstance(on, str) else list(on)
        if len(on_names) != 1:
            raise ComputeError("pivot supports a single `on` column")
        on_col = on_names[0]
        index = [index] if isinstance(index, str) else list(index or [])
        if not index:
            index = [c for c in self.columns
                     if c != on_col and (values is None or c not in values)]
            index = index[:1]
        if values is None:
            values = [c for c in self.columns
                      if c != on_col and c not in index]
        values = [values] if isinstance(values, str) else list(values)
        if on_columns is not None:
            distinct = list(on_columns.to_list()
                            if hasattr(on_columns, "to_list") else on_columns)
        else:
            distinct = sorted(set(self.get_column(on_col).to_list()),
                              key=lambda x: (x is None, x))
        from ..expr.expr import when as _when
        aggs = []
        for v in values:
            for d in distinct:
                sel = (_col(on_col) == d) if d is not None \
                    else _col(on_col).is_null()
                base = _col(v).filter(sel)
                agg = getattr(base, aggregate_function
                              if aggregate_function != "count" else "count")()
                # combinations absent from the input are null, not the
                # aggregate's empty identity (polars-ops pivot semantics)
                agg = _when(sel.sum() > 0).then(agg)
                name = str(d) if len(values) == 1 else f"{v}{separator}{d}"
                aggs.append(agg.alias(name))
        return self.group_by(index, maintain_order=True).agg(aggs)

    def unpivot(self, on=None, *, index=None, variable_name: str = "variable",
                value_name: str = "value") -> "DataFrame":
        return self.lazy().unpivot(on, index=index,
                                   variable_name=variable_name,
                                   value_name=value_name).collect()

    melt = unpivot

    def partition_by(self, *by, as_dict: bool = False,
                     maintain_order: bool = True):
        names = []
        for b in by:
            names.extend(b if isinstance(b, (list, tuple)) else [b])
        keys = self.select(names).unique(maintain_order=maintain_order)
        key_rows = keys.rows()
        out = []
        for row in key_rows:
            pred = None
            for n, v in zip(names, row):
                p = _col(n).is_null() if v is None else (_col(n) == v)
                pred = p if pred is None else (pred & p)
            out.append(self.filter(pred))
        if as_dict:
            return {row if len(row) > 1 else row[0]: df
                    for row, df in zip(key_rows, out)}
        return out

    def sample(self, n: Optional[int] = None, *,
               fraction: Optional[float] = None, shuffle: bool = False,
               seed: Optional[int] = None,
               with_replacement: bool = False) -> "DataFrame":
        t = C.compact(self._table)
        total = t.nrows or 0
        if n is None:
            n = total if fraction is None else int(total * fraction)
        rng = np.random.default_rng(seed)
        if with_replacement:
            idx = rng.integers(0, max(total, 1), n)
        else:
            n = min(n, total)
            idx = rng.choice(total, n, replace=False)
        if not shuffle:
            idx = np.sort(idx)
        perm = np.zeros(t.capacity, dtype=np.int32)
        perm[:len(idx)] = idx
        out = C.gather_table(t, jnp.asarray(perm), len(idx), None)
        return DataFrame._from_table(C.shrink_to(out, len(idx)))

    def shuffle(self, seed: Optional[int] = None) -> "DataFrame":
        return self.sample(fraction=1.0, shuffle=True, seed=seed)

    def describe(self) -> "DataFrame":
        stats = ["count", "null_count", "mean", "std", "min", "25%", "50%",
                 "75%", "max"]
        data: Dict[str, list] = {"statistic": stats}
        for name in self.columns:
            dt = self.schema[name]
            col_vals: list = []
            c = _col(name)
            if dt.is_numeric or dt.is_bool:
                cc = c if not dt.is_bool else c.cast(UInt8)
                vals = self.select(
                    c.count().cast(Float64).alias("count"),
                    c.null_count().cast(Float64).alias("nc"),
                    cc.mean().alias("mean"), cc.std().alias("std"),
                    cc.min().cast(Float64).alias("min"),
                    cc.quantile(0.25, "linear").alias("q1"),
                    cc.quantile(0.5, "linear").alias("q2"),
                    cc.quantile(0.75, "linear").alias("q3"),
                    cc.max().cast(Float64).alias("max")).rows()[0]
                col_vals = list(vals)
            else:
                cnt = self.select(c.count().alias("c")).item()
                nc = self.select(c.null_count().alias("c")).item()
                mn = self.select(c.min().alias("m")).item() \
                    if dt.is_string or dt.is_temporal else None
                mx = self.select(c.max().alias("m")).item() \
                    if dt.is_string or dt.is_temporal else None
                # non-numeric columns report as strings (polars semantics)
                col_vals = [str(cnt), str(nc), None, None,
                            None if mn is None else str(mn),
                            None, None, None,
                            None if mx is None else str(mx)]
            data[name] = col_vals if not (dt.is_numeric or dt.is_bool) else \
                [None if v is None else float(v) for v in col_vals]
        return DataFrame(data)

    # --- combining ------------------------------------------------------
    def vstack(self, other: "DataFrame") -> "DataFrame":
        from ..ops.concat import vstack_tables
        return DataFrame._from_table(vstack_tables([self._table, other._table]))

    def extend(self, other: "DataFrame") -> "DataFrame":
        # polars extend mutates self (appends other's rows in place)
        self._table = self.vstack(other)._table
        return self

    def hstack(self, other) -> "DataFrame":
        t = self._table
        other_t = other._table if isinstance(other, DataFrame) else None
        if other_t is None:
            raise ComputeError("hstack expects a DataFrame")
        ot = other_t
        if ot.capacity < t.capacity:
            ot = C.grow_to(C.compact(ot), t.capacity)
        elif ot.capacity > t.capacity:
            t = C.grow_to(C.compact(t), ot.capacity)
        for name in ot.names:
            t = t.with_column(name, ot.cols[name])
        return DataFrame._from_table(t)

    # --- aggregation shortcuts ------------------------------------------
    def _agg_all(self, agg: str, **kw) -> "DataFrame":
        from ..expr.expr import Expr
        exprs = []
        for n in self.columns:
            dt = self.schema[n]
            if agg in ("sum", "mean", "min", "max", "median", "std", "var") \
                    and not (dt.is_numeric or dt.is_bool or dt.is_temporal
                             or (agg in ("min", "max") and dt.is_string)):
                continue
            exprs.append(Expr("agg", (_col(n),), agg=agg, **kw).alias(n))
        return self.select(exprs) if exprs else DataFrame()

    def sum(self): return self._agg_all("sum")
    def mean(self): return self._agg_all("mean")
    def min(self): return self._agg_all("min")
    def max(self): return self._agg_all("max")
    def median(self): return self._agg_all("median")
    def std(self, ddof: int = 1): return self._agg_all("std", ddof=ddof)
    def var(self, ddof: int = 1): return self._agg_all("var", ddof=ddof)
    def product(self): return self._agg_all("product")

    def quantile(self, q: float, interpolation: str = "nearest"):
        return self._agg_all("quantile", q=q, interpolation=interpolation)

    def approx_n_unique(self) -> "DataFrame":
        return self.select([_col(n).n_unique().alias(n)
                            for n in self.columns])

    def fold(self, operation):
        """Horizontal fold across columns (reference:
        `py-polars` DataFrame.fold)."""
        cols = [self.get_column(n) for n in self.columns]
        acc = cols[0]
        for c in cols[1:]:
            acc = operation(acc, c)
        return acc

    def max_horizontal(self) -> "Series":
        from .functions import max_horizontal
        return self.select(max_horizontal(*self.columns).alias("max")) \
            .get_column("max")

    def min_horizontal(self) -> "Series":
        from .functions import min_horizontal
        return self.select(min_horizontal(*self.columns).alias("min")) \
            .get_column("min")

    def sum_horizontal(self) -> "Series":
        from .functions import sum_horizontal
        return self.select(sum_horizontal(*self.columns).alias("sum")) \
            .get_column("sum")

    def mean_horizontal(self) -> "Series":
        from .functions import mean_horizontal
        return self.select(mean_horizontal(*self.columns).alias("mean")) \
            .get_column("mean")

    def shift(self, n: int = 1, *, fill_value=None) -> "DataFrame":
        return self.with_columns([_col(c).shift(n, fill_value=fill_value)
                                  for c in self.columns])

    def interpolate(self) -> "DataFrame":
        return self.with_columns([_col(c).interpolate()
                                  for c in self.columns
                                  if self.schema[c].is_numeric])

    def is_duplicated(self) -> "Series":
        from ..expr.expr import struct as _struct
        e = _struct(*self.columns).is_duplicated().alias("dup") \
            if self.width > 1 else _col(self.columns[0]) \
            .is_duplicated().alias("dup")
        if self.width > 1:
            # row-wise: duplicated when the whole row repeats; use the
            # distinct machinery over all columns
            from ..ops.groupby import build_groups
            from ..expr.eval import Val as _V
            t = self._table
            kv = [_V(t.cols[n].dtype, t.cols[n].data, t.cols[n].validity,
                     t.cols[n].sdict, False) for n in t.names]
            gctx = build_groups(kv, t.row_mask())
            inv = jnp.argsort(gctx.perm, stable=True)
            cnt_row = gctx.group_count[
                jnp.clip(gctx.gid, 0, gctx.out_cap - 1)][inv]
            n = self.height
            col = Column(Boolean, cnt_row > 1)
            return Series._from_column("dup", col, n)
        return self.select(e).get_column("dup")

    def is_unique(self) -> "Series":
        dup = self.is_duplicated()
        from ..expr.expr import col as _c
        return dup.to_frame().select(
            (~_c(dup.name or "dup")).alias("uniq")).get_column("uniq")

    def glimpse(self) -> str:
        lines = [f"Rows: {self.height}", f"Columns: {self.width}"]
        d = self.to_dict()
        for n in self.columns:
            vals = ", ".join(str(v) for v in d[n][:5])
            lines.append(f"$ {n} <{self.schema[n]!r}> {vals}")
        out = "\n".join(lines)
        print(out)
        return out

    def estimated_size(self, unit: str = "b"):
        total = 0
        for n in self.columns:
            c = self._table.cols[n]
            if c.data is not None:
                total += c.data.size * c.data.dtype.itemsize
        div = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3}[unit]
        return total / div if div > 1 else int(total)

    def rechunk(self) -> "DataFrame":
        return self  # single fixed-capacity chunk by construction

    def clear(self, n: int = 0) -> "DataFrame":
        from ..batch import Table as _T
        empty = _T.empty(list(self.schema.items()))
        return DataFrame._from_table(empty)

    def clone(self) -> "DataFrame":
        return DataFrame._from_table(self._table)

    def transpose(self, include_header: bool = False,
                  header_name: str = "column",
                  column_names=None) -> "DataFrame":
        import numpy as np
        d = self.to_dict()
        rows = list(zip(*[d[n] for n in self.columns])) if self.columns \
            else []
        names = list(column_names) if column_names is not None else \
            [f"column_{i}" for i in range(self.height)]
        out = {}
        if include_header:
            out[header_name] = list(self.columns)
        for i, r in enumerate(rows):
            out[names[i]] = list(r)
        return DataFrame(out)

    def get_columns(self):
        return [self.get_column(n) for n in self.columns]

    def insert_column(self, index: int, series) -> "DataFrame":
        names = list(self.columns)
        names.insert(index, series.name)
        t = self.hstack(series.to_frame())._table.select_columns(names)
        return DataFrame._from_table(t)

    def replace_column(self, index: int, series) -> "DataFrame":
        names = list(self.columns)
        old = names[index]
        out = self.drop(old).hstack(series.to_frame())
        names[index] = series.name
        return DataFrame._from_table(out._table.select_columns(names))

    def iter_rows(self, named: bool = False):
        d = self.to_dict()
        cols = self.columns
        for i in range(self.height):
            if named:
                yield {n: d[n][i] for n in cols}
            else:
                yield tuple(d[n][i] for n in cols)

    def write_json(self, file=None):
        import json as _json
        rows = [r for r in self.iter_rows(named=True)]
        s = _json.dumps(rows, default=str)
        if file is None:
            return s
        with open(file, "w") as f:
            f.write(s)

    def join_asof(self, other: "DataFrame", **kw) -> "DataFrame":
        return self.lazy().join_asof(other.lazy(), **kw).collect()

    def with_row_count(self, name: str = "row_nr",
                       offset: int = 0) -> "DataFrame":
        return self.with_row_index(name, offset)

    def null_count(self) -> "DataFrame":
        return self.select([_col(n).null_count().alias(n) for n in self.columns])

    def count(self) -> "DataFrame":
        return self.select([_col(n).count().alias(n) for n in self.columns])

    def fill_null(self, value=None, strategy: Optional[str] = None) -> "DataFrame":
        return self.with_columns([_col(n).fill_null(value, strategy=strategy)
                                  for n in self.columns])

    def fill_nan(self, value) -> "DataFrame":
        return self.with_columns([
            _col(n).fill_nan(value) for n in self.columns
            if self.schema[n].is_float])

    def drop_nulls(self, subset=None) -> "DataFrame":
        names = [subset] if isinstance(subset, str) else (subset or self.columns)
        pred = None
        for n in names:
            p = _col(n).is_not_null()
            pred = p if pred is None else (pred & p)
        return self.filter(pred) if pred is not None else self

    def drop_nans(self, subset=None) -> "DataFrame":
        names = [subset] if isinstance(subset, str) else (subset or self.columns)
        pred = None
        for n in names:
            if not self.schema[n].is_float:
                continue
            p = _col(n).is_not_nan().fill_null(True)  # nulls are kept
            pred = p if pred is None else (pred & p)
        return self.filter(pred) if pred is not None else self

    # --- conversion ------------------------------------------------------
    def get_column(self, name: str) -> Series:
        t = C.compact(self._table)
        c = t.column(name)
        return Series._from_column(name, c, t.nrows or 0)

    def to_series(self, index: int = 0) -> Series:
        return self.get_column(self.columns[index])

    def to_dict(self, as_series: bool = False) -> Dict[str, Any]:
        d = self._table.to_numpy_dict()
        if as_series:
            return {k: Series(k, list(v)) for k, v in d.items()}
        return {k: [_py(x) for x in list(v)] for k, v in d.items()}

    def to_numpy(self) -> np.ndarray:
        d = self._table.to_numpy_dict()
        return np.column_stack([np.asarray(v) for v in d.values()]) \
            if d else np.zeros((0, 0))

    def to_pandas(self):
        import pandas as pd
        return pd.DataFrame(self._table.to_numpy_dict())

    def to_arrow(self):
        from ..io.arrow_interop import table_to_arrow
        return table_to_arrow(self._table)

    def __arrow_c_stream__(self, requested_schema=None):
        """Arrow PyCapsule export (reference:
        `py-polars/src/polars/dataframe/frame.py:1580`)."""
        return self.to_arrow().__arrow_c_stream__(requested_schema)

    def __dataframe__(self, nan_as_null: bool = False,
                      allow_copy: bool = True):
        """Dataframe-interchange-protocol export (reference:
        `py-polars/src/polars/dataframe/frame.py:1001`), served by the
        Arrow host representation."""
        return self.to_arrow().__dataframe__(
            nan_as_null=nan_as_null, allow_copy=allow_copy)

    def rows(self) -> List[tuple]:
        d = self._table.to_numpy_dict()
        names = list(d.keys())
        n = len(d[names[0]]) if names else 0
        return [tuple(_py(d[k][i]) for k in names) for i in range(n)]

    def row(self, index: int) -> tuple:
        return self.rows()[index]

    def item(self, row: Optional[int] = None, column=None):
        if row is None and column is None:
            if self.shape != (1, 1):
                raise ShapeError(f"can only call .item() on 1x1 frame, got {self.shape}")
            return self.rows()[0][0]
        cn = column if isinstance(column, str) else self.columns[column]
        return _py(self._table.to_numpy_dict()[cn][row])

    def equals(self, other: "DataFrame", null_equal: bool = True) -> bool:
        if self.columns != other.columns:
            return False
        return self.rows() == other.rows()

    def lazy(self):
        from .lazyframe import LazyFrame
        return LazyFrame._from_existing(self._table)

    # --- io ---------------------------------------------------------------
    def write_parquet(self, file, compression: str = "zstd", **kw) -> None:
        from ..io.parquet import write_parquet
        write_parquet(self, file, compression=compression, **kw)

    def write_csv(self, file=None, **kw):
        from ..io.csv import write_csv
        return write_csv(self, file, **kw)

    def write_ipc(self, file, **kw) -> None:
        from ..io.ipc import write_ipc
        write_ipc(self, file, **kw)

    def write_ndjson(self, file=None, **kw):
        from ..io.json_io import write_ndjson
        return write_ndjson(self, file, **kw)

    def write_ipc_stream(self, file, **kw) -> None:
        import pyarrow as pa
        import pyarrow.ipc as paipc
        at = self.to_arrow()
        sink = file if hasattr(file, "write") else pa.OSFile(str(file), "wb")
        with paipc.new_stream(sink, at.schema) as w:
            w.write_table(at)
        if not hasattr(file, "write"):
            sink.close()

    def write_delta(self, target, *, mode: str = "error",
                    table: str = "data") -> None:
        """Write into the versioned lakehouse store (reference:
        py-polars DataFrame.write_delta -> our `lakehouse.LakeStore`)."""
        from ..lakehouse import LakeStore
        store = LakeStore(str(target))
        if mode == "append":
            store.append(table, self)
        elif mode in ("overwrite", "error", "ignore"):
            if mode == "error" and table in store.tables():
                raise InvalidOperationError(
                    f"delta table {table!r} already exists")
            if mode == "ignore" and table in store.tables():
                return
            store.overwrite(table, self)
        else:
            raise InvalidOperationError(f"unknown write_delta mode {mode!r}")

    def write_avro(self, file, compression: str = "uncompressed",
                   **kw) -> None:
        """Write as an Avro object-container file (codecs: uncompressed/
        deflate; reference: `polars-io/src/avro/write.rs`)."""
        from ..io.avro import write_avro as _wa
        _wa(self, file, compression=compression)

    def write_excel(self, workbook=None, **kw) -> None:
        raise ModuleNotFoundError(
            "write_excel requires xlsxwriter, which is not bundled")

    def write_database(self, table_name: str, connection, **kw) -> None:
        raise ModuleNotFoundError(
            "write_database requires sqlalchemy, which is not bundled")

    def write_iceberg(self, target, **kw) -> None:
        raise ModuleNotFoundError(
            "write_iceberg requires pyiceberg, which is not bundled")

    def write_clipboard(self, **kw) -> None:
        raise OSError("no clipboard available in a headless environment")

    # --- misc parity -------------------------------------------------------
    def collect_schema(self) -> Dict[str, DataType]:
        return dict(self.schema)

    def pipe(self, function, *args, **kwargs):
        return function(self, *args, **kwargs)

    def get_column_index(self, name: str) -> int:
        if name not in self.columns:
            raise ColumnNotFoundError(name)
        return self.columns.index(name)

    def iter_columns(self):
        for n in self.columns:
            yield self.get_column(n)

    def iter_slices(self, n_rows: int = 10000):
        off = 0
        while off < self.height:
            yield self.slice(off, n_rows)
            off += n_rows

    def map_rows(self, function, return_dtype=None) -> "DataFrame":
        outs = [function(r) for r in self.iter_rows()]
        if outs and isinstance(outs[0], tuple):
            cols = {f"column_{i}": [o[i] for o in outs]
                    for i in range(len(outs[0]))}
        else:
            cols = {"map": outs}
        return DataFrame(cols)

    def map_columns(self, names, function) -> "DataFrame":
        names = [names] if isinstance(names, str) else list(names)
        out = self
        for n in names:
            s = function(out.get_column(n))
            out = out.replace_column(out.columns.index(n), s.rename(n))
        return out

    def n_chunks(self, strategy: str = "first"):
        return 1 if strategy == "first" else [1] * self.width

    def flags(self) -> Dict[str, dict]:
        return {n: {"SORTED_ASC": False, "SORTED_DESC": False}
                for n in self.columns}

    def set_sorted(self, column, *, descending: bool = False) -> "DataFrame":
        return self  # sortedness is recomputed, not trusted

    def shrink_to_fit(self, in_place: bool = False) -> "DataFrame":
        return self if in_place else self.clone()

    def remove(self, *predicates, **constraints) -> "DataFrame":
        """Drop matching rows (negated filter; py-polars `remove`)."""
        preds = [p for p in predicates]
        for k, v in constraints.items():
            preds.append(_col(k) == v)
        keep = None
        for p in preds:
            pe = p if isinstance(p, Expr) else _col(str(p))
            keep = pe if keep is None else (keep & pe)
        if keep is None:
            return self
        return self.filter(~keep.fill_null(False))

    def drop_in_place(self, name: str) -> Series:
        s = self.get_column(name)
        self._table = self.drop(name)._table
        return s

    def rows_by_key(self, key, *, named: bool = False, unique: bool = False):
        keys = [key] if isinstance(key, str) else list(key)
        out: Dict[Any, Any] = {}
        kidx = [self.columns.index(k) for k in keys]
        vidx = [i for i in range(self.width) if i not in kidx]
        vnames = [self.columns[i] for i in vidx]
        for r in self.iter_rows():
            kv = r[kidx[0]] if len(kidx) == 1 else tuple(r[i] for i in kidx)
            val = {vnames[j]: r[i] for j, i in enumerate(vidx)} if named \
                else tuple(r[i] for i in vidx)
            if unique:
                out[kv] = val
            else:
                out.setdefault(kv, []).append(val)
        return out

    def hash_rows(self, seed: int = 0) -> Series:
        from ..ops.hashing import combine_hashes
        import jax.numpy as _jnp
        acc = None
        t = C.compact(self._table)
        n = t.nrows or 0
        for nme in self.columns:
            from ..ops.hashing import hash_array
            h = hash_array(t.column(nme).data, seed)
            acc = h if acc is None else combine_hashes(acc, h)
        from ..dtypes import UInt32 as _U32
        return Series._from_column(
            "", Column(_U32, acc[:t.capacity]), n)

    def select_seq(self, *exprs, **named) -> "DataFrame":
        return self.select(*exprs, **named)

    def with_columns_seq(self, *exprs, **named) -> "DataFrame":
        return self.with_columns(*exprs, **named)

    def match_to_schema(self, schema, *, missing_columns: str = "raise",
                        extra_columns: str = "raise") -> "DataFrame":
        tgt = dict(schema)
        out = self
        extra = [n for n in out.columns if n not in tgt]
        if extra:
            if extra_columns == "ignore":
                out = out.drop(*extra)
            else:
                raise SchemaError(f"extra columns {extra}")
        exprs = []
        for n, dt in tgt.items():
            if isinstance(dt, type):
                dt = dt()
            if n in out.columns:
                exprs.append(_col(n).cast(dt) if out.schema[n] != dt
                             else _col(n))
            elif missing_columns == "insert":
                from ..expr.expr import lit as _lit
                exprs.append(_lit(None, dtype=dt).alias(n))
            else:
                raise SchemaError(f"missing column {n!r}")
        return out.select(exprs)

    def update(self, other: "DataFrame", on=None, how: str = "left",
               include_nulls: bool = False) -> "DataFrame":
        """Overwrite values with other's (non-null) values, matched by
        position or key (py-polars DataFrame.update)."""
        shared = [c for c in other.columns if c in self.columns]
        if on is None:
            left = self.with_row_index("__pt_upd")
            right = other.with_row_index("__pt_upd")
            on = "__pt_upd"
            drop_key = True
        else:
            left, right = self, other
            on = [on] if isinstance(on, str) else list(on)
            drop_key = False
        keys = [on] if isinstance(on, str) else list(on)
        upd = [c for c in shared if c not in keys]
        right = right.select([_col(k) for k in keys] +
                             [_col(c).alias(f"__pt_new_{c}") for c in upd])
        j = left.join(right, on=keys, how="left")
        exprs = []
        for c in j.columns:
            if c.startswith("__pt_new_"):
                continue
            if c in upd:
                new = _col(f"__pt_new_{c}")
                if include_nulls:
                    exprs.append(new.alias(c))
                else:
                    exprs.append(
                        _when(new.is_not_null()).then(new)
                        .otherwise(_col(c)).alias(c))
            else:
                exprs.append(_col(c))
        out = j.select(exprs)
        if drop_key:
            out = out.drop("__pt_upd")
        return out

    def sql(self, query: str, *, table_name: str = "self") -> "DataFrame":
        from ..sql.context import SQLContext
        ctx = SQLContext()
        ctx.register(table_name, self.lazy())
        return ctx.execute(query).collect()

    def show(self, n: int = 10) -> None:
        print(self.head(n))

    @property
    def style(self):
        raise ModuleNotFoundError(
            "DataFrame.style requires great_tables, which is not bundled")

    @property
    def plot(self):
        raise ModuleNotFoundError(
            "plotting requires altair, which is not bundled")

    def to_dicts(self) -> List[Dict[str, Any]]:
        return list(self.iter_rows(named=True))

    def to_dummies(self, columns=None, *, separator: str = "_",
                   drop_first: bool = False) -> "DataFrame":
        cols = [columns] if isinstance(columns, str) else \
            (list(columns) if columns is not None else list(self.columns))
        out = {}
        d = self.to_dict()
        for n in self.columns:
            if n not in cols:
                out[n] = d[n]
                continue
            vals = d[n]
            cats = sorted({v for v in vals if v is not None}, key=str)
            if drop_first:
                cats = cats[1:]
            for c in cats:
                out[f"{n}{separator}{c}"] = [
                    1 if v == c else 0 for v in vals]
        res = DataFrame(out)
        return res.cast({c: UInt8 for c in res.columns
                         if c not in self.columns})

    def to_init_repr(self, n: int = 1000) -> str:
        body = ",\n    ".join(
            f'pl.Series("{c}", {self.to_dict()[c][:n]!r}, '
            f"dtype=pl.{self.schema[c]!r})" for c in self.columns)
        return f"pl.DataFrame([\n    {body}\n])"

    def to_struct(self, name: str = "") -> Series:
        from ..expr.expr import struct as _struct
        out = self.select(_struct(*[_col(c) for c in self.columns])
                          .alias(name or "struct"))
        return out.get_column(name or "struct")

    def to_jax(self, return_type: str = "array"):
        import jax.numpy as _jnp
        if return_type == "dict":
            t = C.compact(self._table)
            n = t.nrows or 0
            return {c: t.column(c).data[:n] for c in self.columns}
        return _jnp.asarray(self.to_numpy().astype(np.float32))

    def to_torch(self, return_type: str = "tensor"):
        import torch
        if return_type == "dict":
            return {c: torch.from_numpy(
                np.ascontiguousarray(self.get_column(c).to_numpy()).copy())
                for c in self.columns}
        return torch.from_numpy(
            np.ascontiguousarray(self.to_numpy().astype(np.float32)).copy())

    def corr(self, **kw) -> "DataFrame":
        num = [c for c in self.columns if self.schema[c].is_numeric]
        d = self.to_dict()
        mat = np.corrcoef(
            np.asarray([[float(v) for v in d[c]] for c in num]))
        mat = np.atleast_2d(mat)
        return DataFrame({c: mat[i].tolist() for i, c in enumerate(num)})

    def unstack(self, *, step: int, how: str = "vertical",
                columns=None, fill_values=None) -> "DataFrame":
        cols = [columns] if isinstance(columns, str) else \
            (list(columns) if columns is not None else list(self.columns))
        d = self.to_dict()
        out = {}
        n = self.height
        n_out = -(-n // step) if how == "horizontal" else step
        for c in cols:
            vals = d[c]
            if how == "vertical":
                k = -(-n // step)
                for i in range(step):
                    chunk = vals[i * k:(i + 1) * k]
                    chunk = chunk + [fill_values] * (k - len(chunk))
                    out[f"{c}_{i}"] = chunk
            else:
                for i in range(step):
                    chunk = vals[i::step]
                    out[f"{c}_{i}"] = chunk + [fill_values] * \
                        (n_out - len(chunk))
        return DataFrame(out)

    def serialize(self, file=None, *, format: str = "binary"):
        """Self-contained snapshot as Arrow IPC bytes (the reference
        serializes frames the same way for its cloud plans)."""
        import io as _io
        buf = _io.BytesIO()
        self.write_ipc(buf)
        data = buf.getvalue()
        if file is None:
            return data
        if hasattr(file, "write"):
            file.write(data)
        else:
            with open(file, "wb") as f:
                f.write(data)

    @classmethod
    def deserialize(cls, source, *, format: str = "binary") -> "DataFrame":
        import io as _io
        from .functions import read_ipc
        if isinstance(source, (bytes, bytearray)):
            source = _io.BytesIO(source)
        return read_ipc(source)


def _py(v):
    if isinstance(v, np.generic):
        return v.item()
    return v
