"""Fused segment compilation: whole plan chains as ONE jitted XLA program.

The performance analogue of the reference's per-operator Rust kernels +
morsel pipeline: instead of eager per-op dispatch (one XLA launch per
jnp call), a chain of plan nodes (filter/select/with_columns, optionally
terminated by a group_by or sort breaker) traces into a single
`jax.jit`-compiled function over the table's flat arrays. XLA then fuses
elementwise work into the sort/segment kernels — the fusion the
reference gets from hand-written kernels, we get from the compiler.

Compile cache key = (plan-chain fingerprint, input schema incl. string
dictionary versions, capacity bucket); string dictionaries and other
host-side metadata are captured at trace time and replayed on cache hits.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..batch import Column, Table
from ..config import CONFIG
from ..errors import ComputeError
from ..expr import meta
from ..plan import logical as L

_CACHE: Dict[tuple, tuple] = {}
FUSABLE = ("filter", "select", "with_columns")
BREAKERS = ("group_by", "sort")


def plan_chain_fingerprint(nodes: List[L.Plan]) -> str:
    parts = []
    for n in nodes:
        if n.kind == "filter":
            parts.append(f"F({n.predicate.fingerprint()})")
        elif n.kind in ("select", "with_columns"):
            parts.append(f"{n.kind}({';'.join(e.fingerprint() for e in n.exprs)})")
        elif n.kind == "group_by":
            parts.append(
                f"G({';'.join(e.fingerprint() for e in n.keys)}|"
                f"{';'.join(e.fingerprint() for e in n.aggs)}|{n.maintain_order})")
        elif n.kind == "sort":
            parts.append(
                f"S({';'.join(e.fingerprint() for e in n.by)}|"
                f"{n.descending}|{n.nulls_last}|{n.maintain_order}|"
                f"{n.slice_})")
        else:
            raise ComputeError(f"unfusable node {n.kind}")
    return "→".join(parts)


def _table_key(t: Table) -> tuple:
    items = []
    for n in t.names:
        c = t.cols[n]
        st = None
        if c.stats is not None:
            st = (c.stats.get("min"), c.stats.get("max"))
        items.append((n, repr(c.dtype), c.validity is not None,
                      c.sdict.version if c.sdict is not None else 0, st))
    # live-state shape is part of the key: masked / compact / deferred
    # inputs flatten to different pytrees, and the cached output metadata
    # must match the trace that produced it
    live_kind = ("masked" if t.valid is not None else
                 "deferred" if t._nrows is None and t.nrows_dev is not None
                 else "compact")
    return (tuple(items), t.capacity, live_kind)


def _ensure_groupby_stats(nodes: List[L.Plan], table: Table) -> None:
    """Host pre-pass: cache bucketed min/max on integer key columns so the
    traced group-by can take the dense O(n) path. One device sync per
    column, amortized across calls (stats live on the Column object)."""
    import jax.numpy as jnp
    redefined = set()
    for node in nodes:
        if node.kind in ("select", "with_columns"):
            try:
                for e in node.exprs:
                    # a bare col passes through unchanged — stats stay valid
                    if e.kind == "col":
                        continue
                    redefined.add(meta.output_name(e))
            except Exception:
                pass
        if node.kind != "group_by":
            continue
        for ke in node.keys:
            e = ke
            while e.kind == "alias":
                e = e.children[0]
            if e.kind != "col":
                continue
            name = e.attrs["name"]
            if name in redefined or name not in table.cols:
                continue
            c = table.cols[name]
            if not c.dtype.is_integer or c.stats is not None:
                continue
            mask = table.row_mask()
            if c.validity is not None:
                mask = mask & c.validity
            big = jnp.iinfo(c.data.dtype).max
            small = jnp.iinfo(c.data.dtype).min
            # pack (min, max) into ONE readback — a device->host round
            # trip costs ~24ms through the remote tunnel
            packed = jnp.stack(
                [jnp.min(jnp.where(mask, c.data, big)).astype(jnp.int64),
                 jnp.max(jnp.where(mask, c.data, small)).astype(jnp.int64)])
            import numpy as _np
            mn, mx = (int(x) for x in _np.asarray(packed))
            if mx < mn:
                mn, mx = 0, 0
            # bucket bounds so stats stay stable across similar batches
            # (B=16: a 100-value key inflates to span 113, not 1025 —
            # the old B=1024 ballooned 2-key dense domains 100x)
            B = 16
            c.stats = {"min": (mn // B) * B, "max": ((mx // B) + 1) * B - 1}


def _apply_node(node: L.Plan, table: Table) -> Table:
    from ..api.frame import DataFrame
    k = node.kind
    if k == "filter":
        return DataFrame._from_table(table).filter(node.predicate)._table
    if k == "select":
        return DataFrame._from_table(table).select(node.exprs)._table
    if k == "with_columns":
        return DataFrame._from_table(table).with_columns(node.exprs)._table
    if k == "group_by":
        from ..ops.groupby import group_by_agg
        ins = dict(table.schema)
        keys = meta.expand_exprs(node.keys, ins)
        aggs = meta.expand_exprs(node.aggs, ins)
        return group_by_agg(table, keys, aggs, node.maintain_order)
    if k == "sort":
        from ..expr.eval import eval_expr
        from ..ops.sort import sort_table
        vals = [eval_expr(b, table, "select") for b in node.by]
        return sort_table(table, vals, node.descending, node.nulls_last,
                          node.maintain_order)
    raise ComputeError(k)


def run_fused(nodes: List[L.Plan], table: Table) -> Table:
    """Execute a fusable chain as one compiled program. Chains whose
    evaluation needs host values (e.g. cast-to-String builds a dictionary
    from data) fail the trace once, are marked no-fuse, and run eagerly."""
    _ensure_groupby_stats(nodes, table)
    key = (plan_chain_fingerprint(nodes), _table_key(table))
    hit = _CACHE.get(key)

    if hit == ("nofuse",):
        t = table
        for node in nodes:
            t = _apply_node(node, t)
        return t

    in_flat, in_meta = _flatten_table(table)

    if hit is None:
        out_meta_cell: list = [None]

        def fn(flat):
            t = _unflatten_table(flat, in_meta)
            for node in nodes:
                t = _apply_node(node, t)
            out_flat, out_meta = _flatten_table(t)
            out_meta_cell[0] = out_meta
            return out_flat

        jitted = jax.jit(fn)
        try:
            out_flat = jitted(in_flat)  # traces now; captures out metadata
        except Exception:
            # host-dependent op inside the chain: permanently run eagerly
            _CACHE[key] = ("nofuse",)
            t = table
            for node in nodes:
                t = _apply_node(node, t)
            return t
        out_meta = out_meta_cell[0]
        _CACHE[key] = (jitted, out_meta)
        if len(_CACHE) > 512:
            _CACHE.pop(next(iter(_CACHE)))
        return _unflatten_table(out_flat, out_meta)

    jitted, out_meta = hit
    out_flat = jitted(in_flat)
    return _unflatten_table(out_flat, out_meta)


def _flatten_table(t: Table):
    """(flat arrays dict, metadata). Metadata carries everything that is
    NOT a device array."""
    flat = {}
    colmeta = []
    for n in t.names:
        c = t.cols[n]
        if c.fields is not None:
            # struct: flatten child columns under a prefixed key space
            fmeta = []
            for fn, f in c.fields.items():
                flat[f"d:{n}.{fn}"] = f.data
                if f.validity is not None:
                    flat[f"v:{n}.{fn}"] = f.validity
                if f.lengths is not None:
                    flat[f"l:{n}.{fn}"] = f.lengths
                if f.elem_valid is not None:
                    flat[f"e:{n}.{fn}"] = f.elem_valid
                fmeta.append((fn, f.dtype, f.validity is not None, f.sdict,
                              f.lengths is not None,
                              f.elem_valid is not None))
            if c.validity is not None:
                flat[f"v:{n}"] = c.validity
            colmeta.append((n, c.dtype, c.validity is not None, c.sdict,
                            c.stats, False, False, tuple(fmeta)))
            continue
        flat[f"d:{n}"] = c.data
        if c.validity is not None:
            flat[f"v:{n}"] = c.validity
        if c.lengths is not None:
            flat[f"l:{n}"] = c.lengths
        if c.elem_valid is not None:
            flat[f"e:{n}"] = c.elem_valid
        colmeta.append((n, c.dtype, c.validity is not None, c.sdict, c.stats,
                        c.lengths is not None, c.elem_valid is not None,
                        None))
    if t.valid is not None:
        flat["__valid"] = t.valid
    if t.valid is None and t._nrows is None and t.nrows_dev is not None:
        flat["__nrows_dev"] = t.nrows_dev
    metadata = (tuple(colmeta), t.capacity, t._nrows, t.valid is not None)
    return flat, metadata


def _unflatten_table(flat, metadata) -> Table:
    colmeta, capacity, nrows, has_valid = metadata
    names = []
    cols = {}
    for (n, dt, has_v, sdict, stats, has_l, has_e, fmeta) in colmeta:
        names.append(n)
        if fmeta is not None:
            fields = {}
            for (fn, fdt, f_v, f_sd, f_l, f_e) in fmeta:
                fields[fn] = Column(
                    fdt, flat[f"d:{n}.{fn}"],
                    flat.get(f"v:{n}.{fn}") if f_v else None, f_sd,
                    lengths=flat.get(f"l:{n}.{fn}") if f_l else None,
                    elem_valid=flat.get(f"e:{n}.{fn}") if f_e else None)
            cols[n] = Column(dt, None, flat.get(f"v:{n}") if has_v else None,
                             fields=fields)
            continue
        cols[n] = Column(dt, flat[f"d:{n}"],
                         flat.get(f"v:{n}") if has_v else None, sdict, stats,
                         lengths=flat.get(f"l:{n}") if has_l else None,
                         elem_valid=flat.get(f"e:{n}") if has_e else None)
    valid = flat.get("__valid") if has_valid else None
    return Table(names, cols, capacity, nrows, valid,
                 nrows_dev=flat.get("__nrows_dev"))


def collect_fusable_chain(plan: L.Plan) -> Tuple[List[L.Plan], L.Plan]:
    """Walk down from `plan` gathering a fusable suffix ending at the
    chain's input. Returns (nodes bottom-up order, input plan)."""
    chain: List[L.Plan] = []
    cur = plan
    if cur.kind == "group_by" or (
            cur.kind == "sort" and cur.slice_ is None):
        # sort with a fused top-k slice needs the host-synced compact path
        chain.append(cur)
        cur = cur.input
    while cur.kind in FUSABLE:
        chain.append(cur)
        cur = cur.input
    chain.reverse()
    return chain, cur
