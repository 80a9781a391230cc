"""Grouped window expressions: `expr.over(partition_by)`.

Capability analogue of the reference's WindowExpr
(`polars-expr/src/expressions/window.rs`): evaluate an aggregation per
partition and broadcast it back to rows, or run order-dependent ops
(shift/cum_*/rank/fill) segmented by partition. All segmented ops run on
the group-sorted layout (stable sort keeps original row order within a
partition) with boundary-reset scans — one device sort, no per-group
loops.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from .merge_sort import sort_ops as _mssort

from ..batch import Table
from ..dtypes import Boolean, Float64, UInt32
from ..errors import InvalidOperationError
from ..expr.expr import Expr
from ..expr.eval import Val, _float_dt, _stor, _type_bounds, eval_expr
from .groupby import GroupContext, build_groups, eval_group_expr


def _row_gid(gctx: GroupContext):
    """gid per ORIGINAL row position (fused-sort writeback, no gather)."""
    from .fused_sort import apply_perm_u32
    return apply_perm_u32(gctx.perm,
                          gctx.gid.astype(jnp.uint32)).astype(jnp.int32)


def _segmented_cummax(values, reset):
    """Per-segment running max; `reset` marks segment starts.
    Log-doubling over primitive rolls — associative_scan with custom
    combiners hangs the remote TPU compiler at size (see
    groupby._seg_scan_doubling)."""
    from .groupby import _seg_scan_doubling
    gid = jnp.cumsum(reset.astype(jnp.int32))
    return _seg_scan_doubling(values, gid, jnp.maximum)


def _segmented_cumsum(values, reset):
    from .groupby import _seg_scan_doubling
    gid = jnp.cumsum(reset.astype(jnp.int32))
    return _seg_scan_doubling(values, gid, jnp.add)


def _segmented_cummin(values, reset):
    from .groupby import _seg_scan_doubling
    gid = jnp.cumsum(reset.astype(jnp.int32))
    return _seg_scan_doubling(values, gid, jnp.minimum)


def eval_over(e: Expr, table: Table, ctx: str) -> Val:
    inner = e.children[0]
    n_part = e.attrs.get("n_partition", len(e.children) - 1)
    n_ord = e.attrs.get("n_order", 0)
    parts = list(e.children[1:1 + n_part])
    order_exprs = list(e.children[1 + n_part:1 + n_part + n_ord])
    key_vals = [eval_expr(p, table, ctx) for p in parts]
    cap = table.capacity
    mask = table.row_mask()
    key_vals = [Val(v.dtype,
                    v.data if v.data.shape[0] == cap
                    else jnp.broadcast_to(v.data, (cap,)),
                    None if v.validity is None else
                    (v.validity if v.validity.shape[0] == cap
                     else jnp.broadcast_to(v.validity, (cap,))),
                    v.sdict, False, v.live) for v in key_vals]
    extra_words = []
    if order_exprs:
        # order_by: within-partition ordering words appended below the
        # partition key — the stable lex sort then lays each group out in
        # order_by order (ties keep original row order), and every
        # downstream segmented op + the inv-perm writeback are unchanged.
        # Capability analogue of WindowExpr sort_by (polars-expr/src/
        # expressions/window.rs).
        from .keycode import encode_key_words
        desc = e.attrs.get("descending", False)
        nl = e.attrs.get("nulls_last", False)
        descs = list(desc) if isinstance(desc, (list, tuple)) \
            else [desc] * n_ord
        nls = list(nl) if isinstance(nl, (list, tuple)) else [nl] * n_ord
        for oe, d, nlast in zip(order_exprs, descs, nls):
            ov = eval_expr(oe, table, ctx)
            od = ov.data if ov.data.shape[0] == cap else \
                jnp.broadcast_to(ov.data, (cap,))
            oval = ov.validity
            if oval is not None and oval.shape[0] != cap:
                oval = jnp.broadcast_to(oval, (cap,))
            extra_words.extend(encode_key_words(od, oval, bool(d),
                                                bool(nlast)))
    ms = e.attrs.get("mapping_strategy", "group_to_rows")
    if ms == "group_to_rows" and not order_exprs and cap < (1 << 30) and \
            inner.kind == "window" and inner.attrs.get("op") == "rank":
        # rank().over(): the value words join the partition build sort
        # as within-group ordering words, so ranks fall out of run
        # geometry — no second (gid, value) sort, no separate x permute
        # (h2o q8: the old pipeline cost 4 fused sorts after the build)
        from .keycode import encode_key_words as _ekw
        v_in = eval_expr(inner.children[0], table, ctx)
        x_full = (v_in.data if v_in.data.shape[0] == cap
                  else jnp.broadcast_to(v_in.data, (cap,)))
        xval = None
        if v_in.validity is not None:
            xval = (v_in.validity if v_in.validity.shape[0] == cap
                    else jnp.broadcast_to(v_in.validity, (cap,)))
        vw = _ekw(x_full, xval, bool(inner.attrs.get("descending", False)),
                  True)
        if len(vw) <= 2 and x_full.ndim == 1:
            gctx_r = build_groups(key_vals, mask, vw)
            return _rank_over_fused(inner, v_in, gctx_r, xval is not None)

    gctx = build_groups(key_vals, mask, extra_words)

    if ms == "join":
        gid_row = _row_gid(gctx)
        return _eval_over_join(inner, table, gctx, gid_row, cap)
    if ms == "explode":
        return _eval_over_explode(inner, table, ctx, gctx)
    if ms != "group_to_rows":
        raise InvalidOperationError(
            f"unknown mapping_strategy {ms!r}; expected 'group_to_rows', "
            "'join' or 'explode'")

    if inner.kind in ("agg", "table_len") or _is_agg_combo(inner):
        gid_row = _row_gid(gctx)
        gv = eval_group_expr(inner, table, gctx, [], {})
        gdata = gv.data if gv.data.shape[0] == cap else \
            jnp.broadcast_to(gv.data, (cap,))
        gidc = jnp.clip(gid_row, 0, cap - 1)
        data = gdata[gidc]
        validity = None
        if gv.validity is not None:
            gval = gv.validity if gv.validity.shape[0] == cap else \
                jnp.broadcast_to(gv.validity, (cap,))
            validity = gval[gidc]
        return Val(gv.dtype, data, validity, gv.sdict, False)

    if inner.kind == "window":
        return _eval_window_over(inner, table, ctx, gctx)

    raise InvalidOperationError(
        f"expression kind {inner.kind!r} not supported with .over()")


def _val_as_col(v: Val):
    """Structural Column view of a (possibly nested) Val for row gathers."""
    from ..batch import Column
    return Column(v.dtype, v.data, v.validity, v.sdict,
                  lengths=getattr(v, "lengths", None),
                  elem_valid=getattr(v, "elem_valid", None),
                  fields={k: _val_as_col(f) for k, f in v.fields.items()}
                  if getattr(v, "fields", None) is not None else None)


def _col_as_val(c) -> Val:
    return Val(c.dtype, c.data, c.validity, c.sdict, False,
               lengths=c.lengths, elem_valid=c.elem_valid, fields=c.fields)


def _eval_over_join(inner: Expr, table: Table, gctx: GroupContext,
                    gid_row, cap: int) -> Val:
    """mapping_strategy='join': the group-level result series is imploded
    to one List per group and joined back to every row of the group
    (reference: WindowMapping::Join, `polars-expr/src/expressions/
    window.rs`)."""
    from ..dtypes import List as ListT
    if inner.kind in ("agg", "table_len") or _is_agg_combo(inner):
        gv = eval_group_expr(inner, table, gctx, [], {})
    else:
        gv = eval_group_expr(Expr("agg", (inner,), agg="implode"),
                             table, gctx, [], {})
    gidc = jnp.clip(gid_row, 0, gctx.out_cap - 1)
    if getattr(gv, "lengths", None) is None and \
            getattr(gv, "fields", None) is None:
        # scalar aggregate per group -> 1-element list rows
        gdata = gv.data if gv.data.shape[0] == gctx.out_cap else \
            jnp.broadcast_to(gv.data, (gctx.out_cap,))
        data = gdata[gidc][:, None]
        ev = None
        if gv.validity is not None:
            ev = gv.validity[gidc][:, None]
        return Val(ListT(gv.dtype), data, None, gv.sdict, False,
                   lengths=jnp.ones(cap, jnp.int32), elem_valid=ev)
    taken = _val_as_col(gv).take(gidc)
    return _col_as_val(taken)


def _eval_over_explode(inner: Expr, table: Table, ctx: str,
                       gctx: GroupContext) -> Val:
    """mapping_strategy='explode': group results flattened in group order
    (groups are key-sorted here). Only valid where the engine accepts
    length-changing expressions (select context)."""
    if ctx != "select":
        raise InvalidOperationError(
            "mapping_strategy='explode' only works in a select context "
            "(the output length differs from the frame height)")
    if inner.kind in ("agg", "table_len") or _is_agg_combo(inner):
        gv = eval_group_expr(inner, table, gctx, [], {})
        live = gctx.group_count > 0
        return Val(gv.dtype, gv.data, gv.validity, gv.sdict, False,
                   live=live)
    v = eval_expr(inner, table, ctx)
    cap = table.capacity
    x = (v.data if v.data.shape[0] == cap
         else jnp.broadcast_to(v.data, (cap,)))[gctx.perm]
    validity = None
    if v.validity is not None:
        vv = v.validity if v.validity.shape[0] == cap else \
            jnp.broadcast_to(v.validity, (cap,))
        validity = vv[gctx.perm]
    return Val(v.dtype, x, validity, v.sdict, False,
               live=gctx.live_sorted)


def _is_agg_combo(e: Expr) -> bool:
    """elementwise combination of aggregates (e.g. x.sum()+1)."""
    if e.kind in ("agg", "table_len"):
        return True
    if e.kind in ("binary", "unary", "cast", "alias"):
        ok = False
        for c in e.children:
            if c.kind == "lit":
                continue
            if not _is_agg_combo(c):
                return False
            ok = True
        return ok
    return False


def _eval_window_over(e: Expr, table: Table, ctx: str,
                      gctx: GroupContext) -> Val:
    op = e.attrs["op"]
    v = eval_expr(e.children[0], table, ctx)
    fillv = eval_expr(e.children[1], table, ctx)
    cap = table.capacity
    from ..batch import storage_numpy_dtype as _snd2
    from .fused_sort import apply_perm_u32, fused_argsort
    from .keycode import col_from_u32_words, col_to_u32_words
    fused_perm = cap < (1 << 31)

    def _permute(words_src, perm_w):
        """Apply a permutation to u32 words via fused-sort writebacks
        (no XLA gathers: ~7 ns/element vs one fused sort per word)."""
        return [apply_perm_u32(perm_w, w) for w in words_src]

    x_full = (v.data if v.data.shape[0] == cap
              else jnp.broadcast_to(v.data, (cap,)))
    xv_full = (v.valid_or_true() if v.validity is not None
               else jnp.ones(cap, jnp.bool_))
    xv_full = (xv_full if xv_full.shape[0] == cap
               else jnp.broadcast_to(xv_full, (cap,)))
    if fused_perm:
        # inv = argsort(perm); xs[i] = x[perm[i]] = writeback along inv
        _, inv = fused_argsort(gctx.perm.astype(jnp.uint32))
        xw = col_to_u32_words(x_full)
        sw = _permute(xw + [xv_full.astype(jnp.uint32)], inv)
        x = col_from_u32_words(sw[:len(xw)], jnp.dtype(x_full.dtype))
        xv = (sw[-1] != 0) & gctx.live_sorted
    else:
        inv = jnp.argsort(gctx.perm, stable=True)
        x = x_full[gctx.perm]
        xv = xv_full[gctx.perm] & gctx.live_sorted
    idx = jnp.arange(cap)
    # group start per sorted row: a running max of boundary positions —
    # no ncap-sized gather
    gstart = jax.lax.cummax(
        jnp.where(gctx.newgrp, idx.astype(jnp.int32), 0))
    reset = gctx.newgrp

    def _gcount_row():
        """Run length per sorted row (scan, not an ncap gather). A run
        ends before the next group start OR the dead tail."""
        nxt = gctx.newgrp | ~gctx.live_sorted
        is_last = jnp.roll(nxt, -1).at[-1].set(True)
        glast = jax.lax.cummin(
            jnp.where(is_last, idx.astype(jnp.int32), cap), reverse=True)
        return glast - gstart + 1

    def back(data, validity, out_dt=None, sdict=None):
        out_dt = out_dt or v.dtype
        if fused_perm and data.dtype.itemsize <= 4:
            dw = col_to_u32_words(data)
            vw = [] if validity is None else [validity.astype(jnp.uint32)]
            ow = _permute(dw + vw, gctx.perm)
            data_o = col_from_u32_words(ow[:len(dw)], jnp.dtype(data.dtype))
            val_o = (ow[-1] != 0) if validity is not None else None
            return Val(out_dt, data_o, val_o,
                       sdict if sdict is not None else v.sdict, False,
                       v.live)
        return Val(out_dt, data[inv],
                   validity[inv] if validity is not None else None,
                   sdict if sdict is not None else v.sdict, False, v.live)

    if op == "shift" or op == "diff" or op == "pct_change":
        n = e.attrs.get("n", 1)
        src = idx - n
        inb = (src >= gstart) & (src >= 0) & (src < cap) & gctx.live_sorted
        # shifting backward (n<0): stay within group end
        if n < 0:
            gcount = _gcount_row()
            inb = (src < gstart + gcount) & (src >= 0) & gctx.live_sorted
        srcc = jnp.clip(src, 0, cap - 1)
        prev = x[srcc]
        pvalid = inb & xv[srcc]
        if op == "shift":
            data, validity = prev, pvalid
            if repr(fillv.dtype) != "Null":
                from ..expr.eval import cast_val
                fv = cast_val(fillv, v.dtype)
                data = jnp.where(inb, prev, jnp.broadcast_to(fv.data, (cap,)))
                validity = jnp.where(inb, pvalid, True)
            return back(data, validity)
        validity = pvalid & xv
        if op == "diff":
            return back(x - prev, validity)
        out_dt = _float_dt(v.dtype)
        f = x.astype(_stor(out_dt))
        return back(f / prev.astype(_stor(out_dt)) - 1.0, validity, out_dt)

    if op in ("cum_sum", "cum_min", "cum_max", "cum_count", "cum_prod"):
        if op == "cum_count":
            data = _segmented_cumsum(xv.astype(jnp.uint32), reset)
            return back(data, None, UInt32)
        if op == "cum_sum":
            data = _segmented_cumsum(jnp.where(xv, x, 0), reset)
        elif op == "cum_prod":
            from .groupby import _seg_scan_doubling
            gidr = jnp.cumsum(reset.astype(jnp.int32))
            data = _seg_scan_doubling(jnp.where(xv, x, 1), gidr,
                                      jnp.multiply)
        else:
            lo, hi = _type_bounds(x.dtype)
            ident = hi if op == "cum_min" else lo
            fn = _segmented_cummin if op == "cum_min" else _segmented_cummax
            data = fn(jnp.where(xv, x, ident), reset)
        validity = (v.valid_or_true()[gctx.perm]) if v.validity is not None \
            else None
        return back(data.astype(x.dtype), validity)

    if op == "rank":
        return _rank_over(e, v, x, xv, gctx, back)

    if op in ("forward_fill", "backward_fill"):
        fwd = op == "forward_fill"
        if fwd:
            last = _segmented_cummax(jnp.where(xv, idx, -1), reset)
            has = last >= 0
            data = x[jnp.clip(last, 0, cap - 1)]
            return back(data, has & gctx.live_sorted)
        # backward: reverse the sorted layout per group == reverse whole
        # array with reversed reset marks (group ends become starts)
        rx, rxv = x[::-1], xv[::-1]
        rreset = jnp.roll(reset, -1)[::-1]
        rlast = _segmented_cummax(jnp.where(rxv, idx, -1), rreset)
        has = rlast >= 0
        data = rx[jnp.clip(rlast, 0, cap - 1)]
        return back(data[::-1], (has & gctx.live_sorted[::-1])[::-1])

    if op in ("rolling_sum", "rolling_mean", "rolling_min", "rolling_max",
              "rolling_std", "rolling_var"):
        # group-clamped trailing windows: lo = max(i-w+1, group_start)
        # resolved with prefix sums / sparse-table range queries
        from .range_agg import build_sparse, prefix_range_sum, range_query
        w = int(e.attrs["window_size"])
        min_p = e.attrs.get("min_samples") or w
        lo = jnp.maximum(idx - w + 1, gstart)
        hi = idx + 1
        cnt = prefix_range_sum(xv.astype(jnp.int32), lo, hi)
        validity = (cnt >= min_p) & gctx.live_sorted
        dt = v.dtype
        if op in ("rolling_min", "rolling_max"):
            lo_b, hi_b = _type_bounds(x.dtype)
            knd = "min" if op == "rolling_min" else "max"
            pad = hi_b if knd == "min" else lo_b
            levels = build_sparse(jnp.where(xv, x, pad), knd)
            return back(range_query(levels, lo, hi, knd, pad), validity)
        acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        s = prefix_range_sum(jnp.where(xv, x, 0).astype(acc), lo, hi)
        if op == "rolling_sum":
            return back(s.astype(x.dtype), validity)
        out_dt = _float_dt(dt)
        n = jnp.maximum(cnt, 1)
        if op == "rolling_mean":
            return back((s / n).astype(_stor(out_dt)), validity, out_dt)
        s2 = prefix_range_sum(jnp.where(xv, x.astype(acc) ** 2, 0), lo, hi)
        ddof = e.attrs.get("ddof", 1)
        var = jnp.maximum((s2 - s * s / n) / jnp.maximum(n - ddof, 1), 0)
        validity = validity & (cnt > ddof)
        if op == "rolling_var":
            return back(var.astype(_stor(out_dt)), validity, out_dt)
        return back(jnp.sqrt(var).astype(_stor(out_dt)), validity, out_dt)

    if op == "ewm_mean":
        # segment-reset decayed scan (same recurrence as the global ewm,
        # with group boundaries as resets)
        alpha = float(e.attrs["alpha"])
        min_p = e.attrs.get("min_samples", 1)
        out_dt = _float_dt(v.dtype)
        stor = _stor(out_dt)
        f = x.astype(stor)
        decay = jnp.where(xv, 1.0 - alpha, 1.0).astype(stor)
        bn = jnp.where(xv, f, 0.0)
        bd = jnp.where(xv, jnp.ones_like(f), 0.0)

        from .groupby import _seg_scan_doubling_multi
        gidr = jnp.cumsum(reset.astype(jnp.int32))

        def comb(prev, cur):
            (Aa, Na, Da), (Ab, Nb, Db) = prev, cur
            return (Aa * Ab, Na * Ab + Nb, Da * Ab + Db)

        _, N, D = _seg_scan_doubling_multi([decay, bn, bd], gidr, comb)
        data = N / jnp.maximum(D, 1e-30)
        cnt = _segmented_cumsum(xv.astype(jnp.int32), reset)
        validity = xv & (cnt >= min_p)
        return back(data, validity, out_dt)

    if op == "reverse":
        gcount = _gcount_row()
        src = jnp.clip(gstart + (gcount - 1) - (idx - gstart), 0, cap - 1)
        return back(x[src], xv[src])

    if op in ("rolling_sum_by", "rolling_mean_by", "rolling_min_by",
              "rolling_max_by", "rolling_std_by", "rolling_var_by",
              "rolling_quantile_by", "rolling_rank_by"):
        # per-group range windows: segmented binary search for the
        # value-based bounds, then the shared range reducers
        from ..expr.eval import _range_window_reduce, _rolling_by_bounds
        byv = eval_expr(e.children[2], table, ctx)
        b = (byv.data if byv.data.shape[0] == cap
             else jnp.broadcast_to(byv.data, (cap,)))[gctx.perm]
        gcount = _gcount_row()
        gend = gstart + gcount
        # dead rows get an empty segment so their windows resolve empty
        gs = jnp.where(gctx.live_sorted, gstart, idx)
        ge = jnp.where(gctx.live_sorted, gend, idx)
        lo, hi = _rolling_by_bounds(e, b, byv.dtype, gctx.live_sorted,
                                    gs, ge)
        return _range_window_reduce(e, v, x, xv, back, lo, hi, idx,
                                    gctx.live_sorted)

    raise InvalidOperationError(f"window op {op!r} not supported with .over()")


def _rank_over_fused(e: Expr, v: Val, gctx: GroupContext,
                     has_nulls: bool) -> Val:
    """rank().over(partition) on a build sort that already ordered rows
    by (partition, value): ranks fall out of run geometry with NO
    second sort, and the integer rank + validity bit write back as ONE
    packed u32 word (one fused-sort writeback instead of three). The
    caller passed the rank value's order-encoded words (nulls last) as
    build_groups extra_words; their sorted forms sit in
    gctx.sorted_extra. Stable build sort == original-row ordinal
    tiebreak, same as the two-sort formulation (_rank_over)."""
    from .fused_sort import apply_perm_u32
    from ..batch import storage_numpy_dtype as _snd3
    method = e.attrs.get("method", "average")
    cap = gctx.cap
    sw = list(gctx.sorted_extra)
    live = gctx.live_sorted
    # nulls carry a leading 0/1/2 null word (keycode.encode_key_words):
    # 1 == valid, so the sorted validity is free — no xv permute
    xv_sorted = ((sw[0] == 1) & live) if has_nulls else live
    idx = jnp.arange(cap, dtype=jnp.int32)
    g_new = gctx.newgrp
    new_val = g_new | (idx == 0)
    for w in sw:
        new_val = new_val | (w != jnp.roll(w, 1))
    base = jax.lax.cummax(jnp.where(g_new, idx, -1))
    pos = idx - base
    tie_start = jax.lax.cummax(jnp.where(new_val, idx, -1)) - base
    stoppos = jnp.where(new_val, idx, cap).astype(jnp.int32)
    sufmin = jax.lax.cummin(stoppos[::-1])[::-1]
    next_stop = jnp.concatenate([sufmin[1:], jnp.array([cap], jnp.int32)])
    tie_end = next_stop - 1 - base
    if method == "ordinal":
        ri = pos + 1
    elif method == "min":
        ri = tie_start + 1
    elif method == "max":
        ri = tie_end + 1
    elif method == "dense":
        cnv = jnp.cumsum(new_val.astype(jnp.int32))
        cnv0 = jax.lax.cummax(jnp.where(g_new, cnv, 0))
        ri = cnv - cnv0 + 1
    else:  # average: transport 2*rank = tie_start + tie_end + 2
        ri = tie_start + tie_end + 2
    packed = (ri.astype(jnp.uint32) << jnp.uint32(1)) | \
        xv_sorted.astype(jnp.uint32)
    ow = apply_perm_u32(gctx.perm, packed)
    valid_o = (ow & jnp.uint32(1)) != 0
    ri_o = ow >> jnp.uint32(1)
    if method == "average":
        fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        data = (ri_o.astype(fdt) / 2).astype(
            jnp.dtype(_snd3(Float64)))
        return Val(Float64, data, valid_o, v.sdict, False, v.live)
    return Val(UInt32, ri_o, valid_o, v.sdict, False, v.live)


def _rank_over(e: Expr, v: Val, x, xv, gctx: GroupContext, back):
    method = e.attrs.get("method", "average")
    desc = e.attrs.get("descending", False)
    cap = x.shape[0]
    from .keycode import encode_key_words
    from .keycode import lex_sort_indices
    from .fused_sort import _pack2, _unpack2, apply_perm_u32
    gkey = jnp.where(xv, gctx.gid, cap).astype(jnp.uint32)
    vw = encode_key_words(x, None, desc, False)
    idx32 = jnp.arange(cap, dtype=jnp.int32)
    if len(vw) == 1 and cap < (1 << 31):
        # 4-byte values: (gid, value) fused into ONE u64 operand, the
        # row position as a second key word (deterministic ordinal
        # tiebreak == original order within the group-sorted layout)
        ws, perm2 = jax.lax.sort((_pack2(gkey, vw[0]), idx32),
                                 num_keys=2, is_stable=False)
        shi, slo = _unpack2(ws)
        skeys = [shi, slo]
        sgid = shi.astype(jnp.int32)
    else:
        skeys, tails, perm2 = lex_sort_indices([gkey] + vw, (idx32,))
        sgid = skeys[0].astype(jnp.int32)
    idx = jnp.arange(cap)
    # group starts in the second sort
    g_new = (idx == 0) | (sgid != jnp.roll(sgid, 1))
    # tie starts: value OR group changes (g_new ⊆ new_val), so plain global
    # scans respect group boundaries automatically
    new_val = g_new
    for w in skeys[1:]:
        new_val = new_val | (w != jnp.roll(w, 1))
    base = jax.lax.cummax(jnp.where(g_new, idx, -1))
    pos = idx - base  # 0-based position within group
    tie_start = jax.lax.cummax(jnp.where(new_val, idx, -1)) - base
    # next tie start (suffix min of stop positions) -> tie end
    stoppos = jnp.where(new_val, idx, cap).astype(jnp.int32)
    sufmin = jax.lax.cummin(stoppos[::-1])[::-1]
    next_stop = jnp.concatenate([sufmin[1:], jnp.array([cap], jnp.int32)])
    tie_end = next_stop - 1 - base
    cnv = jnp.cumsum(new_val.astype(jnp.int32))
    # cnv at the group start, broadcast per row by a running max (the
    # old cnv[base] gather costs ~7 ns/element on TPU)
    cnv0 = jax.lax.cummax(jnp.where(g_new, cnv, 0))
    dense = cnv - cnv0 + 1
    fdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # integer rank transport (exact); the float form is computed AFTER
    # the writeback so the cargo stays one u32 word
    if method == "ordinal":
        ri = pos + 1
    elif method == "min":
        ri = tie_start + 1
    elif method == "max":
        ri = tie_end + 1
    elif method == "dense":
        ri = dense
    else:  # average: transport 2*rank = tie_start + tie_end + 2
        ri = tie_start + tie_end + 2
    # writeback via fused sort (TPU scatters serialize at table size)
    out_int = apply_perm_u32(perm2, ri.astype(jnp.uint32))
    out_dt = Float64 if method == "average" else UInt32
    if method == "average":
        data = out_int.astype(fdt) / 2
        data = data.astype(_stor(out_dt))
    else:
        data = out_int.astype(_stor(out_dt))
    return back(data, xv, out_dt)
