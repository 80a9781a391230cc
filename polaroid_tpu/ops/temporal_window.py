"""Temporal windows: group_by_dynamic and rolling aggregation.

Capability analogue of `crates/polars-time/src/group_by/` (dynamic and
rolling window group-bys): dynamic windows truncate the index into
buckets and reuse the segment group-by; rolling windows resolve each
row's [t-period, t] range with vectorized segmented binary search and
answer aggregates with prefix sums / sparse-table range queries
(`range_agg.py`) — no per-window loops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column, Table, storage_numpy_dtype
from ..config import capacity_for as capacity_for_rows
from ..dtypes import (Boolean, Date, Datetime, Duration, Float64, Int64,
                      UInt32)
from ..errors import ComputeError, InvalidOperationError
from ..expr import meta
from ..expr.expr import Expr, col as _col
from ..expr.eval import Val, _acc_dtype, _float_dt, _type_bounds, eval_expr
from . import compact as C
from . import temporal as T
from .groupby import build_groups, group_by_agg
from .range_agg import (build_sparse, prefix_range_sum, range_query,
                        segmented_searchsorted)

__all__ = ["bucket_expr", "dynamic_group_by", "rolling_agg"]


def bucket_expr(index_column: str, index_dtype, every: str,
                offset: Optional[str] = None) -> Expr:
    """Expression computing each row's window start."""
    e = _col(index_column)
    kind, n = T.parse_every(every)
    if repr(index_dtype).startswith(("Datetime", "Date")):
        if offset:
            okind, om = T.parse_every(offset)
            if okind == "fixed" and om:
                unit = index_dtype.time_unit if isinstance(index_dtype, Datetime) else None
                if unit:
                    scale = om // (1_000_000_000 // T.UNIT_PER_SECOND[unit])
                    e = e - Expr("lit", value=int(scale), dtype=None)
                else:
                    e = e - Expr("lit", value=int(om // 86_400_000_000_000),
                                 dtype=None)
        out = Expr("dt", (e,), op="truncate", every=every)
        if offset:
            okind, om = T.parse_every(offset)
            if okind == "fixed" and om:
                unit = index_dtype.time_unit if isinstance(index_dtype, Datetime) else None
                if unit:
                    scale = om // (1_000_000_000 // T.UNIT_PER_SECOND[unit])
                    out = out + Expr("lit", value=int(scale), dtype=None)
                else:
                    out = out + Expr("lit", value=int(om // 86_400_000_000_000),
                                     dtype=None)
        return out
    # integer index: every like "2i"
    if kind != "fixed":
        raise InvalidOperationError("month buckets need a temporal index")
    step = n  # 'i' suffix => raw count
    off = 0
    if offset:
        _, off = T.parse_every(offset)
    return ((e - off) // step) * step + off


def _add_months_units(vals, delta_months, dt):
    """Add months to index-unit values (Datetime epochs or Date days) via
    the civil calendar; days saturate at month end (polars semantics)."""
    if isinstance(dt, Datetime):
        per_day = T.UNIT_PER_SECOND[dt.time_unit] * 86_400
        days = T.epoch_to_days(vals, dt.time_unit)
        rem = vals - days.astype(vals.dtype) * per_day
    else:
        days, rem, per_day = vals, 0, None
    y, m, d = T.days_to_civil(days)
    total = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1) \
        + delta_months
    ny = jnp.floor_divide(total, 12).astype(jnp.int32)
    nm = (total - ny.astype(jnp.int64) * 12 + 1).astype(jnp.int32)
    # saturate the day-of-month (Jan 31 + 1mo -> Feb 28/29)
    m_next = jnp.where(nm == 12, 1, nm + 1)
    y_next = jnp.where(nm == 12, ny + 1, ny)
    month_len = T.civil_to_days(y_next, m_next, jnp.ones_like(nm)) - \
        T.civil_to_days(ny, nm, jnp.ones_like(nm))
    nd = jnp.minimum(d, month_len).astype(jnp.int32)
    out_days = T.civil_to_days(ny, nm, nd)
    if isinstance(dt, Datetime):
        return out_days.astype(vals.dtype) * per_day + rem
    return out_days.astype(vals.dtype)


def _span_units(dt, ns: int, what: str) -> int:
    """Duration in index units (epoch counts for temporal, raw for int)."""
    if isinstance(dt, Datetime):
        return ns // (1_000_000_000 // T.UNIT_PER_SECOND[dt.time_unit])
    if dt == Date:
        d = ns // 86_400_000_000_000
        if d == 0:
            raise InvalidOperationError(
                f"{what} shorter than 1d on a Date index")
        return d
    return ns  # integer index: 'i' counts parse as raw units


def dynamic_group_by(table: Table, index_column: str, every: str,
                     period: Optional[str], offset: Optional[str],
                     closed: str, group_by: Sequence[Expr],
                     aggs: Sequence[Expr], start_by: str = "window") -> Table:
    dt = table.column(index_column).dtype
    if (period is None or period == every) and closed == "left":
        # non-overlapping windows: truncate is the whole assignment
        b = bucket_expr(index_column, dt, every, offset).alias(index_column)
        keys = list(group_by) + [b]
        out = group_by_agg(table, keys, list(aggs), maintain_order=False)
    else:
        out = _dynamic_overlap(table, index_column, every, period or every,
                               offset, closed, group_by, aggs)
        keys = list(group_by) + [_col(index_column)]
    # polars returns sorted by keys then window
    from .sort import sort_table
    key_vals = []
    for k in keys:
        name = meta.output_name(k)
        c = out.column(name)
        key_vals.append(Val(c.dtype, c.data, c.validity, c.sdict, False))
    return sort_table(out, key_vals, [False] * len(key_vals),
                      [False] * len(key_vals))


def _dynamic_overlap(table: Table, index_column: str, every: str,
                     period: str, offset: Optional[str], closed: str,
                     group_by: Sequence[Expr], aggs: Sequence[Expr]) -> Table:
    """Overlapping / non-left-closed dynamic windows (reference:
    `polars-time/src/windows/group_by.rs` with period != every).

    TPU-native shape: each row is fanned out to K = ceil(period/every)+1
    CANDIDATE windows (a static expansion — no data-dependent shapes),
    candidates outside the row's actual window range are masked dead, and
    the expanded table reuses the ordinary segment group-by on
    (group keys, window start)."""
    ekind, en = T.parse_every(every)
    pkind, pn = T.parse_every(period)
    dt = table.column(index_column).dtype
    if ekind == "months":
        if not (isinstance(dt, Datetime) or dt == Date):
            raise InvalidOperationError("month buckets need a temporal index")
        if pkind == "months":
            K = max(-(-pn // en), 1) + 1
        else:
            # months are >= 28 days: bound candidates from above
            p_days = max(pn // 86_400_000_000_000, 1)
            K = p_days // (28 * en) + 2
    else:
        if pkind == "months":
            raise InvalidOperationError(
                "month-based period with fixed every not supported")
        e_units = _span_units(dt, en, "every")
        p_units = _span_units(dt, pn, "period")
        K = max(-(-p_units // e_units), 1) + 1  # +1 covers closed edges

    cap = table.capacity
    ecap = capacity_for_rows(cap * K)
    rep = (jnp.arange(ecap) // K).astype(jnp.int32)
    j = (jnp.arange(ecap) % K).astype(jnp.int32)
    in_range = jnp.arange(ecap) < cap * K
    rep = jnp.where(in_range, rep, 0)

    # expand all columns by row-repeat; live mask repeats too
    names = list(table.names)
    cols = {n: table.cols[n].take(rep) for n in names}
    exp_valid = table.row_mask()[rep] & in_range
    exp = Table(names, cols, ecap, None, exp_valid)

    # candidate window start: trunc(t) - j*every (grid-aligned by
    # construction); bucket_expr reuses the device truncate + offset logic
    s0 = eval_expr(bucket_expr(index_column, dt, every, offset), exp,
                   "select")
    t = exp.column(index_column).data
    stor = t.dtype
    if ekind == "months":
        s = _add_months_units(s0.data.astype(stor),
                              -(j.astype(jnp.int64) * en), dt)
        if pkind == "months":
            end = _add_months_units(s, jnp.asarray(pn, jnp.int64), dt)
        else:
            end = s + jnp.asarray(_span_units(dt, pn, "period"), stor)
    else:
        s = s0.data.astype(stor) - j.astype(stor) * jnp.asarray(e_units,
                                                                stor)
        end = s + jnp.asarray(p_units, stor)
    if closed == "left":
        ok = (s <= t) & (t < end)
    elif closed == "right":
        ok = (s < t) & (t <= end)
    elif closed == "both":
        ok = (s <= t) & (t <= end)
    else:  # "none"
        ok = (s < t) & (t < end)
    if s0.validity is not None:
        ok = ok & s0.validity
    exp = exp.with_column("__ws", Column(dt, s, None, None))
    exp = exp.with_valid(exp_valid & ok, None)

    keys = list(group_by) + [_col("__ws").alias(index_column)]
    return group_by_agg(exp, keys, list(aggs), maintain_order=False)


_ROLL_AGGS = {"sum", "mean", "min", "max", "count", "len", "std", "var",
              "first", "last"}


def rolling_agg(table: Table, index_column: str, period: str,
                group_by: Sequence[Expr], aggs: Sequence[Expr],
                closed: str = "right") -> Table:
    """df.rolling(index_column=..., period=...).agg(...): one output row
    per input row, aggregates over the trailing window."""
    cap = table.capacity
    mask = table.row_mask()
    idx_col = table.column(index_column)
    dt = idx_col.dtype
    kind, n = T.parse_every(period)
    if kind != "fixed":
        raise InvalidOperationError("month-based rolling periods unsupported")
    if isinstance(dt, Datetime):
        span = n // (1_000_000_000 // T.UNIT_PER_SECOND[dt.time_unit])
    elif dt == Date:
        span = n // (86_400 * 1_000_000_000)
    else:
        span = n

    # group ids (0 if ungrouped)
    if group_by:
        key_vals = [eval_expr(k, table, "select") for k in group_by]
        gctx = build_groups(key_vals, mask)
        inv = jnp.argsort(gctx.perm, stable=True)
        gid_row = gctx.gid[inv]
    else:
        gid_row = jnp.where(mask, 0, cap)

    t = idx_col.data
    # sort rows by (gid, t) — stable
    dead = (~mask).astype(jnp.uint32)
    from .keycode import encode_key_words, lex_sort_indices
    words = [dead, gid_row.astype(jnp.uint32)] + \
        encode_key_words(t, None, False, False)
    skeys, _, perm = lex_sort_indices(words)
    live_sorted = skeys[0] == 0
    sg = skeys[1]
    st = t[perm]
    idx = jnp.arange(cap)
    g_new = ((idx == 0) | (sg != jnp.roll(sg, 1))) & live_sorted
    gstart = jax.lax.cummax(jnp.where(g_new, idx, -1))
    # group end per row = next group's start (suffix-min of future starts)
    nxt_start = jax.lax.cummin(
        jnp.where(jnp.roll(g_new, -1) & (idx < cap - 1), idx + 1, cap)[::-1]
    )[::-1]
    nlive = jnp.sum(live_sorted)  # dead rows sort last: live is a prefix
    gend = jnp.where(live_sorted, jnp.minimum(nxt_start, nlive), idx)

    lo_q = st - span
    lo = segmented_searchsorted(st, gstart, idx + 1, lo_q,
                                side="right" if closed in ("right", "both")
                                else "left")
    hi = segmented_searchsorted(st, gstart, gend, st,
                                side="right" if closed in ("right", "both")
                                else "left")
    hi = jnp.maximum(hi, idx + 1)

    inv_perm = jnp.argsort(perm, stable=True)

    names: List[str] = []
    cols = {}
    # index + group key columns pass through
    if group_by:
        for k in group_by:
            nm = meta.output_name(k)
            c = table.column(nm)
            names.append(nm)
            cols[nm] = c
    names.append(index_column)
    cols[index_column] = idx_col

    for ae in aggs:
        name, val = _rolling_one(ae, table, perm, inv_perm, lo, hi,
                                 live_sorted)
        if name in cols:
            raise ComputeError(f"duplicate column {name!r}")
        names.append(name)
        cols[name] = val
    return Table(names, cols, cap, table._nrows, table.valid,
                 nrows_dev=table.nrows_dev)


def _rolling_one(ae: Expr, table: Table, perm, inv_perm, lo, hi, live_sorted):
    e = ae
    name = meta.output_name(ae)
    while e.kind in ("alias", "name_map"):
        e = e.children[0]
    if e.kind != "agg" or e.attrs["agg"] not in _ROLL_AGGS:
        raise InvalidOperationError(
            f"rolling agg supports {sorted(_ROLL_AGGS)}, got {e.fingerprint()}")
    agg = e.attrs["agg"]
    v = eval_expr(e.children[0], table, "agg")
    cap = table.capacity
    data = v.data if v.data.shape[0] == cap else \
        jnp.broadcast_to(v.data, (cap,))
    valid = v.valid_or_true()
    valid = valid if valid.shape[0] == cap else jnp.broadcast_to(valid, (cap,))
    x = data[perm]
    xv = valid[perm] & live_sorted
    dt = v.dtype

    def back(arr, validity, out_dt):
        col_valid = validity[inv_perm] if validity is not None else None
        return name, Column(out_dt, arr[inv_perm], col_valid, v.sdict)

    cnt = prefix_range_sum(xv.astype(jnp.int32), lo, hi)
    if agg in ("count",):
        return back(cnt.astype(jnp.uint32), None, UInt32)
    if agg == "len":
        ln = prefix_range_sum(live_sorted.astype(jnp.int32), lo, hi)
        return back(ln.astype(jnp.uint32), None, UInt32)
    if agg in ("sum", "mean", "std", "var"):
        acc = _acc_dtype(dt)
        s = prefix_range_sum(jnp.where(xv, x, 0).astype(acc), lo, hi)
        if agg == "sum":
            from ..expr.eval import _sum_dtype
            out_dt = _sum_dtype(dt)
            return back(s.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                        cnt > 0, out_dt)
        m = s / jnp.maximum(cnt, 1)
        out_dt = _float_dt(dt)
        if agg == "mean":
            return back(m.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                        cnt > 0, out_dt)
        s2 = prefix_range_sum(jnp.where(xv, x.astype(acc) ** 2, 0), lo, hi)
        var = (s2 - s * m) / jnp.maximum(cnt - 1, 1)
        var = jnp.maximum(var, 0)
        out = jnp.sqrt(var) if agg == "std" else var
        return back(out.astype(jnp.dtype(storage_numpy_dtype(out_dt))),
                    cnt > 1, out_dt)
    if agg in ("min", "max"):
        lo_b, hi_b = _type_bounds(x.dtype)
        fill = hi_b if agg == "min" else lo_b
        levels = build_sparse(jnp.where(xv, x, fill), agg)
        r = range_query(levels, lo, hi, agg, fill)
        return back(r, cnt > 0, dt)
    if agg in ("first", "last"):
        pos = jnp.clip(lo if agg == "first" else hi - 1, 0, cap - 1)
        return back(x[pos], (hi > lo) & xv[pos], dt)
    raise InvalidOperationError(agg)
