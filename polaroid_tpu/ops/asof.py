"""As-of join (nearest-key join on sorted keys).

Reference analogue: `polars-ops/src/frame/join/asof/`. Implemented as a
device-side binary search (searchsorted) of left keys into sorted right
keys — the natural TPU formulation of the merge scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .search import searchsorted

from ..batch import Column, Table
from ..errors import ComputeError
from ..expr.eval import Val, cast_val
from ..dtypes import supertype
from . import compact as Cp


def asof_join_tables(left: Table, right: Table, left_on: str, right_on: str,
                     by_left=None, by_right=None, strategy: str = "backward",
                     suffix: str = "_right", tolerance=None) -> Table:
    if by_left or by_right:
        return _asof_by(left, right, left_on, right_on, by_left, by_right,
                        strategy, suffix, tolerance)
    L = Cp.compact(left)
    R = Cp.compact(right)
    nl, nr = L.nrows or 0, R.nrows or 0
    lc, rc = L.column(left_on), R.column(right_on)
    st = supertype(lc.dtype, rc.dtype)
    lv = cast_val(Val(lc.dtype, lc.data, lc.validity, lc.sdict, False), st)
    rv = cast_val(Val(rc.dtype, rc.data, rc.validity, rc.sdict, False), st)
    # right must be sorted on key; sort it to be safe
    big = _big_for(rv.data.dtype)
    rkey = jnp.where(jnp.arange(R.capacity) < nr, rv.data, big)
    order = jnp.argsort(rkey, stable=True)
    rsorted = rkey[order]
    lkey = lv.data
    if strategy == "backward":
        pos = searchsorted(rsorted, lkey, side="right") - 1
        matched = pos >= 0
    elif strategy == "forward":
        pos = searchsorted(rsorted, lkey, side="left")
        matched = pos < nr
    else:  # nearest
        p1 = searchsorted(rsorted, lkey, side="right") - 1
        p2 = searchsorted(rsorted, lkey, side="left")
        p1c = jnp.clip(p1, 0, max(R.capacity - 1, 0))
        p2c = jnp.clip(p2, 0, max(R.capacity - 1, 0))
        d1 = jnp.abs(lkey - rsorted[p1c])
        d2 = jnp.abs(rsorted[p2c] - lkey)
        use1 = (p1 >= 0) & ((p2 >= nr) | (d1 <= d2))
        pos = jnp.where(use1, p1, p2)
        matched = (p1 >= 0) | (p2 < nr)
    posc = jnp.clip(pos, 0, max(R.capacity - 1, 0))
    ridx = order[posc]
    if tolerance is not None:
        tol = _tolerance_value(tolerance, st)
        diff = jnp.abs(lkey - rsorted[posc])
        matched = matched & (diff <= tol)
    names = list(L.names)
    cols = dict(L.cols)
    for n in R.names:
        if n == right_on and n == left_on:
            continue
        c = R.cols[n]
        name = n if n not in cols else f"{n}{suffix}"
        data = c.data[ridx]
        validity = matched & (c.validity[ridx] if c.validity is not None
                              else True)
        names.append(name)
        cols[name] = Column(c.dtype, data, validity, c.sdict)
    return Table(names, cols, L.capacity, nl, None)


def _asof_by(left, right, left_on, right_on, by_left, by_right, strategy,
             suffix, tolerance):
    """Grouped asof: encode (by-keys, key) and search within groups by
    packing the group id into the high bits of the search key."""
    from .groupby import build_groups
    from ..expr.eval import Val
    by_left = [by_left] if isinstance(by_left, str) else list(by_left)
    by_right = [by_right] if isinstance(by_right, str) else list(by_right)
    L = Cp.compact(left)
    R = Cp.compact(right)
    # Assign group ids consistently across both sides via a shared group
    # build on the concatenated by-columns.
    from .join import _key_vals, _unify_keys
    lv, rv = _unify_keys(_key_vals(L, by_left), _key_vals(R, by_right))
    capL, capR = L.capacity, R.capacity
    comb = []
    for a, b in zip(lv, rv):
        data = jnp.concatenate([a.data, b.data])
        validity = None
        if a.validity is not None or b.validity is not None:
            av = a.validity if a.validity is not None else jnp.ones(capL, bool)
            bv = b.validity if b.validity is not None else jnp.ones(capR, bool)
            validity = jnp.concatenate([av, bv])
        comb.append(Val(a.dtype, data, validity, a.sdict, False))
    mask = jnp.concatenate([L.row_mask(), R.row_mask()])
    g = build_groups(comb, mask)
    inv = jnp.argsort(g.perm, stable=True)
    gid_rows = jnp.where(mask, g.gid[inv], capL + capR)
    lgid = jax.lax.slice_in_dim(gid_rows, 0, capL)
    rgid = jax.lax.slice_in_dim(gid_rows, capL, capL + capR)
    # shift keys by group: search key = (gid, key) lexicographic via f64 is
    # lossy; instead do searchsorted on (gid * BIG + rank) using sorted right
    lc, rc = L.column(left_on), R.column(right_on)
    st = supertype(lc.dtype, rc.dtype)
    lkv = cast_val(Val(lc.dtype, lc.data, lc.validity, None, False), st)
    rkv = cast_val(Val(rc.dtype, rc.data, rc.validity, None, False), st)
    from .keycode import encode_orderable
    lk = encode_orderable(lkv.data).astype(jnp.uint64)
    rk = encode_orderable(rkv.data).astype(jnp.uint64)
    # sort right by (gid, key)
    rkeyg = (rgid.astype(jnp.uint64) << jnp.uint64(0))  # placeholder
    ops = jax.lax.sort((rgid.astype(jnp.int64), rk.astype(jnp.int64),
                        jnp.arange(capR, dtype=jnp.int32)), num_keys=2,
                       is_stable=True)
    sg, sk, sidx = ops
    nr = R.nrows or 0

    def search(side):
        # positions of left queries within their group's contiguous run
        grp_start = searchsorted(sg, lgid.astype(jnp.int64), side="left")
        grp_end = searchsorted(sg, lgid.astype(jnp.int64), side="right")
        # binary search within [grp_start, grp_end) on sk
        lo = grp_start
        hi = grp_end

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            midv = sk[jnp.clip(mid, 0, max(capR - 1, 0))]
            if side == "right":
                go_right = midv <= lk.astype(jnp.int64)
            else:
                go_right = midv < lk.astype(jnp.int64)
            lo = jnp.where(go_right & (lo < hi), mid + 1, lo)
            hi = jnp.where((~go_right) & (lo < hi), mid, hi)
            return lo, hi

        import math
        iters = max(1, int(math.ceil(math.log2(max(capR, 2)))) + 1)
        for _ in range(iters):
            lo, hi = body(None, (lo, hi))
        return lo, grp_start, grp_end

    if strategy == "backward":
        pos, gs, ge = search("right")
        pos = pos - 1
        matched = pos >= gs
    elif strategy == "forward":
        pos, gs, ge = search("left")
        matched = pos < ge
    else:
        p1, gs, ge = search("right")
        p1 = p1 - 1
        p2, _, _ = search("left")
        p1c = jnp.clip(p1, 0, max(capR - 1, 0))
        p2c = jnp.clip(p2, 0, max(capR - 1, 0))
        d1 = jnp.abs(lk.astype(jnp.int64) - sk[p1c])
        d2 = jnp.abs(sk[p2c] - lk.astype(jnp.int64))
        use1 = (p1 >= gs) & ((p2 >= ge) | (d1 <= d2))
        pos = jnp.where(use1, p1, p2)
        matched = (p1 >= gs) | (p2 < ge)
    posc = jnp.clip(pos, 0, max(capR - 1, 0))
    ridx = sidx[posc]
    if tolerance is not None:
        tol = _tolerance_value(tolerance, st)
        diff = jnp.abs(lkv.data - rkv.data[ridx])
        matched = matched & (diff <= tol)
    matched = matched & L.row_mask()
    names = list(L.names)
    cols = dict(L.cols)
    skip = set(by_right) | {right_on} if right_on == left_on else set(by_right)
    for n in R.names:
        if n in skip:
            continue
        c = R.cols[n]
        name = n if n not in cols else f"{n}{suffix}"
        data = c.data[ridx]
        validity = matched & (c.validity[ridx] if c.validity is not None
                              else True)
        names.append(name)
        cols[name] = Column(c.dtype, data, validity, c.sdict)
    return Table(names, cols, L.capacity, L.nrows, None)


def _big_for(dt):
    if jnp.issubdtype(dt, jnp.floating):
        return jnp.array(jnp.inf, dt)
    return jnp.array(jnp.iinfo(dt).max, dt)


def _tolerance_value(tol, st):
    import datetime as _dt
    if isinstance(tol, _dt.timedelta):
        from ..dtypes import Datetime
        unit = st.time_unit if isinstance(st, Datetime) else "us"
        scale = {"ms": 1e3, "us": 1e6, "ns": 1e9}[unit]
        return int(tol.total_seconds() * scale)
    if isinstance(tol, str):
        from .temporal import parse_every
        kind, n = parse_every(tol)
        if kind != "fixed":
            raise ComputeError("month-based tolerance unsupported")
        from ..dtypes import Datetime
        unit = st.time_unit if isinstance(st, Datetime) else "us"
        div = {"ms": 1_000_000, "us": 1_000, "ns": 1}[unit]
        return n // div
    return tol


def asof_join_plan(lf, other, on, left_on, right_on, by, by_left, by_right,
                   strategy, suffix, tolerance):
    from ..api.lazyframe import LazyFrame
    from ..plan import logical as Lg
    if on is not None:
        left_on = right_on = on
    if by is not None:
        by_left = by_right = by

    lp, rp = lf._plan, other._plan

    def out_schema(_ins):
        ls = dict(lp.schema())
        rs = rp.schema()
        skip = set([by_right] if isinstance(by_right, str) else (by_right or []))
        if right_on == left_on:
            skip.add(right_on)
        for n, dt in rs.items():
            if n in skip:
                continue
            ls[n if n not in ls else f"{n}{suffix}"] = dt
        return ls

    # per-LEFT-batch application is exact (row-wise lookup into the full
    # right side), so the map is streamable: the streaming engine feeds
    # left batches while the build side is materialized once and cached
    rt_cache: list = []

    def mk(t):
        from ..exec.executor import execute
        if not rt_cache:
            rt_cache.append(execute(rp))
        return asof_join_tables(t, rt_cache[0], left_on, right_on, by_left,
                                by_right, strategy, suffix, tolerance)

    return LazyFrame._from_plan(
        Lg.MapFunction(lp, mk, out_schema, True, "join_asof"))
