"""Variable-window range aggregations.

TPU-native replacement for the reference's rolling kernels
(`polars-compute/src/rolling/`, temporal rolling windows in
`polars-time/src/group_by/`): instead of per-window loops, range
min/max queries use an O(n log n) sparse table built in log(n) fully
vectorized doubling steps, and range sums use prefix sums — every
per-row window [lo_i, hi_i] then resolves with O(1) gathers.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def build_sparse(x, kind: str):
    """Sparse table: levels[k][i] = reduce(x[i : i+2^k])."""
    fn = jnp.minimum if kind == "min" else jnp.maximum
    n = x.shape[0]
    levels = [x]
    k = 1
    while (1 << k) <= n:
        prev = levels[-1]
        shifted = jnp.roll(prev, -(1 << (k - 1)))
        levels.append(fn(prev, shifted))
        k += 1
    return levels


def range_query(levels, lo, hi, kind: str, empty_val):
    """reduce(x[lo:hi]) per element; empty ranges -> empty_val."""
    fn = jnp.minimum if kind == "min" else jnp.maximum
    n = levels[0].shape[0]
    length = jnp.maximum(hi - lo, 0)
    # k = floor(log2(length)), exactly: count of levels with 2^k <= length
    kidx = jnp.zeros_like(length)
    for k in range(1, len(levels)):
        kidx = kidx + (length >= (1 << k)).astype(length.dtype)
    kidx = jnp.clip(kidx, 0, len(levels) - 1)
    a_lo = jnp.clip(lo, 0, n - 1)
    result = None
    for k, lev in enumerate(levels):
        b_lo = jnp.clip(hi - (1 << k), 0, n - 1)
        cand = fn(lev[a_lo], lev[b_lo])
        result = cand if result is None else jnp.where(kidx == k, cand, result)
    return jnp.where(length > 0, result, empty_val)


def prefix_range_sum(x, lo, hi):
    """sum(x[lo:hi]) per element via exclusive prefix sums."""
    cs = jnp.cumsum(x)
    n = x.shape[0]
    hi_s = cs[jnp.clip(hi - 1, 0, n - 1)]
    lo_s = jnp.where(lo > 0, cs[jnp.clip(lo - 1, 0, n - 1)], 0)
    return jnp.where(hi > lo, hi_s - lo_s, jnp.zeros((), x.dtype))


def segmented_searchsorted(sorted_vals, grp_start, grp_end, queries,
                           side: str = "left"):
    """Per-query binary search restricted to [grp_start_i, grp_end_i).
    All arrays are 1-D; O(log n) vectorized rounds (the merge-scan of the
    reference's asof/rolling loops)."""
    n = sorted_vals.shape[0]
    lo = grp_start
    hi = grp_end
    iters = max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)
    for _ in range(iters):
        mid = (lo + hi) // 2
        mv = sorted_vals[jnp.clip(mid, 0, n - 1)]
        if side == "right":
            go = mv <= queries
        else:
            go = mv < queries
        cont = lo < hi
        lo = jnp.where(go & cont, mid + 1, lo)
        hi = jnp.where((~go) & cont, mid, hi)
    return lo
