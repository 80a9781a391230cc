"""Wavelet-tree rank/select over row ranges.

TPU-native order-statistics structure powering variable-window quantile /
median / rank queries (the reference computes these with per-window loops
in `polars-compute/src/rolling/quantile_filter.rs` + the temporal window
iterators in `polars-time/src/group_by/`). Per-window loops don't map to
XLA; instead we build a wavelet tree over the *rank space* of the column
once — L = ceil(log2(n)) levels, each level a prefix-count array plus a
stable bit-partition permutation, all built with cumsums and permutation
scatters — and then answer every row's query with L rounds of O(1)
gathers, fully vectorized across rows.

Queries supported on an arbitrary position range [lo_i, hi_i) per row i:
  * select(k): the k-th smallest element's rank      -> quantile/median
  * count_lt(key): #elements with rank < key          -> rank / ntile

Ranks are dense and distinct (stable argsort order), so ties in the
underlying values occupy a contiguous rank interval [first, last); value
ties are handled by querying both interval edges.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp


def build_wavelet(ranks) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Build the level tables for `ranks` (distinct ints in [0, n)).

    Returns a list of (Z, total_zeros) per level, MSB-first, where Z is
    the exclusive prefix count of zero-bits at that level's ordering
    (length n+1, so Z[hi]-Z[lo] is the zero count in [lo, hi))."""
    n = ranks.shape[0]
    levels = max(1, int(math.ceil(math.log2(max(n, 2)))))
    vals = ranks.astype(jnp.int32)
    pos_idx = jnp.arange(n, dtype=jnp.int32)
    tables = []
    for lvl in range(levels):
        bit = (vals >> (levels - 1 - lvl)) & 1
        zeros = (bit == 0).astype(jnp.int32)
        Z = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(zeros, dtype=jnp.int32)])
        tz = Z[n]
        tables.append((Z, tz))
        if lvl + 1 < levels:
            # stable partition: zeros keep order first, then ones
            dest = jnp.where(bit == 0, Z[pos_idx], tz + (pos_idx - Z[pos_idx]))
            vals = jnp.zeros_like(vals).at[dest].set(vals)
    return tables


def wavelet_select(tables, lo, hi, k):
    """Rank of the k-th smallest element (0-based) in [lo_i, hi_i) per
    row. Caller guarantees lo < hi and 0 <= k < hi - lo."""
    levels = len(tables)
    res = jnp.zeros_like(k)
    for lvl, (Z, tz) in enumerate(tables):
        zlo, zhi = Z[lo], Z[hi]
        cz = zhi - zlo
        left = k < cz
        lo = jnp.where(left, zlo, tz + (lo - zlo))
        hi = jnp.where(left, zhi, tz + (hi - zhi))
        k = jnp.where(left, k, k - cz)
        res = res | jnp.where(left, 0, 1 << (levels - 1 - lvl))
    return res


def wavelet_count_lt(tables, lo, hi, key):
    """#elements in [lo_i, hi_i) whose rank is < key_i, per row."""
    levels = len(tables)
    acc = jnp.zeros_like(lo)
    for lvl, (Z, tz) in enumerate(tables):
        bit = (key >> (levels - 1 - lvl)) & 1
        zlo, zhi = Z[lo], Z[hi]
        cz = zhi - zlo
        acc = acc + jnp.where(bit == 1, cz, 0)
        go_left = bit == 0
        lo = jnp.where(go_left, zlo, tz + (lo - zlo))
        hi = jnp.where(go_left, zhi, tz + (hi - zhi))
    return acc
