"""Table sorting.

TPU-native replacement for the reference's rayon comparison sort
(`polars-core/src/chunked_array/ops/sort/mod.rs:96` par_sort_unstable_by;
multi-key row-encoded path at `ops/sort/arg_sort.rs:256-266`): key columns
are encoded into order-preserving uint32 words (`keycode.py`) and sorted
with XLA's `lax.sort` multi-operand lexicographic sort — a single fused
radix-style device sort, no comparator callbacks. Dead rows sort last via
a leading liveness word, so masked tables sort without prior compaction.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Table
from ..errors import ShapeError
from . import compact as C
from .keycode import encode_key_words


def sort_perm(key_vals, descending: Sequence[bool], nulls_last: Sequence[bool],
              mask: jax.Array, maintain_order: bool = True) -> jax.Array:
    """Permutation sorting live rows by the given evaluated key Vals
    (dead rows pushed to the back). Stable for equal keys."""
    words: List[jax.Array] = [(~mask).astype(jnp.uint32)]
    for v, d, nl in zip(key_vals, descending, nulls_last):
        cap = mask.shape[0]
        data = v.data if v.data.shape[0] == cap else jnp.broadcast_to(v.data, (cap,))
        validity = v.validity
        if validity is not None and validity.shape[0] != cap:
            validity = jnp.broadcast_to(validity, (cap,))
        words.extend(encode_key_words(data, validity, d, nl))
    idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
    from .merge_sort import sort_ops
    out = sort_ops(list(words) + [idx], len(words),
                   is_stable=maintain_order)
    return out[-1]


def sort_table(table: Table, key_vals, descending, nulls_last,
               maintain_order: bool = True) -> Table:
    if not key_vals:
        raise ShapeError("sort requires at least one key")
    mask = table.row_mask()
    count = jnp.sum(mask)
    flat = all(c.lengths is None and c.fields is None
               for c in table.cols.values())
    import os
    carry = os.environ.get("PT_SORT_CARRY")
    use_carry = flat and (carry == "1" or
                          (carry != "0" and
                           jax.default_backend() != "cpu"))
    if use_carry:
        out = _sort_table_carried(table, key_vals, descending, nulls_last,
                                  maintain_order, mask)
    else:
        perm = sort_perm(key_vals, descending, nulls_last, mask,
                         maintain_order)
        out = C.gather_table(table, perm, None, None)
    # live rows are now a prefix; keep the count on device (deferred —
    # no host sync; .nrows reads it lazily)
    return out.with_valid(None, table._nrows, nrows_dev=count)


def _sort_table_carried(table: Table, key_vals, descending, nulls_last,
                        maintain_order: bool, mask) -> Table:
    """Sort with every column carried THROUGH the sort as tail operands
    instead of gathered by the permutation afterwards. On TPU a random
    gather costs ~8.7ns/element while sorted words move at
    ~1.3ns/row/word, so carrying an N-column table through one multi-
    operand `lax.sort` beats N permutation gathers ~3-6x (the same
    doctrine as the m:1 join fill, ARCHITECTURE.md)."""
    from .keycode import col_from_u32_words, col_to_u32_words
    from ..batch import Column, storage_numpy_dtype
    cap = mask.shape[0]
    words: List[jax.Array] = [(~mask).astype(jnp.uint32)]
    for v, d, nl in zip(key_vals, descending, nulls_last):
        data = v.data if v.data.shape[0] == cap else \
            jnp.broadcast_to(v.data, (cap,))
        validity = v.validity
        if validity is not None and validity.shape[0] != cap:
            validity = jnp.broadcast_to(validity, (cap,))
        words.extend(encode_key_words(data, validity, d, nl))
    tails, layout = [], []
    for n in table.names:
        c = table.cols[n]
        ws = col_to_u32_words(c.data)
        hasv = c.validity is not None
        if hasv:
            ws.append(c.validity.astype(jnp.uint32))
        layout.append((n, c, len(ws) - int(hasv), hasv))
        tails.extend(ws)
    from .merge_sort import sort_ops
    outs = sort_ops(list(words) + list(tails), len(words),
                    is_stable=maintain_order)
    sorted_tails = list(outs[len(words):])
    cols = {}
    wi = 0
    for n, c, nwords, hasv in layout:
        data = col_from_u32_words(sorted_tails[wi:wi + nwords],
                                  storage_numpy_dtype(c.dtype))
        wi += nwords
        validity = None
        if hasv:
            validity = sorted_tails[wi] != 0
            wi += 1
        cols[n] = Column(c.dtype, data, validity, c.sdict)
    return Table(list(table.names), cols, cap, None, None)


def top_k_table(table: Table, key_vals, k: int, descending, nulls_last) -> Table:
    """sort + slice fused (reference lowers sort+slice to TopK,
    `polars-stream/src/physical_plan/lower_ir.rs:639`). XLA's sort is
    already O(n log n) single-pass; we sort then statically shrink."""
    t = sort_table(table, key_vals, descending, nulls_last)
    t = C.compact(t)
    n = min(k, t.nrows or 0)
    return C.shrink_to(t.with_valid(None, n), n)
