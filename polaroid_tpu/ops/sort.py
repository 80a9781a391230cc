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
    if len(words) == 2 and mask.shape[0] < (1 << 31):
        # single u32 key word: one fused-u64 single-operand sort
        # ([dead:1|key:32|idx:31], ops/fused_sort.py) — 7.8 ms vs
        # 21.8 ms for the multi-operand stable sort at 8.4M rows
        from .fused_sort import fused_argsort
        _, perm = fused_argsort(words[1], live=(words[0] == 0))
        return perm
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
        out = _try_fused_table_sort(table, key_vals, descending, nulls_last,
                                    maintain_order, mask)
        if out is None:
            out = _sort_table_carried(table, key_vals, descending,
                                      nulls_last, maintain_order, mask)
    else:
        perm = sort_perm(key_vals, descending, nulls_last, mask,
                         maintain_order)
        out = C.gather_table(table, perm, None, None)
    # live rows are now a prefix; keep the count on device (deferred —
    # no host sync; .nrows reads it lazily)
    return out.with_valid(None, table._nrows, nrows_dev=count)


def _try_fused_table_sort(table: Table, key_vals, descending, nulls_last,
                          maintain_order: bool, mask):
    """Fused-u64 single-operand path (ops/fused_sort.py): one u32 key
    word + one u32 cargo word packed into a u64 and sorted in a single
    `lax.sort` operand (7.8 ms vs 21.8 at 8.4M rows). Applies when the
    sort key is a single null-free ≤4-byte column and the table carries
    at most one other 4-byte null-free column (the key column itself
    rides as the encoded word and is decoded back). maintain_order must
    be False: ties order by cargo bits, deterministically."""
    from ..batch import Column, storage_numpy_dtype
    from .fused_sort import fused_sort_kv
    from .keycode import decode_orderable
    if maintain_order or len(key_vals) != 1:
        return None
    v = key_vals[0]
    cap = mask.shape[0]
    if cap >= (1 << 31) or v.validity is not None or v.data.shape[0] != cap:
        return None
    if v.data.dtype.itemsize > 4:
        return None
    cols = [table.cols[n] for n in table.names]
    if any(c.validity is not None or c.lengths is not None
           or c.fields is not None or c.data.dtype.itemsize > 4
           for c in cols):
        return None
    key_col_idx = [i for i, c in enumerate(cols) if c.data is v.data]
    others = [i for i in range(len(cols)) if i not in key_col_idx[:1]]
    if len(others) > 1:
        return None
    kw = encode_key_words(v.data, None, descending[0], nulls_last[0])[0]
    if others:
        cargo = col_to_u32_words_one(cols[others[0]].data)
    else:
        cargo = jnp.zeros(cap, jnp.uint32)
    sk, sc = fused_sort_kv(kw, cargo, live=mask)
    out_cols = {}
    for i, n in enumerate(table.names):
        c = cols[i]
        stor = storage_numpy_dtype(c.dtype)
        if key_col_idx and i == key_col_idx[0]:
            data = decode_orderable(
                sk.astype(jnp.uint64), jnp.dtype(stor), descending[0])
        else:
            data = col_from_one_u32_word(sc, stor)
        out_cols[n] = Column(c.dtype, data, None, c.sdict)
    return Table(list(table.names), out_cols, cap, None, None)


def col_to_u32_words_one(data) -> jax.Array:
    """One-word bitcast for ≤4-byte columns (see keycode.col_to_u32_words)."""
    from .keycode import col_to_u32_words
    ws = col_to_u32_words(data)
    assert len(ws) == 1
    return ws[0]


def col_from_one_u32_word(w, stor):
    from .keycode import col_from_u32_words
    return col_from_u32_words([w], stor)


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
    t = sort_table(table, key_vals, descending, nulls_last,
                   maintain_order=False)
    t = C.compact(t)
    n = min(k, t.nrows or 0)
    return C.shrink_to(t.with_valid(None, n), n)
