"""Device-side row compaction & gather.

The reference mutates Arrow buffers with filter/gather kernels
(`polars-compute/src/filter/`, `gather/`); under XLA static shapes we
instead compact with a stable argsort on the live mask (live rows move to
the front, order preserved) — one fused XLA sort per table, no host sync.
A cheaper prefix-sum + scatter Pallas kernel can replace the argsort later
without changing callers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..batch import Column, Table


def compact_perm(mask: jax.Array) -> jax.Array:
    """Permutation placing live rows first, order-preserving."""
    return jnp.argsort(~mask, stable=True)


def gather_table(table: Table, perm: jax.Array, nrows: Optional[int],
                 valid: Optional[jax.Array]) -> Table:
    """Gather all columns by `perm` (device). New live state supplied by
    the caller."""
    cols = {name: table.cols[name].take(perm) for name in table.names}
    return Table(list(table.names), cols, table.capacity, nrows, valid)


def _carry_prefix(table: Table, mask, nrows: Optional[int],
                  valid: Optional[jax.Array]) -> Optional[Table]:
    """Move live rows to a stable front prefix with ONE multi-operand
    lax.sort carrying every column word (the sort-as-compaction doctrine:
    TPU random gathers cost ~8.7ns/elem vs ~1.3ns/row/word sorted).
    Returns None when a column is nested (caller falls back to gathers)
    or on CPU (gathers are free there)."""
    import os
    carry = os.environ.get("PT_SORT_CARRY")
    if carry == "0" or (carry != "1" and jax.default_backend() == "cpu"):
        return None
    if any(c.lengths is not None or c.fields is not None
           for c in table.cols.values()):
        return None
    from ..batch import storage_numpy_dtype
    from .keycode import col_from_u32_words, col_to_u32_words
    tails, layout = [], []
    for n in table.names:
        c = table.cols[n]
        ws = col_to_u32_words(c.data)
        hasv = c.validity is not None
        if hasv:
            ws.append(c.validity.astype(jnp.uint32))
        layout.append((n, c, len(ws) - int(hasv), hasv))
        tails.extend(ws)
    # fast path: the Pallas block-partition kernel (batched block sort +
    # sequential prefix-concat DMA) — ~5x the carry sort on v5e
    from .pallas_partition import compact_words, use_partition_kernel
    sorted_tails = None
    if use_partition_kernel():
        res = compact_words(mask, tails)
        if res is not None:
            sorted_tails = res[0]
    if sorted_tails is None:
        from .merge_sort import sort_ops as _ms_sort
        outs = _ms_sort([(~mask).astype(jnp.uint32)] + list(tails),
                        num_keys=1, is_stable=True)
        sorted_tails = list(outs[1:])
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
    return Table(list(table.names), cols, table.capacity, nrows, valid)


def _map_axis0(c: Column, fn) -> Column:
    """Apply an axis-0 structural transform to every per-row array of a
    column (data/validity/lengths/elem_valid; struct fields recursively)."""
    if c.fields is not None:
        return Column(c.dtype, None,
                      fn(c.validity) if c.validity is not None else None,
                      fields={k: _map_axis0(f, fn) for k, f in c.fields.items()})
    return Column(
        c.dtype, fn(c.data),
        fn(c.validity) if c.validity is not None else None, c.sdict,
        lengths=fn(c.lengths) if c.lengths is not None else None,
        elem_valid=fn(c.elem_valid) if c.elem_valid is not None else None)


_COMPACT_CACHE: dict = {}


def _in_trace() -> bool:
    from .pallas_partition import trace_state_clean
    return not trace_state_clean()


def compact(table: Table) -> Table:
    """Return a compact-state table (live rows form a front prefix, same
    capacity) WITHOUT any host sync: the row count stays on device as
    `nrows_dev` and syncs lazily on first `.nrows` read. This keeps
    collect() fully asynchronous — queries pipeline on the device stream
    and the host never blocks on a readback between them (the remote-TPU
    tunnel round trip is ~24ms, dwarfing most kernels).

    The whole compaction runs as ONE jitted program per (schema,
    capacity, live-state) — a single dispatch through the remote tunnel,
    and well-defined sharding propagation when the inputs are laid out
    across a mesh (eager op-by-op dispatch on sharded arrays is both
    slower and fragile)."""
    if table.valid is None:
        return table
    # run the partition-kernel selftest NOW (eager context): inside the
    # jit trace below `use_partition_kernel()` skips the selftest and
    # reports False, which would permanently compile the ~5x slower
    # carry-sort compaction into the cached program
    if not _in_trace():
        from .pallas_partition import use_partition_kernel
        use_partition_kernel()
    from ..exec.compiled import _flatten_table, _table_key, _unflatten_table
    in_flat, in_meta = _flatten_table(table)
    key = _table_key(table)
    hit = _COMPACT_CACHE.get(key)
    if hit is None:
        meta_cell: list = [None]

        def fn(flat):
            t = _unflatten_table(flat, in_meta)
            mask = t.valid
            count = jnp.sum(mask)
            out = _carry_prefix(t, mask, None, None)
            if out is None:
                out = gather_table(t, compact_perm(mask), None, None)
            out = out.with_valid(None, None, nrows_dev=count)
            out_flat, out_meta = _flatten_table(out)
            meta_cell[0] = out_meta
            return out_flat
        jitted = jax.jit(fn)
        out_flat = jitted(in_flat)
        hit = (jitted, meta_cell[0])
        _COMPACT_CACHE[key] = hit
        if len(_COMPACT_CACHE) > 512:
            _COMPACT_CACHE.pop(next(iter(_COMPACT_CACHE)))
    else:
        jitted, _ = hit
        out_flat = jitted(in_flat)
    return _unflatten_table(out_flat, hit[1])


def compact_device(table: Table):
    """Device-only compaction: returns (table-with-live-prefix, count) where
    count stays on device (no host sync). Used inside fused pipelines."""
    mask = table.row_mask()
    count = jnp.sum(mask)
    out = _carry_prefix(table, mask, None, None)
    if out is None:
        out = gather_table(table, compact_perm(mask), None, None)
    return out, count


def shrink_to(table: Table, nrows: int) -> Table:
    """Re-bucket a compact table to the smallest capacity holding nrows
    (host-free slice; capacities are static so this is a new XLA shape)."""
    from ..config import capacity_for
    cap = capacity_for(nrows)
    if cap >= table.capacity:
        return table.with_valid(None, nrows)
    cols = {name: _map_axis0(table.cols[name],
                             lambda a: jax.lax.slice_in_dim(a, 0, cap, axis=0))
            for name in table.names}
    return Table(list(table.names), cols, cap, nrows, None)


def grow_to(table: Table, capacity: int) -> Table:
    """Pad a table to a larger capacity bucket."""
    if capacity <= table.capacity:
        return table
    pad = capacity - table.capacity

    def _pad0(a):
        shape = (pad,) + a.shape[1:]
        return jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=0)

    cols = {}
    for name in table.names:
        c = table.cols[name]
        if c.dtype.is_string and c.data is not None:
            data = jnp.concatenate(
                [c.data, jnp.full((pad,), jnp.int32(-1), c.data.dtype)])
            validity = None
            if c.validity is not None:
                validity = jnp.concatenate(
                    [c.validity, jnp.zeros(pad, jnp.bool_)])
            cols[name] = Column(c.dtype, data, validity, c.sdict)
        else:
            cols[name] = _map_axis0(c, _pad0)
    valid = table.valid
    if valid is not None:
        valid = jnp.concatenate([valid, jnp.zeros(pad, jnp.bool_)])
    return Table(list(table.names), cols, capacity, table.nrows, valid)


def slice_rows(table: Table, offset: int, length: Optional[int]) -> Table:
    """head/tail/slice on live rows. Negative offset counts from the end."""
    t = compact(table)
    n = t.nrows or 0
    if offset < 0:
        offset = max(n + offset, 0)
    end = n if length is None else min(offset + length, n)
    offset = min(offset, n)
    end = max(end, offset)
    new_n = end - offset
    if offset == 0:
        return shrink_to(t, new_n) if new_n < n else t.with_valid(None, new_n)
    # shift rows down by offset via roll (static)
    cols = {name: _map_axis0(t.cols[name],
                             lambda a: jnp.roll(a, -offset, axis=0))
            for name in t.names}
    out = Table(list(t.names), cols, t.capacity, new_n, None)
    return shrink_to(out, new_n)
