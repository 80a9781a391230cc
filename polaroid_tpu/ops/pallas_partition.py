"""Pallas stable compaction (the filter kernel).

The engine compacts masked tables by carrying every column word through
one stable `lax.sort` on the dead flag (~34 ms at 8.4M x 3 cols on v5e —
a full comparison sort for what is a 1-bit partition). This module does
the partition in ~bandwidth time instead:

  1. batched `lax.sort` over (B, 8192) blocks on a single fused
     (dead<<13 | local_idx) u32 key — XLA's in-VMEM sort at its sweet
     spot (`tools/sort_probe2.py`: 6.3 ms for 4 operands, vs 29.9 for
     the same operands in one monolithic sort) — giving each block a
     stable live-prefix;
  2. ONE sequential-grid Pallas pass concatenates the live prefixes.
     Block b's rows belong at element offset offs[b] = sum of live
     counts before b. TPU DMA slices at 128-lane row granularity only
     (element-granular dynamic offsets fail Mosaic verification), so
     the kernel rotates the block by offs[b] % 128 lanes in VMEM
     (`tpu.dynamic_rotate`), merges the straddle row with the
     previously-written output row (read-modify-write, safe because
     the TPU grid executes sequentially), and writes R+1 aligned rows.
     Later blocks overwrite earlier garbage tails — no dynamic-size
     DMA anywhere.

Rows past the returned live count are garbage and must be masked dead
by the caller (the engine's masked-capacity contract).

Reference analogue: `polars-compute/src/filter/` — a memcpy-speed
filter; SURVEY §7 kernel-layer row ("filter/select via masked
compaction").
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S = int(os.environ.get("PT_PART_BLOCK", "8192"))  # rows per block
_PASSES = (_S - 1).bit_length()  # shift-compaction bit passes
_LANES = 128
_R = _S // _LANES   # 64 sublane rows per block


_KERNEL_STATE: List = [None]  # None = untested, True = ok, False = broken
_SELFTEST_TRIES: List = [0]


def trace_state_clean() -> bool:
    """True when no trace is active. jax 0.9 removed
    ``jax.core.trace_state_clean`` (AttributeError), which silently
    disabled this guard and let the selftest run inside query traces."""
    try:
        from jax._src import core as _core
        return bool(_core.trace_state_clean())
    except Exception:
        pass
    try:
        return bool(jax.core.trace_state_clean())
    except Exception:
        return False  # unknown -> assume a trace is active


@jax.jit
def _selftest_program():
    """Nullary jit: all inputs are built INSIDE the compiled program, so
    no ambient tracer (an in-flight query trace on another context) can
    leak into the selftest — a leaked tracer used to poison the state to
    False permanently, silently demoting every later compaction to the
    ~5x slower carry sort."""
    m = (jnp.arange(2 * _S) % 3) != 0
    res = compact_words(m, [jnp.arange(2 * _S, dtype=jnp.uint32)])
    return res[1], jnp.sum(m)


def use_partition_kernel() -> bool:
    if os.environ.get("PT_PARTITION", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if _KERNEL_STATE[0] is None:
        # never run the selftest while TRACING another computation
        # (eager pallas dispatch inside a trace can deadlock the remote
        # compile path); report False for this call but leave the state
        # untested so a later eager call still enables the kernel
        if not trace_state_clean():
            return False
    if _KERNEL_STATE[0] is None:
        # one-shot lowering selftest: a Mosaic verification failure on
        # this backend must disable the kernel (fall back to the carry
        # sort) rather than crash every group-by/filter. Transient
        # failures (tracer leak, tunnel hiccup) leave the state untested
        # for a bounded number of retries instead of poisoning it.
        try:
            import numpy as np
            cnt, want = _selftest_program()
            _KERNEL_STATE[0] = int(np.asarray(cnt)) == int(np.asarray(want))
        except Exception:
            _SELFTEST_TRIES[0] += 1
            if _SELFTEST_TRIES[0] >= 3:
                _KERNEL_STATE[0] = False
            return False
    return _KERNEL_STATE[0]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _flat_shift_left(x, s: int):
    """y[i] = x[i + s] over the block's row-major (R, 128) element
    order, circular at the block boundary (callers prove wrap reads are
    harmless). Static shift s."""
    if s % _LANES == 0:
        m = (s // _LANES) % _R
        return pltpu.roll(x, jnp.int32(_R - m), axis=0) if m else x
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    a = pltpu.roll(x, jnp.int32(_LANES - s), axis=1)  # x[r,(l+s)%128]
    xr = pltpu.roll(x, jnp.int32(_R - 1), axis=0)  # x[(r+1) % R, l]
    b = pltpu.roll(xr, jnp.int32(_LANES - s), axis=1)
    return jnp.where(lane < jnp.int32(_LANES - s), a, b)


def _lane_bcast_last(x):
    """Broadcast lane 127's value across each row (x is zero elsewhere,
    values non-negative): log-max with left circular lane shifts."""
    f = x
    for sh in (1, 2, 4, 8, 16, 32, 64):
        f = jnp.maximum(f, pltpu.roll(f, jnp.int32(_LANES - sh), axis=1))
    return f


def _block_delta(live):
    """Per-element left displacement to its stable-compaction slot:
    delta = flat_idx - rank for live elements, 0 for dead. Computed with
    in-VMEM log-step scans (lane cumsum + row-prefix broadcast)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 0)
    cs = live
    for sh in (1, 2, 4, 8, 16, 32, 64):
        cs = cs + jnp.where(lane >= jnp.int32(sh),
                            pltpu.roll(cs, jnp.int32(sh), axis=1),
                            jnp.int32(0))
    # per-row totals live at lane 127
    d = jnp.where(lane == jnp.int32(_LANES - 1), cs, jnp.int32(0))
    e = d
    sh = 1
    while sh < _R:
        e = e + jnp.where(row >= jnp.int32(sh),
                          pltpu.roll(e, jnp.int32(sh), axis=0),
                          jnp.int32(0))
        sh *= 2
    tot_b = _lane_bcast_last(d)        # this row's live count
    incl_b = _lane_bcast_last(e)       # inclusive row-prefix of counts
    rank_incl = cs + (incl_b - tot_b)  # 1-based rank among live
    flat = row * jnp.int32(_LANES) + lane
    return jnp.where(live > 0, flat - (rank_incl - jnp.int32(1)),
                     jnp.int32(0))


def _shift_compact(live, arrs):
    """Stable in-VMEM compaction of a (R, 128) block: live elements end
    at their rank slot, order preserved; other slots are garbage.

    13 conditional-shift passes (LSB-first over the displacement bits):
    an element whose delta has bit k moves left by 2^k. Collision-free
    because displacements are non-decreasing in element order (the
    classic vector-machine compaction; replaces the 4-operand blocked
    lax.sort that cost 8.1 of the filter's 9.9 ms —
    tools/partition_probe.py). Block-boundary wrap reads are safe: a
    mover with delta >= 2^k implies >= 2^k dead elements, so every slot
    that can see a wrapped read is past the live prefix."""
    delta = _block_delta(live)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _LANES), 1)
    for k in range(_PASSES):
        s = 1 << k
        if s % _LANES == 0:
            m = (s // _LANES) % _R
            sh0 = jnp.int32(_R - m)

            def fsl(x, sh0=sh0):
                return pltpu.roll(x, sh0, axis=0)
        else:
            lm = lane < jnp.int32(_LANES - s)
            shl = jnp.int32(_LANES - s)
            shr = jnp.int32(_R - 1)

            def fsl(x, lm=lm, shl=shl, shr=shr):
                # roll axes commute: x[r+1, l+s] = lane-roll then row-roll
                a = pltpu.roll(x, shl, axis=1)
                b = pltpu.roll(a, shr, axis=0)
                return jnp.where(lm, a, b)

        sd = fsl(delta)
        mv = jnp.bitwise_and(jax.lax.shift_right_logical(sd, jnp.int32(k)),
                             jnp.int32(1)) == jnp.int32(1)
        arrs = [jnp.where(mv, fsl(a), a) for a in arrs]
        delta = jnp.where(mv, sd, delta)
    return arrs


def _partition_concat_kernel(offs_ref, *refs, n_ops: int):
    """Fused stable partition + prefix concat: per block, compact the
    live rows in VMEM (13 shift passes), then rotate/merge/write into
    the global live prefix exactly like `_concat_kernel`."""
    mask_ref = refs[0]
    in_refs = refs[1:1 + n_ops]
    out_refs = refs[1 + n_ops:1 + 2 * n_ops]
    stage = refs[1 + 2 * n_ops]      # VMEM (n_ops, R+1, 128) staging
    prev = refs[1 + 2 * n_ops + 1]   # VMEM (n_ops, 1, 128) straddle row
    sems = refs[1 + 2 * n_ops + 2]   # DMA sems (n_ops, 2)
    b = pl.program_id(0)
    off = offs_ref[b]
    row0 = off // jnp.int32(_LANES)
    k = off % jnp.int32(_LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R + 1, _LANES), 1)

    wi = [jnp.int32(w) for w in range(n_ops)]
    for w in range(n_ops):
        pltpu.make_async_copy(out_refs[w].at[pl.ds(row0, 1)],
                              prev.at[wi[w]],
                              sems.at[wi[w], jnp.int32(0)]).start()

    live = mask_ref[:].astype(jnp.int32)
    compacted = _shift_compact(live, [in_refs[w][:] for w in range(n_ops)])

    for w in range(n_ops):
        pltpu.make_async_copy(out_refs[w].at[pl.ds(row0, 1)],
                              prev.at[wi[w]],
                              sems.at[wi[w], jnp.int32(0)]).wait()

    for w in range(n_ops):
        xr = pltpu.roll(compacted[w], k, axis=1)  # dynamic lane rotation
        zero = jnp.zeros((1, _LANES), compacted[w].dtype)
        top = jnp.concatenate([zero, xr], axis=0)     # top[r] = xr[r-1]
        bot = jnp.concatenate([xr, zero], axis=0)     # bot[r] = xr[r]
        staged = jnp.where(lane < k, top, bot)        # (R+1, 128)
        head = jnp.where((lane[:1] < k) & (jnp.int32(0) < k),
                         prev[wi[w]], staged[:1])
        stage[wi[w], :, :] = jnp.concatenate([head, staged[1:]], axis=0)
    for w in range(n_ops):
        pltpu.make_async_copy(stage.at[wi[w]],
                              out_refs[w].at[pl.ds(row0, _R + 1)],
                              sems.at[wi[w], jnp.int32(1)]).start()
    for w in range(n_ops):
        pltpu.make_async_copy(stage.at[wi[w]],
                              out_refs[w].at[pl.ds(row0, _R + 1)],
                              sems.at[wi[w], jnp.int32(1)]).wait()


@functools.partial(jax.jit, static_argnames=("n_ops",))
def _partition_concat(offs, mask32, *words, n_ops: int):
    """One Pallas pass: per-block stable compaction + global prefix
    concat. Replaces blocked lax.sort + `_prefix_concat`."""
    n = words[0].shape[0]
    B = n // _S
    rows = n // _LANES
    dts = [w.dtype for w in words]
    words = [w if w.dtype == jnp.uint32 else
             jax.lax.bitcast_convert_type(w, jnp.uint32) for w in words]
    arrs = [w.reshape(rows, _LANES) for w in words]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((_R, _LANES),
                               lambda b, offs: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)
                  for _ in range(n_ops + 1)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
                   for _ in range(n_ops)],
        scratch_shapes=[
            pltpu.VMEM((n_ops, _R + 1, _LANES), jnp.uint32),
            pltpu.VMEM((n_ops, 1, _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_ops, 2)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_partition_concat_kernel, n_ops=n_ops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows + 1, _LANES), jnp.uint32)
                   for _ in words],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(offs, mask32.reshape(rows, _LANES), *arrs)
    flat = [o[:rows].reshape(n) for o in outs]
    return [f if dt == jnp.uint32 else jax.lax.bitcast_convert_type(f, dt)
            for f, dt in zip(flat, dts)]


def _concat_kernel(offs_ref, *refs, n_ops: int):
    in_refs = refs[:n_ops]
    out_refs = refs[n_ops:2 * n_ops]
    stage = refs[2 * n_ops]      # VMEM (n_ops, R+1, 128) staging
    prev = refs[2 * n_ops + 1]   # VMEM (n_ops, 1, 128) straddle-row readback
    sems = refs[2 * n_ops + 2]   # DMA sems (n_ops, 2)
    b = pl.program_id(0)
    off = offs_ref[b]
    row0 = off // jnp.int32(_LANES)
    k = off % jnp.int32(_LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R + 1, _LANES), 1)

    # read back the straddle rows (previous block's write already
    # completed — sequential grid + end-of-body waits)
    # scratch indices must be typed i32: a python int traces as i64
    # under x64 mode and tpu.memref_slice rejects it
    wi = [jnp.int32(w) for w in range(n_ops)]
    for w in range(n_ops):
        pltpu.make_async_copy(out_refs[w].at[pl.ds(row0, 1)],
                              prev.at[wi[w]],
                              sems.at[wi[w], jnp.int32(0)]).start()
    for w in range(n_ops):
        pltpu.make_async_copy(out_refs[w].at[pl.ds(row0, 1)],
                              prev.at[wi[w]],
                              sems.at[wi[w], jnp.int32(0)]).wait()

    for w in range(n_ops):
        x = in_refs[w][:]                       # (R, 128)
        xr = pltpu.roll(x, k, axis=1)           # dynamic lane rotation
        zero = jnp.zeros((1, _LANES), x.dtype)
        top = jnp.concatenate([zero, xr], axis=0)     # top[r] = xr[r-1]
        bot = jnp.concatenate([xr, zero], axis=0)     # bot[r] = xr[r]
        staged = jnp.where(lane < k, top, bot)        # (R+1, 128)
        head = jnp.where((lane[:1] < k) & (jnp.int32(0) < k),
                         prev[wi[w]], staged[:1])
        stage[wi[w], :, :] = jnp.concatenate([head, staged[1:]], axis=0)
    for w in range(n_ops):
        pltpu.make_async_copy(stage.at[wi[w]],
                              out_refs[w].at[pl.ds(row0, _R + 1)],
                              sems.at[wi[w], jnp.int32(1)]).start()
    # wait before the next grid step: it reads our straddle row and
    # overwrites our garbage tail, so our writes must land first
    for w in range(n_ops):
        pltpu.make_async_copy(stage.at[wi[w]],
                              out_refs[w].at[pl.ds(row0, _R + 1)],
                              sems.at[wi[w], jnp.int32(1)]).wait()


@functools.partial(jax.jit, static_argnames=("n_ops",))
def _prefix_concat(offs, *words, n_ops: int):
    n = words[0].shape[0]
    B = n // _S
    rows = n // _LANES
    # one shared u32 staging dtype (callers mix u32/i32/f32 words)
    dts = [w.dtype for w in words]
    words = [w if w.dtype == jnp.uint32 else
             jax.lax.bitcast_convert_type(w, jnp.uint32) for w in words]
    arrs = [w.reshape(rows, _LANES) for w in words]
    # +1 pad row: the last block's rotated write spans R+1 rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((_R, _LANES),
                               lambda b, offs: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)
                  for _ in range(n_ops)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
                   for _ in range(n_ops)],
        scratch_shapes=[
            pltpu.VMEM((n_ops, _R + 1, _LANES), words[0].dtype),
            pltpu.VMEM((n_ops, 1, _LANES), words[0].dtype),
            pltpu.SemaphoreType.DMA((n_ops, 2)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_concat_kernel, n_ops=n_ops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows + 1, _LANES), jnp.uint32)
                   for _ in words],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(offs, *arrs)
    flat = [o[:rows].reshape(n) for o in outs]
    return [f if dt == jnp.uint32 else jax.lax.bitcast_convert_type(f, dt)
            for f, dt in zip(flat, dts)]


def compact_words(mask: jax.Array, words: List[jax.Array]
                  ) -> Optional[Tuple[List[jax.Array], jax.Array]]:
    """Stable-compact `words` so rows where mask is True form a prefix
    (original order preserved); tail rows are garbage. Returns
    (compacted words, live count) or None when the shape doesn't fit
    the kernel (caller falls back to the carry sort)."""
    n = mask.shape[0]
    if n % _S != 0 or n < 2 * _S:
        return None
    if any(w.dtype.itemsize != 4 for w in words):
        return None
    B = n // _S
    counts = jnp.sum(mask.reshape(B, _S), axis=1, dtype=jnp.int32)
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    if os.environ.get("PT_PARTITION_SHIFT", "1") != "0":
        # fused path: in-VMEM 13-pass shift compaction + prefix concat
        # in ONE kernel (the blocked 4-op lax.sort it replaces was 8.1
        # of the filter's 9.9 ms — tools/partition_probe.py)
        outs = _partition_concat(offs, mask.astype(jnp.uint32), *words,
                                 n_ops=len(words))
        return list(outs), jnp.sum(counts)
    lidx = jax.lax.broadcasted_iota(jnp.uint32, (B, _S), 1)
    key = jnp.where(mask.reshape(B, _S), jnp.uint32(0),
                    jnp.uint32(1) << jnp.uint32(13)) | lidx
    ops = (key,) + tuple(w.reshape(B, _S) for w in words)
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1,
                              is_stable=False)
    flat = [o.reshape(n) for o in sorted_ops[1:]]
    outs = _prefix_concat(offs, *flat, n_ops=len(flat))
    return list(outs), jnp.sum(counts)
