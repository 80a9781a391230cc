"""Fused-word device sort — the engine's fast sort primitive.

TPU-native replacement for the reference's comparison par_sort
(`polars-core/src/chunked_array/ops/sort/mod.rs:96`; SURVEY §7
"Comparison par_sort → radix sort on packed keys" row). The design is
the packed-key idea taken to where this chip is actually fastest:
instead of scattering 8-bit digits through HBM (a radix pass needs a
data-dependent scatter, and v5e has no fast one — XLA gather/scatter
measured 60–290 ms for 8.4M elements), the key AND its cargo are packed
into ONE 64-bit word and sorted in a single-operand `lax.sort`, whose
vectorized in-VMEM sorter is the one reorder primitive this toolchain
runs near speed-of-light.

Measured on v5e under x64 (tools/sort_truth_probe.py + bucket_probe*.py,
2026-08-21, 8.4M rows):

  lax.sort (key,payload) stable 2-op    21.8 ms   (the r3 sort path)
  (key, idx) stable argsort 2-op        16.0 ms
  lax.sort (key,payload) unstable       14.0 ms
  fused u64 single-op incl pack/unpack  12.8 ms  ← this module
  lax.sort raw u64 single-op            15.7 ms  (64-bit emulated)
  lax.sort raw u32 single-op             7.7 ms
  per-8192-block fused u32 single-op     1.10 ms  (used by hgroup)

Alternatives built and rejected with the same probes: hierarchical
bitonic merge (ops/merge_sort.py — per-level HBM passes 8x off
bandwidth), sample-sort with padded bucket transpose (level-2 re-sort
dominates: 9.2 ms alone at S=262144), LSD radix via block sorts +
bucket exchange (payload movement costs 3.2 ms/word/pass through
2-op block sorts — 4 passes lose to one fused sort), Leighton
columnsort (4 column-sort rounds ≈ 11 ms), 8-bit-digit LSD via fused
u32 passes (each pass needs a permutation apply, and XLA gathers cost
60–290 ms at this size). The fused word wins because `lax.sort` pays
per OPERAND: the emulated-64-bit single operand (15.7) still beats
key+payload as two operands once stability is required (21.8), and
the packed form amortizes the pack into the win (12.8).

Packings (n ≤ 2^31 rows; "hi" orders before "lo"):

  kv       hi=key            lo=cargo        full sort of a 2-word row;
                                             ties in `key` order by
                                             cargo — deterministic
                                             unstable sort (polars'
                                             maintain_order=False)
  masked   dead rows become (~0, ~0)         dead rows sort last; ties
                                             against a live all-ones row
                                             are harmless because equal
                                             packed words are
                                             bit-identical rows
  argsort  hi=key|~0 if dead  lo=dead<<31|idx  stable argsort, dead rows
                                             after live rows of equal key
                                             (and after everything via
                                             the forced ~0 key)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_FULL = jnp.uint32(0xFFFFFFFF)


def _pack2(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """(hi, lo) u32 -> u64. Arithmetic on purpose: the X64-rewrite pass
    on v5e (no native 64-bit) legalizes u64 shift/or into u32 pairs but
    CANNOT legalize a bitcast-convert INTO u64 ("While rewriting
    computation to not contain X64 element types ... not implemented").
    The narrowing direction (u64 -> u32[...,2]) is native — see
    _unpack2."""
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _unpack2(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """u64 -> (hi, lo) u32, arithmetic only — the X64 rewriter also
    fails on the narrowing bitcast when it appears behind broadcasts
    (q6 on axon: "bitcast-convert ... not implemented")."""
    return ((w >> jnp.uint64(32)).astype(jnp.uint32),
            (w & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def fused_sort_kv(key: jax.Array, cargo: jax.Array,
                  live: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Sort (key, cargo) u32 pairs by key (ties by cargo) in ONE
    single-operand u64 `lax.sort`. Dead rows (live=False) sort last as
    all-ones words; a live row that is itself (0xFFFFFFFF, 0xFFFFFFFF)
    ties bit-identically with them, so any live/dead interleaving
    within the tie run yields the same first-`count` rows."""
    hi = key.astype(jnp.uint32)
    lo = cargo.astype(jnp.uint32)
    if live is not None:
        hi = jnp.where(live, hi, _FULL)
        lo = jnp.where(live, lo, _FULL)
    ws = jax.lax.sort((_pack2(hi, lo),), num_keys=1, is_stable=False)[0]
    return _unpack2(ws)


def fused_argsort_dead_key(dead: jax.Array, key: jax.Array
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stable argsort by (dead, key) — the group-layout sort of
    build_groups — packed [dead:1 | key:32 | idx:31] into one u64
    operand. Returns (dead_s, key_s, perm) in sorted order; dead must
    be 0/1, n < 2^31."""
    n = key.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    d = dead.astype(jnp.uint32)
    k = key.astype(jnp.uint32)
    hi = (d << jnp.uint32(31)) | (k >> jnp.uint32(1))
    lo = (k << jnp.uint32(31)) | idx
    ws = jax.lax.sort((_pack2(hi, lo),), num_keys=1, is_stable=False)[0]
    shi, slo = _unpack2(ws)
    dead_s = shi >> jnp.uint32(31)
    key_s = (shi << jnp.uint32(1)) | (slo >> jnp.uint32(31))
    perm = (slo & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    return dead_s, key_s, perm


def apply_perm_u32(perm: jax.Array, word: jax.Array) -> jax.Array:
    """out[j] = word[i] where perm[i] == j — i.e. scatter `word` (in
    permuted space) back to the space `perm` points into, WITHOUT a
    device scatter/gather: one fused sort of (perm, word) pairs by
    perm. `perm` must be a permutation of 0..n-1 (unique), so ties
    never occur and the pairing is exact. This is the engine's
    writeback primitive: XLA gathers cost ~7 ns/element (60 ms at
    8.4M) while this costs one fused sort (~12.8 ms at 8.4M, ~6.4 at
    4M)."""
    _, out = fused_sort_kv(perm.astype(jnp.uint32), word)
    return out


def fused_argsort(key: jax.Array, live: Optional[jax.Array] = None,
                  ) -> Tuple[jax.Array, jax.Array]:
    """Stable argsort of a u32 key word with dead rows last.

    Returns (sorted_key, perm): perm[i] = original row index of the
    row at sorted position i. Dead rows take key=~0 (sorting after all
    live keys) and dead-bit 31 in the low word (sorting after live
    rows that genuinely hold key ~0). n < 2^31."""
    n = key.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    hi = key.astype(jnp.uint32)
    lo = idx
    if live is not None:
        hi = jnp.where(live, hi, _FULL)
        lo = jnp.where(live, lo, lo | jnp.uint32(0x80000000))
    ws = jax.lax.sort((_pack2(hi, lo),), num_keys=1, is_stable=False)[0]
    skey, slo = _unpack2(ws)
    return skey, (slo & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
