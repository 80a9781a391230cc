"""Order-preserving key encoding ("row format").

TPU-native replacement for the reference's polars-row encoding
(`crates/polars-row/src/lib.rs:1-60`, `encode.rs:23`): instead of packing
variable-length big-endian byte rows, we encode every key column into
fixed-width unsigned *words* whose integer order equals the logical order:

  * signed ints:  flip the sign bit           (lib.rs int scheme)
  * floats:       sign bit set -> ~bits, else bits | signbit
                  (the mantissa-tweak trick from polars-row)
  * bools:        0/1
  * strings:      dictionary codes are already order-preserving
                  (sorted dicts, see `strings.py`)
  * descending:   bitwise NOT of the word
  * nulls:        a dedicated leading bit folded into the word when spare
                  bits exist, else a separate null-key word
                  (null_sentinel analogue, `polars-row/src/row.rs:59-114`)

Multi-key sorts feed the word list to `lax.sort` multi-operand
lexicographic sort; group-bys/joins pack words into as few uint32/uint64
lanes as fit (bit-budget packing) so comparisons stay single-word.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def encode_orderable(x, descending: bool = False):
    """Map an array to same-width unsigned ints with order preserved."""
    dt = x.dtype
    if dt == jnp.bool_:
        u = x.astype(jnp.uint32)
    elif jnp.issubdtype(dt, jnp.floating):
        if dt.itemsize == 8 and jax.default_backend() == "cpu":
            b = jax.lax.bitcast_convert_type(x, jnp.uint64)
            sign = b >> jnp.uint64(63)
            u = jnp.where(sign == 1, ~b, b | jnp.uint64(1) << jnp.uint64(63))
        else:
            # f64 on accelerator: the chip computes f64 as f32 anyway
            # (X64 rewrite) and cannot legalize the f64 bitcast — order
            # by the f32 encoding (identical order up to f32 ulp)
            b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
            sign = b >> jnp.uint32(31)
            u = jnp.where(sign == 1, ~b, b | (jnp.uint32(1) << jnp.uint32(31)))
    elif jnp.issubdtype(dt, jnp.unsignedinteger):
        u = x
    else:  # signed int: flip sign bit
        w = dt.itemsize * 8
        udt = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[w]
        u = jax.lax.bitcast_convert_type(x, udt) ^ (
            jnp.array(1, udt) << jnp.array(w - 1, udt))
    if descending:
        u = ~u
    return u


def encode_key_words(x, validity, descending: bool, nulls_last: bool
                     ) -> List[jax.Array]:
    """Encode one key column (+null placement) into a list of uint32 words,
    most significant first. Nulls get an extra leading word (0/1/2) only
    when validity exists."""
    u = encode_orderable(x, descending)
    words: List[jax.Array] = []
    if validity is not None:
        # null key: nulls_last -> nulls sort after everything
        nk = jnp.where(validity, jnp.uint32(1),
                       jnp.uint32(2) if nulls_last else jnp.uint32(0))
        words.append(nk)
    if u.dtype.itemsize == 8:
        words.append((u >> jnp.uint64(32)).astype(jnp.uint32))
        words.append((u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    else:
        words.append(u.astype(jnp.uint32))
    if validity is not None:
        # neutralize value words for nulls so null rows compare equal
        words[1:] = [jnp.where(validity, w, jnp.uint32(0)) for w in words[1:]]
    return words


def lex_sort_indices(key_words: Sequence[jax.Array],
                     tail_operands: Sequence[jax.Array] = ()
                     ) -> Tuple[List[jax.Array], List[jax.Array], jax.Array]:
    """Stable lexicographic sort by the given key words.
    Returns (sorted key words, sorted tail operands, permutation); the
    permutation maps sorted slot -> original row."""
    cap = key_words[0].shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    ops = tuple(key_words) + tuple(tail_operands) + (idx,)
    from .merge_sort import sort_ops
    out = sort_ops(list(ops), len(key_words), is_stable=True)
    keys = list(out[:len(key_words)])
    tails = list(out[len(key_words):-1])
    perm = out[-1]
    return keys, tails, perm


# ---------------------------------------------------------------------------
# bit-budget packing (for group-by / join keys where only equality matters
# or where orderable single-word keys speed up sorting)
# ---------------------------------------------------------------------------

def column_bit_width(x, validity) -> jax.Array:
    """Bits needed to represent (max - min) of the encoded column, +1 if
    nullable. Returns (bits, minval) as device scalars (uint64)."""
    u = encode_orderable(x).astype(jnp.uint64)
    big = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    if validity is not None:
        mn = jnp.min(jnp.where(validity, u, big))
        mx = jnp.max(jnp.where(validity, u, jnp.uint64(0)))
    else:
        mn = jnp.min(u)
        mx = jnp.max(u)
    span = mx - jnp.minimum(mn, mx)
    # ceil(log2(span+2)): +1 slot reserved for null
    bits = jnp.ceil(jnp.log2(span.astype(jnp.float64 if jax.config.jax_enable_x64
                                         else jnp.float32) + 2)).astype(jnp.int32)
    return jnp.maximum(bits, 1), mn


def pack_keys_single_word(columns, validities, bits: Sequence[int],
                          mins, nulls_last: Optional[Sequence[bool]] = None
                          ) -> jax.Array:
    """Pack multiple key columns into ONE uint64 word given per-column bit
    budgets (host-known ints). Order-preserving within each column and
    lexicographic across columns (first column = most significant).

    Null placement per column (the null_sentinel analogue of
    `polars-row/src/row.rs:59-114`): nulls-first columns encode null as
    code 0 and valid values as (u - min + 1); nulls-last columns encode
    valid values as (u - min) and null as the max code (2^b - 1) — the
    bit budget ceil(log2(span+2)) guarantees max valid code <= 2^b - 2,
    so the sentinel never collides."""
    total = sum(bits)
    if total > 64:
        raise ValueError(f"bit budget {total} exceeds 64")
    if nulls_last is None:
        nulls_last = [False] * len(bits)
    acc = None
    for x, valid, b, mn, nl in zip(columns, validities, bits, mins,
                                   nulls_last):
        u = encode_orderable(x).astype(jnp.uint64)
        if nl:
            v = u - mn
            if valid is not None:
                sentinel = (jnp.uint64(1) << jnp.uint64(b)) - jnp.uint64(1)
                v = jnp.where(valid, v, sentinel)
        else:
            v = u - mn + jnp.uint64(1)
            if valid is not None:
                v = jnp.where(valid, v, jnp.uint64(0))
        acc = v if acc is None else ((acc << jnp.uint64(b)) | v)
    return acc


def unpack_keys_single_word(packed, bits: Sequence[int]):
    """Inverse of pack for diagnostics; returns offset codes per column."""
    out = []
    shift = 0
    for b in reversed(list(bits)):
        mask = (jnp.uint64(1) << jnp.uint64(b)) - jnp.uint64(1)
        out.append((packed >> jnp.uint64(shift)) & mask)
        shift += b
    return list(reversed(out))


def col_to_u32_words(data) -> list:
    """Reinterpret a 1-D column buffer as 1 or 2 uint32 word arrays."""
    dt = data.dtype
    if dt == jnp.bool_:
        return [data.astype(jnp.uint32)]
    if dt == jnp.float64 and jax.default_backend() != "cpu":
        # v5e: NO 64-bit bitcast legalizes through the X64 rewriter in
        # either direction (f64<->u32[n,2], and even jnp.frexp fails —
        # it bitcasts internally; tools/f64_words_probe.py), yet f64
        # COMPUTE is emulated exactly (hash-path f64 scans match numpy
        # to 15 digits). Transport as a DOUBLE-FLOAT (hi, lo) f32 pair:
        # ~49-bit precision via value converts only — the same
        # precision contract as the engine's f32-compensated
        # accumulators (groupby c259773). The r4 single-f32 transport
        # silently squashed f64 aggregates to 24 bits (~2% std errors
        # on small groups through the compacted hash path).
        hi = data.astype(jnp.float32)
        lo = jnp.where(jnp.isfinite(hi),
                       data - hi.astype(jnp.float64),
                       jnp.float64(0)).astype(jnp.float32)
        return [jax.lax.bitcast_convert_type(hi, jnp.uint32),
                jax.lax.bitcast_convert_type(lo, jnp.uint32)]
    if dt.itemsize <= 4:
        if dt.itemsize < 4:
            data = data.astype(
                jnp.int32 if jnp.issubdtype(dt, jnp.signedinteger)
                else jnp.uint32)
        u = jax.lax.bitcast_convert_type(
            data, jnp.uint32 if data.dtype.itemsize == 4 else data.dtype)
        if u.dtype != jnp.uint32:
            u = u.astype(jnp.uint32)
        return [u]
    # 8-byte: bitcast straight to (n, 2) u32 words — the X64-rewrite
    # pass on TPU (v5e has no native 64-bit) cannot legalize a
    # bitcast INTO u64, but the widening/narrowing u32 form is native.
    # Trailing index 0 holds the LOW 32 bits.
    w = jax.lax.bitcast_convert_type(data, jnp.uint32)
    return [w[..., 1], w[..., 0]]


def col_from_u32_words(words, stor):
    """Inverse of _col_u32_words for a target numpy storage dtype."""
    stor = jnp.dtype(stor)
    if stor == jnp.float64 and len(words) == 1:
        # legacy single-f32 transport (CPU never takes it; kept for
        # word-count compatibility)
        return jax.lax.bitcast_convert_type(
            words[0], jnp.float32).astype(jnp.float64)
    if stor == jnp.float64 and jax.default_backend() != "cpu":
        # double-float (hi, lo) f32 pair — see col_to_u32_words
        hi = jax.lax.bitcast_convert_type(words[0], jnp.float32)
        lo = jax.lax.bitcast_convert_type(words[1], jnp.float32)
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)
    if len(words) == 2:
        return jax.lax.bitcast_convert_type(
            jnp.stack([words[1], words[0]], axis=-1), stor)
    w = words[0]
    if stor == jnp.bool_:
        return w != 0
    if stor.itemsize < 4:
        return w.astype(stor)
    return jax.lax.bitcast_convert_type(w, stor)


def decode_orderable(u, dtype, descending: bool):
    """Inverse of keycode.encode_orderable for a uint64/uint32-encoded
    value (u already truncated to the dtype's width in the low bits)."""
    import jax.lax as lax
    stor = jnp.dtype(dtype)
    if descending:
        u = ~u  # encode_orderable(desc) is NOT of the ascending encoding
    if stor.kind == "f":
        if stor.itemsize == 8:
            if jax.default_backend() != "cpu":
                # f64 keys encode as f32 words on accelerators (see
                # encode_orderable) — decode the low 32 bits
                u32 = u.astype(jnp.uint32)
                sign = (u32 >> jnp.uint32(31)) & jnp.uint32(1)
                raw = jnp.where(sign == 1,
                                u32 ^ (jnp.uint32(1) << jnp.uint32(31)),
                                ~u32)
                return lax.bitcast_convert_type(
                    raw, jnp.float32).astype(jnp.float64)
            sign = (u >> jnp.uint64(63)) & jnp.uint64(1)
            raw = jnp.where(sign == 1,
                            u ^ (jnp.uint64(1) << jnp.uint64(63)), ~u)
            return lax.bitcast_convert_type(raw, jnp.float64)
        u32 = u.astype(jnp.uint32)
        sign = (u32 >> jnp.uint32(31)) & jnp.uint32(1)
        raw = jnp.where(sign == 1, u32 ^ (jnp.uint32(1) << jnp.uint32(31)),
                        ~u32)
        return lax.bitcast_convert_type(raw, jnp.float32)
    if stor.kind == "u":
        return u.astype(stor)
    if stor.kind == "b":
        return (u & jnp.uint64(1)) != 0
    w = stor.itemsize * 8
    udt = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32,
           8: jnp.uint64}[stor.itemsize]
    uu = u.astype(udt) ^ (jnp.asarray(1, udt) << jnp.asarray(w - 1, udt))
    return lax.bitcast_convert_type(uu, stor)
