"""Host-side sorted string dictionaries.

TPU-native replacement for the reference's binview ("German string") arrays
(`crates/polars-arrow/src/array/binview/`): devices hold only fixed-width
int32 *codes*; the variable-length bytes live in a host-side **sorted**
dictionary. Because the dictionary is sorted, code order == lexicographic
string order, so device-side comparisons, sorts, group-bys and joins on
strings are plain integer ops — the same trick polars uses for
`Categorical(ordering="lexical")` but applied to every string column.

Null is encoded as code -1 (validity mask remains authoritative).

String *functions* (upper/lower/len/contains/...) evaluate as a host-side
transform of the (small) dictionary producing a per-code lookup table that
is gathered on device — O(unique) host work instead of O(rows).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

NULL_CODE = np.int32(-1)


_DICT_COUNTER = [0]


class StringDict:
    """Immutable sorted dictionary of unique strings."""

    __slots__ = ("values", "_index", "version")

    def __init__(self, values: np.ndarray):
        # values must be sorted unique, dtype=object or str
        self.values = values
        self._index: Optional[dict] = None
        # monotonic id for compile-cache keys (id() can be reused by GC)
        _DICT_COUNTER[0] += 1
        self.version = _DICT_COUNTER[0]

    def __len__(self) -> int:
        return len(self.values)

    def __repr__(self) -> str:
        return f"StringDict(n={len(self.values)})"

    # ------------------------------------------------------------------
    @staticmethod
    def encode(strings: np.ndarray, mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, "StringDict"]:
        """Encode an array of python/numpy strings (or bytes, for the
        Binary dtype — same sorted-dictionary design) to int32 codes."""
        obj = np.asarray(strings, dtype=object)
        if mask is None:
            mask = np.array([s is not None for s in obj], dtype=bool)
        first = next((s for s, m in zip(obj, mask) if m), None)
        if isinstance(first, (bytes, bytearray)):
            # bytes sort correctly as objects; never round-trip through
            # numpy "S"/str dtypes (both mangle embedded/trailing NULs)
            uniq_list = sorted({bytes(s) for s, m in zip(obj, mask) if m})
            index = {s: i for i, s in enumerate(uniq_list)}
            codes = np.array(
                [index[bytes(s)] if m else NULL_CODE
                 for s, m in zip(obj, mask)], dtype=np.int32)
            return codes, StringDict(np.array(uniq_list, dtype=object))
        filled = np.where(mask, obj, "")
        uniq, inv = np.unique(filled.astype(str), return_inverse=True)
        codes = inv.astype(np.int32)
        codes[~mask] = NULL_CODE
        return codes, StringDict(uniq)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        out = np.empty(len(codes), dtype=object)
        valid = codes >= 0
        out[valid] = self.values[codes[valid]]
        out[~valid] = None
        return out

    # --- literal binding (for comparisons against string literals) ------
    def find(self, s: str) -> Optional[int]:
        """Exact code of `s`, or None if absent."""
        i = int(np.searchsorted(self.values, s))
        if i < len(self.values) and self.values[i] == s:
            return i
        return None

    def lower_bound(self, s: str) -> int:
        """First code whose string >= s. `col < s` <=> `code < lower_bound(s)`,
        `col <= s` <=> `code < upper_bound(s)`."""
        return int(np.searchsorted(self.values, s, side="left"))

    def upper_bound(self, s: str) -> int:
        return int(np.searchsorted(self.values, s, side="right"))

    # --- merging (for joins / concats across columns) -------------------
    def merge(self, other: "StringDict"
              ) -> Tuple["StringDict", np.ndarray, np.ndarray]:
        """Union two dictionaries. Returns (merged, remap_self, remap_other)
        where remap_x maps old code -> new code (int32 arrays, indexable on
        device via gather). Index -1 is preserved by convention: callers
        gather with `jnp.where(code >= 0, remap[code], -1)`."""
        merged = np.union1d(self.values, other.values)
        remap_a = np.searchsorted(merged, self.values).astype(np.int32)
        remap_b = np.searchsorted(merged, other.values).astype(np.int32)
        return StringDict(merged), remap_a, remap_b

    # --- per-code transforms --------------------------------------------
    def map_to_array(self, fn: Callable[[str], object], dtype) -> np.ndarray:
        """Apply `fn` to every dictionary entry -> numpy lookup table
        (one entry per code) for device-side gather."""
        out = np.empty(len(self.values), dtype=dtype)
        for i, v in enumerate(self.values):
            out[i] = fn(v)
        return out

    def map_to_strings(self, fn: Callable[[str], str]
                       ) -> Tuple["StringDict", np.ndarray]:
        """Apply a str->str fn; returns (new sorted dict, remap old->new)."""
        mapped = np.array([fn(v) for v in self.values], dtype=object)
        uniq, inv = np.unique(mapped.astype(str), return_inverse=True)
        return StringDict(uniq), inv.astype(np.int32)


EMPTY_DICT = StringDict(np.array([], dtype=object))
