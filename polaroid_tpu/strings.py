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

# content-fingerprint -> (codes, StringDict) memo for large encodes
from collections import OrderedDict as _OrderedDict

_ENCODE_CACHE: "_OrderedDict[bytes, tuple]" = _OrderedDict()


def _arrow_fingerprint(arr) -> bytes:
    """blake2b over the arrow array's type, length and raw buffers —
    identical string content (incl. nulls) maps to one key."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    h.update(str(arr.type).encode())
    h.update(len(arr).to_bytes(8, "little"))
    h.update(int(arr.offset).to_bytes(8, "little"))
    for b in arr.buffers():
        if b is not None:
            h.update(b)
    return h.digest()


class StringDict:
    """Immutable sorted dictionary of unique strings.

    Values may be held as a pyarrow array and converted to a numpy
    object array lazily: device group-by/join/sort work on codes only,
    so a scan → aggregate pipeline never materializes python strings
    (the conversion alone costs ~0.4 s at 1M unique)."""

    __slots__ = ("_values", "_values_pa", "_len", "_index", "version")

    def __init__(self, values: Optional[np.ndarray] = None,
                 values_pa=None):
        # values must be sorted unique, dtype=object or str
        self._values = values
        self._values_pa = values_pa
        self._len = len(values) if values is not None else len(values_pa)
        self._index: Optional[dict] = None
        # monotonic id for compile-cache keys (id() can be reused by GC)
        _DICT_COUNTER[0] += 1
        self.version = _DICT_COUNTER[0]

    @property
    def values(self) -> np.ndarray:
        if self._values is None:
            v = self._values_pa.to_numpy(zero_copy_only=False)
            if v.dtype != object:
                v = v.astype(object)
            self._values = v
        return self._values

    def __len__(self) -> int:
        return self._len

    def __repr__(self) -> str:
        return f"StringDict(n={len(self.values)})"

    # ------------------------------------------------------------------
    @staticmethod
    def encode(strings: np.ndarray, mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, "StringDict"]:
        """Encode an array of python/numpy strings (or bytes, for the
        Binary dtype — same sorted-dictionary design) to int32 codes."""
        # ride arrow's C++ hash + sort: orders of magnitude faster than
        # np.unique on object arrays at high cardinality. Arrow infers
        # nulls from None directly (no host mask loop); binary stays
        # bytes (never round-trip numpy "S"/str dtypes — both mangle
        # embedded/trailing NULs) and sorts bytewise == python order.
        import pyarrow as pa
        raw = np.asarray(strings)
        if raw.dtype.kind == "U" and raw.dtype.itemsize > 0 and \
                (mask is None or bool(np.asarray(mask).all())):
            # zero-copy fast path: view the fixed-width UCS4 storage as
            # fixed-size binary and dictionary-encode the RAW bytes in
            # C++ (no 8M-row UTF-8 conversion — that alone cost 2.3 s at
            # the bench shape); only the O(unique) dictionary is decoded
            # and sorted, by code point == python str order
            return StringDict._encode_fixed_ucs4(np.ascontiguousarray(raw))
        if raw.dtype.kind in "US":
            # fixed-width numpy strings convert in C++ — never build
            # millions of PyUnicode objects (np.unique on U-dtype is
            # ~14x slower than arrow's hash path at 8M rows)
            pamask = None if mask is None or bool(mask.all()) else ~mask
            arr = pa.array(raw, mask=pamask)
        else:
            obj = np.asarray(strings, dtype=object)
            if mask is not None and not mask.all():
                obj = np.where(mask, obj, None)
            try:
                arr = pa.array(obj, from_pandas=True)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                arr = pa.array([bytes(s) if isinstance(s, (bytes, bytearray))
                                else s for s in obj], from_pandas=True)
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.large_string())
        elif pa.types.is_binary(arr.type) or \
                pa.types.is_fixed_size_binary(arr.type):
            arr = arr.cast(pa.large_binary())
        elif not pa.types.is_large_binary(arr.type) and \
                not pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.large_string())
        return StringDict.encode_arrow(arr)

    @staticmethod
    def _encode_fixed_ucs4(raw: np.ndarray) -> Tuple[np.ndarray,
                                                     "StringDict"]:
        """Encode a contiguous numpy U-dtype array via a zero-copy
        fixed-size-binary view: arrow's C++ hash groups identical UCS4
        byte patterns, then only the unique values round-trip to python
        strings. Content-fingerprint memoized like encode_arrow."""
        import hashlib
        import pyarrow as pa
        n = len(raw)
        itn = raw.dtype.itemsize
        byte_view = raw.view(np.uint8)
        fp = None
        if n >= (1 << 20):
            h = hashlib.blake2b(digest_size=16)
            h.update(b"ucs4")
            h.update(str(raw.dtype).encode())
            h.update(byte_view)
            fp = h.digest()
            hit = _ENCODE_CACHE.get(fp)
            if hit is not None:
                _ENCODE_CACHE.move_to_end(fp)
                codes, sdict = hit
                return codes.copy(), sdict
        arr = pa.Array.from_buffers(pa.binary(itn), n,
                                    [None, pa.py_buffer(byte_view)])
        d = arr.dictionary_encode()
        dic = d.dictionary
        k = len(dic)
        if k == 0:
            return (np.full(n, NULL_CODE, np.int32),
                    StringDict(np.array([], dtype=object)))
        if dic.offset != 0:  # defensive: frombuffer assumes offset 0
            dic = dic.combine_chunks() if hasattr(dic, "combine_chunks") \
                else dic
        dbytes = np.frombuffer(dic.buffers()[1], dtype=np.uint8,
                               count=k * itn)
        du = dbytes.view(raw.dtype).reshape(k)
        perm = np.argsort(du, kind="stable")  # code-point == str order
        rank = np.empty(k, np.int32)
        rank[perm] = np.arange(k, dtype=np.int32)
        codes = rank[d.indices.to_numpy().astype(np.int64)] \
            .astype(np.int32, copy=False)
        values = du[perm].astype(object)
        sdict = StringDict(values)
        if fp is not None:
            _ENCODE_CACHE[fp] = (codes.copy(), sdict)
            if len(_ENCODE_CACHE) > 8:
                _ENCODE_CACHE.popitem(last=False)
        return codes, sdict

    @staticmethod
    def _merge_dictionary_chunks(carr):
        """Merge a chunked DictionaryArray whose chunks share few
        distinct dictionaries (identified by buffer address): returns
        (indices int32 ndarray, valid bool ndarray | None, dictionary)
        with indices already remapped into the merged dictionary, or
        None when the layout is unexpected. Avoids combine_chunks'
        full re-unification (~1.8 s at 64 chunks x 660k entries)."""
        import pyarrow as pa
        try:
            chunks = [c for c in carr.chunks if len(c)]
            if not chunks:
                return None
            distinct: list = []       # list of dictionary arrays
            slot_of: dict = {}        # buffer address -> index in distinct
            chunk_slot = []
            for c in chunks:
                dic = c.dictionary
                if dic.null_count:
                    return None
                bufs = dic.buffers()
                addr = tuple(b.address for b in bufs if b is not None)
                if addr not in slot_of:
                    slot_of[addr] = len(distinct)
                    distinct.append(dic)
                chunk_slot.append(slot_of[addr])
            if len(distinct) == 1:
                dic = distinct[0]
                remaps = [None]
            else:
                # union the few distinct dictionaries (O(total entries))
                offs = np.cumsum([0] + [len(d) for d in distinct])
                alld = pa.concat_arrays(
                    [d.cast(distinct[0].type) for d in distinct])
                dd = alld.dictionary_encode()
                slots = dd.indices.to_numpy()
                dic = dd.dictionary
                remaps = [np.asarray(slots[offs[i]:offs[i + 1]], np.int32)
                          for i in range(len(distinct))]
            n = sum(len(c) for c in chunks)
            out = np.empty(n, np.int32)
            valid = None
            pos = 0
            for c, sl in zip(chunks, chunk_slot):
                idx = c.indices
                if idx.null_count:
                    if valid is None:
                        valid = np.ones(n, bool)
                    valid[pos:pos + len(c)] = ~np.asarray(idx.is_null())
                    raw = idx.fill_null(0).to_numpy()
                else:
                    raw = idx.to_numpy()
                if remaps[sl] is None:
                    out[pos:pos + len(c)] = raw
                else:
                    out[pos:pos + len(c)] = remaps[sl][raw]
                pos += len(c)
            return out, valid, dic
        except (pa.ArrowException, ValueError, TypeError):
            return None

    @staticmethod
    def encode_dictionary(arr) -> Tuple[np.ndarray, "StringDict"]:
        """Encode a pyarrow DictionaryArray (e.g. a parquet
        dictionary-encoded column read with `read_dictionary`) WITHOUT
        re-hashing the rows: only the O(unique) dictionary is sorted
        (C++), the O(rows) work is one int remap. The reference decodes
        parquet dictionaries straight into its categorical reprs
        (`polars-parquet/src/arrow/read/`); this is the sorted-dict
        analogue."""
        import hashlib
        import pyarrow as pa
        import pyarrow.compute as pc
        idx_np = valid_np = None
        fp_src = arr
        n_rows = len(arr)
        fp = None
        if n_rows >= (1 << 20):
            # hash indices per chunk but each DISTINCT dictionary once:
            # DictionaryArray.buffers() includes the dictionary buffers,
            # which chunks share (hashing them per chunk costs ~2 s at
            # 64 chunks x 11 MB)
            h = hashlib.blake2b(digest_size=16)
            chunks = fp_src.chunks if isinstance(fp_src, pa.ChunkedArray) \
                else [fp_src]
            seen_bufs = set()
            for c in chunks:
                h.update(str(c.type).encode())
                h.update(len(c).to_bytes(8, "little"))
                h.update(int(c.offset).to_bytes(8, "little"))
                # chunks are SLICES over shared buffers (indices) and
                # share dictionary buffers: hash each distinct buffer
                # once — rehashing per chunk costs ~1.6 s at 64 chunks
                for b in list(c.indices.buffers()) + \
                        list(c.dictionary.buffers()):
                    if b is not None and b.address not in seen_bufs:
                        seen_bufs.add(b.address)
                        h.update(b)
            fp = h.digest()
            hit = _ENCODE_CACHE.get(fp)
            if hit is not None:
                _ENCODE_CACHE.move_to_end(fp)
                codes, sdict = hit
                return codes.copy(), sdict
        if isinstance(arr, pa.ChunkedArray) and arr.num_chunks > 1:
            # pyarrow splits a row group into many record batches that
            # SHARE one dictionary; combine_chunks would re-unify all of
            # them (~1.8 s at 64 chunks x 660k entries). Group chunks by
            # the dictionary's buffer address: typically 1-2 distinct
            # dictionaries (one per row group) remain to merge, and the
            # indices stay int32 numpy end to end.
            merged = StringDict._merge_dictionary_chunks(arr)
            if merged is not None:
                idx_np, valid_np, dic = merged
            else:
                arr = arr.combine_chunks()
        elif isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if idx_np is None:
            dic = arr.dictionary
        k = len(dic)
        if k == 0:
            return (np.full(n_rows, NULL_CODE, np.int32),
                    StringDict(np.array([], dtype=object)))
        if dic.null_count:
            # nulls belong in the index validity, not the dictionary;
            # fall back to the row-level encoder for this odd layout
            if idx_np is not None:
                arr = pa.DictionaryArray.from_arrays(
                    pa.array(idx_np, mask=None if valid_np is None
                             else ~valid_np), dic)
            return StringDict.encode_arrow(arr.cast(pa.large_string()))
        dd = dic.dictionary_encode()  # dedupe (cross-row-group unions)
        uniq = dd.dictionary
        if len(uniq) != k:
            first = dd.indices.to_numpy()
            k2 = len(uniq)
        else:
            uniq, first, k2 = dic, None, k
        perm = pc.array_sort_indices(uniq).to_numpy()  # bytes == str order
        rank = np.empty(k2, np.int32)
        rank[perm] = np.arange(k2, dtype=np.int32)
        if first is not None:
            rank = rank[first]  # old dict slot -> sorted unique code
        if idx_np is None:
            idx = arr.indices
            if idx.null_count:
                valid_np = ~np.asarray(idx.is_null())
                idx_np = idx.fill_null(0).to_numpy()
            else:
                idx_np = idx.to_numpy()
        codes = rank[idx_np]
        if valid_np is not None:
            codes[~valid_np] = NULL_CODE
        sdict = StringDict(values_pa=uniq.take(pa.array(perm)))
        codes = np.asarray(codes, np.int32)
        if fp is not None:
            _ENCODE_CACHE[fp] = (codes.copy(), sdict)
            if len(_ENCODE_CACHE) > 8:
                _ENCODE_CACHE.popitem(last=False)
        return codes, sdict

    @staticmethod
    def encode_arrow(arr) -> Tuple[np.ndarray, "StringDict"]:
        """Encode a pyarrow string/binary array without a host object
        round-trip: C++ dictionary_encode (hash) + C++ sort of the
        (small) dictionary, then an O(unique) host remap of codes.
        Byte-wise UTF-8 order == code-point order, so arrow's sort
        matches python str comparisons exactly.

        Large encodes are memoized by a content fingerprint (blake2b of
        the arrow buffers, ~10x cheaper than the build): constructing a
        second DataFrame from the same string data reuses the dictionary
        instead of paying the O(unique) build per frame (VERDICT r2 #9).
        """
        import pyarrow as pa
        import pyarrow.compute as pc
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        fp = None
        if len(arr) >= (1 << 20):
            fp = _arrow_fingerprint(arr)
            hit = _ENCODE_CACHE.get(fp)
            if hit is not None:
                _ENCODE_CACHE.move_to_end(fp)
                codes, sdict = hit
                return codes.copy(), sdict
        codes, sdict = StringDict._encode_arrow_impl(arr)
        if fp is not None:
            _ENCODE_CACHE[fp] = (codes.copy(), sdict)
            if len(_ENCODE_CACHE) > 8:
                _ENCODE_CACHE.popitem(last=False)
        return codes, sdict

    @staticmethod
    def _encode_arrow_impl(arr) -> Tuple[np.ndarray, "StringDict"]:
        import pyarrow as pa
        import pyarrow.compute as pc
        d = arr.dictionary_encode()
        dic = d.dictionary
        idx = d.indices
        k = len(dic)
        if k == 0:
            codes = np.full(len(arr), NULL_CODE, np.int32)
            return codes, StringDict(np.array([], dtype=object))
        perm = pc.array_sort_indices(dic).to_numpy()
        rank = np.empty(k, np.int32)
        rank[perm] = np.arange(k, dtype=np.int32)
        if idx.null_count:
            valid = ~np.asarray(idx.is_null())
            raw = idx.fill_null(0).to_numpy().astype(np.int64)
            codes = rank[raw]
            codes[~valid] = NULL_CODE
        else:
            codes = rank[idx.to_numpy().astype(np.int64)]
        return (codes.astype(np.int32, copy=False),
                StringDict(values_pa=dic.take(pa.array(perm))))

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
