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


# ---------------------------------------------------------------------------
# prefix-word lexicographic sort: strings order as two big-endian u64
# words over their first 16 bytes, so the O(unique) dictionary sort runs
# as integer sorts (torch's parallel sort when present — ~4x numpy's
# comparison argsort on this 2-core host) instead of arrow's string
# comparator (`pc.array_sort_indices` measured 194 ms at 663k uniques).
# Ties beyond the prefix are rare (only strings sharing 16 leading
# bytes) and are fixed up per run. UTF-8 byte order == codepoint order,
# so the same words serve String and Binary.
# ---------------------------------------------------------------------------

def _warm_sort_backend() -> None:
    """Import torch and spin up its thread pool off the critical path:
    the first torch sort in a process costs ~0.5 s of one-time setup
    that otherwise lands inside the first dictionary build."""
    try:
        import torch
        torch.argsort(torch.zeros(4, dtype=torch.int64), stable=True)
    except Exception:
        pass


_WARM_STARTED = [False]


def _start_warm_thread() -> None:
    """One-shot, called at the top of the big encode entrypoints: they
    do hundreds of ms of arrow/hash work before the first sort, which
    hides most of torch's ~0.5-2 s import. Starting at package import
    instead measurably polluted unrelated early phases (BENCH r5:
    parquet_stage_ms 17 -> 320 with the import-time thread competing
    for the 2 cores)."""
    if _WARM_STARTED[0]:
        return
    _WARM_STARTED[0] = True
    import os
    import threading
    if os.environ.get("PT_WARM_TORCH", "1") != "0":
        threading.Thread(target=_warm_sort_backend, daemon=True).start()


def _stable_argsort_u64(x: np.ndarray) -> np.ndarray:
    """Stable ascending argsort of uint64 (torch parallel sort; numpy
    fallback). Order-preserving sign-flip maps u64 onto int64."""
    xi = (x ^ np.uint64(1 << 63)).view(np.int64)
    try:
        import torch
        return torch.argsort(torch.from_numpy(xi), stable=True).numpy()
    except Exception:
        return np.argsort(xi, kind="stable")


def _argsort_u64_pair(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Lexicographic argsort by (hi, lo): stable sort by the minor key,
    then stable sort by the major key."""
    p1 = _stable_argsort_u64(lo)
    p2 = _stable_argsort_u64(hi[p1])
    return p1[p2]


def _be_words(pad16: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(K, 16) u8 rows -> (hi, lo) native u64 with big-endian byte
    significance (byte order == integer order)."""
    hi = np.ascontiguousarray(pad16[:, :8]).view(">u8").ravel() \
        .astype(np.uint64)
    lo = np.ascontiguousarray(pad16[:, 8:]).view(">u8").ravel() \
        .astype(np.uint64)
    return hi, lo


def _fix_tie_runs(perm: np.ndarray, hi: np.ndarray, lo: np.ndarray,
                  value_of) -> np.ndarray:
    """Reorder entries whose 16-byte prefixes tie by their full values.
    `value_of(indices) -> list` returns comparable py values (str or
    bytes) for the given original indices."""
    shi, slo = hi[perm], lo[perm]
    eq = (shi[1:] == shi[:-1]) & (slo[1:] == slo[:-1])
    if not bool(eq.any()):
        return perm
    starts = np.flatnonzero(~np.concatenate(([False], eq)))
    bounds = np.concatenate((starts, [len(perm)]))
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s > 1:
            sub = perm[s:e]
            vals = value_of(sub)
            order = sorted(range(len(sub)), key=lambda i: vals[i])
            perm[s:e] = sub[np.asarray(order)]
    return perm


def _prefix_argsort_fixed(mat: np.ndarray) -> np.ndarray:
    """Lexicographic argsort of fixed-width byte rows (K, W) u8."""
    K, W = mat.shape
    if W == 16:
        pad = np.ascontiguousarray(mat)
    elif W < 16:
        pad = np.zeros((K, 16), np.uint8)
        pad[:, :W] = mat
    else:
        pad = np.ascontiguousarray(mat[:, :16])
    hi, lo = _be_words(pad)
    perm = _argsort_u64_pair(hi, lo)
    if W > 16:
        sview = np.ascontiguousarray(mat).view(f"S{W}").ravel()
        perm = _fix_tie_runs(perm, hi, lo, lambda idx: list(sview[idx]))
    return perm


def _prefix_sort_indices(arr) -> Optional[np.ndarray]:
    """Lexicographic argsort (int32) of a null-free pyarrow string or
    binary array; None when the layout is unsupported."""
    import pyarrow as pa
    t = arr.type
    if arr.null_count:
        return None
    K = len(arr)
    if K == 0:
        return np.empty(0, np.int32)
    if pa.types.is_fixed_size_binary(t):
        b = arr.buffers()[1]
        mat = np.frombuffer(b, np.uint8, count=K * t.byte_width,
                            offset=arr.offset * t.byte_width) \
            .reshape(K, t.byte_width)
        return _prefix_argsort_fixed(mat).astype(np.int32, copy=False)
    if pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        return None
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], odt)[arr.offset:arr.offset + K + 1] \
        .astype(np.int64, copy=False)
    data = np.frombuffer(bufs[2], np.uint8)
    lens = np.diff(offs)
    maxlen = int(lens.max())
    minlen = int(lens.min())
    W = min(maxlen, 16)
    # column-wise extraction: W gathers of K bytes each beats a (K, W)
    # fancy index matrix by ~4x at 1M entries
    out = np.zeros((16, K), np.uint8)
    base = offs[:-1]
    for j in range(W):
        if j < minlen:
            out[j] = data[base + j]
        else:
            m = lens > j
            out[j, m] = data[(base + j)[m]]
    pad = np.ascontiguousarray(out.T)
    hi, lo = _be_words(pad)
    if maxlen <= 15:
        # byte 15 is uniformly zero-padding: fold the length into the
        # minor word so trailing-NUL ties ("a" vs "a\x00") order and
        # compare correctly without a third sort pass
        lo = lo | lens.astype(np.uint64)
        perm = _argsort_u64_pair(hi, lo)
    else:
        perm = _argsort_u64_pair(hi, lo)

        def value_of(idx):
            import pyarrow as pa
            return arr.take(pa.array(np.asarray(idx, np.int64))) \
                .to_pylist()

        perm = _fix_tie_runs(perm, hi, lo, value_of)
    return perm.astype(np.int32, copy=False)


class StringDict:
    """Immutable sorted dictionary of unique strings.

    Values may be held as a pyarrow array — or an unevaluated thunk
    producing one — and converted to a numpy object array lazily:
    device group-by/join/sort work on codes only, so a scan → aggregate
    pipeline never materializes python strings (the conversion alone
    costs ~0.4 s at 1M unique)."""

    __slots__ = ("_values", "_values_pa", "_values_fn", "_len", "_index",
                 "version")

    def __init__(self, values: Optional[np.ndarray] = None,
                 values_pa=None, values_fn=None, length: int = -1):
        # values must be sorted unique, dtype=object or str
        self._values = values
        self._values_pa = values_pa
        self._values_fn = values_fn
        if values is not None:
            self._len = len(values)
        elif values_pa is not None:
            self._len = len(values_pa)
        else:
            assert length >= 0, "values_fn requires explicit length"
            self._len = length
        self._index: Optional[dict] = None
        # monotonic id for compile-cache keys (id() can be reused by GC)
        _DICT_COUNTER[0] += 1
        self.version = _DICT_COUNTER[0]

    @property
    def values_pa(self):
        if self._values_pa is None and self._values_fn is not None:
            self._values_pa = self._values_fn()
            self._values_fn = None
        return self._values_pa

    @property
    def values(self) -> np.ndarray:
        if self._values is None:
            v = self.values_pa.to_numpy(zero_copy_only=False)
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
        _start_warm_thread()
        n = len(raw)
        itn = raw.dtype.itemsize
        ncp = itn // 4
        # Latin-1 narrowing: when every codepoint fits a byte (the
        # common case), hash/encode n*ncp bytes instead of 4x that —
        # arrow's row hash and the fingerprint dominate this path
        # (dictionary_encode on 300 MB UCS4 measured ~1.4 s vs ~0.4 s
        # narrowed at the 8.4M x U9 bench shape)
        u32v = raw.view(np.uint32).reshape(n, ncp) if n else None
        maxcp = 0
        if n:
            try:
                import torch
                maxcp = int(torch.from_numpy(u32v.reshape(-1)
                                             .view(np.int32)).max())
                if maxcp < 0:  # >= 2^31 codepoints can't occur in UCS4,
                    maxcp = 0x110000   # but stay safe on garbage input
            except Exception:
                maxcp = int(u32v.max())
        if 0 < maxcp <= 0xFF:
            enc_bytes = u32v.astype(np.uint8)  # (n, ncp) contiguous
            width = ncp
            tag = b"u8nar"
        else:
            enc_bytes = raw.view(np.uint8).reshape(n, itn) if n else None
            width = itn
            tag = b"ucs4"
        if n == 0:
            return (np.full(0, NULL_CODE, np.int32),
                    StringDict(np.array([], dtype=object)))
        fp = None
        d = None
        enc_thread = None
        enc_box: list = [None, None]

        def _make_chunks():
            # two chunks let arrow's row hash use both cores
            # (pc.dictionary_encode parallelizes across chunks:
            # measured 2.1 s vs 4.7 s single at 8.4M x 9B)
            if n >= (1 << 21):
                half = n // 2
                parts = [enc_bytes[:half], enc_bytes[half:]]
            else:
                parts = [enc_bytes]
            import pyarrow.compute as _pc
            arrs = [pa.Array.from_buffers(
                pa.binary(width), len(p),
                [None, pa.py_buffer(np.ascontiguousarray(p))])
                for p in parts]
            return _pc.dictionary_encode(pa.chunked_array(arrs))

        if n >= (1 << 20):
            # arrow's row hash runs speculatively in a worker (it
            # releases the GIL) while the fingerprint hashes on the main
            # thread; a cache hit returns at fingerprint cost and
            # abandons the worker, a miss overlaps the two fully
            def _enc_work():
                try:
                    enc_box[0] = _make_chunks()
                except BaseException as e:  # re-raised on join
                    enc_box[1] = e

            import threading as _threading
            enc_thread = _threading.Thread(target=_enc_work, daemon=True)
            enc_thread.start()
            h = hashlib.blake2b(digest_size=16)
            h.update(tag)
            h.update(str(raw.dtype).encode())
            h.update(enc_bytes)
            fp = h.digest()
            hit = _ENCODE_CACHE.get(fp)
            if hit is not None:
                _ENCODE_CACHE.move_to_end(fp)
                codes, sdict = hit
                return codes, sdict
            enc_thread.join()
            if enc_box[1] is not None:
                raise enc_box[1]
            d = enc_box[0]
        else:
            d = _make_chunks()

        def _sort_dic_bytes(dbytes):
            if tag == b"u8nar":
                # narrowed bytes order == codepoint order directly
                perm = _prefix_argsort_fixed(dbytes)
                du = dbytes.astype(np.uint32).reshape(-1).view(raw.dtype)
            else:
                du = dbytes.reshape(-1).view(raw.dtype)
                perm = np.argsort(du, kind="stable")  # cp == str order
            return perm, du

        merged = StringDict._merge_dictionary_chunks(d) \
            if d.num_chunks > 1 else None
        if merged is None:
            dd = d.combine_chunks() if d.num_chunks != 1 else d.chunk(0)
            dic = dd.dictionary
            k = len(dic)
            if k == 0:
                return (np.full(n, NULL_CODE, np.int32),
                        StringDict(np.array([], dtype=object)))
            if dic.offset != 0:  # defensive: frombuffer assumes offset 0
                dic = dic.combine_chunks() \
                    if hasattr(dic, "combine_chunks") else dic
            dbytes = np.frombuffer(dic.buffers()[1], dtype=np.uint8,
                                   count=k * width).reshape(k, width)
            perm, du = _sort_dic_bytes(dbytes)
            rank = np.empty(k, np.int32)
            rank[perm] = np.arange(k, dtype=np.int32)
            codes = rank[dd.indices.to_numpy()].astype(np.int32,
                                                       copy=False)
        else:
            chunks, chunk_slot, remaps, dic = merged
            k = len(dic)
            dbytes = np.frombuffer(
                dic.buffers()[1], dtype=np.uint8,
                count=k * width, offset=dic.offset * width).reshape(
                    k, width)
            perm, du = _sort_dic_bytes(dbytes)
            rank = np.empty(k, np.int32)
            rank[perm] = np.arange(k, dtype=np.int32)
            tables = [rank if r is None else rank[r] for r in remaps]
            codes = np.empty(n, np.int32)
            pos = 0
            for c, sl in zip(chunks, chunk_slot):
                codes[pos:pos + len(c)] = tables[sl][c.indices.to_numpy()]
                pos += len(c)
        sdict = StringDict(values_fn=lambda: pa.array(du[perm]), length=k)
        if fp is not None:
            # cached arrays are returned as-is: freeze instead of paying
            # a 34 MB copy per build (measured 143 ms on this host)
            codes.setflags(write=False)
            _ENCODE_CACHE[fp] = (codes, sdict)
            if len(_ENCODE_CACHE) > 8:
                _ENCODE_CACHE.popitem(last=False)
        return codes, sdict

    @staticmethod
    def _merge_dictionary_chunks(carr):
        """Union the few distinct dictionaries of a chunked
        DictionaryArray (identified by buffer address): returns
        (chunks, chunk_slot, remaps, dic) where `remaps[slot]` maps
        that distinct dictionary's entries into the union `dic` (None =
        identity), or None when the layout is unexpected. Row indices
        are NOT touched — the caller composes the final
        slot->sorted-code table per distinct dictionary and remaps each
        row exactly once (a second O(rows) gather measured ~38 ms at
        8.4M rows). Avoids combine_chunks' full re-unification (~1.8 s
        at 64 chunks x 660k entries)."""
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
            return chunks, chunk_slot, remaps, dic
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
        _start_warm_thread()
        idx_np = valid_np = None
        fp_src = arr
        n_rows = len(arr)
        fp = None
        merge_thread = None
        merge_box: list = [None, None]
        if n_rows >= (1 << 20):
            # the dictionary union runs speculatively in a worker (arrow
            # releases the GIL) while the fingerprint hashes here: a
            # cache hit returns at fingerprint cost, a miss overlaps the
            # two (sequential fp alone measured 68 ms at the 8.4M-row
            # bench shape)
            if isinstance(arr, pa.ChunkedArray) and arr.num_chunks > 1:
                def _merge_work():
                    try:
                        merge_box[0] = \
                            StringDict._merge_dictionary_chunks(arr)
                    except BaseException as e:
                        merge_box[1] = e

                import threading as _threading
                merge_thread = _threading.Thread(target=_merge_work,
                                                 daemon=True)
                merge_thread.start()
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
                return codes, sdict
        merged = None
        if merge_thread is not None:
            merge_thread.join()
            if merge_box[1] is not None:
                raise merge_box[1]
            merged = merge_box[0]
            if merged is None:
                arr = arr.combine_chunks()
        elif isinstance(arr, pa.ChunkedArray) and arr.num_chunks > 1:
            # pyarrow splits a row group into many record batches that
            # SHARE one dictionary; combine_chunks would re-unify all of
            # them (~1.8 s at 64 chunks x 660k entries). Group chunks by
            # the dictionary's buffer address: typically 1-2 distinct
            # dictionaries (one per row group) remain to merge, and the
            # indices stay int32 numpy end to end.
            merged = StringDict._merge_dictionary_chunks(arr)
            if merged is None:
                arr = arr.combine_chunks()
        elif isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        dic_unique = False
        if merged is not None:
            chunks, chunk_slot, remaps, dic = merged
            # a multi-dictionary union comes out of dictionary_encode
            # and is deduplicated by construction — skip re-encoding it
            # (measured ~110 ms at 1.31M union entries)
            dic_unique = len(remaps) > 1
        else:
            dic = arr.dictionary
        k = len(dic)
        if k == 0:
            return (np.full(n_rows, NULL_CODE, np.int32),
                    StringDict(np.array([], dtype=object)))
        if dic.null_count:
            # nulls belong in the index validity, not the dictionary;
            # fall back to the row-level encoder for this odd layout
            if merged is not None:
                arr = arr.combine_chunks()
            return StringDict.encode_arrow(arr.cast(pa.large_string()))
        if dic_unique:
            uniq, first, k2 = dic, None, k
        else:
            dd = dic.dictionary_encode()  # dedupe (single-page defensive)
            uniq = dd.dictionary
            if len(uniq) != k:
                first = dd.indices.to_numpy()
                k2 = len(uniq)
            else:
                uniq, first, k2 = dic, None, k
        perm = _prefix_sort_indices(uniq)  # bytes == str order
        if perm is None:
            perm = pc.array_sort_indices(uniq).to_numpy()
        rank = np.empty(k2, np.int32)
        rank[perm] = np.arange(k2, dtype=np.int32)
        if first is not None:
            rank = rank[first]  # old dict slot -> sorted unique code
        if merged is not None:
            # compose slot->code tables at dictionary size, then remap
            # each row ONCE (vs once into the union + once into codes)
            tables = [rank if r is None else rank[r] for r in remaps]
            codes = np.empty(n_rows, np.int32)
            valid_np = None
            pos = 0
            for c, sl in zip(chunks, chunk_slot):
                idx = c.indices
                if idx.null_count:
                    if valid_np is None:
                        valid_np = np.ones(n_rows, bool)
                    valid_np[pos:pos + len(c)] = ~np.asarray(idx.is_null())
                    raw = idx.fill_null(0).to_numpy()
                else:
                    raw = idx.to_numpy()
                codes[pos:pos + len(c)] = tables[sl][raw]
                pos += len(c)
        else:
            idx = arr.indices
            if idx.null_count:
                valid_np = ~np.asarray(idx.is_null())
                idx_np = idx.fill_null(0).to_numpy()
            else:
                idx_np = idx.to_numpy()
            codes = rank[idx_np]
        if valid_np is not None:
            codes[~valid_np] = NULL_CODE
        sdict = StringDict(
            values_fn=lambda: uniq.take(pa.array(perm)), length=k2)
        codes = np.asarray(codes, np.int32)
        if fp is not None:
            codes.setflags(write=False)  # frozen, not copied (34 MB)
            _ENCODE_CACHE[fp] = (codes, sdict)
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
                return codes, sdict
        codes, sdict = StringDict._encode_arrow_impl(arr)
        if fp is not None:
            codes.setflags(write=False)  # frozen, not copied
            _ENCODE_CACHE[fp] = (codes, sdict)
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
