"""Hierarchical merge sort (ops/merge_sort.py) — differential vs
lax.sort, including exact stability, plus engine integration with the
Pallas chunk kernels forced on (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polaroid_tpu as pl
from polaroid_tpu.ops import merge_sort as MS


def test_merge_sort_words_matches_lax_sort():
    rng = np.random.default_rng(0)
    for n in (1 << 13, 1 << 14, 1 << 17):
        for nk in (1, 2):
            ws = [jnp.asarray(rng.integers(0, 37, n).astype(np.uint32))
                  for _ in range(nk)]
            pay = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                              .astype(np.uint32))
            out = MS.merge_sort_words(ws + [pay], nk, stable=True)
            ref = jax.lax.sort(tuple(ws) + (pay,), num_keys=nk,
                               is_stable=True)
            for i in range(nk):
                assert np.array_equal(np.asarray(out[i]),
                                      np.asarray(ref[i])), (n, nk, i)
            # exact stability: payload order identical
            assert np.array_equal(np.asarray(out[nk + 1]),
                                  np.asarray(ref[nk])), (n, nk)
            perm = np.asarray(out[nk])
            assert np.array_equal(np.sort(perm), np.arange(n))


def test_merge_sort_extremes_and_dups():
    rng = np.random.default_rng(1)
    n = 1 << 14
    k = np.full(n, 7, np.uint32)  # all-equal keys: stability everywhere
    k[: n // 2] = rng.integers(0, 3, n // 2)
    key = jnp.asarray(k)
    pay = jnp.asarray(np.arange(n, dtype=np.uint32))
    out = MS.merge_sort_words([key, pay], 1, stable=True)
    ref = jax.lax.sort((key, pay), num_keys=1, is_stable=True)
    assert np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(out[2]), np.asarray(ref[1]))


def test_sort_ops_dtype_matrix():
    rng = np.random.default_rng(3)
    n = 1 << 16
    old = MS.use_merge_sort
    MS.use_merge_sort = lambda: True
    try:
        cases = [
            ([np.uint32], [np.float32, np.int64]),
            ([np.int32, np.float32], [np.int32]),
            ([np.float64], [np.uint32]),
        ]
        for keys, pays in cases:
            ops = []
            for dt in keys + pays:
                if np.issubdtype(dt, np.floating):
                    ops.append(jnp.asarray(rng.normal(0, 50, n).astype(dt)))
                else:
                    lo = -100 if np.issubdtype(dt, np.signedinteger) else 0
                    ops.append(jnp.asarray(
                        rng.integers(lo, 100, n).astype(dt)))
            nk = len(keys)
            got = MS.sort_ops(ops, nk, is_stable=True)
            ref = jax.lax.sort(tuple(ops), num_keys=nk, is_stable=True)
            for g, r in zip(got, ref):
                assert np.array_equal(np.asarray(g), np.asarray(r))
    finally:
        MS.use_merge_sort = old


def test_engine_rides_merge_sort(monkeypatch):
    """Force the merge-sort path (Pallas interpret mode on CPU) through
    sort_table / group_by / compaction at a capacity that engages it."""
    monkeypatch.setattr(MS, "use_merge_sort", lambda: True)
    monkeypatch.setenv("PT_SORT_CARRY", "1")
    rng = np.random.default_rng(5)
    n = 60_000  # capacity bucket 2^16 -> merge-sort engaged
    df = pl.DataFrame({"k": rng.integers(0, 97, n),
                       "v": rng.normal(0, 10, n),
                       "s": rng.choice(["a", "b", "c"], n).tolist()})
    got = df.sort(["k", "v"]).to_dict()
    monkeypatch.setattr(MS, "use_merge_sort", lambda: False)
    want = df.sort(["k", "v"]).to_dict()
    assert got == want
