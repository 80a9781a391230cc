"""Oracle tests for the fused-u64 single-operand sort
(ops/fused_sort.py) and its table-level integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polaroid_tpu as pl
from polaroid_tpu.ops.fused_sort import fused_argsort, fused_sort_kv


def test_fused_sort_kv_oracle():
    rng = np.random.default_rng(0)
    n = 4096
    k = rng.integers(0, 50, n).astype(np.uint32)
    c = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    sk, sc = fused_sort_kv(jnp.asarray(k), jnp.asarray(c))
    order = np.lexsort((c, k))
    np.testing.assert_array_equal(np.asarray(sk), k[order])
    np.testing.assert_array_equal(np.asarray(sc), c[order])


def test_fused_sort_kv_masked_all_ones_tie():
    # live rows whose packed word is all-ones must survive the dead-fill
    # tie: content is bit-identical, so the first-count prefix is right
    k = np.array([5, 0xFFFFFFFF, 7, 0xFFFFFFFF, 1], np.uint32)
    c = np.array([9, 0xFFFFFFFF, 8, 0xFFFFFFFF, 7], np.uint32)
    live = np.array([True, True, False, True, True])
    sk, sc = fused_sort_kv(jnp.asarray(k), jnp.asarray(c),
                           live=jnp.asarray(live))
    skh, sch = np.asarray(sk), np.asarray(sc)
    # live rows sorted: (1,7),(5,9),(0xFFFFFFFF,0xFFFFFFFF)
    np.testing.assert_array_equal(skh[:3], [1, 5, 0xFFFFFFFF])
    np.testing.assert_array_equal(sch[:3], [7, 9, 0xFFFFFFFF])


def test_fused_argsort_stable():
    rng = np.random.default_rng(1)
    n = 10000
    k = rng.integers(0, 20, n).astype(np.uint32)
    sk, perm = fused_argsort(jnp.asarray(k))
    ph = np.asarray(perm)
    np.testing.assert_array_equal(np.asarray(sk), np.sort(k))
    # stability: equal keys keep original order
    oracle = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ph, oracle)


def test_fused_argsort_dead_last():
    k = np.array([3, 1, 2, 0, 9], np.uint32)
    live = np.array([True, False, True, True, False])
    sk, perm = fused_argsort(jnp.asarray(k), live=jnp.asarray(live))
    ph = np.asarray(perm)
    np.testing.assert_array_equal(ph[:3], [3, 2, 0])
    assert set(ph[3:]) == {1, 4}


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("dtype", [np.int32, np.float32, np.uint32,
                                   np.int16])
def test_table_sort_fused_path(descending, dtype):
    rng = np.random.default_rng(2)
    n = 5000
    if np.issubdtype(dtype, np.floating):
        key = rng.normal(0, 100, n).astype(dtype)
    else:
        key = rng.integers(0, 100, n).astype(dtype)
    val = rng.normal(0, 1, n).astype(np.float32)
    df = pl.DataFrame({"k": key, "v": val})
    out = df.sort("k", descending=descending)
    kh = out["k"].to_numpy()
    vh = out["v"].to_numpy()
    order = np.argsort(key, kind="stable")
    if descending:
        order = np.argsort(-key.astype(np.float64), kind="stable")
    np.testing.assert_array_equal(np.sort(kh), np.sort(key))
    np.testing.assert_array_equal(kh, key[order])
    # rows stay aligned: (k, v) multiset must match
    got = sorted(zip(kh.tolist(), vh.tolist()))
    want = sorted(zip(key.tolist(), val.tolist()))
    assert got == want
    # v within equal-k runs may be reordered (maintain_order=False);
    # per-group multisets must match
    import collections
    gg = collections.defaultdict(list)
    for a, b in zip(kh, vh):
        gg[a].append(b)
    ww = collections.defaultdict(list)
    for a, b in zip(key, val):
        ww[a].append(b)
    for g in ww:
        assert sorted(gg[g]) == sorted(ww[g])


def test_table_sort_maintain_order_still_stable():
    rng = np.random.default_rng(3)
    n = 3000
    key = rng.integers(0, 10, n).astype(np.int32)
    val = np.arange(n, dtype=np.int32)
    df = pl.DataFrame({"k": key, "v": val})
    out = df.sort("k", maintain_order=True)
    order = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(out["v"].to_numpy(), val[order])


def test_table_sort_single_column():
    rng = np.random.default_rng(4)
    key = rng.integers(-500, 500, 4000).astype(np.int32)
    df = pl.DataFrame({"k": key})
    out = df.sort("k")
    np.testing.assert_array_equal(out["k"].to_numpy(), np.sort(key))


def test_lazy_sort_fused_vs_oracle():
    rng = np.random.default_rng(5)
    n = 4096
    key = rng.integers(0, 1000, n).astype(np.int64)
    val = rng.integers(0, 100, n).astype(np.int32)
    # int64 key: fused path must bow out (8-byte), carry path handles it
    df = pl.DataFrame({"k": key, "v": val})
    out = df.lazy().sort("k").collect()
    np.testing.assert_array_equal(out["k"].to_numpy(), np.sort(key))
