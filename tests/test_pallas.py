"""Pallas kernel correctness (interpreter mode on CPU) + engine-level
differential tests with the Pallas paths force-enabled.

The TPU backend routes the dense-domain group-by helpers through the
hand-written kernels in `ops/pallas_kernels.py`; here we run the same
kernels through the Pallas interpreter and compare against numpy oracles
and against the engine's default (fused-XLA) results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polaroid_tpu as pl
from polaroid_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("n,G", [(4096, 100), (8192, 1000), (512, 4096),
                                 (64, 7), (1000, 130)])
def test_onehot_seg_sum_oracle(n, G):
    rng = np.random.default_rng(1)
    gid = rng.integers(-1, G + 2, n).astype(np.int32)
    v = rng.normal(size=(3, n)).astype(np.float32)
    out = np.asarray(pk.onehot_seg_sum(jnp.asarray(v), jnp.asarray(gid), G))
    sel = (gid >= 0) & (gid < G)
    ref = np.zeros((3, G), np.float32)
    for c in range(3):
        np.add.at(ref[c], gid[sel], v[c][sel])
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("is_max", [True, False])
def test_onehot_seg_minmax_oracle(is_max):
    rng = np.random.default_rng(2)
    n, G = 4096, 300
    gid = rng.integers(-1, G + 2, n).astype(np.int32)
    x = rng.normal(size=n).astype(np.float32)
    ident = -np.inf if is_max else np.inf
    out = np.asarray(pk.onehot_seg_minmax(jnp.asarray(x), jnp.asarray(gid),
                                          G, is_max, float(ident)))
    sel = (gid >= 0) & (gid < G)
    ref = np.full(G, ident, np.float32)
    (np.maximum if is_max else np.minimum).at(ref, gid[sel], x[sel])
    assert np.array_equal(out, ref)


def test_onehot_gather_oracle():
    rng = np.random.default_rng(3)
    n, G = 5000, 257
    gid = rng.integers(-1, G + 2, n).astype(np.int32)
    table = rng.normal(size=G).astype(np.float32)
    out = np.asarray(pk.onehot_gather(jnp.asarray(table), jnp.asarray(gid)))
    ref = np.where((gid >= 0) & (gid < G), table[np.clip(gid, 0, G - 1)], 0.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_engine_groupby_with_pallas_forced(monkeypatch):
    """Force the engine's dense group-by helpers down the Pallas path
    (interpreter on CPU) and check results match the default engine."""
    monkeypatch.setattr(pk, "use_pallas", lambda: True)
    rng = np.random.default_rng(4)
    n = 4096
    df = pl.DataFrame({
        "k": rng.integers(0, 50, n),
        "v": rng.normal(size=n).astype(np.float32),
        "w": rng.integers(0, 100, n),
    })
    out = (df.lazy()
           .filter(pl.col("w") > 10)
           .group_by("k")
           .agg(pl.len().alias("n"),
                pl.col("v").sum().alias("s"),
                pl.col("v").mean().alias("m"),
                pl.col("v").min().alias("lo"),
                pl.col("v").max().alias("hi"))
           .sort("k").collect().to_dict())
    monkeypatch.setattr(pk, "use_pallas", lambda: False)
    ref = (df.lazy()
           .filter(pl.col("w") > 10)
           .group_by("k")
           .agg(pl.len().alias("n"),
                pl.col("v").sum().alias("s"),
                pl.col("v").mean().alias("m"),
                pl.col("v").min().alias("lo"),
                pl.col("v").max().alias("hi"))
           .sort("k").collect().to_dict())
    assert out["k"] == ref["k"]
    assert out["n"] == ref["n"]
    np.testing.assert_allclose(out["s"], ref["s"], rtol=1e-5)
    np.testing.assert_allclose(out["m"], ref["m"], rtol=1e-5)
    np.testing.assert_allclose(out["lo"], ref["lo"], rtol=0)
    np.testing.assert_allclose(out["hi"], ref["hi"], rtol=0)


def test_engine_over_with_pallas_forced(monkeypatch):
    monkeypatch.setattr(pk, "use_pallas", lambda: True)
    rng = np.random.default_rng(5)
    n = 2048
    df = pl.DataFrame({
        "k": rng.integers(0, 20, n),
        "v": rng.normal(size=n).astype(np.float32),
    })
    out = df.with_columns(
        pl.col("v").mean().over("k").alias("gm")).to_dict()
    monkeypatch.setattr(pk, "use_pallas", lambda: False)
    ref = df.with_columns(
        pl.col("v").mean().over("k").alias("gm")).to_dict()
    np.testing.assert_allclose(out["gm"], ref["gm"], rtol=1e-5)
