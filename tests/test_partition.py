"""Pallas stable-compaction kernel (ops/pallas_partition.py) —
differential vs the carry-sort path, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polaroid_tpu as pl
from polaroid_tpu.ops import pallas_partition as PP


def test_compact_words_stable_exact():
    rng = np.random.default_rng(0)
    for n, frac in ((1 << 16, 0.5), (1 << 16, 0.01), (1 << 16, 0.99)):
        mask = jnp.asarray(rng.uniform(size=n) < frac)
        ws = [jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                          .astype(np.uint32)),
              jnp.asarray(np.arange(n, dtype=np.uint32))]
        res = PP.compact_words(mask, ws)
        assert res is not None
        outs, cnt = res
        cnt = int(cnt)
        m = np.asarray(mask)
        assert cnt == int(m.sum())
        for o, w in zip(outs, ws):
            assert np.array_equal(np.asarray(o)[:cnt], np.asarray(w)[m])


def test_compact_words_all_dead_all_live():
    n = 1 << 16
    w = jnp.asarray(np.arange(n, dtype=np.uint32))
    outs, cnt = PP.compact_words(jnp.ones(n, bool), [w])
    assert int(cnt) == n
    assert np.array_equal(np.asarray(outs[0]), np.asarray(w))
    outs, cnt = PP.compact_words(jnp.zeros(n, bool), [w])
    assert int(cnt) == 0


def test_engine_compact_rides_kernel(monkeypatch):
    """Force the kernel through the engine's compact() (interpret mode)
    and check a full filter-collect matches the fallback path."""
    monkeypatch.setattr(PP, "use_partition_kernel", lambda: True)
    monkeypatch.setenv("PT_SORT_CARRY", "1")
    rng = np.random.default_rng(2)
    n = 60_000  # capacity bucket 2^16
    df = pl.DataFrame({"a": rng.integers(0, 1000, n),
                       "b": rng.normal(0, 1, n),
                       "s": rng.choice(["x", "y"], n).tolist()})
    got = df.lazy().filter(pl.col("a") > 500).collect().to_dict()
    monkeypatch.setattr(PP, "use_partition_kernel", lambda: False)
    want = df.lazy().filter(pl.col("a") > 500).collect().to_dict()
    assert got == want
