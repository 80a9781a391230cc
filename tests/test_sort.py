"""Sort kernel: multi-key, descending, nulls placement, top-k."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_sort_basic():
    df = pl.DataFrame({"a": [3, 1, 2]})
    assert df.sort("a").to_dict() == {"a": [1, 2, 3]}
    assert df.sort("a", descending=True).to_dict() == {"a": [3, 2, 1]}


def test_sort_multi_key():
    df = pl.DataFrame({"a": [1, 2, 1, 2], "b": [9, 8, 7, 6]})
    out = df.sort(["a", "b"])
    assert out.to_dict() == {"a": [1, 1, 2, 2], "b": [7, 9, 6, 8]}
    out2 = df.sort(["a", "b"], descending=[False, True])
    assert out2.to_dict() == {"a": [1, 1, 2, 2], "b": [9, 7, 8, 6]}


def test_sort_nulls():
    df = pl.DataFrame({"a": [3, None, 1]})
    assert df.sort("a").to_dict() == {"a": [None, 1, 3]}
    assert df.sort("a", nulls_last=True).to_dict() == {"a": [1, 3, None]}
    assert df.sort("a", descending=True).to_dict() == {"a": [None, 3, 1]}
    assert df.sort("a", descending=True, nulls_last=True).to_dict() == \
        {"a": [3, 1, None]}


def test_sort_strings():
    df = pl.DataFrame({"s": ["pear", "apple", "fig"]})
    assert df.sort("s").to_dict() == {"s": ["apple", "fig", "pear"]}
    assert df.sort("s", descending=True).to_dict() == \
        {"s": ["pear", "fig", "apple"]}


def test_sort_floats_with_nan():
    df = pl.DataFrame({"a": [2.0, float("nan"), 1.0, -1.0]})
    out = df.sort("a").to_dict()["a"]
    assert out[0] == -1.0 and out[1] == 1.0 and out[2] == 2.0
    assert np.isnan(out[3])  # NaN sorts greatest (polars)


def test_sort_stability():
    # maintain_order=True guarantees tie stability (polars semantics:
    # the default maintain_order=False leaves tie order unspecified)
    df = pl.DataFrame({"k": [1, 1, 1, 0, 0], "i": [0, 1, 2, 3, 4]})
    out = df.sort("k", maintain_order=True)
    assert out.to_dict()["i"] == [3, 4, 0, 1, 2]
    out2 = df.sort("k")
    assert sorted(out2.to_dict()["i"][:2]) == [3, 4]
    assert sorted(out2.to_dict()["i"][2:]) == [0, 1, 2]


def test_sort_by_expression():
    df = pl.DataFrame({"a": [-3, 1, -2]})
    assert df.sort(pl.col("a").abs()).to_dict() == {"a": [1, -2, -3]}


def test_sort_after_filter():
    df = pl.DataFrame({"a": [5, 3, 8, 1, 9]})
    assert df.filter(pl.col("a") > 2).sort("a").to_dict() == \
        {"a": [3, 5, 8, 9]}


def test_top_k():
    df = pl.DataFrame({"a": [3, 9, 1, 7, 5]})
    assert df.top_k(2, by="a").to_dict() == {"a": [9, 7]}
    assert df.bottom_k(2, by="a").to_dict() == {"a": [1, 3]}


def test_sort_large_random(rng):
    n = 5000
    a = rng.integers(-1000, 1000, n)
    b = rng.normal(size=n)
    df = pl.DataFrame({"a": a, "b": b})
    out = df.sort(["a", "b"]).to_dict()
    order = np.lexsort((b, a))
    assert out["a"] == [int(x) for x in a[order]]
    assert np.allclose(out["b"], b[order])


def test_sort_i64_extremes():
    vals = [2**62, -2**62, 0, -1, 1]
    df = pl.DataFrame({"a": vals})
    assert df.sort("a").to_dict() == {"a": sorted(vals)}


def test_sort_dates():
    import datetime as dt
    d = [dt.date(2024, 3, 1), dt.date(2023, 1, 5), dt.date(2025, 7, 9)]
    df = pl.DataFrame({"d": d})
    assert df.sort("d").to_dict() == {"d": sorted(d)}


def test_compact_carried_matches_gather(monkeypatch):
    rng = np.random.default_rng(10)
    n = 3000
    df = pl.DataFrame({
        "k": rng.integers(0, 50, n).tolist(),
        "s": rng.choice(["p", "q"], n).tolist(),
        "f": [None if rng.random() < 0.1 else float(v)
              for v in rng.normal(0, 1, n).round(4)],
    })
    pred = pl.col("k") % 3 == 1
    monkeypatch.setenv("PT_SORT_CARRY", "1")
    a = df.filter(pred).to_dict()
    monkeypatch.setenv("PT_SORT_CARRY", "0")
    b = df.filter(pred).to_dict()
    assert a == b
