"""Filter + inequality-join benchmark queries as correctness fixtures.

Parity targets: `py-polars/tests/benchmark/test_filter.py` and
`test_join_where.py` — run against pandas oracles (benchmarks double as
correctness tests, SURVEY §4)."""

import numpy as np
import pandas as pd
import pytest

import polaroid_tpu as pl


@pytest.fixture(scope="module")
def h2o():
    rng = np.random.default_rng(7)
    n = 10_000
    g = 100
    data = {
        "id1": [f"id{i:03d}" for i in rng.integers(0, g, n)],
        "id6": [int(i) for i in rng.integers(1, n // 10 + 1, n)],
        "v3": [round(float(x), 6) for x in rng.uniform(0, 100, n)],
    }
    return pl.DataFrame(data), pd.DataFrame(data)


def test_filter1_h2o(h2o):
    df, pdf = h2o
    out = (df.lazy()
           .filter(pl.col("id1").eq_missing(pl.lit("id046")))
           .select(pl.col("id6").cast(pl.Int64).sum(),
                   pl.col("v3").sum())
           .collect())
    sub = pdf[pdf.id1 == "id046"]
    assert out.to_dict()["id6"] == [int(sub.id6.sum())]
    assert out.to_dict()["v3"] == pytest.approx([float(sub.v3.sum())])


def test_filter2_h2o(h2o):
    df, pdf = h2o
    out = (df.lazy()
           .filter(~(pl.col("id1").eq_missing(pl.lit("id046"))))
           .select(pl.col("id6").cast(pl.Int64).sum(),
                   pl.col("v3").sum())
           .collect())
    sub = pdf[pdf.id1 != "id046"]
    assert out.to_dict()["id6"] == [int(sub.id6.sum())]
    assert out.to_dict()["v3"] == pytest.approx([float(sub.v3.sum())])


@pytest.fixture(scope="module")
def east_west():
    rng = np.random.default_rng(42)
    num_rows_left, num_rows_right = 800, 600
    east = pl.DataFrame({
        "id": list(range(num_rows_left)),
        "dur": [int(x) for x in rng.integers(100, 200, num_rows_left)],
        "rev": [int(x) for x in rng.integers(9000, 10000, num_rows_left)],
    })
    west = pl.DataFrame({
        "t_id": list(range(num_rows_right)),
        "time": [int(x) for x in rng.integers(120, 230, num_rows_right)],
        "cost": [int(x) for x in rng.integers(9000, 10000, num_rows_right)],
    })
    return east, west


def _oracle_join_where(east, west, conds):
    e = east.to_pandas()
    w = west.to_pandas()
    e["__k"] = 1
    w["__k"] = 1
    m = e.merge(w, on="__k").drop(columns="__k")
    for f in conds:
        m = m[f(m)]
    return m


def test_join_where_strict(east_west):
    east, west = east_west
    out = (east.lazy()
           .join_where(west.lazy(),
                       pl.col("dur") < pl.col("time"),
                       pl.col("rev") > pl.col("cost"))
           .collect())
    ref = _oracle_join_where(east, west,
                             [lambda m: m.dur < m.time,
                              lambda m: m.rev > m.cost])
    assert out.height == len(ref) > 0


def test_join_where_non_strict(east_west):
    east, west = east_west
    out = (east.lazy()
           .join_where(west.lazy(),
                       pl.col("dur") <= pl.col("time"),
                       pl.col("rev") >= pl.col("cost"))
           .collect())
    ref = _oracle_join_where(east, west,
                             [lambda m: m.dur <= m.time,
                              lambda m: m.rev >= m.cost])
    assert out.height == len(ref) > 0


def test_join_where_single(east_west):
    east, west = east_west
    out = (east.lazy()
           .with_columns((pl.col("dur") * 30).alias("scaled_dur"))
           .join_where(west.lazy(),
                       pl.col("scaled_dur") < pl.col("time"))
           .collect())
    e2 = east.with_columns((pl.col("dur") * 30).alias("scaled_dur"))
    ref = _oracle_join_where(e2, west,
                             [lambda m: m.scaled_dur < m.time])
    assert out.height == len(ref)
