"""Grouped windows: expr.over(partition) vs pandas groupby oracle."""

import numpy as np
import pandas as pd
import pytest

import polaroid_tpu as pl


def test_agg_over_broadcast():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.select(
        pl.col("k"),
        pl.col("v").sum().over("k").alias("s"),
        pl.col("v").mean().over("k").alias("m"),
        pl.col("v").max().over("k").alias("mx"),
        pl.len().over("k").alias("n"),
    )
    assert out.to_dict() == {
        "k": ["a", "b", "a", "b", "a"],
        "s": [9, 6, 9, 6, 9],
        "m": [3.0, 3.0, 3.0, 3.0, 3.0],
        "mx": [5, 4, 5, 4, 5],
        "n": [3, 2, 3, 2, 3]}


def test_agg_combo_over():
    df = pl.DataFrame({"k": [1, 1, 2], "v": [1.0, 3.0, 10.0]})
    out = df.select(
        ((pl.col("v") - pl.col("v").mean().over("k"))).alias("centered"))
    assert out.to_dict() == {"centered": [-1.0, 1.0, 0.0]}


def test_shift_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.select(pl.col("v").shift(1).over("k").alias("s"))
    assert out.to_dict() == {"s": [None, None, 1, 2, 3]}


def test_diff_pct_change_over():
    df = pl.DataFrame({"k": ["a", "a", "b", "a", "b"],
                       "v": [1.0, 3.0, 10.0, 6.0, 30.0]})
    d = df.select(pl.col("v").diff().over("k").alias("d"),
                  pl.col("v").pct_change().over("k").alias("p")).to_dict()
    assert d["d"] == [None, 2.0, None, 3.0, 20.0]
    assert d["p"][1] == 2.0 and d["p"][4] == 2.0


def test_cum_sum_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.select(pl.col("v").cum_sum().over("k").alias("c"),
                    pl.col("v").cum_max().over("k").alias("cm"),
                    pl.col("v").cum_count().over("k").alias("cc"))
    assert out.to_dict() == {"c": [1, 2, 4, 6], "cm": [1, 2, 3, 4],
                             "cc": [1, 1, 2, 2]}


def test_rank_over():
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [10, 30, 10, 5, 1]})
    d = df.select(pl.col("v").rank("ordinal").over("k").alias("o"),
                  pl.col("v").rank("min").over("k").alias("mn"),
                  pl.col("v").rank("dense").over("k").alias("dn"),
                  pl.col("v").rank().over("k").alias("avg")).to_dict()
    assert d["o"] == [1, 3, 2, 2, 1]
    assert d["mn"] == [1, 3, 1, 2, 1]
    assert d["dn"] == [1, 2, 1, 2, 1]
    assert d["avg"] == [1.5, 3.0, 1.5, 2.0, 1.0]


def test_forward_fill_over():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, None, None, 4, None]})
    d = df.select(pl.col("v").forward_fill().over("k").alias("f"),
                  pl.col("v").backward_fill().over("k").alias("b")).to_dict()
    assert d["f"] == [1, None, 1, 4, 1]
    assert d["b"] == [1, 4, None, 4, None]


def test_over_with_nulls_in_values():
    df = pl.DataFrame({"k": [1, 1, 1, 2], "v": [1, None, 3, 4]})
    d = df.select(pl.col("v").sum().over("k").alias("s"),
                  pl.col("v").count().over("k").alias("c")).to_dict()
    assert d["s"] == [4, 4, 4, 4]
    assert d["c"] == [2, 2, 2, 1]


def test_over_multiple_partitions():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "y", "x", "x", "x"],
                       "v": [10, 20, 30, 40, 50]})
    out = df.select(pl.col("v").sum().over("a", "b").alias("s"))
    assert out.to_dict() == {"s": [60, 20, 70, 70, 60]}


def test_over_random_oracle(rng):
    n = 2000
    k = rng.integers(0, 20, n)
    v = rng.normal(size=n)
    df = pl.DataFrame({"k": k, "v": v})
    got = df.select(pl.col("v").sum().over("k").alias("s"),
                    pl.col("v").cum_sum().over("k").alias("cs"),
                    pl.col("v").shift(1).over("k").alias("sh")).to_dict()
    pdf = pd.DataFrame({"k": k, "v": v})
    g = pdf.groupby("k")["v"]
    assert np.allclose(got["s"], g.transform("sum").values)
    assert np.allclose(got["cs"], g.cumsum().values)
    sh = g.shift(1).values
    for a, b in zip(got["sh"], sh):
        if b != b:
            assert a is None
        else:
            assert abs(a - b) < 1e-9


def test_over_after_filter():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.filter(pl.col("v") > 1).select(
        pl.col("v").cum_sum().over("k").alias("c"))
    assert out.to_dict() == {"c": [2, 3, 6, 8]}


def test_rolling_ewm_reverse_over_groups():
    import pandas as pd
    import pytest as _pytest
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [1.0, 2.0, 4.0, 10.0, 20.0]})
    sel = lambda e: df.select(e.alias("x")).to_dict()["x"]  # noqa: E731
    ref = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                        "v": [1.0, 2, 4, 10, 20]})
    rm = ref.groupby("k").v.rolling(2, min_periods=1).mean() \
        .reset_index(drop=True).tolist()
    assert sel(pl.col("v").rolling_mean(2, min_samples=1).over("k")) == \
        _pytest.approx(rm)
    assert sel(pl.col("v").rolling_sum(2, min_samples=1).over("k")) == \
        [1.0, 3.0, 6.0, 10.0, 30.0]
    assert sel(pl.col("v").rolling_min(2, min_samples=1).over("k")) == \
        [1.0, 1.0, 2.0, 10.0, 10.0]
    assert sel(pl.col("v").rolling_max(2, min_samples=1).over("k")) == \
        [1.0, 2.0, 4.0, 10.0, 20.0]
    re = ref.groupby("k").v.apply(lambda s: s.ewm(alpha=0.5).mean()).tolist()
    assert sel(pl.col("v").ewm_mean(alpha=0.5).over("k")) == \
        _pytest.approx(re)
    assert sel(pl.col("v").reverse().over("k")) == \
        [4.0, 2.0, 1.0, 20.0, 10.0]


def test_rolling_by_over_groups():
    import pandas as pd
    rng = np.random.default_rng(5)
    n = 150
    g = rng.choice(["a", "b"], n)
    t = np.empty(n, "datetime64[ns]")
    for k in ("a", "b"):
        m = g == k
        t[m] = (pd.to_datetime("2024-01-01") + pd.to_timedelta(
            np.sort(rng.integers(0, 900, m.sum())), unit="m")).values
    x = rng.normal(0, 10, n).round(2)
    df = pl.DataFrame({"g": g.tolist(),
                       "t": [pd.Timestamp(v).to_pydatetime() for v in t],
                       "x": x.tolist()})
    out = df.select(
        pl.col("x").rolling_sum_by("t", "2h").over("g").alias("s"),
        pl.col("x").rolling_median_by("t", "2h").over("g").alias("m"),
    ).to_dict()
    tv = t.astype(np.int64)
    p = int(pd.Timedelta("2h").value)
    for i in range(n):
        w = x[(g == g[i]) & (tv > tv[i] - p) & (tv <= tv[i])]
        assert np.isclose(out["s"][i], w.sum())
        assert np.isclose(out["m"][i], np.median(w))


def test_over_order_by():
    # window fns computed in order_by order within each partition, output
    # mapped back to original row positions (polars .over(order_by=...))
    df = pl.DataFrame({
        "g": ["a", "b", "a", "b", "a", "b", "a"],
        "t": [3, 1, 1, 3, 2, 2, 4],
        "x": [10., 20., 30., 40., 50., 60., 70.],
    })
    out = df.with_columns(
        pl.col("x").cum_sum().over("g", order_by="t").alias("cs"),
        pl.col("x").shift(1).over("g", order_by="t").alias("sh"),
        pl.col("x").diff().over("g", order_by=pl.col("t")).alias("d"),
    ).to_dict()
    p = pd.DataFrame(df.to_dict())
    s = p.sort_values(["g", "t"], kind="stable")
    s["cs"] = s.groupby("g")["x"].cumsum()
    s["sh"] = s.groupby("g")["x"].shift(1)
    s["d"] = s.groupby("g")["x"].diff()
    ref = p.join(s[["cs", "sh", "d"]])
    assert np.allclose(out["cs"], ref["cs"].values)
    for k in ("sh", "d"):
        got = [None if v is None else float(v) for v in out[k]]
        exp = [None if np.isnan(v) else v for v in ref[k].values]
        assert got == exp, (k, got, exp)


def test_over_order_by_descending_and_nulls():
    df = pl.DataFrame({
        "g": ["a", "a", "a", "a", "b", "b"],
        "t": [1, None, 3, 2, 2, 1],
        "x": [1., 2., 3., 4., 5., 6.],
    })
    # descending order_by: cum_sum runs from the largest t down;
    # nulls_last=False (default) puts null-t rows FIRST (they sort
    # before everything, matching polars' encoding)
    out = df.with_columns(
        pl.col("x").cum_sum().over("g", order_by="t", descending=True,
                                   nulls_last=True).alias("cs"),
    ).to_dict()
    # group a order (desc, nulls last): t=3(x=3), t=2(x=4), t=1(x=1), None(x=2)
    # cum: 3, 7, 8, 10 -> rows (t=1)->8, (None)->10, (3)->3, (2)->7
    assert np.allclose(out["cs"][:4], [8., 10., 3., 7.])
    # group b: t=2(x=5), t=1(x=6) -> cum 5, 11 -> rows: (t=2)->5, (t=1)->11
    assert np.allclose(out["cs"][4:], [5., 11.])


def test_over_order_by_agg_first_last():
    # order-sensitive aggregates respect order_by
    df = pl.DataFrame({
        "g": ["a", "a", "b", "b", "a"],
        "t": [5, 1, 2, 9, 3],
        "x": [10, 20, 30, 40, 50],
    })
    out = df.with_columns(
        pl.col("x").first().over("g", order_by="t").alias("f"),
        pl.col("x").last().over("g", order_by="t").alias("l"),
    ).to_dict()
    assert out["f"] == [20, 20, 30, 30, 20]
    assert out["l"] == [10, 10, 40, 40, 10]


def test_rank_over_fused_differential():
    """The fused rank-over (value words ride the build sort,
    ops/window_over._rank_over_fused) against a per-group numpy oracle:
    ties, nulls, descending, every method, plus the h2o-q8 top-k
    shape."""
    import numpy as np
    rng = np.random.default_rng(3)
    n = 4000
    k = rng.integers(0, 37, n)
    v = rng.integers(0, 25, n).astype(np.float32)
    vl = v.astype(object)
    vl[rng.random(n) < 0.1] = None
    df = pl.DataFrame({"k": k.tolist(), "v": vl.tolist()})
    out = df.select(
        pl.col("v").rank("ordinal").over("k").alias("o"),
        pl.col("v").rank("min", descending=True).over("k").alias("mnd"),
        pl.col("v").rank("max").over("k").alias("mx"),
        pl.col("v").rank("dense").over("k").alias("dn"),
        pl.col("v").rank().over("k").alias("avg")).to_dict()

    def oracle(method, desc):
        res = [None] * n
        for g in np.unique(k):
            rows = [i for i in range(n) if k[i] == g and vl[i] is not None]
            svals = sorted(rows, key=lambda i: (-v[i] if desc else v[i], i))
            for pos, i in enumerate(svals):
                ties = [j for j in svals if v[j] == v[i]]
                first = min(svals.index(j) for j in ties)
                last = max(svals.index(j) for j in ties)
                if method == "ordinal":
                    res[i] = pos + 1
                elif method == "min":
                    res[i] = first + 1
                elif method == "max":
                    res[i] = last + 1
                elif method == "dense":
                    smaller = len({v[j] for j in svals
                                   if svals.index(j) < first})
                    res[i] = smaller + 1
                else:
                    res[i] = (first + last) / 2 + 1
        return res

    assert out["o"] == oracle("ordinal", False)
    assert out["mnd"] == oracle("min", True)
    assert out["mx"] == oracle("max", False)
    assert out["dn"] == oracle("dense", False)
    assert out["avg"] == oracle("average", False)

    # h2o q8 shape: top-2 per group by rank, then filter+select
    top = (df.lazy()
           .with_columns(pl.col("v").rank("ordinal", descending=True)
                         .over("k").alias("r"))
           .filter(pl.col("r") <= 2).select("k", "v").collect().to_dict())
    want = {}
    for g in np.unique(k):
        rows = [i for i in range(n) if k[i] == g and vl[i] is not None]
        best = sorted(rows, key=lambda i: (-v[i], i))[:2]
        want[int(g)] = sorted(float(v[i]) for i in best)
    got = {}
    for gk, gv in zip(top["k"], top["v"]):
        got.setdefault(int(gk), []).append(float(gv))
    assert {kk: sorted(vv) for kk, vv in got.items()} == want
