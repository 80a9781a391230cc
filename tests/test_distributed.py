"""Distributed executor (engine=\"distributed\") on the 8-device CPU mesh —
differential-tested against the in-memory engine (the reference's
streaming-vs-inmemory strategy, SURVEY §4)."""

import numpy as np
import pytest

import jax

import polaroid_tpu as pl


@pytest.fixture(scope="module")
def data(rng_mod=None):
    rng = np.random.default_rng(5)
    n = 4000
    return pl.LazyFrame({
        "k": rng.integers(0, 40, n),
        "s": rng.choice(["aa", "bb", "cc", "dd"], n).tolist(),
        "v": rng.normal(0, 10, n),
        "w": rng.integers(-100, 100, n),
    })


def _cmp(lf, sort_keys, float_cols=()):
    a = lf.collect().sort(sort_keys).to_dict()
    b = lf.collect(engine="distributed").sort(sort_keys).to_dict()
    assert list(a.keys()) == list(b.keys())
    for k in a:
        if k in float_cols:
            assert np.allclose(
                np.array([np.nan if x is None else x for x in a[k]], float),
                np.array([np.nan if x is None else x for x in b[k]], float),
                equal_nan=True, rtol=1e-6), k
        else:
            assert a[k] == b[k], k


def test_dist_groupby_int_key(data):
    lf = data.group_by("k").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n"),
        pl.col("w").min().alias("mn"), pl.col("w").max().alias("mx"),
        pl.col("v").mean().alias("m"))
    _cmp(lf, "k", float_cols=("s", "m"))


def test_dist_groupby_string_key(data):
    lf = data.group_by("s").agg(pl.col("w").sum().alias("t"),
                                pl.len().alias("n"))
    _cmp(lf, "s")


def test_dist_groupby_multi_key(data):
    lf = data.group_by("k", "s").agg(pl.col("v").sum().alias("t"))
    _cmp(lf, ["k", "s"], float_cols=("t",))


def test_dist_filter_then_groupby(data):
    lf = (data.filter(pl.col("v") > 0)
          .with_columns((pl.col("v") * pl.col("w")).alias("vw"))
          .group_by("k").agg(pl.col("vw").sum().alias("t"),
                             pl.col("vw").count().alias("c")))
    _cmp(lf, "k", float_cols=("t",))


def test_dist_groupby_std(data):
    lf = data.group_by("s").agg(pl.col("v").std().alias("sd"),
                                pl.col("v").mean().alias("m"))
    _cmp(lf, "s", float_cols=("sd", "m"))


def test_dist_sort(data):
    lf = data.sort("w")
    a = lf.collect().to_dict()
    b = lf.collect(engine="distributed").to_dict()
    assert a["w"] == b["w"]
    # full rows travel together
    assert sorted(zip(a["w"], a["k"])) == sorted(zip(b["w"], b["k"]))


def test_dist_sort_desc_and_topk(data):
    lf = data.sort("v", descending=True).head(25)
    a = lf.collect().to_dict()
    b = lf.collect(engine="distributed").to_dict()
    assert np.allclose(a["v"], b["v"])


def test_dist_sort_multi_key(data):
    lf = data.sort(["k", "w"])
    a = lf.collect().to_dict()
    b = lf.collect(engine="distributed").to_dict()
    assert a["k"] == b["k"] and a["w"] == b["w"]


def test_dist_union(data):
    lf = pl.concat([data.filter(pl.col("w") > 50),
                    data.filter(pl.col("w") < -50)]) \
        .group_by("s").agg(pl.len().alias("n"))
    _cmp(lf, "s")


def test_dist_fallback_join(data):
    dim = pl.LazyFrame({"k": list(range(40)), "name": [f"g{i}" for i in range(40)]})
    lf = data.join(dim, on="k").group_by("name").agg(pl.len().alias("n"))
    _cmp(lf, "name")


def test_dist_sharded_join_matches_inmemory():
    rng = np.random.default_rng(6)
    n, m = 20000, 3000
    orders = pl.DataFrame({
        "user_id": rng.integers(0, 4000, n).tolist(),
        "amount": rng.uniform(1, 100, n).round(2).tolist(),
        "flag": (rng.random(n) > 0.5).tolist()})
    users = pl.DataFrame({
        "user_id": rng.choice(4000, m, replace=False).tolist(),
        "country": rng.choice(["CH", "DE", "FR"], m).tolist()})
    lf = orders.lazy().join(users.lazy(), on="user_id", how="inner")
    # canonicalize on ALL columns: ties in a key prefix may order
    # differently across engines (sort default is maintain_order=False)
    allc = ["user_id", "amount", "flag", "country"]
    out = lf.collect(engine="distributed").sort(allc)
    ref = lf.collect(engine="in-memory").sort(allc)
    assert out.height == ref.height
    assert out.columns == ref.columns
    da, db = out.to_dict(), ref.to_dict()
    for k in da:
        for a, b in zip(da[k], db[k]):
            assert a == b or (a is None and b is None) or \
                abs(a - b) < 1e-9, k


def test_dist_join_nulls_strings_suffix():
    l = pl.DataFrame({"k": ["a", "b", None, "c", "a"], "v": [1, 2, 3, 4, 5]})
    r = pl.DataFrame({"k": ["a", "c", None], "v": [10, 20, 30]})
    lf = l.lazy().join(r.lazy(), on="k", how="inner")
    assert lf.collect(engine="distributed").sort(["k", "v"]).to_dict() == \
        lf.collect(engine="in-memory").sort(["k", "v"]).to_dict()
    lf2 = l.lazy().join(r.lazy(), on="k", how="inner", join_nulls=True)
    assert lf2.collect(engine="distributed").sort(
        ["k", "v"], nulls_last=True).to_dict() == \
        lf2.collect(engine="in-memory").sort(
            ["k", "v"], nulls_last=True).to_dict()
    lf3 = l.lazy().join(r.lazy(), on="k", how="inner", coalesce=False)
    assert "k_right" in lf3.collect(engine="distributed").columns


# ---------------------------------------------------------------------------
# full join matrix + distinct on the 8-device mesh (VERDICT r1 item 3):
# every `how` differential-tested against the in-memory oracle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def join_sides():
    rng = np.random.default_rng(11)
    n, m = 5000, 1200
    lk = rng.integers(0, 900, n).astype(object)
    rk = rng.integers(0, 1500, m).astype(object)  # partial overlap
    lk[rng.random(n) < 0.03] = None
    rk[rng.random(m) < 0.05] = None
    left = pl.DataFrame({"k": lk.tolist(),
                         "lv": rng.uniform(0, 10, n).round(3).tolist()})
    right = pl.DataFrame({"k": rk.tolist(),
                          "rv": rng.integers(-5, 5, m).tolist()})
    return left.lazy(), right.lazy()


def _cmp_join(lf, sort_keys=None):
    a0 = lf.collect(engine="in-memory")
    sort_keys = list(a0.columns)  # total order: ties must compare equal
    a = a0.sort(sort_keys, nulls_last=True)
    b = lf.collect(engine="distributed").sort(sort_keys, nulls_last=True)
    assert a.height == b.height
    assert a.columns == b.columns
    da, db = a.to_dict(), b.to_dict()
    for k in da:
        for x, y in zip(da[k], db[k]):
            ok = (x == y) or (x is None and y is None) or \
                (isinstance(x, float) and isinstance(y, float)
                 and abs(x - y) < 1e-9)
            assert ok, (k, x, y)


@pytest.mark.parametrize("how", ["inner", "left", "right", "full",
                                 "semi", "anti"])
def test_dist_join_matrix(join_sides, how):
    lf_l, lf_r = join_sides
    kw = {"coalesce": False} if how == "full" else {}
    lf = lf_l.join(lf_r, on="k", how=how, **kw)
    cols = lf.collect_schema() if hasattr(lf, "collect_schema") else None
    keys = ["k", "lv"] if how in ("semi", "anti") else \
        (["k", "k_right", "lv", "rv"] if how == "full" else ["k", "lv"]
         if how != "right" else ["k", "rv"])
    keys = [c for c in keys
            if c in lf.collect(engine="in-memory").columns]
    _cmp_join(lf, keys)


@pytest.mark.parametrize("how", ["left", "full", "anti"])
def test_dist_join_matrix_join_nulls(join_sides, how):
    lf_l, lf_r = join_sides
    kw = {"coalesce": False} if how == "full" else {}
    lf = lf_l.join(lf_r, on="k", how=how, join_nulls=True, **kw)
    keys = [c for c in ["k", "lv", "rv"]
            if c in lf.collect(engine="in-memory").columns]
    _cmp_join(lf, keys)


@pytest.mark.parametrize("keep", ["any", "first", "last", "none"])
def test_dist_distinct(data, keep):
    lf = data.unique(subset=["k", "s"], keep=keep)
    a = lf.collect(engine="in-memory").sort(["k", "s", "v"]).to_dict()
    b = lf.collect(engine="distributed").sort(["k", "s", "v"]).to_dict()
    assert a == b


def test_dist_distinct_maintain_order(data):
    lf = data.unique(subset=["k"], keep="first", maintain_order=True)
    a = lf.collect(engine="in-memory").to_dict()
    b = lf.collect(engine="distributed").to_dict()
    assert a == b


# ---------------------------------------------------------------------------
# window ops under the distributed engine (VERDICT r1 missing item 1 tail):
# over()/rolling/cum/rank evaluate on globally-sharded arrays — XLA
# inserts the collectives; results must match the in-memory engine exactly
# ---------------------------------------------------------------------------

def test_dist_window_over_partition(data):
    lf = data.with_columns(
        pl.col("v").sum().over("k").alias("ps"),
        pl.col("v").rank().over("k").alias("rk"),
        pl.col("v").cum_sum().over("k").alias("cs"),
        pl.col("v").shift(1).over("k").alias("sh"),
        pl.col("w").max().over(["k", "s"]).alias("mx2"))
    a = lf.collect(engine="distributed")
    b = lf.collect(engine="in-memory")
    assert a.to_dict() == b.to_dict()


def test_dist_rolling_and_rank_global(data):
    # maintain_order=True: the rolling ops downstream are order-
    # dependent, so the sort must be deterministic across engines
    lf = data.sort("w", maintain_order=True).with_columns(
        pl.col("v").rolling_mean(7).alias("rm"),
        pl.col("v").rank("dense").alias("dr"),
        pl.col("v").cum_max().alias("cm"))
    a = lf.collect(engine="distributed")
    b = lf.collect(engine="in-memory")
    assert a.to_dict() == b.to_dict()


# ---------------------------------------------------------------------------
# exact (row-shuffle) distributed group-by: median/quantile/n_unique/
# first/last run in-engine via full-row hash shuffle (VERDICT r2 #6)
# ---------------------------------------------------------------------------

def test_dist_groupby_exact_median_quantile(data):
    lf = data.group_by("k").agg(
        pl.col("v").median().alias("md"),
        pl.col("v").quantile(0.25, "linear").alias("q25"),
        pl.col("w").quantile(0.9, "lower").alias("q90l"),
        pl.col("v").quantile(0.5, "midpoint").alias("qm"),
        pl.col("v").quantile(0.75, "nearest").alias("qn"))
    _cmp(lf, "k", float_cols=("md", "q25", "qm", "qn", "q90l"))


def test_dist_groupby_exact_nunique_first_last(data):
    lf = data.group_by("s").agg(
        pl.col("w").n_unique().alias("nu"),
        pl.col("v").first().alias("f"),
        pl.col("v").last().alias("l"))
    _cmp(lf, "s", float_cols=("f", "l"))


def test_dist_groupby_exact_mixed_with_decomposable(data):
    # one non-decomposable agg forces the whole agg set onto the exact
    # row-shuffle path; sums/counts must still match
    lf = data.group_by("k").agg(
        pl.col("v").median().alias("md"),
        pl.col("v").sum().alias("sv"),
        pl.len().alias("n"),
        pl.col("w").min().alias("mn"),
        pl.col("v").mean().alias("mu"),
        pl.col("v").std().alias("sd"))
    _cmp(lf, "k", float_cols=("md", "sv", "mu", "sd"))


def test_dist_groupby_exact_with_nulls():
    rng = np.random.default_rng(11)
    n = 2000
    v = rng.normal(0, 5, n).tolist()
    for i in range(0, n, 7):
        v[i] = None
    lf = pl.LazyFrame({"k": rng.integers(0, 16, n).tolist(), "v": v})
    out = lf.group_by("k").agg(
        pl.col("v").median().alias("md"),
        pl.col("v").n_unique().alias("nu"),
        pl.col("v").first().alias("f"))
    _cmp(out, "k", float_cols=("md", "f"))


def test_dist_sort_nulls_last():
    rng = np.random.default_rng(7)
    n = 1000
    v = rng.integers(0, 50, n).tolist()
    for i in range(0, n, 11):
        v[i] = None
    lf = pl.LazyFrame({"v": v, "x": list(range(n))})
    for desc in (False, True):
        out = lf.sort("v", descending=desc, nulls_last=True)
        a = out.collect(engine="in-memory").to_dict()
        b = out.collect(engine="distributed").to_dict()
        # key column order must match exactly; payload ties may permute
        assert a["v"] == b["v"]
        assert sorted(a["x"]) == sorted(b["x"])


def test_shuffle_overflow_refused(monkeypatch):
    # force a tiny per-destination capacity: the exchange must REPORT the
    # overflow and the executor must refuse (no silent row loss)
    from polaroid_tpu.exec import distributed as D
    from polaroid_tpu.errors import ComputeError
    real = D.capacity_for

    monkeypatch.setattr(D, "capacity_for", lambda n: 1)
    rng = np.random.default_rng(3)
    n = 512
    lf = pl.LazyFrame({"k": rng.integers(0, 64, n),
                       "v": rng.normal(0, 1, n)})
    q = lf.group_by("k").agg(pl.col("v").median().alias("m"))
    with pytest.raises(ComputeError, match="overflow"):
        q.collect(engine="distributed")
    monkeypatch.setattr(D, "capacity_for", real)


# ---------------------------------------------------------------------------
# r4: cross / asof / coalescing-full no longer fall back to one device
# ---------------------------------------------------------------------------

def test_dist_cross_join():
    l = pl.LazyFrame({"a": [1, 2, 3, 4, 5], "b": ["x", "y", "z", "w", "v"]})
    r = pl.LazyFrame({"c": [10, 20, 30]})
    lf = l.join(r, how="cross")
    a = lf.collect(engine="distributed").sort(["a", "c"]).to_dict()
    b = lf.collect(engine="in-memory").sort(["a", "c"]).to_dict()
    assert a == b
    assert len(a["a"]) == 15


def test_dist_full_join_coalesced(join_sides):
    lf_l, lf_r = join_sides
    lf = lf_l.join(lf_r, on="k", how="full", coalesce=True)
    _cmp_join(lf)


def test_dist_asof_join():
    rng = np.random.default_rng(9)
    n, m = 5000, 800
    quotes_t = np.sort(rng.integers(0, 100000, m))
    trades_t = np.sort(rng.integers(0, 100000, n))
    trades = pl.LazyFrame({"t": trades_t.tolist(),
                           "qty": rng.integers(1, 100, n).tolist()})
    quotes = pl.LazyFrame({"t": quotes_t.tolist(),
                           "px": rng.uniform(1, 100, m).round(3).tolist()})
    lf = trades.join_asof(quotes, on="t", strategy="backward")
    a = lf.collect(engine="distributed").to_dict()
    b = lf.collect(engine="in-memory").to_dict()
    assert a == b


def test_dist_asof_join_by():
    rng = np.random.default_rng(10)
    n, m = 4000, 900
    syms = ["A", "B", "C"]
    trades = pl.DataFrame({
        "s": rng.choice(syms, n).tolist(),
        "t": np.sort(rng.integers(0, 50000, n)).tolist(),
        "qty": rng.integers(1, 100, n).tolist()}).sort("t")
    quotes = pl.DataFrame({
        "s": rng.choice(syms, m).tolist(),
        "t": np.sort(rng.integers(0, 50000, m)).tolist(),
        "px": rng.uniform(1, 100, m).round(3).tolist()}).sort("t")
    lf = trades.lazy().join_asof(quotes.lazy(), on="t", by="s",
                                 strategy="backward")
    a = lf.collect(engine="distributed").to_dict()
    b = lf.collect(engine="in-memory").to_dict()
    assert a == b


def test_dist_groupby_wide_keys():
    # >64-bit packed key set: two ~41-bit columns -> the salted-mix
    # two-word path (collision-checked) instead of the r3 refusal
    rng = np.random.default_rng(12)
    n = 6000
    base = (1 << 40)
    k1 = (rng.integers(0, 1 << 12, n).astype(np.int64) * (base // (1 << 12)))
    k2 = (rng.integers(0, 1 << 12, n).astype(np.int64) * (base // (1 << 12))
          + base)
    lf = pl.LazyFrame({"k1": k1.tolist(), "k2": k2.tolist(),
                       "v": rng.normal(0, 5, n).tolist()}) \
        .group_by("k1", "k2").agg(pl.col("v").sum().alias("s"),
                                  pl.len().alias("n"),
                                  pl.col("v").median().alias("m"))
    a = lf.collect(engine="distributed").sort(["k1", "k2"]).to_dict()
    b = lf.collect(engine="in-memory").sort(["k1", "k2"]).to_dict()
    assert a["k1"] == b["k1"] and a["k2"] == b["k2"]
    assert a["n"] == b["n"]
    for x, y in zip(a["s"], b["s"]):
        assert abs(x - y) < 1e-6
    for x, y in zip(a["m"], b["m"]):
        assert abs(x - y) < 1e-9
