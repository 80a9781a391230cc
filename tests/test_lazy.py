"""Lazy engine: plan building, optimizer pushdowns, collect parity."""

import numpy as np
import pytest

import polaroid_tpu as pl


@pytest.fixture
def pq_file(tmp_path, rng):
    n = 2000
    df = pl.DataFrame({
        "id": np.arange(n),
        "price": rng.uniform(0, 200, n),
        "volume": rng.integers(0, 5000, n),
        "symbol": rng.choice(["AAPL", "MSFT", "GOOG", "AMZN"], n).tolist(),
    })
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    return p, df


def test_lazy_basic_collect():
    lf = pl.LazyFrame({"a": [1, 2, 3]})
    out = lf.select((pl.col("a") * 2).alias("b")).collect()
    assert out.to_dict() == {"b": [2, 4, 6]}


def test_lazy_schema_propagation():
    lf = pl.LazyFrame({"a": [1], "s": ["x"]})
    lf2 = lf.with_columns((pl.col("a") / 2).alias("half"))
    assert lf2.schema == {"a": pl.Int64, "s": pl.String, "half": pl.Float64}
    assert lf2.select(pl.col("half")).columns == ["half"]


def test_scan_parquet_collect(pq_file):
    p, df = pq_file
    out = pl.scan_parquet(str(p)).collect()
    assert out.shape == df.shape
    assert out.sort("id").to_dict()["id"] == df.to_dict()["id"]


def test_scan_projection_pushdown(pq_file):
    p, _ = pq_file
    lf = pl.scan_parquet(str(p)).select("id", "price")
    plan = lf.optimized_plan()
    txt = plan.describe()
    assert "π=2" in txt
    out = lf.collect()
    assert out.columns == ["id", "price"]


def test_scan_predicate_pushdown(pq_file):
    p, df = pq_file
    lf = pl.scan_parquet(str(p)).filter(pl.col("price") > 100.0)
    txt = lf.optimized_plan().describe()
    assert "σ" in txt and "FILTER" not in txt
    out = lf.collect()
    ref = df.filter(pl.col("price") > 100.0)
    assert out.height == ref.height
    assert out.sort("id").to_dict() == ref.sort("id").to_dict()


def test_filter_pushdown_through_with_columns(pq_file):
    p, df = pq_file
    lf = (pl.scan_parquet(str(p))
          .with_columns((pl.col("price") * pl.col("volume")).alias("notional"))
          .filter(pl.col("symbol") == "AAPL"))
    txt = lf.optimized_plan().describe()
    assert "FILTER" not in txt  # pushed into scan
    out = lf.collect()
    ref = df.filter(pl.col("symbol") == "AAPL").with_columns(
        (pl.col("price") * pl.col("volume")).alias("notional"))
    assert out.sort("id").to_dict() == ref.sort("id").to_dict()


def test_slice_pushdown(pq_file):
    p, _ = pq_file
    lf = pl.scan_parquet(str(p)).head(7)
    txt = lf.optimized_plan().describe()
    assert "n=7" in txt
    assert lf.collect().height == 7


def test_lazy_full_pipeline(pq_file):
    """The showcase query shape (BASELINE.md cell 4)."""
    p, df = pq_file
    lf = (pl.scan_parquet(str(p))
          .filter(pl.col("volume") > 1000)
          .with_columns((pl.col("price") * pl.col("volume")).alias("notional"))
          .group_by("symbol")
          .agg(pl.len().alias("trade_count"),
               pl.col("price").mean().alias("avg_price"),
               pl.col("notional").sum().alias("total_notional"),
               pl.col("price").std().alias("price_std"))
          .filter(pl.col("trade_count") > 10)
          .sort("total_notional", descending=True))
    out = lf.collect()
    # oracle with eager engine
    ref = (df.filter(pl.col("volume") > 1000)
           .with_columns((pl.col("price") * pl.col("volume")).alias("notional"))
           .group_by("symbol")
           .agg(pl.len().alias("trade_count"),
                pl.col("price").mean().alias("avg_price"),
                pl.col("notional").sum().alias("total_notional"),
                pl.col("price").std().alias("price_std"))
           .filter(pl.col("trade_count") > 10)
           .sort("total_notional", descending=True))
    g, r = out.to_dict(), ref.to_dict()
    assert g["symbol"] == r["symbol"]
    assert g["trade_count"] == r["trade_count"]
    assert np.allclose(g["avg_price"], r["avg_price"])
    assert np.allclose(g["total_notional"], r["total_notional"])


def test_lazy_join(pq_file):
    p, df = pq_file
    dim = pl.LazyFrame({"symbol": ["AAPL", "MSFT", "GOOG", "AMZN"],
                        "sector": ["tech", "tech", "ads", "retail"]})
    out = (pl.scan_parquet(str(p)).join(dim, on="symbol")
           .group_by("sector").agg(pl.col("volume").sum().alias("v"))
           .sort("sector").collect())
    ref = (df.join(pl.DataFrame({"symbol": ["AAPL", "MSFT", "GOOG", "AMZN"],
                                 "sector": ["tech", "tech", "ads", "retail"]}),
                   on="symbol")
           .group_by("sector").agg(pl.col("volume").sum().alias("v"))
           .sort("sector"))
    assert out.to_dict() == ref.to_dict()


def test_streaming_collect_matches(pq_file):
    p, df = pq_file
    lf = (pl.scan_parquet(str(p))
          .filter(pl.col("volume") > 500)
          .group_by("symbol")
          .agg(pl.len().alias("n"), pl.col("price").mean().alias("m"),
               pl.col("price").min().alias("mn"),
               pl.col("price").max().alias("mx")))
    a = lf.collect().sort("symbol").to_dict()
    b = lf.collect(engine="streaming").sort("symbol").to_dict()
    assert a["symbol"] == b["symbol"]
    assert a["n"] == b["n"]
    assert np.allclose(a["m"], b["m"])
    assert a["mn"] == b["mn"] and a["mx"] == b["mx"]


def test_streaming_std_mean_decomposition(pq_file):
    p, _ = pq_file
    lf = (pl.scan_parquet(str(p)).group_by("symbol")
          .agg(pl.col("price").std().alias("sd"),
               pl.col("price").mean().alias("m")))
    a = lf.collect().sort("symbol").to_dict()
    b = lf.collect(engine="streaming").sort("symbol").to_dict()
    assert np.allclose(a["sd"], b["sd"])
    assert np.allclose(a["m"], b["m"])


def test_lazy_concat():
    a = pl.LazyFrame({"x": [1, 2]})
    b = pl.LazyFrame({"x": [3]})
    out = pl.concat([a, b]).collect()
    assert out.to_dict() == {"x": [1, 2, 3]}


def test_lazy_unique_distinct():
    lf = pl.LazyFrame({"a": [1, 1, 2], "b": ["x", "x", "y"]})
    assert lf.unique(maintain_order=True).collect().height == 2


def test_explain_contains_nodes(pq_file):
    p, _ = pq_file
    lf = pl.scan_parquet(str(p)).filter(pl.col("price") > 0).select("id")
    txt = lf.explain()
    assert "SCAN" in txt


def test_sink_parquet(tmp_path, pq_file):
    p, df = pq_file
    out_path = tmp_path / "out.parquet"
    pl.scan_parquet(str(p)).filter(pl.col("volume") > 2500).sink_parquet(
        str(out_path))
    back = pl.read_parquet(str(out_path))
    assert back.height == df.filter(pl.col("volume") > 2500).height


def test_with_row_index_lazy():
    lf = pl.LazyFrame({"a": [10, 20]})
    assert lf.with_row_index("i").collect().to_dict() == \
        {"i": [0, 1], "a": [10, 20]}


def test_unpivot():
    df = pl.DataFrame({"id": [1, 2], "x": [10, 20], "y": [30, 40]})
    out = df.lazy().unpivot(["x", "y"], index=["id"]).collect() \
        .sort(["variable", "id"])
    assert out.to_dict() == {
        "id": [1, 2, 1, 2], "variable": ["x", "x", "y", "y"],
        "value": [10, 20, 30, 40]}


def test_expression_cse_single_eval():
    calls = {"n": 0}

    def f(s):
        calls["n"] += 1
        return s

    df = pl.DataFrame({"x": [1.0, 2.0, 3.0]})
    e = pl.col("x").map_batches(f)
    out = df.select((e + 1).alias("p"), (e + 2).alias("q"))
    assert calls["n"] == 1
    assert out.to_dict() == {"p": [2.0, 3.0, 4.0], "q": [3.0, 4.0, 5.0]}


def test_common_subplan_cache_inserted():
    lf = pl.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}).lazy() \
        .with_columns(w=pl.col("v") * 2)
    j = lf.join(lf, on="k", suffix="_r")
    assert "CACHE" in j.explain()
    d = j.collect().to_dict()
    assert d["w"] == [20, 40, 60] and d["w_r"] == [20, 40, 60]


def test_cache_node_memoizes():
    calls = {"n": 0}

    def fn(t):
        calls["n"] += 1
        return t

    import polaroid_tpu.plan.logical as L
    base = pl.DataFrame({"k": [1, 2], "v": [5, 6]}).lazy()
    mapped = pl.LazyFrame._from_plan(
        L.MapFunction(base._plan, fn, label="count"))
    c = mapped.cache()
    out = c.join(c, on="k").collect()
    assert calls["n"] == 1
    assert out.height == 2


def test_streaming_join_differential():
    import numpy as np
    rng = np.random.default_rng(5)
    n = 20000
    left = pl.DataFrame({"k": rng.integers(0, 500, n),
                         "v": rng.uniform(0, 1, n)})
    right = pl.DataFrame({"k": np.arange(500), "w": np.arange(500) * 2})
    lf = (left.lazy().join(right.lazy(), on="k", how="inner")
          .group_by("k").agg(pl.col("w").first().alias("w"),
                             pl.len().alias("n")).sort("k"))
    assert lf.collect(engine="streaming").to_dict() == \
        lf.collect(engine="in-memory").to_dict()
    for how in ("left", "semi", "anti"):
        l3 = left.lazy().join(right.lazy().filter(pl.col("k") < 50),
                              on="k", how=how).sort("k", "v")
        assert l3.collect(engine="streaming").to_dict() == \
            l3.collect(engine="in-memory").to_dict()


def test_streaming_distinct_topk_rowindex_sinks(tmp_path):
    import numpy as np
    import polaroid_tpu as pl
    rng = np.random.default_rng(0)
    n = 20000
    src = tmp_path / "src"
    src.mkdir()
    df = pl.DataFrame({"k": rng.integers(0, 50, n),
                       "v": rng.uniform(0, 1, n)})
    for i in range(4):
        df.slice(i * (n // 4), n // 4).write_parquet(
            str(src / f"p{i}.parquet"))
    lf = pl.scan_parquet(str(src / "*.parquet"))
    # differential: streaming vs in-memory (the reference's load-bearing
    # test strategy, SURVEY §4)
    d1 = lf.unique(subset="k").collect(engine="streaming").sort("k")
    d2 = lf.unique(subset="k").collect(engine="in-memory").sort("k")
    assert d1.to_dict() == d2.to_dict()
    t1 = lf.sort("v", descending=True).head(5).collect(engine="streaming")
    t2 = lf.sort("v", descending=True).head(5).collect(engine="in-memory")
    assert t1.to_dict() == t2.to_dict()
    r1 = lf.with_row_index("i").collect(engine="streaming")
    assert r1.to_dict()["i"][:3] == [0, 1, 2]
    assert r1.to_dict()["i"][-1] == n - 1
    # out-of-core sinks write batch-by-batch
    outp = tmp_path / "out.parquet"
    lf.filter(pl.col("v") > 0.5).sink_parquet(str(outp))
    ref = lf.filter(pl.col("v") > 0.5).collect()
    assert pl.read_parquet(str(outp)).height == ref.height
    lf.sink_csv(str(tmp_path / "out.csv"))
    assert pl.read_csv(str(tmp_path / "out.csv")).height == n
    lf.sink_ipc(str(tmp_path / "out.ipc"))
    assert pl.read_ipc(str(tmp_path / "out.ipc")).height == n
    lf.sink_ndjson(str(tmp_path / "out.ndjson"))
    assert pl.read_ndjson(str(tmp_path / "out.ndjson")).height == n


def test_count_star_fast_path(tmp_path):
    import numpy as np
    p = str(tmp_path / "c.parquet")
    n = 50_000
    pl.DataFrame({"a": np.arange(n).tolist(),
                  "b": np.random.rand(n).tolist()}).write_parquet(p)
    lf = pl.scan_parquet(p).select(pl.len())
    assert "FAST_COUNT" in lf.explain()
    out = lf.collect()
    assert out.to_dict()["len"] == [n]
    assert repr(out.schema["len"]) == "UInt32"
    # aliased + head(): count = min(n_rows, total)
    out2 = pl.scan_parquet(p).head(123).select(pl.len().alias("n")).collect()
    assert out2.to_dict()["n"] == [123]
    # a filter disables the fast path but stays correct
    out3 = pl.scan_parquet(p).filter(pl.col("a") < 7).select(pl.len()).collect()
    assert out3.to_dict()["len"] == [7]


def test_simplify_exprs():
    df = pl.DataFrame({"x": [1, 2, 3, 4, 5, 6, 7, 8]})
    out = df.lazy().filter(
        (pl.col("x") > pl.lit(2) + pl.lit(3)) & pl.lit(True)).collect()
    assert out.to_dict()["x"] == [6, 7, 8]
    assert df.lazy().filter(pl.lit(True)).collect().height == 8
    assert df.lazy().filter(
        (pl.col("x") > 0) & pl.lit(False)).collect().height == 0
    # double negation + folded arithmetic in select
    out2 = df.lazy().select(
        (~(~(pl.col("x") > 1))).alias("m"),
        (pl.lit(2) * pl.lit(10) + pl.col("x")).alias("v")).collect().to_dict()
    assert out2["m"] == [False] + [True] * 7
    assert out2["v"] == [21, 22, 23, 24, 25, 26, 27, 28]


def test_streaming_stateful_windows(tmp_path, monkeypatch):
    # cross-batch state: cum_* via carried scalars, shift/diff/rolling via
    # the input-tail replay; differential vs the in-memory engine
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 700)
    n = 4000
    rng = np.random.default_rng(2)
    x = rng.normal(0, 10, n).round(3)
    x[rng.random(n) < 0.05] = np.nan  # nulls via parquet NaN? keep floats
    df = pl.DataFrame({"x": np.nan_to_num(x).tolist(),
                       "y": rng.integers(0, 9, n).tolist()})
    p = str(tmp_path / "s.parquet")
    df.write_parquet(p)
    lf = pl.scan_parquet(p).with_columns(
        pl.col("x").cum_sum().alias("cs"),
        pl.col("x").cum_min().alias("cm"),
        pl.col("x").cum_prod().alias("cp"),
        pl.col("y").cum_count().alias("cc"),
        pl.col("x").shift(5).alias("sh"),
        (pl.col("x").rolling_sum(100) + pl.col("x").diff(2)).alias("mix"),
    )
    a = lf.collect(engine="streaming")
    b = lf.collect(engine="in-memory")
    da, db = a.to_dict(), b.to_dict()
    assert a.height == b.height == n
    for k in ("cs", "cm", "cc", "sh", "mix"):
        for va, vb in zip(da[k], db[k]):
            if va is None or vb is None:
                assert va is None and vb is None, k
            else:
                assert va == pytest.approx(vb, rel=1e-9, abs=1e-9), k
    # select context preserves expr order
    s = pl.scan_parquet(p).select(pl.col("x").cum_sum().alias("cs"),
                                  pl.col("x").shift(1).alias("sh"))
    out = s.collect(engine="streaming")
    assert out.columns == ["cs", "sh"]
    ref = s.collect(engine="in-memory")
    assert out.to_dict()["cs"] == pytest.approx(ref.to_dict()["cs"])


# ---------------------------------------------------------------------------
# sortedness propagation (VERDICT r1 item 9): redundant sorts elided
# ---------------------------------------------------------------------------

def _plan_has_sort(p):
    if p.kind == "sort":
        return True
    return any(_plan_has_sort(i) for i in p.inputs)


def test_sort_elided_after_groupby():
    import numpy as np
    from polaroid_tpu.plan.optimizer import optimize
    rng = np.random.default_rng(0)
    lf = (pl.LazyFrame({"k": rng.integers(0, 20, 500),
                        "v": rng.uniform(0, 1, 500)})
          .group_by("k").agg(pl.col("v").sum().alias("s")).sort("k"))
    assert not _plan_has_sort(optimize(lf._plan, "in-memory"))
    # still present for hash-sharded engines
    assert _plan_has_sort(optimize(lf._plan, "distributed"))
    # results correct (and ordered) without the sort node
    out = lf.collect().to_dict()
    assert out["k"] == sorted(set(rng.integers(0, 20, 0).tolist()) |
                              set(np.unique(
                                  np.random.default_rng(0)
                                  .integers(0, 20, 500)).tolist()))


def test_sort_elided_after_sort_through_filter():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [3, 1, 2], "b": [1.0, 2.0, 3.0]})
          .sort("a", descending=True).filter(pl.col("b") > 0.5)
          .with_columns((pl.col("b") * 2).alias("c"))
          .sort("a", descending=True))
    p = optimize(lf._plan, "in-memory")
    n_sorts = 0
    def count(pp):
        nonlocal n_sorts
        if pp.kind == "sort":
            n_sorts += 1
        for i in pp.inputs:
            count(i)
    count(p)
    assert n_sorts == 1
    assert lf.collect().to_dict()["a"] == [3, 2, 1]


def test_sort_not_elided_when_key_redefined():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [3, 1, 2]})
          .sort("a")
          .with_columns((pl.col("a") % 2).alias("a"))
          .sort("a"))
    assert _plan_has_sort(optimize(lf._plan, "in-memory"))
    assert lf.collect().to_dict()["a"] == [0, 1, 1]


def test_sort_not_elided_on_direction_mismatch():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"k": [2, 1, 2], "v": [1, 2, 3]})
          .group_by("k").agg(pl.col("v").sum().alias("s"))
          .sort("k", descending=True))
    assert _plan_has_sort(optimize(lf._plan, "in-memory"))
    assert lf.collect().to_dict()["k"] == [2, 1]


def test_streaming_join_build_side_selection(monkeypatch):
    """VERDICT r1 item 7: inner joins pick the smaller side as build —
    either side may be large; differential vs in-memory. Small batch
    size + sample limit force multi-batch sampling."""
    import numpy as np
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 500)
    monkeypatch.setattr(CONFIG, "join_sample_limit", 800)
    rng = np.random.default_rng(8)
    big_n, small_n = 20_000, 700
    big = pl.LazyFrame({"k": rng.integers(0, 2_000, big_n),
                        "bv": rng.uniform(0, 1, big_n).round(4)})
    small = pl.LazyFrame({"k": rng.choice(2_000, small_n, replace=False),
                          "sv": rng.integers(0, 9, small_n)})

    # build side should be the SMALL side whichever side of the join
    for lf in (big.join(small, on="k", how="inner"),
               small.join(big, on="k", how="inner")):
        a = lf.collect(engine="streaming")
        b = lf.collect(engine="in-memory")
        assert a.columns == b.columns
        keys = list(a.columns)
        da = a.sort(keys).to_dict()
        db = b.sort(keys).to_dict()
        assert da == db

    # left joins stay right-build; still correct with a large right side
    lf = small.join(big, on="k", how="left")
    a = lf.collect(engine="streaming").sort(["k", "bv"], nulls_last=True)
    b = lf.collect(engine="in-memory").sort(["k", "bv"], nulls_last=True)
    assert a.to_dict() == b.to_dict()


def test_streaming_join_swapped_naming(monkeypatch):
    """Swapped inner joins must restore polars column naming: collision
    suffixes and coalesced keys."""
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 4)
    monkeypatch.setattr(CONFIG, "join_sample_limit", 6)
    l = pl.LazyFrame({"k": [1, 2], "v": [10.0, 20.0]})
    r = pl.LazyFrame({"k": [1, 1, 2, 3, 2, 1, 1, 2, 1, 2, 2, 1],
                      "v": [float(i) for i in range(12)]})
    lf = l.join(r, on="k", how="inner")
    a = lf.collect(engine="streaming")
    b = lf.collect(engine="in-memory")
    assert a.columns == b.columns == ["k", "v", "v_right"]
    assert a.sort(["k", "v_right"]).to_dict() == \
        b.sort(["k", "v_right"]).to_dict()


# ---------------------------------------------------------------------------
# cluster_with_columns + fused arithmetic (VERDICT r1 missing item 5;
# reference: optimizer/cluster_with_columns.rs, optimizer/fused.rs)
# ---------------------------------------------------------------------------

def _count_kind(p, kind):
    return (p.kind == kind) + sum(_count_kind(i, kind) for i in p.inputs)


def _expr_has_kind(e, kind):
    return e.kind == kind or any(_expr_has_kind(c, kind) for c in e.children)


def test_cluster_with_columns_merges_independent():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
          .with_columns((pl.col("a") + 1).alias("x"))
          .with_columns((pl.col("b") + 1).alias("y"))
          .with_columns((pl.col("a") - pl.col("b")).alias("z")))
    opt = optimize(lf._plan)
    assert _count_kind(opt, "with_columns") == 1
    out = lf.collect().to_dict()
    assert out["x"] == [2.0, 3.0] and out["y"] == [4.0, 5.0] \
        and out["z"] == [-2.0, -2.0]


def test_cluster_with_columns_blocked_on_dependency():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [1.0, 2.0]})
          .with_columns((pl.col("a") + 1).alias("x"))
          .with_columns((pl.col("x") * 2).alias("y")))   # reads lower's out
    opt = optimize(lf._plan)
    assert _count_kind(opt, "with_columns") == 2
    assert lf.collect().to_dict()["y"] == [4.0, 6.0]


def test_cluster_with_columns_blocked_on_overwrite():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [1.0, 2.0]})
          .with_columns((pl.col("a") + 1).alias("x"))
          .with_columns(pl.lit(9.0).alias("x")))          # rewrites lower's out
    opt = optimize(lf._plan)
    assert _count_kind(opt, "with_columns") == 2
    assert lf.collect().to_dict()["x"] == [9.0, 9.0]


def test_fused_arithmetic_plan_and_values():
    from polaroid_tpu.plan.optimizer import optimize
    lf = (pl.LazyFrame({"a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]})
          .select((pl.col("a") * pl.col("b") + pl.col("c")).alias("fma"),
                  (pl.col("c") + pl.col("a") * pl.col("b")).alias("fma2"),
                  (pl.col("a") * pl.col("b") - pl.col("c")).alias("fms"),
                  (pl.col("c") - pl.col("a") * pl.col("b")).alias("fsm")))
    opt = optimize(lf._plan)
    sel = opt
    while sel.kind != "select":
        sel = sel.inputs[0]
    assert all(_expr_has_kind(e, "fma") for e in sel.exprs)
    out = lf.collect().to_dict()
    assert out["fma"] == [8.0, 14.0] and out["fma2"] == [8.0, 14.0]
    assert out["fms"] == [-2.0, 2.0] and out["fsm"] == [2.0, -2.0]


def test_fused_arithmetic_skips_non_numeric_and_null_prop():
    # strings: not fused, still correct; nulls propagate through fma
    df = pl.DataFrame({"s": ["x", "y"], "i": [1, None], "j": [2, 3]})
    out = df.select((pl.col("i") * pl.col("j") + pl.col("j")).alias("v"))
    assert out.to_dict()["v"] == [4, None]
    # unfused naming rule preserved: a*b+c named after leftmost root
    d2 = pl.DataFrame({"a": [1.0], "b": [2.0], "c": [3.0]})
    s = d2.select(pl.col("c") + pl.col("a") * pl.col("b"))
    assert s.columns == ["c"] and s.to_dict()["c"] == [5.0]


def test_fused_arithmetic_int_overflow_semantics():
    # multiply stays in supertype(a,b) before widening, like the chain
    import numpy as np
    df = pl.DataFrame({"a": np.array([60000], np.int32),
                       "b": np.array([60000], np.int32),
                       "c": [1.5]})
    fused = df.select((pl.col("a") * pl.col("b") + pl.col("c")).alias("v"))
    unfused = df.select(((pl.col("a") * pl.col("b")).alias("m"))) \
        .with_columns((pl.col("m") + 1.5).alias("v"))
    assert fused.to_dict()["v"] == unfused.to_dict()["v"]


# ---------------------------------------------------------------------------
# streaming full join / asof / external sort / group_by_dynamic
# (VERDICT r1 missing item 7; reference: equi_join.rs EmitUnmatchedBuild,
# polars-stream out-of-core sort)
# ---------------------------------------------------------------------------

def test_streaming_full_join_differential(monkeypatch):
    import numpy as np
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 300)
    rng = np.random.default_rng(5)
    l = pl.LazyFrame({"k": rng.integers(0, 40, 1000),
                      "v": rng.uniform(0, 1, 1000)})
    r = pl.LazyFrame({"k": np.concatenate([rng.integers(20, 60, 500),
                                           np.array([99, 98])]),
                      "w": rng.uniform(0, 1, 502)})
    for coalesce in (None, True, False):
        lf = l.join(r, on="k", how="full", coalesce=coalesce)
        a = lf.collect(engine="streaming")
        b = lf.collect(engine="in-memory")
        assert a.columns == b.columns
        sk = [c for c in a.columns]
        assert a.sort(sk, nulls_last=True).to_dict() == \
            b.sort(sk, nulls_last=True).to_dict()


def test_streaming_full_join_null_keys(monkeypatch):
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 2)
    l = pl.LazyFrame({"k": [1, None, 2, None, 5], "v": [1, 2, 3, 4, 5]})
    r = pl.LazyFrame({"k": [2, None, 7], "w": [10, 20, 30]})
    for jn in (False, True):
        lf = l.join(r, on="k", how="full", join_nulls=jn)
        a = lf.collect(engine="streaming")
        b = lf.collect(engine="in-memory")
        cols = a.columns
        assert a.sort(cols, nulls_last=True).to_dict() == \
            b.sort(cols, nulls_last=True).to_dict()


def test_streaming_asof_join(monkeypatch):
    import numpy as np
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 250)
    rng = np.random.default_rng(3)
    lt = np.sort(rng.integers(0, 10_000, 1000))
    rt = np.sort(rng.integers(0, 10_000, 300))
    l = pl.LazyFrame({"t": lt, "v": np.arange(1000)})
    r = pl.LazyFrame({"t": rt, "w": np.arange(300)})
    lf = l.join_asof(r, on="t", strategy="backward")
    a = lf.collect(engine="streaming")
    b = lf.collect(engine="in-memory")
    assert a.to_dict() == b.to_dict()


def test_streaming_external_sort(monkeypatch, tmp_path):
    import numpy as np
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 400)
    rng = np.random.default_rng(11)
    n = 5000
    df = pl.DataFrame({"a": rng.integers(-50, 50, n),
                       "f": rng.normal(0, 1, n),
                       "s": rng.choice(["aa", "bb", "cc", "dd"], n).tolist()})
    p = tmp_path / "x.parquet"
    df.write_parquet(p)
    for by, desc, nl in [(["a", "f"], [False, True], [False, False]),
                         (["f"], [True], [True]),
                         (["s", "a"], [False, False], [True, True])]:
        # maintain_order=True: tie order must match across ENGINES for
        # the differential assert (default False leaves it unspecified)
        lf = pl.scan_parquet(p).sort(by, descending=desc, nulls_last=nl,
                                     maintain_order=True)
        a = lf.collect(engine="streaming")
        b = lf.collect(engine="in-memory")
        assert a.to_dict() == b.to_dict(), (by, desc, nl)


def test_streaming_external_sort_with_nulls(monkeypatch):
    import numpy as np
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 64)
    rng = np.random.default_rng(2)
    vals = [None if rng.uniform() < 0.2 else float(rng.normal())
            for _ in range(700)]
    lf = pl.LazyFrame({"x": vals, "i": list(range(700))})
    for nl in (False, True):
        s = lf.sort("x", nulls_last=nl)
        a = s.collect(engine="streaming")
        b = s.collect(engine="in-memory")
        assert a.to_dict() == b.to_dict()


def test_lazy_group_by_dynamic_lowers_and_streams(monkeypatch):
    import datetime as dt
    import numpy as np
    monkeypatch.setattr(pl.CONFIG, "batch_rows", 100)
    base = dt.datetime(2024, 1, 1)
    times = [base + dt.timedelta(minutes=int(m))
             for m in np.random.default_rng(0).integers(0, 600, 500)]
    lf = pl.LazyFrame({"t": times,
                       "v": np.random.default_rng(1).uniform(0, 1, 500)})
    q = lf.sort("t").group_by_dynamic("t", every="1h").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n"))
    # the fast path lowers to a real group_by node (no map_function)
    def _has_map(p):
        return p.kind == "map_function" or any(_has_map(i) for i in p.inputs)
    assert not _has_map(q._plan)
    a = q.collect(engine="streaming")
    b = q.collect(engine="in-memory")
    assert a.to_dict() == b.to_dict()
    # matches the eager implementation
    e = lf.collect().sort("t").group_by_dynamic("t", every="1h").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n"))
    assert a.to_dict() == e.to_dict()


def test_streaming_grace_hash_join(monkeypatch):
    """A build side over the budget must spill to grace-hash partitions
    and still match the in-memory result exactly (VERDICT r2 #7)."""
    import numpy as np
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 400)
    monkeypatch.setattr(CONFIG, "join_build_budget_rows", 300)
    monkeypatch.setattr(CONFIG, "join_grace_partitions", 4)
    rng = np.random.default_rng(21)
    n_l, n_r = 3000, 2500
    lk = rng.integers(0, 500, n_l).tolist()
    for i in range(0, n_l, 13):
        lk[i] = None
    lf = pl.LazyFrame({"k": lk, "lv": rng.normal(0, 1, n_l).tolist()})
    rf = pl.LazyFrame({"k": rng.integers(0, 500, n_r).tolist(),
                       "rv": rng.integers(-50, 50, n_r).tolist(),
                       "s": rng.choice(["x", "y", "z"], n_r).tolist()})
    for how in ("left", "inner", "semi", "anti", "full"):
        q = lf.join(rf, on="k", how=how)
        a = q.collect(engine="in-memory")
        b = q.collect(engine="streaming")
        cols = a.columns
        sk = [c for c in cols]
        ad, bd = a.sort(sk).to_dict(), b.sort(sk).to_dict()
        assert ad == bd, how


def test_streaming_grace_join_string_keys(monkeypatch):
    import numpy as np
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 300)
    monkeypatch.setattr(CONFIG, "join_build_budget_rows", 200)
    rng = np.random.default_rng(5)
    keys = [f"k{int(i)}" for i in rng.integers(0, 200, 1500)]
    lf = pl.LazyFrame({"k": keys, "v": list(range(1500))})
    rf = pl.LazyFrame({"k": [f"k{i}" for i in range(0, 300, 2)],
                       "w": list(range(150))})
    q = lf.join(rf, on="k", how="left")
    a = q.collect(engine="in-memory").sort(["k", "v"]).to_dict()
    b = q.collect(engine="streaming").sort(["k", "v"]).to_dict()
    assert a == b


def test_streaming_distinct_keep_none_cross_batch(monkeypatch):
    """keep='none' must drop a key duplicated ACROSS batches — per-batch
    pre-dedupe loses that information, so the streaming engine has to
    see the whole input."""
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 100)
    ks = list(range(250)) + [7, 123, 249]  # dups land in other batches
    lf = pl.LazyFrame({"k": ks, "v": list(range(len(ks)))})
    q = lf.unique(subset=["k"], keep="none")
    a = q.collect(engine="in-memory").sort("k").to_dict()
    b = q.collect(engine="streaming").sort("k").to_dict()
    assert a == b
    assert 7 not in b["k"] and 123 not in b["k"] and 249 not in b["k"]


def test_streaming_distinct_incremental_fold(monkeypatch):
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 128)
    import numpy as np
    rng = np.random.default_rng(0)
    n = 3000
    lf = pl.LazyFrame({"k": rng.integers(0, 2500, n).tolist()})
    q = lf.unique(subset=["k"], keep="first", maintain_order=True)
    a = q.collect(engine="in-memory").to_dict()
    b = q.collect(engine="streaming").to_dict()
    assert a == b


def test_streaming_right_join(monkeypatch):
    import numpy as np
    from polaroid_tpu.config import CONFIG
    monkeypatch.setattr(CONFIG, "batch_rows", 300)
    rng = np.random.default_rng(9)
    lf = pl.LazyFrame({"k": rng.integers(0, 100, 900).tolist(),
                       "lv": list(range(900))})
    rf = pl.LazyFrame({"k": rng.integers(0, 150, 1100).tolist(),
                       "rv": list(range(1100))})
    q = lf.join(rf, on="k", how="right")
    a = q.collect(engine="in-memory")
    cols = a.columns
    a = a.sort(cols).to_dict()
    b = q.collect(engine="streaming").sort(cols).to_dict()
    assert a == b
    # grace path (left over budget)
    monkeypatch.setattr(CONFIG, "join_build_budget_rows", 200)
    b2 = q.collect(engine="streaming").sort(cols).to_dict()
    assert a == b2
