"""Group-by kernel: segment aggregation vs numpy oracle."""

import numpy as np
import pytest

import polaroid_tpu as pl


def sorted_dict(df, by):
    return df.sort(by).to_dict()


def test_groupby_sum_mean():
    df = pl.DataFrame({"k": ["a", "b", "a", "b", "c"],
                       "v": [1, 2, 3, 4, 5]})
    out = df.group_by("k").agg(
        pl.col("v").sum().alias("s"),
        pl.col("v").mean().alias("m"),
        pl.len().alias("n"),
    ).sort("k")
    assert out.to_dict() == {
        "k": ["a", "b", "c"], "s": [4, 6, 5], "m": [2.0, 3.0, 5.0],
        "n": [2, 2, 1]}


def test_groupby_multi_key():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 1], "b": ["x", "y", "x", "x", "x"],
                       "v": [10, 20, 30, 40, 50]})
    out = df.group_by("a", "b").agg(pl.col("v").sum().alias("s")) \
        .sort(["a", "b"])
    assert out.to_dict() == {
        "a": [1, 1, 2], "b": ["x", "y", "x"], "s": [60, 20, 70]}


def test_groupby_null_keys_group_together():
    df = pl.DataFrame({"k": ["a", None, "a", None], "v": [1, 2, 3, 4]})
    out = df.group_by("k").agg(pl.col("v").sum().alias("s")).sort("k")
    d = out.to_dict()
    assert d["k"] == [None, "a"] or d["k"] == ["a", None]
    m = dict(zip(d["k"], d["s"]))
    assert m["a"] == 4 and m[None] == 6


def test_groupby_agg_with_nulls():
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [1, None, None]})
    out = df.group_by("k").agg(
        pl.col("v").sum().alias("s"),
        pl.col("v").count().alias("c"),
        pl.col("v").mean().alias("m"),
        pl.col("v").max().alias("mx"),
    ).sort("k")
    assert out.to_dict() == {
        "k": ["a", "b"], "s": [1, 0], "c": [1, 0], "m": [1.0, None],
        "mx": [1, None]}


def test_groupby_min_max_first_last():
    df = pl.DataFrame({"k": [1, 2, 1, 2, 1], "v": [5, 1, 3, 8, 4]})
    out = df.group_by("k").agg(
        pl.col("v").min().alias("mn"), pl.col("v").max().alias("mx"),
        pl.col("v").first().alias("f"), pl.col("v").last().alias("l"),
    ).sort("k")
    assert out.to_dict() == {
        "k": [1, 2], "mn": [3, 1], "mx": [5, 8], "f": [5, 1], "l": [4, 8]}


def test_groupby_std_var_nunique():
    rng = np.random.default_rng(0)
    k = rng.integers(0, 5, 200)
    v = rng.normal(0, 10, 200)
    df = pl.DataFrame({"k": k, "v": v})
    out = df.group_by("k").agg(
        pl.col("v").std().alias("sd"),
        pl.col("v").n_unique().alias("nu"),
    ).sort("k")
    d = out.to_dict()
    for i, kk in enumerate(d["k"]):
        ref = np.std(v[k == kk], ddof=1)
        assert abs(d["sd"][i] - ref) < 1e-6
        assert d["nu"][i] == len(np.unique(v[k == kk]))


def test_groupby_expression_key():
    df = pl.DataFrame({"a": [1, 2, 3, 4, 5, 6]})
    out = df.group_by((pl.col("a") % 2).alias("par")).agg(
        pl.col("a").sum().alias("s")).sort("par")
    assert out.to_dict() == {"par": [0, 1], "s": [12, 9]}


def test_groupby_compound_agg_expr():
    df = pl.DataFrame({"k": ["a", "a", "b"], "x": [1.0, 3.0, 5.0],
                       "y": [2.0, 4.0, 6.0]})
    out = df.group_by("k").agg(
        (pl.col("x") * pl.col("y")).sum().alias("xy"),
        (pl.col("x").sum() + pl.col("y").sum()).alias("sxy"),
        (pl.col("x").max() - pl.col("x").min()).alias("rng"),
    ).sort("k")
    assert out.to_dict() == {
        "k": ["a", "b"], "xy": [14.0, 30.0], "sxy": [10.0, 11.0],
        "rng": [2.0, 0.0]}


def test_groupby_maintain_order():
    df = pl.DataFrame({"k": ["z", "a", "z", "m", "a"], "v": [1, 2, 3, 4, 5]})
    out = df.group_by("k", maintain_order=True).agg(pl.col("v").sum().alias("s"))
    assert out.to_dict() == {"k": ["z", "a", "m"], "s": [4, 7, 4]}


def test_groupby_median_quantile():
    df = pl.DataFrame({"k": ["a"] * 4 + ["b"] * 3,
                       "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0]})
    out = df.group_by("k").agg(
        pl.col("v").median().alias("med"),
        pl.col("v").quantile(0.5, "lower").alias("ql"),
    ).sort("k")
    assert out.to_dict() == {"k": ["a", "b"], "med": [2.5, 20.0],
                             "ql": [2.0, 20.0]}


def test_groupby_after_filter():
    df = pl.DataFrame({"k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.filter(pl.col("v") > 1).group_by("k").agg(
        pl.col("v").sum().alias("s")).sort("k")
    assert out.to_dict() == {"k": ["a", "b"], "s": [3, 6]}


def test_groupby_len_shortcut():
    df = pl.DataFrame({"k": ["x", "y", "x"]})
    assert df.group_by("k").len().sort("k").to_dict() == {
        "k": ["x", "y"], "len": [2, 1]}


def test_groupby_any_all():
    df = pl.DataFrame({"k": [1, 1, 2, 2], "b": [True, False, True, True]})
    out = df.group_by("k").agg(pl.col("b").any().alias("any"),
                               pl.col("b").all().alias("all")).sort("k")
    assert out.to_dict() == {"k": [1, 2], "any": [True, True],
                             "all": [False, True]}


def test_unique():
    df = pl.DataFrame({"a": [1, 2, 1, 3, 2], "b": ["x", "y", "x", "z", "q"]})
    out = df.unique(subset="a", keep="first", maintain_order=True)
    assert out.to_dict() == {"a": [1, 2, 3], "b": ["x", "y", "z"]}
    out2 = df.unique(subset="a", keep="last", maintain_order=True)
    assert out2.to_dict() == {"a": [1, 3, 2], "b": ["x", "z", "q"]}
    out3 = df.unique(maintain_order=True)
    assert out3.height == 4  # (1,"x") appears twice
    out4 = df.unique(subset="a", keep="none", maintain_order=True)
    assert out4.to_dict() == {"a": [3], "b": ["z"]}


def test_groupby_numeric_random_oracle(rng):
    n = 3000
    k = rng.integers(0, 50, n)
    v = rng.integers(-100, 100, n)
    df = pl.DataFrame({"k": k, "v": v})
    out = df.group_by("k").agg(pl.col("v").sum().alias("s"),
                               pl.col("v").min().alias("mn"),
                               pl.col("v").max().alias("mx"),
                               pl.len().alias("n")).sort("k")
    d = out.to_dict()
    keys = sorted(np.unique(k))
    assert d["k"] == [int(x) for x in keys]
    for i, kk in enumerate(keys):
        sel = v[k == kk]
        assert d["s"][i] == int(sel.sum())
        assert d["mn"][i] == int(sel.min())
        assert d["mx"][i] == int(sel.max())
        assert d["n"][i] == len(sel)


def test_groupby_iteration_and_map_groups():
    df = pl.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    got = {name: g.to_dict()["v"] for name, g in df.group_by("k")}
    assert got == {"a": [1, 3], "b": [2]}
    m = df.group_by("k").map_groups(lambda g: g.head(1))
    assert m.height == 2


def test_group_moment_bitwise_entropy_aggs():
    import numpy as np
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [1.0, 3.0, 5.0, 2.0, 2.0],
                       "i": [3, 6, 4, 1, 5]})
    out = df.group_by("k").agg(
        pl.col("i").bitwise_and().alias("ba"),
        pl.col("i").bitwise_or().alias("bo"),
        pl.col("i").bitwise_xor().alias("bx"),
        pl.col("v").entropy(base=2).alias("en"),
        pl.col("v").skew().alias("sk"),
        pl.col("v").kurtosis().alias("ku"),
        pl.col("v").nan_min().alias("nmn"),
        pl.col("v").nan_max().alias("nmx"),
    ).sort("k").to_dict()
    assert out["ba"] == [0, 1] and out["bo"] == [7, 5] and \
        out["bx"] == [1, 4]
    x = np.array([1, 3, 5.0])
    p = x / x.sum()
    assert abs(out["en"][0] - (-(p * np.log2(p)).sum())) < 1e-9
    d = x - x.mean()
    assert abs(out["sk"][0] - (d**3).mean() / (d**2).mean()**1.5) < 1e-9
    assert out["nmn"] == [1.0, 2.0] and out["nmx"] == [5.0, 2.0]
    # NaN propagation in nan_max
    d2 = pl.DataFrame({"k": ["a", "a"], "v": [1.0, float("nan")]})
    got = d2.group_by("k").agg(pl.col("v").nan_max().alias("m")) \
        .to_dict()["m"]
    assert np.isnan(got[0])
    # over() context reuses the same reductions
    assert df.select(pl.col("i").bitwise_and().over("k").alias("v")) \
        .to_dict()["v"] == [0, 0, 0, 1, 1]


def test_group_head_tail_all_having():
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": ["a", "a", "a", "b", "b"], "v": [1, 2, 3, 4, 5]})
    assert df.group_by("k").head(2).to_dict() == \
        {"k": ["a", "a", "b", "b"], "v": [1, 2, 4, 5]}
    assert df.group_by("k").tail(1).to_dict() == \
        {"k": ["a", "b"], "v": [3, 5]}
    assert df.group_by("k").all().sort("k").to_dict() == \
        {"k": ["a", "b"], "v": [[1, 2, 3], [4, 5]]}
    assert df.group_by("k").having(pl.col("v").sum() > 6).agg(
        pl.col("v").sum().alias("s")).to_dict() == {"k": ["b"], "s": [9]}
    lf = df.lazy()
    assert lf.group_by("k").head(2).collect().height == 4
    assert lf.group_by("k").tail(1).collect().height == 2
    assert lf.group_by("k").quantile(0.5).collect().sort("k") \
        .to_dict()["v"] == [2.0, 4.0]
    assert lf.group_by("k").having(pl.col("v").sum() > 6).agg(
        pl.col("v").sum().alias("s")).collect().to_dict()["k"] == ["b"]
    assert lf.group_by("k").map_groups(lambda d: d.head(1)) \
        .collect().to_dict()["v"] == [1, 4]


def test_seg_sorted_accelerator_path_oracle(monkeypatch):
    """Force the accelerator segment-reduction path (log-doubling scans,
    normally TPU-only) on CPU and differential-check vs numpy."""
    import numpy as np
    import jax.numpy as jnp
    from polaroid_tpu.ops import groupby as G

    from polaroid_tpu.ops import pallas_partition as PP
    monkeypatch.setattr(G, "_use_segscan", lambda: True)
    monkeypatch.setattr(PP, "use_partition_kernel", lambda: True)
    rng = np.random.default_rng(0)
    cap = 1 << 14
    ncap = cap
    # sorted gid with dead tail
    ngroups = 37
    gid_np = np.sort(rng.integers(0, ngroups, cap - 300)).astype(np.int32)
    gid_np = np.concatenate([gid_np, np.full(300, np.int32(ncap), np.int32)])
    gid = jnp.asarray(gid_np)
    live = gid_np < ncap
    for dt in (np.float32, np.int32, np.int64, np.float64):
        if np.issubdtype(dt, np.floating):
            v_np = rng.normal(0, 10, cap).astype(dt)
        else:
            v_np = rng.integers(-50, 50, cap).astype(dt)
        v = jnp.asarray(v_np)
        s = np.asarray(G._seg_sum(v, gid, ncap))
        mn = np.asarray(G._seg_min(v, gid, ncap))
        mx = np.asarray(G._seg_max(v, gid, ncap))
        for g in range(ngroups):
            vals = v_np[live & (gid_np == g)]
            if len(vals) == 0:
                continue
            # float error scales with sum(|v|), not the (possibly
            # cancelled) total — same bound as pairwise summation
            tol = 1e-5 * max(np.abs(vals.astype(np.float64)).sum(), 1.0) \
                if np.issubdtype(dt, np.floating) else 0.0
            assert np.allclose(s[g], vals.sum(dtype=np.float64),
                               rtol=1e-6, atol=tol), (dt, g)
            assert mn[g] == vals.min(), (dt, g)
            assert mx[g] == vals.max(), (dt, g)


def test_seg_sum_unsorted_dense_oracle(monkeypatch):
    import numpy as np
    import jax.numpy as jnp
    from polaroid_tpu.ops import groupby as G

    monkeypatch.setattr(G, "_use_segscan", lambda: True)
    rng = np.random.default_rng(1)
    cap, ng = 5000, 300
    gid_np = rng.integers(0, ng, cap).astype(np.int32)
    gid_np[::17] = ng + 5  # dead rows
    for dt in (np.int64, np.int32, np.float32):
        if np.issubdtype(dt, np.floating):
            v = rng.normal(0, 10, cap).astype(dt)
        else:
            v = rng.integers(-1000, 1000, cap).astype(dt)
        s = np.asarray(G._seg_unsorted_dense(
            jnp.asarray(v), jnp.asarray(gid_np), ng, jnp.add, 0))
        mx = np.asarray(G._seg_unsorted_dense(
            jnp.asarray(v), jnp.asarray(gid_np), ng, jnp.maximum,
            np.iinfo(dt).min if np.issubdtype(dt, np.integer)
            else -np.inf))
        for g in range(ng):
            rows = v[gid_np == g]
            if len(rows):
                assert mx[g] == rows.max(), (dt, g, "max")
        assert s.shape[0] == ng
        for g in range(ng):
            rows = v[gid_np == g]
            exp = rows.sum() if len(rows) else 0
            assert abs(float(s[g]) - float(exp)) < 1e-3, (dt, g)


def test_groupby_carried_columns_accel_path(monkeypatch):
    """Force the accelerator sorted path (carried agg columns through the
    build sort) and compare against the default CPU path."""
    import numpy as np
    from polaroid_tpu.ops import groupby as G

    rng = np.random.default_rng(3)
    n = 4000
    v = rng.normal(0, 10, n).tolist()
    for i in range(0, n, 11):
        v[i] = None
    df = pl.DataFrame({"k": rng.integers(0, 37, n).tolist(),
                       "k2": rng.integers(0, 5, n).tolist(),
                       "v": v,
                       "w": rng.integers(-100, 100, n).tolist()})
    q = lambda d: d.group_by("k", "k2").agg(
        pl.col("v").sum().alias("s"), pl.col("v").mean().alias("m"),
        pl.col("w").min().alias("mn"), pl.col("w").max().alias("mx"),
        pl.col("v").first().alias("f"), pl.col("v").last().alias("l"),
        pl.len().alias("n")).sort(["k", "k2"]).to_dict()
    want = q(df)
    monkeypatch.setattr(G, "_use_segscan", lambda: True)
    got = q(df)
    assert got.keys() == want.keys()
    for c in want:
        for a, b in zip(got[c], want[c]):
            if isinstance(a, float) and a is not None and b is not None:
                assert abs(a - b) < 1e-6, c
            else:
                assert a == b, c


def test_groupby_key_compaction_accel_path(monkeypatch):
    """Force the accelerator path and check the boundary-compacted key
    extraction (nullable int, string, f64 keys) matches the CPU path."""
    import numpy as np
    import unittest.mock as M
    from polaroid_tpu.ops import groupby as G

    rng = np.random.default_rng(6)
    n = 3000
    k1 = rng.integers(0, 29, n).tolist()
    for i in range(0, n, 13):
        k1[i] = None
    df = pl.DataFrame({"k1": k1,
                       "s": rng.choice(["aa", "bb", "cc"], n).tolist(),
                       "f": rng.normal(0, 1, n).astype(np.float64),
                       "v": rng.integers(-9, 9, n).tolist()})

    def q():
        return df.group_by("k1", "s", "f").agg(
            pl.col("v").sum().alias("sv"), pl.len().alias("n")) \
            .sort(["k1", "s", "f"]).to_dict()

    want = q()
    with M.patch.object(G, "_use_segscan", lambda: True):
        got = q()
    assert got == want


def test_groupby_dense_mxu_batched_stash(monkeypatch):
    """Force the dense MXU layout (batched one-hot stash) on CPU and
    compare against the default path, nulls included."""
    import numpy as np
    import unittest.mock as M
    import jax as _jax
    from polaroid_tpu.ops import groupby as G

    rng = np.random.default_rng(8)
    n = 4000
    v = rng.normal(0, 10, n).tolist()
    for i in range(0, n, 9):
        v[i] = None
    df = pl.DataFrame({"k": rng.integers(0, 50, n).tolist(),
                       "v": v,
                       "w": rng.integers(-5, 5, n).tolist()})

    def q():
        return df.group_by("k").agg(
            pl.len().alias("n"), pl.col("v").sum().alias("s"),
            pl.col("v").mean().alias("m"), pl.col("v").count().alias("c"),
            pl.col("w").mean().alias("wm")).sort("k").to_dict()

    want = q()
    with M.patch.object(_jax, "default_backend", lambda: "tpu"):
        got = q()
    assert got.keys() == want.keys()
    for cname in want:
        for a, b in zip(got[cname], want[cname]):
            if isinstance(a, float) and a is not None and b is not None:
                assert abs(a - b) < 1e-4, cname
            else:
                assert a == b, cname
