"""Join kernel: all join types vs oracle."""

import numpy as np
import pytest

import polaroid_tpu as pl


def canon(df, by):
    return df.sort(by).to_dict()


def test_inner_join():
    a = pl.DataFrame({"k": [1, 2, 3], "x": ["a", "b", "c"]})
    b = pl.DataFrame({"k": [2, 3, 4], "y": [20, 30, 40]})
    out = canon(a.join(b, on="k"), "k")
    assert out == {"k": [2, 3], "x": ["b", "c"], "y": [20, 30]}


def test_inner_join_duplicates():
    a = pl.DataFrame({"k": [1, 1, 2], "x": [10, 11, 12]})
    b = pl.DataFrame({"k": [1, 1, 3], "y": [100, 101, 103]})
    out = canon(a.join(b, on="k"), ["k", "x", "y"])
    assert out == {"k": [1, 1, 1, 1], "x": [10, 10, 11, 11],
                   "y": [100, 101, 100, 101]}


def test_left_join():
    a = pl.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})
    b = pl.DataFrame({"k": [2], "y": [200]})
    out = canon(a.join(b, on="k", how="left"), "k")
    assert out == {"k": [1, 2, 3], "x": [10, 20, 30], "y": [None, 200, None]}


def test_full_join_coalesce():
    a = pl.DataFrame({"k": [1, 2], "x": [10, 20]})
    b = pl.DataFrame({"k": [2, 3], "y": [200, 300]})
    out = canon(a.join(b, on="k", how="full", coalesce=True), "k")
    assert out == {"k": [1, 2, 3], "x": [10, 20, None], "y": [None, 200, 300]}


def test_full_join_no_coalesce():
    a = pl.DataFrame({"k": [1, 2], "x": [10, 20]})
    b = pl.DataFrame({"k": [2, 3], "y": [200, 300]})
    out = a.join(b, on="k", how="full")
    d = canon(out, ["k", "k_right"])
    assert d["k"] == [None, 1, 2]
    assert d["k_right"] == [3, None, 2]


def test_semi_anti_join():
    a = pl.DataFrame({"k": [1, 2, 3, 4], "x": [1, 2, 3, 4]})
    b = pl.DataFrame({"k": [2, 4, 9]})
    assert canon(a.join(b, on="k", how="semi"), "k") == \
        {"k": [2, 4], "x": [2, 4]}
    assert canon(a.join(b, on="k", how="anti"), "k") == \
        {"k": [1, 3], "x": [1, 3]}


def test_join_multi_key():
    a = pl.DataFrame({"k1": [1, 1, 2], "k2": ["x", "y", "x"], "v": [1, 2, 3]})
    b = pl.DataFrame({"k1": [1, 2, 2], "k2": ["x", "x", "z"], "w": [10, 20, 30]})
    out = canon(a.join(b, on=["k1", "k2"]), ["k1", "k2"])
    assert out == {"k1": [1, 2], "k2": ["x", "x"], "v": [1, 3], "w": [10, 20]}


def test_join_string_key_dict_merge():
    a = pl.DataFrame({"k": ["apple", "beta", "cherry"], "v": [1, 2, 3]})
    b = pl.DataFrame({"k": ["beta", "delta", "apple"], "w": [20, 40, 10]})
    out = canon(a.join(b, on="k"), "k")
    assert out == {"k": ["apple", "beta"], "v": [1, 2], "w": [10, 20]}


def test_join_left_right_on():
    a = pl.DataFrame({"ka": [1, 2], "x": [1, 2]})
    b = pl.DataFrame({"kb": [2, 3], "y": [20, 30]})
    out = canon(a.join(b, left_on="ka", right_on="kb"), "ka")
    assert out == {"ka": [2], "x": [2], "y": [20]}


def test_join_nulls_param():
    a = pl.DataFrame({"k": [1, None], "x": [1, 2]})
    b = pl.DataFrame({"k": [1, None], "y": [10, 20]})
    out = canon(a.join(b, on="k"), "k")
    assert out == {"k": [1], "x": [1], "y": [10]}
    out2 = canon(a.join(b, on="k", join_nulls=True), "k")
    assert out2 == {"k": [None, 1], "x": [2, 1], "y": [20, 10]}


def test_left_join_null_keys_kept():
    a = pl.DataFrame({"k": [1, None], "x": [1, 2]})
    b = pl.DataFrame({"k": [1], "y": [10]})
    out = canon(a.join(b, on="k", how="left"), "x")
    assert out == {"k": [1, None], "x": [1, 2], "y": [10, None]}


def test_cross_join():
    a = pl.DataFrame({"x": [1, 2]})
    b = pl.DataFrame({"y": ["a", "b", "c"]})
    out = a.join(b, how="cross")
    assert out.height == 6
    assert canon(out, ["x", "y"]) == {
        "x": [1, 1, 1, 2, 2, 2], "y": ["a", "b", "c", "a", "b", "c"]}


def test_join_suffix_collision():
    a = pl.DataFrame({"k": [1], "v": [1]})
    b = pl.DataFrame({"k": [1], "v": [2]})
    out = a.join(b, on="k")
    assert out.columns == ["k", "v", "v_right"]
    assert out.to_dict() == {"k": [1], "v": [1], "v_right": [2]}


def test_right_join():
    a = pl.DataFrame({"k": [1, 2], "x": [10, 20]})
    b = pl.DataFrame({"k": [2, 3], "y": [200, 300]})
    out = canon(a.join(b, on="k", how="right"), "k")
    assert out == {"x": [20, None], "k": [2, 3], "y": [200, 300]}


def test_join_random_oracle(rng):
    import pandas as pd
    n1, n2 = 300, 400
    a = pl.DataFrame({"k": rng.integers(0, 50, n1), "x": np.arange(n1)})
    b = pl.DataFrame({"k": rng.integers(0, 50, n2), "y": np.arange(n2)})
    got = a.join(b, on="k").sort(["k", "x", "y"]).to_dict()
    pa_ = pd.DataFrame(a.to_dict())
    pb_ = pd.DataFrame(b.to_dict())
    ref = pa_.merge(pb_, on="k").sort_values(["k", "x", "y"])
    assert got["k"] == ref["k"].tolist()
    assert got["x"] == ref["x"].tolist()
    assert got["y"] == ref["y"].tolist()


def test_join_asof():
    a = pl.DataFrame({"t": [1, 5, 10], "x": [1, 2, 3]})
    b = pl.DataFrame({"t": [0, 4, 9], "y": ["a", "b", "c"]})
    out = a.lazy().join_asof(b.lazy(), on="t").collect()
    assert out.to_dict() == {"t": [1, 5, 10], "x": [1, 2, 3],
                             "y": ["a", "b", "c"]}


def test_join_asof_strategies():
    a = pl.DataFrame({"t": [3, 7]})
    b = pl.DataFrame({"t": [1, 5, 8], "y": [10, 50, 80]})
    fw = a.lazy().join_asof(b.lazy(), on="t", strategy="forward").collect()
    assert fw.to_dict() == {"t": [3, 7], "y": [50, 80]}
    a2 = pl.DataFrame({"t": [4, 7]})
    nr = a2.lazy().join_asof(b.lazy(), on="t", strategy="nearest").collect()
    assert nr.to_dict() == {"t": [4, 7], "y": [50, 80]}


def test_join_where_inequality():
    east = pl.DataFrame({"id": [100, 101, 102], "dur": [120, 140, 160]})
    west = pl.DataFrame({"t_id": [404, 498, 676], "time": [90, 130, 150]})
    out = east.join_where(west, pl.col("dur") < pl.col("time"))
    pairs = sorted(zip(out.to_dict()["dur"], out.to_dict()["time"]))
    assert pairs == [(120, 130), (120, 150), (140, 150)]


def test_join_where_compound():
    a = pl.DataFrame({"x": [1, 2, 3]})
    b = pl.DataFrame({"y": [1, 2, 3]})
    out = a.join_where(b, pl.col("x") < pl.col("y"),
                       pl.col("x") + pl.col("y") > 3)
    pairs = sorted(zip(out.to_dict()["x"], out.to_dict()["y"]))
    assert pairs == [(1, 3), (2, 3)]


def test_merge_sorted():
    a = pl.DataFrame({"k": [1, 3, 5], "v": ["a", "c", "e"]})
    b = pl.DataFrame({"k": [2, 3, 6], "v": ["b", "x", "f"]})
    m = a.merge_sorted(b, "k")
    assert m.to_dict()["k"] == [1, 2, 3, 3, 5, 6]


def test_lookup_join_sorted_oracle():
    import jax
    import jax.numpy as jnp
    from polaroid_tpu.ops.join import lookup_join_sorted
    rng = np.random.default_rng(3)
    nb, npr = 5000, 20000
    bkey = jnp.asarray(rng.permutation(nb).astype(np.uint32))
    bval = jnp.asarray(rng.uniform(0, 1, nb).astype(np.float32))
    pkey = jnp.asarray(rng.integers(0, nb * 2, npr).astype(np.uint32))
    v, h = jax.jit(lookup_join_sorted)(bkey, bval, pkey)
    lut = np.zeros(nb * 2, np.float32)
    lut[np.asarray(bkey)] = np.asarray(bval)
    present = np.zeros(nb * 2, bool)
    present[np.asarray(bkey)] = True
    exp_h = present[np.asarray(pkey)]
    assert np.array_equal(np.asarray(h), exp_h)
    assert np.allclose(np.asarray(v), np.where(exp_h, lut[np.asarray(pkey)],
                                               0))


def test_m1_fast_path_differential():
    # m:1 joins take the sort-native fast path; differential vs pandas
    import pandas as pd
    rng = np.random.default_rng(8)
    n, m = 8000, 1500
    orders = pl.DataFrame({
        "uid": [None if rng.random() < 0.02 else int(v)
                for v in rng.integers(0, 3000, n)],
        "amt": rng.uniform(1, 100, n).round(2).tolist()})
    users = pl.DataFrame({
        "uid": rng.choice(3000, m, replace=False).tolist(),
        "cc": [None if rng.random() < 0.1 else c
               for c in rng.choice(["CH", "DE", "FR"], m)],
        "score": rng.normal(0, 1, m).round(4).tolist(),
        "vip": (rng.random(m) > 0.8).tolist(),
        "n64": rng.integers(-2**40, 2**40, m).tolist()})
    for how in ("inner", "left"):
        out = orders.join(users, on="uid", how=how)
        ref = pd.DataFrame(orders.to_dict()).merge(
            pd.DataFrame(users.to_dict()), on="uid", how=how)
        assert out.height == len(ref)
        oc = out.sort(["uid", "amt"], nulls_last=True).to_dict()
        rc = ref.sort_values(["uid", "amt"], na_position="last")
        assert np.allclose(
            [np.nan if x is None else x for x in oc["score"]],
            rc["score"].values, equal_nan=True)
        assert [x for x in oc["cc"]] == \
            [None if (isinstance(x, float) and np.isnan(x)) else x
             for x in rc["cc"].values]
        assert [x for x in oc["n64"]] == \
            [None if np.isnan(x) else int(x) for x in rc["n64"].values]
        exp_vip = [None if (isinstance(x, float) and np.isnan(x)) else
                   bool(x) for x in rc["vip"].values]
        assert oc["vip"] == exp_vip
    # m:1 with multi-key + suffix collision
    l2 = pl.DataFrame({"a": [1, 2, 1], "b": ["x", "y", "y"], "v": [1, 2, 3]})
    r2 = pl.DataFrame({"a": [1, 1], "b": ["x", "y"], "v": [10, 20]})
    got = l2.join(r2, on=["a", "b"], how="left").sort("v").to_dict()
    assert got == {"a": [1, 2, 1], "b": ["x", "y", "y"], "v": [1, 2, 3],
                   "v_right": [10, None, 20]}


# ---------------------------------------------------------------------------
# IEJoin (join_where without cross product) — VERDICT r1 item 6
# ---------------------------------------------------------------------------

def _iej_oracle(ldict, rdict, conds, suffix="_right"):
    """Brute-force oracle over dict-of-lists; conds = [(lcol, op, rcol)]."""
    import operator
    ops = {"lt": operator.lt, "le": operator.le,
           "gt": operator.gt, "ge": operator.ge}
    lcols = list(ldict)
    rcols = list(rdict)
    nl = len(ldict[lcols[0]]); nr = len(rdict[rcols[0]])
    out = []
    for i in range(nl):
        for j in range(nr):
            ok = True
            for (lc, op, rc) in conds:
                a, b = ldict[lc][i], rdict[rc][j]
                if a is None or b is None or not ops[op](a, b):
                    ok = False
                    break
            if ok:
                out.append(tuple(ldict[c][i] for c in lcols) +
                           tuple(rdict[c][j] for c in rcols))
    return sorted(out)


@pytest.mark.parametrize("op1", ["lt", "le", "gt", "ge"])
@pytest.mark.parametrize("op2", ["lt", "le", "gt", "ge"])
def test_join_where_two_ineq_matrix(op1, op2):
    rng = np.random.default_rng(hash((op1, op2)) % 2**32)
    nl, nr = 60, 45
    ld = {"a": rng.integers(0, 20, nl).tolist(),
          "b": rng.integers(0, 20, nl).tolist()}
    rd = {"x": rng.integers(0, 20, nr).tolist(),
          "y": rng.integers(0, 20, nr).tolist()}
    l = pl.DataFrame(ld); r = pl.DataFrame(rd)
    import operator
    opmap = {"lt": operator.lt, "le": operator.le,
             "gt": operator.gt, "ge": operator.ge}
    pred1 = {"lt": pl.col("a") < pl.col("x"),
             "le": pl.col("a") <= pl.col("x"),
             "gt": pl.col("a") > pl.col("x"),
             "ge": pl.col("a") >= pl.col("x")}[op1]
    pred2 = {"lt": pl.col("b") < pl.col("y"),
             "le": pl.col("b") <= pl.col("y"),
             "gt": pl.col("b") > pl.col("y"),
             "ge": pl.col("b") >= pl.col("y")}[op2]
    out = l.join_where(r, pred1, pred2).to_dict()
    got = sorted(zip(out["a"], out["b"], out["x"], out["y"]))
    want = _iej_oracle(ld, rd, [("a", op1, "x"), ("b", op2, "y")])
    assert got == want


def test_join_where_floats_and_nulls():
    l = pl.DataFrame({"a": [1.5, None, 3.25, -2.0],
                      "b": [10, 20, 30, 40]})
    r = pl.DataFrame({"x": [0.5, 2.0, None, 3.25],
                      "y": [15, 25, 5, 35]})
    out = l.join_where(r, pl.col("a") > pl.col("x"),
                       pl.col("b") < pl.col("y")).to_dict()
    got = sorted(zip(out["a"], out["b"], out["x"], out["y"]))
    want = _iej_oracle({"a": [1.5, None, 3.25, -2.0],
                        "b": [10, 20, 30, 40]},
                       {"x": [0.5, 2.0, None, 3.25],
                        "y": [15, 25, 5, 35]},
                       [("a", "gt", "x"), ("b", "lt", "y")])
    assert got == want


def test_join_where_flipped_and_exprs():
    # right-side expr on the left of the operator, and computed keys
    l = pl.DataFrame({"a": [1, 5, 9]})
    r = pl.DataFrame({"x": [2, 6, 10]})
    out = l.join_where(r, pl.col("x") > pl.col("a") + 1).to_dict()
    want = _iej_oracle({"a2": [2, 6, 10]}, {"x": [2, 6, 10]},
                       [("a2", "lt", "x")])
    got = sorted((a + 1, x) for a, x in zip(out["a"], out["x"]))
    assert got == want


def test_join_where_suffix_collision_and_post():
    l = pl.DataFrame({"t": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    r = pl.DataFrame({"t": [2, 3, 4], "v": [10.0, 20.0, 30.0]})
    out = l.join_where(r, pl.col("t") < pl.col("t_right"),
                       pl.col("v_right") > pl.col("v") * 5)
    d = out.to_dict()
    assert set(d) == {"t", "v", "t_right", "v_right"}
    got = sorted(zip(d["t"], d["t_right"], d["v"], d["v_right"]))
    want = _iej_oracle({"t": [1, 2, 3], "v": [1.0, 2.0, 3.0]},
                       {"t": [2, 3, 4], "v": [10.0, 20.0, 30.0]},
                       [("t", "lt", "t"), ("v", "lt", "v")])
    # oracle emits (t, v, t_r, v_r); reorder + filter v_r > v*5
    want2 = sorted((t, tr, v, vr) for (t, v, tr, vr) in want if vr > v * 5)
    assert got == want2


def test_join_where_scale_no_cross_product():
    """50k x 50k with selective predicates: the cross product (2.5e9
    pairs) is infeasible; the wavelet path must finish quickly."""
    rng = np.random.default_rng(3)
    n = 50_000
    l = pl.DataFrame({"a": rng.integers(0, 1_000_000, n),
                      "b": rng.integers(0, 1_000_000, n)})
    r = pl.DataFrame({"x": rng.integers(0, 1_000_000, n),
                      "y": rng.integers(0, 1_000_000, n)})
    out = l.join_where(r, pl.col("a") < pl.col("x") - 990_000,
                       pl.col("b") > pl.col("y") + 990_000)
    h = out.height
    # sparse-sample oracle check on the pair count
    la = np.asarray(l.to_dict()["a"]); lb = np.asarray(l.to_dict()["b"])
    rx = np.asarray(r.to_dict()["x"]); ry = np.asarray(r.to_dict()["y"])
    want = 0
    sel = la < 10_000  # only tiny `a` can match
    for i in np.nonzero(sel)[0]:
        want += int(np.sum((la[i] < rx - 990_000) & (lb[i] > ry + 990_000)))
    assert h == want
