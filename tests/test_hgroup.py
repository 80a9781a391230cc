"""Hash-exchange group-by (ops/hgroup.py) + bucket exchange kernel
(ops/exchange.py) against brute-force oracles. The Pallas kernel runs in
interpreter mode on CPU (same code path as TPU modulo Mosaic lowering)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polaroid_tpu.ops import exchange as EX
from polaroid_tpu.ops import hgroup as HG


def test_bucket_exchange_oracle(rng):
    B = 3
    n = B * EX.S
    # keys sorted per block with digit = top 5 bits
    h = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    # mark ~10% dead
    dead = rng.random(n) < 0.1
    h[dead] = 0xFFFFFFFF
    hb = np.sort(h.reshape(B, EX.S), axis=1)
    v = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    vb = v.reshape(B, EX.S)  # payload rides un-sorted is fine for the test
    digit = (hb >> 27).astype(np.int32)
    live = hb != 0xFFFFFFFF
    counts = np.zeros((B, EX.K), np.int32)
    for b in range(B):
        for k in range(EX.K):
            counts[b, k] = int(((digit[b] == k) & live[b]).sum())
    starts = np.concatenate(
        [np.zeros((B, 1), np.int32), np.cumsum(counts, 1)[:, :-1]], axis=1)
    assert counts.max() <= EX.CAP, "test data must not overflow"
    outs = EX.bucket_exchange(
        jnp.asarray(starts), jnp.asarray(counts),
        [jnp.asarray(hb.reshape(-1)), jnp.asarray(vb.reshape(-1))],
        fills=(0xFFFFFFFF, 0))
    ho, vo = map(np.asarray, outs)
    assert ho.shape == (EX.K, B * EX.CAP)
    for k in range(EX.K):
        for b in range(B):
            cell = ho[k, b * EX.CAP:(b + 1) * EX.CAP]
            c = counts[b, k]
            s = starts[b, k]
            assert np.array_equal(cell[:c], hb[b, s:s + c]), (k, b)
            assert (cell[c:] == 0xFFFFFFFF).all(), (k, b)
            vcell = vo[k, b * EX.CAP:(b + 1) * EX.CAP]
            assert np.array_equal(vcell[:c], vb[b, s:s + c]), (k, b)
            assert (vcell[c:] == 0).all(), (k, b)


def test_fmix_inverse(rng):
    x = jnp.asarray(rng.integers(0, 1 << 32, 1000, dtype=np.uint64)
                    .astype(np.uint32))
    from polaroid_tpu.ops.hashing import _fmix32
    assert np.array_equal(np.asarray(HG.fmix32_inv(_fmix32(x))),
                          np.asarray(x))


def test_hash_groupby_overflow_flag(rng):
    # few heavy keys concentrate a digit cell beyond CAP: the fast path
    # must refuse (ok=False) so the caller's lax.cond takes the carry
    # sort — never silently truncate
    n = 2 * EX.S
    key = rng.integers(0, 8, n).astype(np.uint32) * 500_000_011
    val = rng.normal(size=n).astype(np.float32)
    _, _, _, ok = HG.hash_groupby_u32(
        jnp.asarray(key), [jnp.asarray(val)], jnp.asarray(np.ones(n, bool)),
        ["sum"])
    assert not bool(ok)
    assert not bool(HG.precheck(jnp.asarray(key),
                                jnp.asarray(np.ones(n, bool))))


@pytest.mark.parametrize("nkeys,aggs", [
    (2000, ["sum", "count"]),
    (5000, ["sum", "min", "max", "count"]),
    (200_000, ["sum", "count"]),
])
def test_hash_groupby_oracle(rng, nkeys, aggs):
    n = 2 * EX.S + 777
    key = rng.integers(0, nkeys, n).astype(np.uint32)
    # include huge key values to prove range-independence
    key[key % 7 == 0] += 4_000_000_000 - nkeys
    val = rng.normal(0, 10, n).astype(np.float32)
    valid = rng.random(n) > 0.15
    gkey, outs, gvalid, ok = jax.jit(
        lambda k, v, m: HG.hash_groupby_u32(k, [v] * len(aggs), m, aggs)
    )(jnp.asarray(key), jnp.asarray(val), jnp.asarray(valid))
    assert bool(ok)
    gkn = np.asarray(gkey)
    gvn = np.asarray(gvalid)
    outn = [np.asarray(o) for o in outs]
    ref = {}
    for k, v, m in zip(key, val, valid):
        if m:
            a = ref.setdefault(int(k), [0.0, np.inf, -np.inf, 0])
            a[0] += float(v)
            a[1] = min(a[1], v)
            a[2] = max(a[2], v)
            a[3] += 1
    got_keys = [int(gkn[i]) for i in range(len(gkn)) if gvn[i]]
    assert sorted(got_keys) == sorted(ref.keys())
    col = {"sum": 0, "min": 1, "max": 2, "count": 3}
    for i in range(len(gkn)):
        if not gvn[i]:
            continue
        want = ref[int(gkn[i])]
        for j, agg in enumerate(aggs):
            w = want[col[agg]]
            g = outn[j][i]
            if agg == "count":
                assert int(g) == w, (int(gkn[i]), agg)
            elif agg == "sum":
                assert abs(float(g) - w) < 1e-2 + 1e-4 * abs(w), \
                    (int(gkn[i]), agg)
            else:
                assert float(g) == pytest.approx(w), (int(gkn[i]), agg)


def test_hash_groupby_int_vals(rng):
    n = 2 * EX.S
    key = rng.integers(0, 300, n).astype(np.uint32)
    val = rng.integers(-1000, 1000, n).astype(np.int32)
    valid = rng.random(n) > 0.5
    gkey, outs, gvalid, ok = HG.hash_groupby_u32(
        jnp.asarray(key), [jnp.asarray(val)] * 3, jnp.asarray(valid),
        ["sum", "min", "max"])
    assert bool(ok)
    gkn, gvn = np.asarray(gkey), np.asarray(gvalid)
    s, mn, mx = [np.asarray(o) for o in outs]
    ref = {}
    for k, v, m in zip(key, val, valid):
        if m:
            a = ref.setdefault(int(k), [0, 1 << 40, -(1 << 40)])
            a[0] += int(v)
            a[1] = min(a[1], int(v))
            a[2] = max(a[2], int(v))
    for i in range(len(gkn)):
        if gvn[i]:
            w = ref[int(gkn[i])]
            assert int(s[i]) == w[0]
            assert int(mn[i]) == w[1]
            assert int(mx[i]) == w[2]


def test_adaptive_dispatcher_all_tiers(rng):
    """Each cond tier (dense / hash-exchange / carry fallback) must agree
    with the oracle; exercised directly since CPU backend short-circuits
    local_groupby before the dispatcher."""
    import polaroid_tpu.parallel.shuffle as SH

    n = 2 * EX.S
    val = rng.normal(0, 10, n).astype(np.float32)
    valid = rng.random(n) > 0.1
    cases = {
        "dense": rng.integers(500, 3000, n).astype(np.uint32),
        "exchange": rng.integers(0, 1 << 31, n, dtype=np.int64)
        .astype(np.uint32),
        "carry": (rng.integers(0, 6, n) * 700_000_003).astype(np.uint32),
    }
    for name, key in cases.items():
        gk, outs, gv = HG.adaptive_local_groupby(
            jnp.asarray(key), [jnp.asarray(val)] * 2, jnp.asarray(valid),
            ["sum", "count"],
            lambda: SH._local_groupby_carry(
                jnp.asarray(key), [jnp.asarray(val)] * 2,
                jnp.asarray(valid), ["sum", "count"]))
        gkn, gvn = np.asarray(gk), np.asarray(gv)
        sn, cn = np.asarray(outs[0]), np.asarray(outs[1])
        ref = {}
        for k, v, m in zip(key, val, valid):
            if m:
                a = ref.setdefault(int(k), [0.0, 0])
                a[0] += float(v)
                a[1] += 1
        got = {int(gkn[i]): (float(sn[i]), int(cn[i]))
               for i in range(len(gkn)) if gvn[i]}
        assert set(got) == set(ref), name
        for k in ref:
            assert abs(got[k][0] - ref[k][0]) < 1e-2, (name, k)
            assert got[k][1] == ref[k][1], (name, k)


def test_engine_hash_groupby_fast(rng, monkeypatch):
    """Force the engine's large-domain fast path (CPU backends skip it)
    and check it against the normal engine path."""
    import polaroid_tpu as pl
    import polaroid_tpu.ops.groupby as G

    n = 2 * EX.S
    nuniq = 6000  # dense-coded span > _MXU_GROUP_LIMIT via dict strings
    uniq = np.array([f"k{i:05d}" for i in range(nuniq)])
    codes = rng.integers(0, nuniq, n)
    strs = uniq[codes]
    v1 = rng.integers(0, 100, n).astype(np.int32)
    v2 = rng.normal(0, 5, n).astype(np.float32)
    df = pl.DataFrame({"id": strs.tolist(), "v1": v1, "v2": v2})
    q = (df.lazy().group_by("id")
         .agg(pl.col("v1").sum().alias("s1"),
              pl.col("v2").mean().alias("m2"),
              pl.col("v2").min().alias("lo"),
              pl.len().alias("n")))
    base = q.collect().to_dict()

    called = {}
    orig = G._hash_groupby_fast

    def spy(*a, **k):
        r = orig(*a, **k)
        called["hit"] = r is not None
        return r

    import polaroid_tpu.exec.compiled as CC
    CC._CACHE.clear()
    monkeypatch.setattr(G, "_hash_groupby_fast", spy)
    monkeypatch.setattr(G, "_use_segscan", lambda: True)
    fast = q.collect().to_dict()
    CC._CACHE.clear()
    assert called.get("hit"), "fast path did not engage"

    want = dict(zip(base["id"],
                    zip(base["s1"], base["m2"], base["lo"], base["n"])))
    got = dict(zip(fast["id"],
                   zip(fast["s1"], fast["m2"], fast["lo"], fast["n"])))
    assert set(got) == set(want)
    for k in want:
        assert int(got[k][0]) == int(want[k][0]), k
        assert abs(got[k][1] - want[k][1]) < 1e-3, k
        assert got[k][2] == pytest.approx(want[k][2]), k
        assert int(got[k][3]) == int(want[k][3]), k


def test_hash_groupby_sumprod_oracle(rng):
    """sumprod (the covariance cross term): both factor words ride the
    shared raw-word sort, multiplied post-exchange with a compensated
    two-prod (f64 scan request)."""
    n = 2 * EX.S + 123
    key = rng.integers(0, 3000, n).astype(np.uint32)
    a = rng.normal(0, 5, n).astype(np.float32)
    b = rng.normal(0, 5, n).astype(np.float32)
    valid = rng.random(n) > 0.1
    aggs = ["sumprod", "sum", "count"]
    vals = [(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(a),
            jnp.asarray(a)]
    sd = [jnp.dtype(jnp.float64), None, None]
    gkey, outs, gvalid, ok = HG.hash_groupby_u32(
        jnp.asarray(key), vals, jnp.asarray(valid), aggs, scan_dtypes=sd)
    assert bool(ok)
    gkn, gvn = np.asarray(gkey), np.asarray(gvalid)
    outn = [np.asarray(o) for o in outs]
    ref = {}
    for k, x, y, m in zip(key, a, b, valid):
        if m:
            r = ref.setdefault(int(k), [0.0, 0.0, 0])
            r[0] += float(x) * float(y)
            r[1] += float(x)
            r[2] += 1
    seen = 0
    for i in range(len(gkn)):
        if not gvn[i]:
            continue
        w = ref[int(gkn[i])]
        assert abs(outn[0][i] - w[0]) < 1e-3 + 1e-5 * abs(w[0])
        assert abs(outn[1][i] - w[1]) < 1e-2 + 1e-4 * abs(w[1])
        assert int(outn[2][i]) == w[2]
        seen += 1
    assert seen == len(ref)


def test_engine_hash_groupby_combo(rng, monkeypatch):
    """Aggregate-combination outputs (corr**2, max-min, (a*b).sum())
    ride the hash-exchange path; differential against the normal engine
    path, with nulls in one value column."""
    import polaroid_tpu as pl
    import polaroid_tpu.ops.groupby as G

    n = 2 * EX.S
    nuniq = 6000
    uniq = np.array([f"k{i:05d}" for i in range(nuniq)])
    codes = rng.integers(0, nuniq, n)
    v1 = rng.integers(1, 6, n).astype(np.int32)
    v2 = rng.normal(10, 5, n).astype(np.float32)
    v2l = v2.astype(object)
    v2l[rng.random(n) < 0.05] = None
    # v2 declared Float32: under the CPU test config Float64 columns
    # store as real f64 (8-byte words can't ride the u32 transport), on
    # TPU Float64 stores as f32 and combos engage either way
    df = pl.DataFrame({"id": uniq[codes].tolist(), "v1": v1,
                       "v2": pl.Series("v2", v2l.tolist(),
                                       dtype=pl.Float32)})
    q = (df.lazy().group_by("id")
         .agg((pl.corr("v1", "v2") ** 2).alias("r2"),
              (pl.col("v1").max() - pl.col("v1").min()).alias("rng"),
              (pl.col("v1") * pl.col("v1")).cast(pl.Float64).sum()
              .alias("ssq")))
    base = q.collect().to_dict()

    called = {}
    orig = G._hash_groupby_fast

    def spy(*a, **k):
        r = orig(*a, **k)
        called["hit"] = r is not None
        return r

    import polaroid_tpu.exec.compiled as CC
    CC._CACHE.clear()
    monkeypatch.setattr(G, "_hash_groupby_fast", spy)
    monkeypatch.setattr(G, "_use_segscan", lambda: True)
    fast = q.collect().to_dict()
    CC._CACHE.clear()
    assert called.get("hit"), "combo fast path did not engage"

    want = dict(zip(base["id"], zip(base["r2"], base["rng"], base["ssq"])))
    got = dict(zip(fast["id"], zip(fast["r2"], fast["rng"], fast["ssq"])))
    assert set(got) == set(want)
    for k in want:
        wr, gr = want[k][0], got[k][0]
        if wr is None or (isinstance(wr, float) and np.isnan(wr)):
            assert gr is None or np.isnan(gr), k
        else:
            assert abs(gr - wr) < 2e-5 + 1e-4 * abs(wr), k
        assert int(got[k][1]) == int(want[k][1]), k
        assert abs(got[k][2] - want[k][2]) < 1e-2 + 1e-5 * abs(want[k][2])
