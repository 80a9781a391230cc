"""Collocate join (ops/hjoin.py) against brute-force oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from polaroid_tpu.ops import hjoin as HJ


def test_mix31_bijective(rng):
    x = jnp.asarray(rng.integers(0, 1 << 31, 4096, dtype=np.int64)
                    .astype(np.uint32))
    assert np.array_equal(np.asarray(HJ.mix31_inv(HJ.mix31(x))),
                          np.asarray(x))
    # distinct inputs -> distinct outputs on a dense range
    y = np.asarray(HJ.mix31(jnp.arange(1 << 16, dtype=jnp.uint32)))
    assert len(np.unique(y)) == 1 << 16


def test_lookup_join_collocated_oracle(rng):
    nb, npr = 3000, 20000
    bkey = rng.permutation(1 << 20)[:nb].astype(np.uint32)
    bval = rng.normal(0, 10, nb).astype(np.float32)
    pkey = np.concatenate([
        bkey[rng.integers(0, nb, npr // 2)],
        rng.integers(1 << 20, 1 << 21, npr - npr // 2).astype(np.uint32)])
    rng.shuffle(pkey)
    pidx, val, hit, live, ok = jax.jit(HJ.lookup_join_collocated)(
        jnp.asarray(bkey), jnp.asarray(bval), jnp.asarray(pkey))
    assert bool(ok)
    pidx, val, hit, live = map(np.asarray, (pidx, val, hit, live))
    lut = dict(zip(bkey.tolist(), bval.tolist()))
    seen = set()
    for i in range(len(pidx)):
        if not live[i]:
            continue
        p = int(pidx[i])
        assert p not in seen, "duplicate probe row"
        seen.add(p)
        want = lut.get(int(pkey[p]))
        if want is None:
            assert not hit[i], p
        else:
            assert hit[i], p
            assert val[i] == np.float32(want), p
    assert len(seen) == npr, "every probe row exactly once"


def test_collocate_key_over_31_bits_refused(rng):
    bkey = np.array([1, 2, 3, 0x80000001], np.uint32)
    pkey = np.array([1, 2], np.uint32)
    *_, ok = HJ.lookup_join_collocated(
        jnp.asarray(bkey), jnp.asarray(np.ones(4, np.float32)),
        jnp.asarray(pkey))
    assert not bool(ok)


def _join_oracle(lkey, lval, rkey, rval, how):
    lut = {}
    for k, v in zip(rkey, rval):
        lut[int(k)] = v
    rows = []
    for k, v in zip(lkey, lval):
        m = lut.get(int(k))
        if m is not None:
            rows.append((int(k), float(v), float(m), True))
        elif how == "left":
            rows.append((int(k), float(v), None, False))
    return rows


def test_collocated_join_engine(rng):
    """Engine-level collocated join vs oracle (inner + left, with and
    without the dup-build fallback trigger)."""
    from polaroid_tpu.batch import Table, Column
    from polaroid_tpu.dtypes import Int32, Float32
    from polaroid_tpu.ops.hjoin import collocated_join
    from polaroid_tpu.expr.eval import Val

    capL, capR = 3 * 8192, 8192
    lkey = rng.integers(0, 40000, capL).astype(np.int32)
    lval = rng.normal(0, 5, capL).astype(np.float32)
    rkey = rng.permutation(50000)[:capR].astype(np.int32)
    rval = rng.normal(0, 5, capR).astype(np.float32)
    left = Table(["k", "lv"], {"k": Column(Int32, jnp.asarray(lkey), None, None),
                               "lv": Column(Float32, jnp.asarray(lval), None, None)},
                 capL, None, None)
    right = Table(["k", "rv"], {"k": Column(Int32, jnp.asarray(rkey), None, None),
                                "rv": Column(Float32, jnp.asarray(rval), None, None)},
                  capR, None, None)
    lv = [Val(Int32, jnp.asarray(lkey), None, None, False)]
    rv = [Val(Int32, jnp.asarray(rkey), None, None, False)]
    lm = jnp.ones(capL, bool)
    rm = jnp.ones(capR, bool)
    for how in ("inner", "left"):
        res = collocated_join(left, right, ["k"], ["k"], how, "_right",
                              True, lv, rv, lm, rm)
        assert res is not None
        t, ok = res
        assert bool(ok)
        live = np.asarray(t.valid)
        kk = np.asarray(t.cols["k"].data)
        lvv = np.asarray(t.cols["lv"].data)
        rvv = np.asarray(t.cols["rv"].data)
        rvalid = np.asarray(t.cols["rv"].validity)
        got = []
        for i in range(len(live)):
            if live[i]:
                got.append((int(kk[i]), float(lvv[i]),
                            float(rvv[i]) if rvalid[i] else None,
                            bool(rvalid[i])))
        want = _join_oracle(lkey, lval, rkey, rval, how)
        assert sorted(got, key=str) == sorted(want, key=str), how


def test_collocated_join_dup_right_refused(rng):
    from polaroid_tpu.batch import Table, Column
    from polaroid_tpu.dtypes import Int32
    from polaroid_tpu.ops.hjoin import collocated_join
    from polaroid_tpu.expr.eval import Val
    capL, capR = 2 * 8192, 8192
    lkey = rng.integers(0, 100, capL).astype(np.int32)
    rkey = rng.integers(0, 100, capR).astype(np.int32)  # duplicates!
    left = Table(["k"], {"k": Column(Int32, jnp.asarray(lkey), None, None)},
                 capL, None, None)
    right = Table(["k2"], {"k2": Column(Int32, jnp.asarray(rkey), None, None)},
                  capR, None, None)
    lv = [Val(Int32, jnp.asarray(lkey), None, None, False)]
    rv = [Val(Int32, jnp.asarray(rkey), None, None, False)]
    res = collocated_join(left, right, ["k"], ["k2"], "inner", "_right",
                          True, lv, rv, jnp.ones(capL, bool),
                          jnp.ones(capR, bool))
    assert res is not None
    _, ok = res
    assert not bool(ok)


def test_collocated_join_int64_offset_keys(rng):
    """Int64 keys ride as one offset u32 word: negative / large key
    ranges shift by the stat base, and the key column reconstructs as
    base + word (r5: the engine's x64 default keys engage the kernel)."""
    from polaroid_tpu.batch import Table, Column
    from polaroid_tpu.dtypes import Int64, Float32
    from polaroid_tpu.ops.hjoin import collocated_join
    from polaroid_tpu.expr.eval import Val

    capL, capR = 3 * 8192, 8192
    base = -5_000_000_000  # far outside [0, 2^31)
    rkey = (rng.permutation(50000)[:capR].astype(np.int64) + base)
    lkey = np.concatenate([
        rkey[rng.integers(0, capR, capL // 2)],
        rng.integers(50000, 120000, capL - capL // 2).astype(np.int64)
        + base])
    rng.shuffle(lkey)
    lval = rng.normal(0, 5, capL).astype(np.float32)
    rval = rng.normal(0, 5, capR).astype(np.float32)
    left = Table(["k", "lv"],
                 {"k": Column(Int64, jnp.asarray(lkey), None, None),
                  "lv": Column(Float32, jnp.asarray(lval), None, None)},
                 capL, None, None)
    right = Table(["k", "rv"],
                  {"k": Column(Int64, jnp.asarray(rkey), None, None),
                   "rv": Column(Float32, jnp.asarray(rval), None, None)},
                  capR, None, None)
    lv = [Val(Int64, jnp.asarray(lkey), None, None, False)]
    rv = [Val(Int64, jnp.asarray(rkey), None, None, False)]
    lm = jnp.ones(capL, bool)
    rm = jnp.ones(capR, bool)
    for how in ("inner", "left"):
        res = collocated_join(left, right, ["k"], ["k"], how, "_right",
                              True, lv, rv, lm, rm)
        assert res is not None, how
        t, ok = res
        assert bool(ok), how
        live = np.asarray(t.valid)
        kk = np.asarray(t.cols["k"].data)
        lvv = np.asarray(t.cols["lv"].data)
        rvv = np.asarray(t.cols["rv"].data)
        rvalid = np.asarray(t.cols["rv"].validity)
        got = []
        for i in range(len(live)):
            if live[i]:
                got.append((int(kk[i]), float(lvv[i]),
                            float(rvv[i]) if rvalid[i] else None,
                            bool(rvalid[i])))
        want = _join_oracle(lkey, lval, rkey, rval, how)
        assert sorted(got, key=str) == sorted(want, key=str), how


def test_collocated_join_int64_range_too_wide_refused(rng):
    """A live i64 range wider than 31 bits is statically refused."""
    from polaroid_tpu.batch import Table, Column
    from polaroid_tpu.dtypes import Int64
    from polaroid_tpu.ops.hjoin import collocated_join
    from polaroid_tpu.expr.eval import Val
    capL = capR = 3 * 8192
    lkey = rng.integers(0, 1 << 40, capL).astype(np.int64)
    rkey = rng.integers(0, 1 << 40, capR).astype(np.int64)
    left = Table(["k"], {"k": Column(Int64, jnp.asarray(lkey), None, None)},
                 capL, None, None)
    right = Table(["k2"],
                  {"k2": Column(Int64, jnp.asarray(rkey), None, None)},
                  capR, None, None)
    lv = [Val(Int64, jnp.asarray(lkey), None, None, False)]
    rv = [Val(Int64, jnp.asarray(rkey), None, None, False)]
    res = collocated_join(left, right, ["k"], ["k2"], "inner", "_right",
                          True, lv, rv, jnp.ones(capL, bool),
                          jnp.ones(capR, bool))
    assert res is None
