"""pivot, partition_by, sample, describe, concat_str, string casts, Series."""

import numpy as np
import pytest

import polaroid_tpu as pl


def test_pivot():
    df = pl.DataFrame({"k": ["a", "a", "b", "b"],
                       "cat": ["x", "y", "x", "y"],
                       "v": [1, 2, 3, 4]})
    out = df.pivot("cat", index="k", values="v")
    assert out.to_dict() == {"k": ["a", "b"], "x": [1, 3], "y": [2, 4]}


def test_pivot_agg_sum():
    df = pl.DataFrame({"k": ["a", "a", "a"], "cat": ["x", "x", "y"],
                       "v": [1, 2, 10]})
    out = df.pivot("cat", index="k", values="v", aggregate_function="sum")
    assert out.to_dict() == {"k": ["a"], "x": [3], "y": [10]}


def test_partition_by():
    df = pl.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    parts = df.partition_by("k")
    assert len(parts) == 2
    assert parts[0].to_dict() == {"k": ["a", "a"], "v": [1, 3]}
    d = df.partition_by("k", as_dict=True)
    assert d["b"].to_dict() == {"k": ["b"], "v": [2]}


def test_sample_and_shuffle():
    df = pl.DataFrame({"a": list(range(100))})
    s = df.sample(10, seed=1)
    assert s.height == 10
    assert len(set(s.to_dict()["a"])) == 10
    sh = df.shuffle(seed=2)
    assert sh.height == 100
    assert sorted(sh.to_dict()["a"]) == list(range(100))
    assert sh.to_dict()["a"] != list(range(100))


def test_describe():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0, None], "s": ["x", "y", "y", None]})
    out = df.describe()
    d = out.to_dict()
    assert d["statistic"][0] == "count"
    assert d["a"][0] == 3.0  # count
    assert d["a"][1] == 1.0  # null_count
    assert d["a"][2] == 2.0  # mean
    assert d["s"][4] == "x" and d["s"][8] == "y"  # min/max


def test_cast_to_string():
    df = pl.DataFrame({"a": [1, 2], "f": [1.5, 2.0], "b": [True, False]})
    out = df.select(pl.col("a").cast(pl.String).alias("sa"),
                    pl.col("f").cast(pl.String).alias("sf"),
                    pl.col("b").cast(pl.String).alias("sb"))
    assert out.to_dict() == {"sa": ["1", "2"], "sf": ["1.5", "2.0"],
                             "sb": ["true", "false"]}


def test_cast_string_to_number():
    df = pl.DataFrame({"s": ["1", "2.5", "zzz", None]})
    out = df.select(pl.col("s").cast(pl.Float64, strict=False).alias("f"),
                    pl.col("s").cast(pl.Int64, strict=False).alias("i"))
    assert out.to_dict()["f"] == [1.0, 2.5, None, None]
    # "2.5" is not an integer literal (polars: strict=False -> null)
    assert out.to_dict()["i"] == [1, None, None, None]


def test_concat_str():
    df = pl.DataFrame({"a": ["x", "y", None], "n": [1, 2, 3]})
    out = df.select(pl.concat_str(pl.col("a"), pl.col("n"),
                                  separator="-").alias("c"))
    assert out.to_dict() == {"c": ["x-1", "y-2", None]}


def test_series_arithmetic():
    s = pl.Series("v", [1, 2, 3])
    assert (s + 1).to_list() == [2, 3, 4]
    assert (s * s).to_list() == [1, 4, 9]
    assert (-s).to_list() == [-1, -2, -3]
    assert s.cast(pl.Float64).to_list() == [1.0, 2.0, 3.0]


def test_series_filter_sort_unique():
    s = pl.Series("v", [3, 1, 2, 1])
    assert s.sort().to_list() == [1, 1, 2, 3]
    assert sorted(s.unique().to_list()) == [1, 2, 3]
    m = s > 1
    assert s.filter(m).to_list() == [3, 2]
    assert s.head(2).to_list() == [3, 1]


def test_series_value_counts():
    s = pl.Series("v", ["a", "b", "a"])
    out = s.value_counts()
    assert out.to_dict() == {"v": ["a", "b"], "count": [2, 1]}


def test_series_null_ops():
    s = pl.Series("v", [1, None, 3])
    assert s.is_null().to_list() == [False, True, False]
    assert s.fill_null(0).to_list() == [1, 0, 3]
    assert s.shift(1).to_list() == [None, 1, None] or \
        s.shift(1).to_list() == [None, 1, None]
    assert s.cum_sum().to_list() == [1, None, 4]


def test_select_expr_filter_compacts():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 2, 3]})
    out = df.select(pl.col("a").filter(pl.col("a") > 1))
    assert out.to_dict()["a"] == [2, 2, 2, 3]
    d2 = pl.DataFrame({"x": [1, None, 3]})
    assert d2.select(pl.col("x").drop_nulls()).to_dict()["x"] == [1, 3]


def test_gather_every_rle_peaks():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 2, 3]})
    assert df.select(pl.col("a").gather_every(2)).to_dict()["a"] == [1, 2, 2]
    assert df.select(
        pl.col("a").gather_every(2, offset=1)).to_dict()["a"] == [1, 2, 3]
    r = df.select(pl.col("a").rle())
    assert r.to_dict()["a"] == [{"len": 2, "value": 1},
                                {"len": 3, "value": 2},
                                {"len": 1, "value": 3}]
    assert df.select(pl.col("a").rle_id()).to_dict()["a"] == [0, 0, 1, 1, 1, 2]
    p = pl.DataFrame({"v": [1, 3, 2, 5, 4]})
    assert p.select(pl.col("v").peak_max()).to_dict()["v"] == \
        [False, True, False, True, False]
    assert p.select(pl.col("v").peak_min()).to_dict()["v"] == \
        [True, False, True, False, True]


def test_shrink_dtype_entropy():
    s = pl.DataFrame({"v": [1, 2, 127]}).select(pl.col("v").shrink_dtype())
    assert repr(s.schema["v"]) == "Int8"
    s2 = pl.DataFrame({"v": [1, 300]}).select(pl.col("v").shrink_dtype())
    assert repr(s2.schema["v"]) == "Int16"
    e = pl.DataFrame({"v": [1.0, 1.0]}).select(pl.col("v").entropy(base=2))
    assert abs(e.to_dict()["v"][0] - 1.0) < 1e-6


def test_series_api_surface():
    s = pl.Series("x", [3, 1, 2, None])
    assert s.arg_min() == 1 and s.arg_max() == 0
    assert s.rank().to_list()[:3] == [3.0, 1.0, 2.0]
    assert s.clip(1, 2).to_list() == [2, 1, 2, None]
    assert s.drop_nulls().to_list() == [3, 1, 2]
    assert s.reverse().to_list() == [None, 2, 1, 3]
    assert s.gather([0, 2]).to_list() == [3, 2]
    assert pl.Series("a", [1.0, 2.0]).dot(pl.Series("b", [3.0, 4.0])) == 11.0
    z = pl.Series("x", [1, 2]).zip_with(pl.Series("m", [True, False]),
                                        pl.Series("o", [9, 9]))
    assert z.to_list() == [1, 9]
    assert pl.Series("t", ["ab", "c"]).str.len_chars().to_list() == [2, 1]
    assert pl.Series("l", [[1, 2], [3]]).list.sum().to_list() == [3, 3]
    assert s.set(pl.Series("m", [True, False, False, False]),
                 99).to_list() == [99, 1, 2, None]
    assert s.scatter([1], [42]).to_list() == [3, 42, 2, None]
    assert s.map_elements(lambda v: v * 10).to_list() == [30, 10, 20, None]
    assert pl.Series("x", [1, 2, 3]).is_sorted()


def test_frame_api_surface():
    df = pl.DataFrame({"a": [1, 2, 2], "b": [4.0, 5.0, 5.0]})
    assert df.product().to_dict() == {"a": [4], "b": [100.0]}
    assert df.sum_horizontal().to_list() == [5.0, 7.0, 7.0]
    assert df.shift(1).to_dict()["a"] == [None, 1, 2]
    assert df.is_duplicated().to_list() == [False, True, True]
    assert df.is_unique().to_list() == [True, False, False]
    assert df.transpose().to_dict()["column_0"] == [1, 4.0]
    assert list(df.iter_rows()) == [(1, 4.0), (2, 5.0), (2, 5.0)]
    assert df.fold(lambda a, b: a + b).to_list() == [5.0, 7.0, 7.0]
    assert df.clear().height == 0 and df.clear().columns == ["a", "b"]
    assert df.insert_column(1, pl.Series("c", [7, 8, 9])).columns == \
        ["a", "c", "b"]


def test_pl_functions_surface():
    import math
    import numpy as np
    df = pl.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0],
                       "p": [True, False], "q": [True, True]})
    assert df.select(pl.any_horizontal("p", "q")).to_dict()["any"] == \
        [True, True]
    assert df.select(pl.all_horizontal("p", "q")).to_dict()["all"] == \
        [True, False]
    assert df.select(
        pl.fold(0, lambda a, b: a + b, ["a", "b"])).to_dict()["fold"] == \
        [4.0, 6.0]
    at = df.select(pl.arctan2("a", "b").alias("t")).to_dict()["t"]
    assert abs(at[0] - math.atan2(1, 3)) < 1e-6
    assert df.select(pl.format("v={}", pl.col("a")).alias("s")) \
        .to_dict()["s"] == ["v=1.0", "v=2.0"]
    d = pl.DataFrame({"y": [2024], "m": [1], "d": [15]})
    out = d.select(pl.datetime("y", "m", "d").alias("ts")).to_dict()["ts"]
    assert out[0] == np.datetime64("2024-01-15T00:00:00", "us")
    fe = pl.DataFrame({"t": [86400]}).select(
        pl.from_epoch(pl.col("t"), "s").alias("x")).to_dict()["x"]
    assert fe[0] == np.datetime64("1970-01-02T00:00:00", "us")
    e = pl.sql_expr("a + 1")
    assert df.select(e.alias("x")).to_dict()["x"] == [2.0, 3.0]


def test_lazyframe_api_surface():
    df = pl.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    lf = df.lazy()
    assert lf.sum().collect().to_dict()["a"] == [3.0]
    assert lf.null_count().collect().to_dict()["a"] == [0]
    assert lf.shift(1).collect().to_dict()["a"] == [None, 1.0]
    assert lf.reverse().collect().to_dict()["a"] == [2.0, 1.0]
    s = lf.filter(pl.col("a") > 1).serialize()
    back = pl.LazyFrame.deserialize(s)
    assert back.collect().to_dict()["a"] == [2.0]


# --- Series delegation + DataFrame/LazyFrame parity batch -----------------

def test_series_delegation_scalars():
    import polaroid_tpu as pl
    b = pl.Series("b", [1, 2, 3, 4, 5])
    assert b.skew() == 0.0
    assert b.product() == 120
    assert pl.Series("t", [True, False]).any() is True
    assert pl.Series("t", [True, True]).all() is True
    assert b.rolling_mean(2).to_list() == [None, 1.5, 2.5, 3.5, 4.5]
    assert b.is_between(2, 4).to_list() == [False, True, True, True, False]
    assert b.is_in([2, 4]).to_list() == [False, True, False, True, False]
    assert b.top_k(2).to_list() == [5, 4]
    assert b.diff().to_list() == [None, 1, 1, 1, 1]
    assert b.eq(pl.Series("c", [1, 0, 3, 0, 5])).to_list() == \
        [True, False, True, False, True]


def test_series_utility_methods():
    import numpy as np
    import polaroid_tpu as pl
    s = pl.Series("x", [3.0, 1.0, None])
    assert s.clear(2).to_list() == [None, None]
    assert s.clone().to_list() == s.to_list()
    assert s.has_validity() is True
    assert s.flags == {"SORTED_ASC": False, "SORTED_DESC": False}
    assert np.asarray(pl.Series("b", [1, 2]).to_jax()).tolist() == [1, 2]
    assert pl.Series("b", [1, 2]).to_torch().shape[0] == 2
    assert pl.Series("b", [1, 2, 3, 4]).reshape((-1, 2)).to_list() == \
        [[1, 2], [3, 4]]
    assert "pl.Series" in s.to_init_repr()
    assert s.extend(pl.Series("y", [9.0])).to_list() == [3.0, 1.0, None, 9.0]


def test_frame_parity_batch():
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0],
                       "s": ["a", "b", "a"]})
    assert df.get_column_index("v") == 1
    assert [s.name for s in df.iter_columns()] == ["k", "v", "s"]
    assert [d.height for d in df.iter_slices(2)] == [2, 1]
    assert df.remove(pl.col("k") == 2).to_dict()["k"] == [1, 3]
    assert df.rows_by_key("s")["a"] == [(1, 10.0), (3, 30.0)]
    assert df.to_dicts()[0] == {"k": 1, "v": 10.0, "s": "a"}
    dm = df.to_dummies("s")
    assert dm.to_dict()["s_a"] == [1, 0, 1]
    assert df.to_struct("r").to_list()[0] == {"k": 1, "v": 10.0, "s": "a"}
    m = df.match_to_schema({"k": pl.Int64, "v": pl.Float64, "s": pl.String,
                            "z": pl.Int32}, missing_columns="insert")
    assert m.to_dict()["z"] == [None, None, None]
    other = pl.DataFrame({"k": [2, 3], "v": [99.0, None]})
    assert df.update(other, on="k").to_dict()["v"] == [10.0, 99.0, 30.0]
    assert df.sql("SELECT k FROM self WHERE k > 1").to_dict()["k"] == [2, 3]
    assert pl.DataFrame.deserialize(df.serialize()).to_dict() == df.to_dict()
    assert len(df.hash_rows().to_list()) == 3
    d2 = df.clone()
    s = d2.drop_in_place("s")
    assert s.to_list() == ["a", "b", "a"] and d2.columns == ["k", "v"]


def test_frame_write_delta_roundtrip(tmp_path):
    import polaroid_tpu as pl
    from polaroid_tpu.lakehouse import LakeStore
    df = pl.DataFrame({"k": [1, 2]})
    df.write_delta(str(tmp_path), mode="overwrite")
    assert LakeStore(str(tmp_path)).read("data").to_dict()["k"] == [1, 2]
    df.write_delta(str(tmp_path), mode="append")
    assert LakeStore(str(tmp_path)).read("data").height == 4


def test_lazyframe_parity_batch():
    import polaroid_tpu as pl
    lf = pl.DataFrame({"k": [1, 2, 3], "v": [10.0, None, 30.0]}).lazy()
    assert lf.bottom_k(2, "k").collect().to_dict()["k"] == [1, 2]
    assert lf.clear().collect().shape == (0, 2)
    assert lf.clone().collect().height == 3
    assert lf.collect_async().result().height == 3
    assert [d.height for d in lf.collect_batches(batch_size=2)] == [2, 1]
    acc = []
    lf.sink_batches(lambda b: acc.append(b.height) and False, batch_size=2)
    assert acc == [2, 1]
    assert lf.drop_nans().collect().height == 3  # nulls stay, nans drop
    nanf = pl.DataFrame({"v": [1.0, float("nan"), 3.0]}).lazy()
    assert nanf.drop_nans().collect().height == 2
    assert lf.remove(pl.col("k") == 2).collect().to_dict()["k"] == [1, 3]
    assert lf.with_row_count().collect().columns[0] == "row_nr"
    assert lf.sql("SELECT k FROM self WHERE k >= 2") \
        .collect().to_dict()["k"] == [2, 3]
    other = pl.DataFrame({"k": [2], "v": [99.0]}).lazy()
    assert lf.update(other, on="k").collect().to_dict()["v"] == \
        [10.0, 99.0, 30.0]
    ctx = pl.DataFrame({"extra": [7, 8, 9]}).lazy()
    assert lf.with_context(ctx).collect().columns == ["k", "v", "extra"]


def test_free_functions_batch():
    import datetime as dtm
    import numpy as np
    import pandas as pd
    import polaroid_tpu as pl
    df = pl.DataFrame({"a": [3.0, 1.0, 2.0], "b": [1, 2, 3]})
    assert df.select(pl.arg_where(pl.col("b") > 1).alias("v")) \
        .to_dict()["v"] == [1, 2]
    assert df.select(pl.arg_sort_by("a").alias("v")).to_dict()["v"] == \
        [1, 2, 0]
    assert df.select(pl.row_index().alias("v")).to_dict()["v"] == [0, 1, 2]
    assert df.select(pl.median("a").alias("v")).item() == 2.0
    assert df.select(pl.first("a").alias("v")).item() == 3.0
    assert pl.escape_regex("a.b") == "a\\.b"
    lf1, lf2 = df.lazy(), df.lazy().select(pl.col("a") * 2)
    assert [d.height for d in pl.collect_all([lf1, lf2])] == [3, 3]
    assert [d.height for d in pl.collect_all_async([lf1, lf2]).result()] \
        == [3, 3]
    d1 = pl.DataFrame({"k": [1, 2], "x": [10, 20]})
    d2 = pl.DataFrame({"k": [2, 3], "y": [5, 6]})
    a1, a2 = pl.align_frames(d1, d2, on="k")
    assert a1.to_dict()["k"] == [1, 2, 3] and a2.to_dict()["y"] == \
        [None, 5, 6]
    dd = pl.DataFrame({"s": [dtm.date(2024, 8, 12)],
                       "e": [dtm.date(2024, 8, 19)]})
    assert dd.select(pl.business_day_count("s", "e").alias("v")).item() == 5
    t = pl.DataFrame({"x": [1.0, 2.0, 4.0, 3.0, 5.0],
                      "y": [2.0, 4.0, 7.0, 7.0, 9.0]})
    got = t.select(pl.rolling_cov("x", "y", window_size=3).alias("v")) \
        .to_dict()["v"]
    ref = pd.Series([1, 2, 4, 3, 5.]).rolling(3).cov(
        pd.Series([2, 4, 7, 7, 9.])).tolist()
    assert got[2:] == pytest.approx(ref[2:]) and got[:2] == [None, None]
    got = t.select(pl.rolling_corr("x", "y", window_size=3).alias("v")) \
        .to_dict()["v"]
    ref = pd.Series([1, 2, 4, 3, 5.]).rolling(3).corr(
        pd.Series([2, 4, 7, 7, 9.])).tolist()
    assert got[2:] == pytest.approx(ref[2:])
    sf = pl.DataFrame({"a": [1, 2], "b": [3, 4]}).select(
        pl.struct("a", "b").alias("s"))
    out = sf.select(pl.col("s").struct.with_fields(
        c=pl.field("a") + pl.field("b")).struct.field("c").alias("v"))
    assert out.to_dict()["v"] == [4, 6]
    assert df.select(pl.cum_reduce(lambda x, y: x + y,
                                   [pl.col("a"), pl.col("b")])
                     .alias("v")).to_dict()["v"][0] == {"a": 3.0, "b": 4.0}


def test_partition_sinks(tmp_path):
    import glob
    import polaroid_tpu as pl
    df = pl.DataFrame({"k": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    df.lazy().sink_parquet(pl.PartitionByKey(str(tmp_path / "bykey"),
                                             by="k"))
    assert sorted(p.split("/")[-1]
                  for p in glob.glob(str(tmp_path / "bykey" / "*"))) == \
        ["k=a", "k=b"]
    assert pl.scan_parquet(str(tmp_path / "bykey")).collect() \
        .sort("v").to_dict()["v"] == [1, 2, 3, 4]
    df.lazy().sink_parquet(pl.PartitionMaxSize(str(tmp_path / "bysize"),
                                               max_size=2))
    files = glob.glob(str(tmp_path / "bysize" / "*.parquet"))
    assert len(files) == 2
    assert sum(pl.read_parquet(f).height for f in files) == 4


def test_misc_top_level_surface():
    import polaroid_tpu as pl
    assert pl.Schema({"a": pl.Int64}).names() == ["a"]
    with pl.StringCache():
        assert pl.using_string_cache()
    assert pl.union([pl.DataFrame({"a": [1]}),
                     pl.DataFrame({"a": [2]})]).to_dict()["a"] == [1, 2]
    assert pl.from_dicts([{"a": 1}, {"a": 2, "b": "x"}]).to_dict() == \
        {"a": [1, 2], "b": [None, "x"]}
    assert pl.json_normalize([{"a": {"b": 1}, "c": 2}]).to_dict() == \
        {"a.b": [1], "c": [2]}
    d = pl.DataFrame({"a": [1, 2]})
    assert pl.from_repr(repr(d)).to_dict() == d.to_dict()
    assert pl.build_info()["engine"] == "polaroid-tpu"
    assert repr(pl.get_index_type()) == "UInt32"
    assert pl.thread_pool_size() >= 1
    assert pl.Array(pl.Int64, 4).size == 4
    assert pl.Enum(["a", "b"]).categories == ["a", "b"]


def test_monads():
    from polaroid_tpu.monads import Lazy, Option, Result
    r = Result.ok(2).map(lambda x: x + 1)
    assert r.is_ok() and r.unwrap() == 3
    e = Result.err("boom")
    assert e.is_err() and e.unwrap_or(9) == 9 and e.err_value() == "boom"
    assert Result.ok(2).map(lambda x: 1 / 0).is_err()
    assert Result.ok(2).and_then(lambda x: Result.ok(x * 2)).unwrap() == 4
    assert Result.ok(1).match_result(lambda v: "ok", lambda e2: "err") == \
        "ok"
    o = Option.some(5).filter(lambda x: x > 3).map(lambda x: x * 2)
    assert o.is_some() and o.unwrap() == 10
    assert Option.nothing().unwrap_or(7) == 7
    assert Option.some(1).match_option(lambda v: v, lambda: 0) == 1
    calls = []
    lz = Lazy(lambda: calls.append(1) or 42)
    assert not lz.is_evaluated()
    assert lz.force() == 42 and lz.force() == 42 and calls == [1]
    assert lz.map(lambda x: x + 1).force() == 43


def test_expr_rolling_agg_windows():
    import pandas as pd
    n = 120
    rng = np.random.default_rng(4)
    t = np.sort(rng.integers(0, 2000, n)).astype(
        "datetime64[s]").astype("datetime64[ns]")
    x = rng.normal(0, 5, n).round(2)
    df = pl.DataFrame({"t": [pd.Timestamp(v).to_pydatetime() for v in t],
                       "x": x.tolist()})
    out = df.select(
        pl.col("x").sum().rolling(index_column="t", period="5m").alias("s"),
        pl.len().rolling(index_column="t", period="5m").alias("n"),
        pl.col("x").max().rolling(index_column="t", period="5m").alias("mx"),
    ).to_dict()
    tv = t.astype(np.int64)
    p = int(pd.Timedelta("5m").value)
    for i in range(n):
        w = x[(tv > tv[i] - p) & (tv <= tv[i])]
        assert np.isclose(out["s"][i], w.sum())
        assert out["n"][i] == len(w)
        assert np.isclose(out["mx"][i], w.max())


def test_expr_reshape():
    df = pl.DataFrame({"foo": [1, 2, 3, 4, 5, 6, 7, 8, 9]})
    sq = df.select(pl.col("foo").reshape((3, 3))).to_dict()
    assert sq["foo"] == [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    assert df.select(pl.col("foo").reshape((-1, 3))).height == 3
    assert df.select(pl.col("foo").reshape((9,))).to_dict()["foo"] == \
        list(range(1, 10))
    with pytest.raises(Exception):
        df.select(pl.col("foo").reshape((2, 4)))
    s = pl.Series("s", [1.0, 2.0, 3.0, 4.0]).reshape((2, 2))
    assert s.to_list() == [[1.0, 2.0], [3.0, 4.0]]


def test_lazy_pivot_and_remote_and_pipe_with_schema():
    df = pl.DataFrame({"k": ["a", "a", "b"], "c": ["x", "y", "x"],
                       "v": [1, 2, 3]})
    lp = df.lazy().pivot("c", ["x", "y", "z"], index="k", values="v",
                         aggregate_function="sum")
    # schema is static (the lazy-pivot contract)
    assert list(lp.schema.keys()) == ["k", "x", "y", "z"]
    out = lp.collect().sort("k").to_dict()
    assert out["x"] == [1, 3] and out["y"] == [2, None] and \
        out["z"] == [None, None]
    # remote() without a context runs the distributed engine in-process
    lf = df.lazy().group_by("k").agg(pl.col("v").sum())
    got = lf.remote().collect().sort("k").to_dict()
    assert got == {"k": ["a", "b"], "v": [3, 3]}
    out2 = df.lazy().pipe_with_schema(
        lambda l, sch: l.select([pl.col(n) for n in sch if n != "k"]))
    assert out2.collect().columns == ["c", "v"]


def test_series_dir_exposes_expr_methods():
    s = pl.Series("a", [1, 2, 3])
    d = dir(s)
    for m in ("rolling_mean", "cum_sum", "sin", "is_in", "rank"):
        assert m in d


def test_defer_and_io_source_lazy():
    calls = []

    def make():
        calls.append(1)
        return pl.DataFrame({"a": [1.0, 2.0]})

    lf = pl.defer(make, schema={"a": pl.Float64})
    assert calls == []  # not executed at construction
    assert lf.collect().to_dict()["a"] == [1.0, 2.0]
    assert calls == [1]
    with pytest.raises(Exception):
        pl.defer(lambda: pl.DataFrame({"a": [1]}),
                 schema={"a": pl.Float64}).collect()


def test_datatype_expr():
    df = pl.DataFrame({"a": [1, 2, 3], "b": [1.5, 2.5, 3.5]})
    out = df.lazy().with_columns(pl.col("b").cast(pl.dtype_of("a"))).collect()
    assert repr(out.schema["b"]) == "Int64"
    out2 = df.select(pl.col("a").map_batches(lambda x: x * 2,
                                             return_dtype=pl.dtype_of("a")))
    assert out2.to_dict()["a"] == [2, 4, 6]
    dt = pl.struct_with_fields(
        {"x": pl.Int32, "y": pl.dtype_of("b")}).collect_dtype(dict(df.schema))
    assert "Struct" in repr(dt)


def test_map_groups_and_plugins():
    import polaroid_tpu.plugins as plug
    g = pl.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 3.0, 10.0]})
    out = g.group_by("k").agg(
        pl.map_groups(["v"], lambda s: s[0].sum() + 1,
                      returns_scalar=True).alias("m")).sort("k").to_dict()
    assert out["m"] == [5.0, 11.0]
    out2 = g.group_by("k").agg(
        pl.map_groups(["v"], lambda s: s[0] * 2).alias("m")
    ).sort("k").to_dict()
    assert out2["m"] == [[2.0, 6.0], [20.0]]
    plug.register_plugin_callable("dbl_test", lambda d: d * 2)
    e = plug.register_plugin_function(function_name="dbl_test", args=["v"],
                                      is_elementwise=True)
    assert g.select(e).to_dict()["v"] == [2.0, 6.0, 20.0]


def test_extension_types_and_partition_contexts():
    class MyExt(pl.BaseExtension):
        pass

    pl.register_extension_type("my_test_ext", MyExt)
    assert pl.get_extension_type("my_test_ext") is MyExt
    with pytest.raises(ValueError):
        pl.register_extension_type("my_test_ext", MyExt)
    pl.unregister_extension_type("my_test_ext")
    assert pl.get_extension_type("my_test_ext") is None
    kp = pl.KeyedPartition("k", "a", "a")
    assert kp.hive_name() == "k=a"
    ctx = pl.KeyedPartitionContext(0, 0, 0, [kp, pl.KeyedPartition(
        "j", "b", "b")], "f", "f")
    assert str(ctx.hive_dirs()) == "k=a/j=b"


def test_list_item_bin_slice_name_map():
    df = pl.DataFrame({"a": [[1], [2], [3]]})
    assert df.select(pl.col("a").list.item()).to_dict()["a"] == [1, 2, 3]
    with pytest.raises(Exception):
        pl.DataFrame({"a": [[1, 2]]}).select(pl.col("a").list.item())
    db = pl.DataFrame({"b": [b"hello", b"ab", b""]})
    out = db.select(pl.col("b").bin.head(2).alias("h"),
                    pl.col("b").bin.tail(2).alias("t"),
                    pl.col("b").bin.slice(1, 2).alias("s")).to_dict()
    assert out["h"] == [b"he", b"ab", b""]
    assert out["t"] == [b"lo", b"ab", b""]
    assert out["s"] == [b"el", b"b", b""]
    d3 = pl.DataFrame({"foo_x": [1]})
    assert d3.select(pl.col("foo_x").name.map(str.upper)).columns == ["FOO_X"]
    assert d3.select(
        pl.col("foo_x").name.replace("_x$", "_y")).columns == ["foo_y"]
    d4 = pl.DataFrame({"s": [{"a": 1, "b": 2}]})
    assert d4.select(
        pl.col("s").name.prefix_fields("p_")).unnest("s").columns == \
        ["p_a", "p_b"]
    assert d4.select(
        pl.col("s").name.map_fields(lambda n: n * 2)).unnest("s").columns == \
        ["aa", "bb"]


def test_ext_namespace_and_cast():
    # reference: py-polars/src/polars/expr/ext.py (to/storage),
    # series/ext.py
    MyExt = pl.Extension("point", pl.Float64)
    df = pl.DataFrame({"a": [1.0, 2.0, None]})
    wrapped = df.select(pl.col("a").ext.to(MyExt))
    assert wrapped.schema["a"] == MyExt
    back = df.select(pl.col("a").ext.to(MyExt).ext.storage())
    assert back.schema["a"] == pl.Float64
    assert back.to_dict()["a"] == [1.0, 2.0, None]
    # cast to/from extension dtypes rebrands the same storage
    assert df.select(pl.col("a").cast(MyExt)).schema["a"] == MyExt
    # storage() on non-extension input passes through
    assert df.select(pl.col("a").ext.storage()).schema["a"] == pl.Float64
    # mismatched storage raises
    with pytest.raises(Exception):
        pl.DataFrame({"a": ["x"]}).select(pl.col("a").ext.to(MyExt))
    # Series namespace
    s = pl.Series("a", [1.0, 2.0])
    s2 = s.ext.to(MyExt)
    assert s2.dtype == MyExt
    assert s2.ext.storage().dtype == pl.Float64


def test_register_plugin_deprecated_and_select_context():
    import warnings
    from polaroid_tpu import plugins

    plugins.register_plugin_callable(
        "pt_test_dbl",
        lambda s: pl.Series("x", [None if v is None else v * 2
                                  for v in s.to_list()]))
    df = pl.DataFrame({"a": [1.0, 2.0, None]})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        e = pl.col("a").register_plugin(lib="dummy.so", symbol="pt_test_dbl")
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert df.select(e.alias("a")).to_dict()["a"] == [2.0, 4.0, None]
    # register_plugin_function evaluates in plain select context too
    e2 = plugins.register_plugin_function(
        function_name="pt_test_dbl", args=[pl.col("a")])
    assert df.select(e2.alias("a")).to_dict()["a"] == [2.0, 4.0, None]


def test_dataframe_interchange_and_capsule():
    df = pl.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    dfi = df.__dataframe__()
    assert list(dfi.column_names()) == ["a", "b"]
    assert dfi.num_rows() == 2
    import pandas as pd
    if hasattr(pd.api, "interchange"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            pdf = pd.api.interchange.from_dataframe(df.__dataframe__())
        assert list(pdf["a"]) == [1, 2]
    # Arrow PyCapsule protocol
    import pyarrow as pa
    tbl = pa.table(df)  # consumes __arrow_c_stream__
    assert tbl.column_names == ["a", "b"]
    arr = pa.chunked_array(pl.Series("s", [1, 2, 3]))
    assert arr.to_pylist() == [1, 2, 3]
    # single-chunk Series introspection
    s = pl.Series("s", [1, 2, 3])
    assert len(s.get_chunks()) == 1
    assert s.get_chunks()[0].to_list() == [1, 2, 3]
