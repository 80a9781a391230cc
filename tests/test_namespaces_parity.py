"""str/dt/list/struct/cat namespace parity batch (reference:
py-polars/src/polars/expr/{string,datetime,list,struct,categorical}.py)."""

import datetime as dtm

import pytest

import polaroid_tpu as pl


def sel(df, e):
    return df.select(e.alias("v")).to_dict()["v"]


@pytest.fixture()
def sdf():
    return pl.DataFrame({"s": ["foo-bar", "a-b-c", "xyz", None]})


def test_str_strip_fixes(sdf):
    assert sel(sdf, pl.col("s").str.strip_prefix("foo")) == \
        ["-bar", "a-b-c", "xyz", None]
    assert sel(sdf, pl.col("s").str.strip_suffix("c")) == \
        ["foo-bar", "a-b-", "xyz", None]


def test_str_replace_find(sdf):
    assert sel(sdf, pl.col("s").str.replace_many({"-": "_", "x": "X"})) == \
        ["foo_bar", "a_b_c", "Xyz", None]
    assert sel(sdf, pl.col("s").str.contains_any(["bar", "xy"])) == \
        [True, False, True, None]
    assert sel(sdf, pl.col("s").str.find("b", literal=True)) == \
        [4, 2, None, None]
    assert sel(pl.DataFrame({"s": ["abcab"]}),
               pl.col("s").str.find_many(["ab", "c"])) == [[0, 2, 3]]


def test_str_extract_split(sdf):
    assert sel(sdf, pl.col("s").str.extract_all(r"[a-z]+")) == \
        [["foo", "bar"], ["a", "b", "c"], ["xyz"], None]
    assert sel(sdf, pl.col("s").str.split_exact("-", 1)) == \
        [{"field_0": "foo", "field_1": "bar"},
         {"field_0": "a", "field_1": "b"},
         {"field_0": "xyz", "field_1": None}, None]
    assert sel(sdf, pl.col("s").str.splitn("-", 2)) == \
        [{"field_0": "foo", "field_1": "bar"},
         {"field_0": "a", "field_1": "b-c"},
         {"field_0": "xyz", "field_1": None}, None]
    got = sel(pl.DataFrame({"s": ["k=1", "nope"]}),
              pl.col("s").str.extract_groups(r"(\w+)=(\d+)"))
    assert got == [{"1": "k", "2": "1"}, {"1": None, "2": None}]


def test_str_concat_encode(sdf):
    assert sdf.select(pl.col("s").str.concat("|").alias("v")).item() == \
        "foo-bar|a-b-c|xyz"
    assert pl.DataFrame({"s": ["hi"]}).select(
        pl.col("s").str.encode("hex").alias("v")).item() == "6869"
    assert pl.DataFrame({"s": ["6869"]}).select(
        pl.col("s").str.decode("hex").alias("v")).item() == "hi"
    assert pl.DataFrame({"s": ['{"a":{"b":[1,2]}}']}).select(
        pl.col("s").str.json_path_match("$.a.b[1]").alias("v")).item() == "2"
    assert pl.DataFrame({"s": ["a.b"]}).select(
        pl.col("s").str.escape_regex().alias("v")).item() == "a\\.b"


def test_str_to_time_chars():
    got = pl.DataFrame({"s": ["12:34:56"]}).select(
        pl.col("s").str.to_time().alias("v")).to_dict()["v"]
    assert got == [dtm.time(12, 34, 56)] or got == [45296000000000]
    assert sel(pl.DataFrame({"s": ["ab"]}), pl.col("s").str.explode()) == \
        ["a", "b"]


def test_dt_parts():
    d = pl.DataFrame({"ts": ["2024-02-15 10:30:45"]}).with_columns(
        pl.col("ts").str.to_datetime(format="%Y-%m-%d %H:%M:%S"))
    assert sel(d, pl.col("ts").dt.century()) == [21]
    assert sel(d, pl.col("ts").dt.millennium()) == [3]
    assert sel(d, pl.col("ts").dt.days_in_month()) == [29]
    assert sel(d, pl.col("ts").dt.is_business_day()) == [True]
    # Thu Feb 15 + 3 business days = Tue Feb 20
    assert sel(d, pl.col("ts").dt.add_business_days(3).dt.day()) == [20]
    assert sel(d, pl.col("ts").dt.replace(year=2000).dt.year()) == [2000]
    assert sel(d, pl.col("ts").dt.replace(hour=5).dt.hour()) == [5]
    assert d.select(pl.col("ts").dt.with_time_unit("ms").alias("v")) \
        .schema["v"] == pl.Datetime("ms")


def test_dt_duration_and_combine():
    dur = pl.DataFrame({"a": [dtm.datetime(2024, 1, 2)],
                        "b": [dtm.datetime(2024, 1, 1)]})
    assert sel(dur, (pl.col("a") - pl.col("b")).dt.total_nanoseconds()) == \
        [86400 * 10**9]
    dd = pl.DataFrame({"d": [dtm.date(2024, 3, 1)], "t": ["01:02:03"]}) \
        .with_columns(pl.col("t").str.to_time())
    assert sel(dd, pl.col("d").dt.combine(pl.col("t"))) == \
        [dtm.datetime(2024, 3, 1, 1, 2, 3)]


@pytest.fixture()
def ldf():
    return pl.DataFrame({"l": [[3, 1, 2], [5, 5, None], [7], []],
                         "r": [[1, 9], [5], [], [2]]})


def test_list_reductions(ldf):
    assert sel(ldf, pl.col("l").list.median()) == [2.0, 5.0, 7.0, None]
    assert sel(ldf, pl.col("l").list.std()) == [1.0, 0.0, None, None]
    assert sel(ldf, pl.col("l").list.n_unique()) == [3, 2, 1, 0]
    assert sel(ldf, pl.col("l").list.count_matches(5)) == [0, 2, 0, 0]


def test_list_positional(ldf):
    assert sel(ldf, pl.col("l").list.diff()) == \
        [[None, -2, 1], [None, 0, None], [None], []]
    assert sel(ldf, pl.col("l").list.diff(null_behavior="drop")) == \
        [[-2, 1], [0, None], [], []]
    assert sel(ldf, pl.col("l").list.shift()) == \
        [[None, 3, 1], [None, 5, 5], [None], []]
    assert sel(ldf, pl.col("l").list.drop_nulls()) == \
        [[3, 1, 2], [5, 5], [7], []]
    assert sel(ldf, pl.col("l").list.gather([0, 1], null_on_oob=True)) == \
        [[3, 1], [5, 5], [7, None], [None, None]]
    assert sel(ldf, pl.col("l").list.gather_every(2)) == \
        [[3, 2], [5, None], [7], []]


def test_list_sets(ldf):
    assert sel(ldf, pl.col("l").list.set_union(pl.col("r"))) == \
        [[1, 2, 3, 9], [5], [7], [2]]
    assert sel(ldf, pl.col("l").list.set_intersection(pl.col("r"))) == \
        [[1], [5], [], []]
    assert sel(ldf, pl.col("l").list.set_difference(pl.col("r"))) == \
        [[2, 3], [], [7], []]
    assert sel(ldf, pl.col("l").list.set_symmetric_difference(
        pl.col("r"))) == [[2, 3, 9], [], [7], [2]]
    ss = pl.DataFrame({"l": [["a", "b"], ["b"]], "r": [["b", "c"], ["z"]]})
    assert sel(ss, pl.col("l").list.set_union(pl.col("r"))) == \
        [["a", "b", "c"], ["b", "z"]]


def test_list_filter_struct(ldf):
    assert sel(ldf, pl.col("l").list.filter(pl.element() > 1)) == \
        [[3, 2], [5, 5], [7], []]
    got = sel(ldf, pl.col("l").list.to_struct())
    assert got[0] == {"field_0": 3, "field_1": 1, "field_2": 2}
    assert sel(ldf, pl.col("l").list.concat(pl.col("r")))[0] == \
        [3, 1, 2, 1, 9]


def test_struct_namespace():
    sf = pl.DataFrame({"a": [1, 2], "b": ["x", "y"]}).select(
        pl.struct("a", "b").alias("s"))
    assert sel(sf, pl.col("s").struct.with_fields(c=pl.lit(9))
               .struct.field("c")) == [9, 9]
    assert sel(sf, pl.col("s").struct.json_encode()) == \
        ['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}']
    assert sf.select(pl.col("s").struct.unnest()).to_dict() == \
        {"a": [1, 2], "b": ["x", "y"]}


def test_cat_string_ops():
    c = pl.DataFrame({"c": ["apple", "banana"]}).select(
        pl.col("c").cast(pl.Categorical))
    assert sel(c, pl.col("c").cat.starts_with("app")) == [True, False]
    assert sel(c, pl.col("c").cat.len_chars()) == [5, 6]
    assert sel(c, pl.col("c").cat.slice(0, 3)) == ["app", "ban"]
