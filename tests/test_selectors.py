"""Column selectors (reference: py-polars/src/polars/selectors.py)."""

import datetime as dtm

import polaroid_tpu as pl
import polaroid_tpu.selectors as cs


def frame():
    return pl.DataFrame({"abc": [1, 2], "xyz": [1.5, 2.5],
                         "flag": [True, False], "name": ["a", "b"],
                         "d": [dtm.date(2024, 1, 1)] * 2})


def test_dtype_selectors():
    df = frame()
    assert df.select(cs.numeric()).columns == ["abc", "xyz"]
    assert df.select(cs.float()).columns == ["xyz"]
    assert df.select(cs.integer()).columns == ["abc"]
    assert df.select(cs.string()).columns == ["name"]
    assert df.select(cs.boolean()).columns == ["flag"]
    assert df.select(cs.temporal()).columns == ["d"]
    assert df.select(cs.date()).columns == ["d"]
    assert df.select(cs.by_dtype(pl.Int64)).columns == ["abc"]


def test_name_selectors():
    df = frame()
    assert df.select(cs.starts_with("a", "x")).columns == ["abc", "xyz"]
    assert df.select(cs.ends_with("g")).columns == ["flag"]
    assert df.select(cs.contains("y")).columns == ["xyz"]
    assert df.select(cs.matches("^[an]")).columns == ["abc", "name"]
    assert df.select(cs.by_name("abc", "name")).columns == ["abc", "name"]
    assert df.select(cs.by_index(0, -1)).columns == ["abc", "d"]
    assert df.select(cs.first()).columns == ["abc"]
    assert df.select(cs.last()).columns == ["d"]
    assert df.select(cs.alpha()).columns == ["abc", "xyz", "flag", "name",
                                             "d"]


def test_set_algebra():
    df = frame()
    assert df.select(cs.numeric() | cs.boolean()).columns == \
        ["abc", "xyz", "flag"]
    assert df.select(cs.numeric() & cs.by_name("abc")).columns == ["abc"]
    assert df.select(cs.numeric() - cs.by_name("abc")).columns == ["xyz"]
    assert df.select(~cs.numeric()).columns == ["flag", "name", "d"]
    assert df.select(cs.exclude("abc", "d")).columns == \
        ["xyz", "flag", "name"]


def test_selector_as_expr():
    df = frame()
    assert df.select(cs.numeric().sum()).to_dict() == \
        {"abc": [3], "xyz": [4.0]}
    assert df.lazy().select(cs.float() * 2).collect().to_dict() == \
        {"xyz": [3.0, 5.0]}
    assert df.group_by("name").agg(cs.numeric().sum()).sort("name") \
        .to_dict()["abc"] == [1, 2]


def test_expand_selector():
    df = frame()
    assert cs.expand_selector(df, cs.numeric()) == ("abc", "xyz")
    assert cs.expand_selector(dict(df.schema), cs.string()) == ("name",)
