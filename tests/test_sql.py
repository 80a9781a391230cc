"""SQL frontend tests (parity target: py-polars/tests/unit/sql/)."""

import numpy as np
import pytest

import polaroid_tpu as pl


@pytest.fixture
def ctx():
    sales = pl.DataFrame({
        "region": ["eu", "us", "eu", "us", "apac", "eu"],
        "amount": [100.0, 200.0, 150.0, 50.0, 300.0, None],
        "qty": [1, 2, 3, 4, 5, 6],
        "product": ["widget", "gadget", "widget", "widget", "gizmo", "gadget"],
    })
    regions = pl.DataFrame({
        "region": ["eu", "us", "apac"],
        "name": ["Europe", "United States", "Asia Pacific"],
    })
    return pl.SQLContext(sales=sales, regions=regions)


def test_select_where(ctx):
    out = ctx.execute(
        "SELECT product, amount FROM sales WHERE amount > 100", eager=True)
    assert out.to_dict() == {"product": ["gadget", "widget", "gizmo"],
                             "amount": [200.0, 150.0, 300.0]}


def test_select_star_limit(ctx):
    out = ctx.execute("SELECT * FROM sales LIMIT 2", eager=True)
    assert out.height == 2 and out.width == 4


def test_arithmetic_alias(ctx):
    out = ctx.execute(
        "SELECT qty * 2 AS dq, amount / 2 half FROM sales LIMIT 1",
        eager=True)
    assert out.to_dict() == {"dq": [2], "half": [50.0]}


def test_group_by_agg(ctx):
    out = ctx.execute("""
        SELECT region, COUNT(*) AS n, SUM(amount) AS total,
               AVG(amount) AS avg_amt
        FROM sales GROUP BY region ORDER BY region
    """, eager=True)
    assert out.to_dict()["region"] == ["apac", "eu", "us"]
    assert out.to_dict()["n"] == [1, 3, 2]
    assert out.to_dict()["total"] == [300.0, 250.0, 250.0]


def test_group_by_having(ctx):
    out = ctx.execute("""
        SELECT region, SUM(qty) AS tq FROM sales
        GROUP BY region HAVING SUM(qty) > 5 ORDER BY tq DESC
    """, eager=True)
    assert out.to_dict() == {"region": ["eu", "us"], "tq": [10, 6]}


def test_join(ctx):
    out = ctx.execute("""
        SELECT s.product, r.name, s.amount
        FROM sales s JOIN regions r ON s.region = r.region
        WHERE s.amount >= 200 ORDER BY s.amount
    """, eager=True)
    assert out.to_dict() == {
        "product": ["gadget", "gizmo"],
        "name": ["United States", "Asia Pacific"],
        "amount": [200.0, 300.0]}


def test_left_join_using(ctx):
    out = ctx.execute("""
        SELECT region, name FROM regions LEFT JOIN sales USING (region)
        WHERE qty = 5
    """, eager=True)
    assert out.to_dict() == {"region": ["apac"], "name": ["Asia Pacific"]}


def test_case_when(ctx):
    out = ctx.execute("""
        SELECT product,
               CASE WHEN amount >= 200 THEN 'big'
                    WHEN amount >= 100 THEN 'mid'
                    ELSE 'small' END AS size
        FROM sales WHERE amount IS NOT NULL ORDER BY amount
    """, eager=True)
    assert out.to_dict()["size"] == ["small", "mid", "mid", "big", "big"]


def test_in_between_like(ctx):
    out = ctx.execute(
        "SELECT qty FROM sales WHERE region IN ('eu','apac') AND qty BETWEEN 2 AND 6 ORDER BY qty",
        eager=True)
    assert out.to_dict() == {"qty": [3, 5, 6]}
    out2 = ctx.execute(
        "SELECT DISTINCT product FROM sales WHERE product LIKE 'g%' ORDER BY product",
        eager=True)
    assert out2.to_dict() == {"product": ["gadget", "gizmo"]}


def test_order_nulls_last(ctx):
    out = ctx.execute(
        "SELECT amount FROM sales ORDER BY amount DESC NULLS LAST LIMIT 3",
        eager=True)
    assert out.to_dict() == {"amount": [300.0, 200.0, 150.0]}


def test_distinct_union(ctx):
    out = ctx.execute("""
        SELECT region FROM sales WHERE qty > 4
        UNION SELECT region FROM sales WHERE qty < 2
    """, eager=True).sort("region")
    assert out.to_dict() == {"region": ["apac", "eu"]}
    out2 = ctx.execute("""
        SELECT region FROM sales WHERE qty = 1
        UNION ALL SELECT region FROM sales WHERE qty = 1
    """, eager=True)
    assert out2.height == 2


def test_subquery_cte(ctx):
    out = ctx.execute("""
        WITH big AS (SELECT * FROM sales WHERE amount > 100)
        SELECT region, COUNT(*) AS n FROM big GROUP BY region ORDER BY region
    """, eager=True)
    assert out.to_dict() == {"region": ["apac", "eu", "us"], "n": [1, 1, 1]}
    out2 = ctx.execute("""
        SELECT * FROM (SELECT qty FROM sales WHERE qty <= 2) t ORDER BY qty
    """, eager=True)
    assert out2.to_dict() == {"qty": [1, 2]}


def test_scalar_functions(ctx):
    out = ctx.execute("""
        SELECT UPPER(product) AS up, LENGTH(product) AS ln,
               ROUND(amount / 7, 1) AS r
        FROM sales WHERE qty = 1
    """, eager=True)
    assert out.to_dict() == {"up": ["WIDGET"], "ln": [6], "r": [14.3]}


def test_count_distinct(ctx):
    out = ctx.execute(
        "SELECT COUNT(DISTINCT region) AS nr FROM sales", eager=True)
    assert out.to_dict() == {"nr": [3]}


def test_cast_and_coalesce(ctx):
    out = ctx.execute("""
        SELECT CAST(qty AS DOUBLE) AS q, COALESCE(amount, 0.0) AS amt
        FROM sales WHERE qty >= 5 ORDER BY qty
    """, eager=True)
    assert out.to_dict() == {"q": [5.0, 6.0], "amt": [300.0, 0.0]}
    out2 = ctx.execute("SELECT qty::float8 AS q FROM sales LIMIT 1", eager=True)
    assert out2.to_dict() == {"q": [1.0]}


def test_show_tables(ctx):
    out = ctx.execute("SHOW TABLES", eager=True)
    assert out.to_dict() == {"name": ["regions", "sales"]}


def test_select_no_from():
    ctx = pl.SQLContext()
    out = ctx.execute("SELECT 1 + 2 AS x, 'hi' AS s", eager=True)
    assert out.to_dict() == {"x": [3], "s": ["hi"]}


def test_read_parquet_table_fn(tmp_path):
    pl.DataFrame({"a": [1, 2, 3]}).write_parquet(tmp_path / "f.parquet")
    ctx = pl.SQLContext()
    out = ctx.execute(
        f"SELECT SUM(a) AS s FROM read_parquet('{tmp_path}/f.parquet')",
        eager=True)
    assert out.to_dict() == {"s": [6]}


def test_group_by_ordinal_and_expr(ctx):
    out = ctx.execute("""
        SELECT region, MAX(amount) - MIN(amount) AS rng
        FROM sales WHERE amount IS NOT NULL GROUP BY 1 ORDER BY 1
    """, eager=True)
    assert out.to_dict()["region"] == ["apac", "eu", "us"]
    assert out.to_dict()["rng"] == [0.0, 50.0, 150.0]


def test_anti_semi_join(ctx):
    out = ctx.execute("""
        SELECT region FROM regions ANTI JOIN sales ON regions.region = sales.region
    """, eager=True)
    assert out.height == 0
    out2 = ctx.execute("""
        SELECT r.region FROM regions r SEMI JOIN sales s ON r.region = s.region
        ORDER BY region
    """, eager=True)
    assert out2.to_dict() == {"region": ["apac", "eu", "us"]}


def test_lazy_execution(ctx):
    lf = ctx.execute("SELECT region FROM sales LIMIT 2")
    assert isinstance(lf, pl.LazyFrame)
    assert lf.collect().height == 2


def test_sql_window_functions():
    df = pl.DataFrame({"g": ["a", "a", "b", "b", "b"], "v": [3, 1, 5, 2, 4]})
    ctx = pl.SQLContext(t=df)
    out = ctx.execute(
        "SELECT g, v, SUM(v) OVER (PARTITION BY g) AS total, "
        "ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn, "
        "RANK() OVER (PARTITION BY g ORDER BY v DESC) AS rk, "
        "LAG(v) OVER (PARTITION BY g) AS prev "
        "FROM t ORDER BY g, v")
    d = out.collect().to_dict() if hasattr(out, "collect") else out.to_dict()
    assert d["total"] == [4, 4, 11, 11, 11]
    assert d["rn"] == [1, 2, 1, 2, 3]
    assert d["rk"] == [2, 1, 3, 2, 1]
    # LAG without ORDER BY in the window is order-unspecified in SQL; the
    # engine evaluates windows over the (sorted) frame deterministically
    assert d["prev"] == [None, 1, None, 2, 4]


def test_sql_global_window():
    df = pl.DataFrame({"v": [1, 2, 3]})
    ctx = pl.SQLContext(t=df)
    out = ctx.execute("SELECT v, SUM(v) OVER () AS s FROM t")
    d = out.collect().to_dict() if hasattr(out, "collect") else out.to_dict()
    assert d["s"] == [6, 6, 6]


def test_sql_function_batch():
    import polaroid_tpu as pl
    ctx = pl.SQLContext()
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 4.0, 9.0],
                       "i": [3, 6, 4], "s": ["foo-bar", "baz-qux", "x-y"],
                       "d": ["2024-02-15", "2024-03-01", "2024-01-05"]})
    ctx.register("t", df.lazy())
    q = lambda s: ctx.execute(s).collect().to_dict()  # noqa: E731
    assert q("SELECT mod(i, 2) AS m, div(i, 2) AS d FROM t") == \
        {"m": [1, 0, 0], "d": [1, 3, 2]}
    assert q("SELECT k, bit_and(i) AS ba, bit_or(i) AS bo FROM t "
             "GROUP BY k ORDER BY k") == \
        {"k": ["a", "b"], "ba": [2, 4], "bo": [7, 4]}
    assert q("SELECT bit_count(i) AS bc FROM t")["bc"] == [2, 2, 1]
    assert q("SELECT left(s, 3) AS l, right(s, 3) AS r, "
             "strpos(s, 'bar') AS p FROM t") == \
        {"l": ["foo", "baz", "x-y"], "r": ["bar", "qux", "x-y"],
         "p": [5, 0, 0]}
    assert q("SELECT split_part(s, '-', 1) AS p FROM t")["p"] == \
        ["foo", "baz", "x"]
    assert q("SELECT regexp_like(s, '^f') AS r FROM t")["r"] == \
        [True, False, False]
    assert q("SELECT concat_ws('_', k, s) AS c FROM t")["c"][0] == \
        "a_foo-bar"
    assert q("SELECT k || s AS c FROM t")["c"][0] == "afoo-bar"
    out = q("SELECT k, array_agg(v) AS aa, quantile_cont(v, 0.5) AS qc "
            "FROM t GROUP BY k ORDER BY k")
    assert out["aa"] == [[1.0, 4.0], [9.0]] and out["qc"] == [2.5, 9.0]
    assert q("SELECT if(v > 2, 'big', 'small') AS f FROM t")["f"] == \
        ["small", "big", "big"]
    assert q("SELECT ifnull(nullif(v, 1.0), -1) AS n FROM t")["n"] == \
        [-1.0, 4.0, 9.0]
    assert q("SELECT strftime(to_date(d), '%Y/%m') AS f FROM t")["f"] == \
        ["2024/02", "2024/03", "2024/01"]
    assert q("SELECT array_to_string(string_to_array(s, '-'), '+') AS a "
             "FROM t")["a"] == ["foo+bar", "baz+qux", "x+y"]
    assert q("SELECT cbrt(v) AS c FROM t")["c"][0] == 1.0
    assert q("SELECT first_value(v) OVER (PARTITION BY k) AS f FROM t") \
        ["f"] == [1.0, 1.0, 9.0]


def test_sql_window_order_by():
    df = pl.DataFrame({"g": ["a", "b", "a", "b"], "t": [2, 1, 1, 2],
                       "x": [1., 2., 3., 4.]})
    ctx = pl.SQLContext(frames={"df": df})
    out = ctx.execute(
        "SELECT g, LAG(x, 1) OVER (PARTITION BY g ORDER BY t) AS lx, "
        "LEAD(x, 1) OVER (PARTITION BY g ORDER BY t) AS ld, "
        "FIRST_VALUE(x) OVER (PARTITION BY g ORDER BY t DESC) AS fv "
        "FROM df").collect().to_dict()
    assert out["lx"] == [3.0, None, None, 2.0]
    assert out["ld"] == [None, 4.0, 1.0, None]
    assert out["fv"] == [1.0, 4.0, 1.0, 4.0]
