"""gRPC server + client + HTTP /exec (reference: polarway-grpc tests)."""

import json
import urllib.request

import numpy as np
import pytest

import polaroid_tpu as pl


@pytest.fixture(scope="module")
def server_and_port(tmp_path_factory):
    from polaroid_tpu.server.service import make_server
    server = make_server()
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    yield server, port
    server.stop(0)


@pytest.fixture(scope="module")
def pq(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "t.parquet"
    rng = np.random.default_rng(3)
    pl.DataFrame({
        "k": rng.integers(0, 5, 500),
        "v": rng.uniform(0, 10, 500),
        "s": rng.choice(["a", "b", "c"], 500).tolist(),
    }).write_parquet(p)
    return str(p)


@pytest.fixture
def client(server_and_port):
    from polaroid_tpu.client import connect
    _, port = server_and_port
    c = connect(f"127.0.0.1:{port}")
    yield c
    c.close()


def test_heartbeat(client):
    hb = client.heartbeat()
    assert hb["ok"]


def test_read_filter_collect(client, pq):
    rf = client.read_parquet(pq)
    assert set(rf.columns) == {"k", "v", "s"}
    out = rf.filter(pl.col("v") > 5.0).collect()
    local = pl.read_parquet(pq).filter(pl.col("v") > 5.0)
    assert out.height == local.height
    assert out.sort(["k", "v"]).to_dict() == local.sort(["k", "v"]).to_dict()


def test_remote_groupby_join_sort(client, pq):
    rf = client.read_parquet(pq)
    agg = rf.group_by("k").agg(pl.col("v").sum().alias("sv"),
                               pl.len().alias("n")).sort("k")
    out = agg.collect()
    ref = (pl.read_parquet(pq).group_by("k")
           .agg(pl.col("v").sum().alias("sv"), pl.len().alias("n")).sort("k"))
    assert out.to_dict()["k"] == ref.to_dict()["k"]
    assert np.allclose(out.to_dict()["sv"], ref.to_dict()["sv"])

    dim = client.upload(pl.DataFrame({"k": [0, 1, 2, 3, 4],
                                      "name": list("abcde")}))
    j = rf.join(dim, on="k").group_by("name").agg(pl.len().alias("n"))
    got = j.collect().sort("name")
    assert got.height == 5


def test_remote_select_head_release(client, pq):
    rf = client.read_parquet(pq, columns=["k", "v"])
    out = rf.select((pl.col("v") * 2).alias("v2")).head(3).collect()
    assert out.columns == ["v2"] and out.height == 3
    n = rf.count_rows()
    assert n == 500
    rf.release()


def test_sql_rpc(client, pq):
    rf = client.sql(f"SELECT k, COUNT(*) AS n FROM read_parquet('{pq}') "
                    "GROUP BY k ORDER BY k")
    out = rf.collect()
    assert out.columns == ["k", "n"]
    assert sum(out.to_dict()["n"]) == 500


def test_unknown_handle_error(client):
    import grpc
    from polaroid_tpu.client import RemoteFrame
    bogus = RemoteFrame(client, "not-a-handle", {})
    with pytest.raises(grpc.RpcError):
        bogus.collect()


def test_http_exec(server_and_port, pq):
    from polaroid_tpu.server.http_api import start_http
    server, _ = server_and_port
    httpd = start_http("127.0.0.1", 0, server._polaroid_service)
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/ping") as r:
            assert json.load(r)["status"] == "ok"
        q = urllib.parse.quote(
            f"SELECT k, COUNT(*) AS n FROM read_parquet('{pq}') GROUP BY k ORDER BY k")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/exec?query={q}") as r:
            body = json.load(r)
        assert body["count"] == 5
        assert [c["name"] for c in body["columns"]] == ["k", "n"]
        assert sum(row[1] for row in body["dataset"]) == 500
        # error path
        bad = urllib.parse.quote("SELECT nope FROM missing")
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/exec?query={bad}")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.load(e)
    finally:
        httpd.shutdown()


def test_expr_serde_roundtrip():
    from polaroid_tpu.expr.serde import expr_from_dict, expr_to_dict
    e = ((pl.col("a") * 2 + pl.col("b")).sum() > pl.lit(3.5)).alias("x")
    d = expr_to_dict(e)
    e2 = expr_from_dict(json.loads(json.dumps(d)))
    assert e2.fingerprint() == e.fingerprint()
    # dtype-bearing expr
    e3 = pl.col("a").cast(pl.Datetime("ms")).alias("t")
    assert expr_from_dict(expr_to_dict(e3)).fingerprint() == e3.fingerprint()


def test_async_client(server_and_port, pq):
    import asyncio
    from polaroid_tpu.aio_client import connect_async
    _, port = server_and_port

    async def run():
        c = connect_async(f"127.0.0.1:{port}")
        hb = await c.heartbeat()
        assert hb["ok"]
        rf = await c.read_parquet(pq)
        f = await rf.filter(pl.col("v") > 5.0)
        g = await f.group_by_agg(["k"], [pl.len().alias("n")])
        out = await g.collect()
        assert out.columns == ["k", "n"]
        # concurrent fan-out: many queries in flight at once
        frames = await asyncio.gather(*[
            c.sql(f"SELECT COUNT(*) c FROM read_parquet('{pq}')")
            for _ in range(8)])
        outs = await asyncio.gather(*[f.collect() for f in frames])
        assert all(o.item() == 500 for o in outs)
        await c.close()

    asyncio.run(run())


def test_execute_plan_rpc(client, pq):
    lf = (pl.scan_parquet(pq).filter(pl.col("v") > 5.0)
          .group_by("k").agg(pl.len().alias("n")))
    rf = client.execute_plan(lf)
    out = rf.collect().sort("k")
    ref = lf.collect().sort("k")
    assert out.to_dict() == ref.to_dict()


def test_plan_serde_roundtrip(pq):
    import json as _json
    from polaroid_tpu.plan.serde import plan_from_dict, plan_to_dict
    lf = (pl.scan_parquet(pq).filter(pl.col("v") > 3.0)
          .with_columns((pl.col("v") * 2).alias("v2"))
          .group_by("k", "s").agg(pl.col("v2").sum().alias("t"))
          .sort("t", descending=True).head(5))
    d = _json.loads(_json.dumps(plan_to_dict(lf._plan)))
    lf2 = pl.LazyFrame._from_plan(plan_from_dict(d))
    assert lf.collect().to_dict() == lf2.collect().to_dict()
    # in-memory frame payloads roundtrip too
    df = pl.DataFrame({"a": [1, None], "s": ["x", None]})
    lf3 = df.lazy().filter(pl.col("a").is_not_null())
    d3 = _json.loads(_json.dumps(plan_to_dict(lf3._plan)))
    assert pl.LazyFrame._from_plan(plan_from_dict(d3)).collect().to_dict() == \
        {"a": [1], "s": ["x"]}
