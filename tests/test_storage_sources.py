"""Storage tiers, native lib, and network sources (local servers only)."""

import asyncio
import json

import numpy as np
import pytest

import polaroid_tpu as pl


def test_native_lib_loaded():
    from polaroid_tpu.native import has_native, available_memory, process_rss
    assert has_native(), "native/libptmemstore.so should be built"
    assert available_memory() > 0
    assert process_rss() > 0


def test_native_lru_eviction():
    from polaroid_tpu.native import NativeLRU
    lru = NativeLRU(1000)
    assert lru.put("a", b"x" * 400)
    assert lru.put("b", b"y" * 400)
    assert lru.get("a") == b"x" * 400  # touch a
    assert lru.put("c", b"z" * 400)    # evicts b (LRU)
    assert lru.get("b") is None
    assert lru.get("a") is not None
    assert lru.get("c") is not None
    st = lru.stats()
    assert st["evictions"] >= 1 and st["entries"] == 2
    assert not lru.put("huge", b"q" * 2000)  # larger than capacity


def test_adaptive_chunk_rows():
    from polaroid_tpu.native import adaptive_chunk_rows
    n = adaptive_chunk_rows(1 << 16, 64)
    assert (1 << 14) <= n <= (1 << 24)


def test_hybrid_storage_roundtrip(tmp_path):
    from polaroid_tpu.storage import HybridStorage
    hs = HybridStorage(str(tmp_path / "store"), cache_bytes=10 << 20)
    df = pl.DataFrame({"a": [1, 2, 3], "s": ["x", "y", None]})
    hs.store("trades/day1", df)
    got = hs.load("trades/day1")  # cache hit
    assert got.to_dict() == df.to_dict()
    assert hs.stats()["cache_hits"] == 1
    # cold load after cache wipe
    hs.cache.delete("trades/day1")
    got2 = hs.load("trades/day1")
    assert got2.to_dict() == df.to_dict()
    assert hs.stats()["cache_misses"] == 1
    assert hs.list_keys() == ["trades/day1"]


def test_hybrid_storage_sql(tmp_path):
    from polaroid_tpu.storage import HybridStorage
    hs = HybridStorage(str(tmp_path / "s2"))
    hs.store("sales", pl.DataFrame({"r": ["eu", "us", "eu"],
                                    "v": [1.0, 2.0, 3.0]}))
    out = hs.query('SELECT r, SUM(v) AS t FROM sales GROUP BY r ORDER BY r')
    assert out.to_dict() == {"r": ["eu", "us"], "t": [4.0, 2.0]}
    assert hs.delete("sales")
    with pytest.raises(pl.NoDataError):
        hs.load("sales")


def test_rate_limiter():
    from polaroid_tpu.sources import TokenBucketRateLimiter
    rl = TokenBucketRateLimiter(rate=1000.0, capacity=5)
    ok = sum(rl.try_acquire() for _ in range(10))
    assert 5 <= ok <= 7  # capacity burst (+ tokens replenished meanwhile)


def test_websocket_source():
    import websockets
    from polaroid_tpu.sources import WebSocketSource, collect_stream

    async def run():
        async def handler(ws):
            for i in range(10):
                await ws.send(json.dumps({"tick": i, "px": 100.0 + i}))
            await asyncio.sleep(0.2)

        async with websockets.serve(handler, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]
            src = WebSocketSource(f"ws://127.0.0.1:{port}", batch_rows=5)
            df = await collect_stream(src, max_batches=2)
            return df, src

    df, src = asyncio.run(run())
    assert df.height == 10
    assert df.to_dict()["tick"] == list(range(10))
    assert src.rows_received == 10


def test_rest_source():
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from polaroid_tpu.sources import RestSource, collect_stream

    counter = {"n": 0}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            counter["n"] += 1
            body = json.dumps(
                [{"poll": counter["n"], "v": 1.5}]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        src = RestSource(f"http://127.0.0.1:{port}/data", interval_s=0.01,
                         batch_rows=3, max_polls=6, flush_interval=3600.0)
        df = asyncio.run(collect_stream(src, max_batches=2))
        assert df.height == 6
        assert df.to_dict()["poll"] == [1, 2, 3, 4, 5, 6]
    finally:
        httpd.shutdown()
