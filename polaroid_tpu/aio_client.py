"""Async remote DataFrame client (grpc.aio).

Capability analogue of `polarway-python/polarway/async_client.py`:
the same handle-based surface as `client.py`, awaitable, suitable for
high-concurrency fan-out (the reference's 650-QPS concurrent-clients
benchmark shape, `docs/PERFORMANCE_COMPARISON.md:12`).
"""

from __future__ import annotations

import io
import json
from typing import Dict, List, Optional

import grpc
import grpc.aio

from .expr.serde import exprs_to_obj
from .client import _SERVICE, _to_exprs


class AsyncRemoteClient:
    def __init__(self, address: str = "localhost:50051"):
        from .server import polaroid_pb2 as pb
        self._pb = pb
        self._channel = grpc.aio.insecure_channel(
            address, options=[("grpc.max_receive_message_length", 64 << 20),
                              ("grpc.max_send_message_length", 64 << 20)])
        self._stubs: Dict[str, object] = {}

    def _unary(self, name, req_t, resp_t):
        if name not in self._stubs:
            self._stubs[name] = self._channel.unary_unary(
                f"/{_SERVICE}/{name}",
                request_serializer=req_t.SerializeToString,
                response_deserializer=resp_t.FromString)
        return self._stubs[name]

    async def _call(self, name, req, resp_t):
        return await self._unary(name, type(req), resp_t)(req)

    async def read_parquet(self, path: str, columns=None, n_rows: int = 0
                           ) -> "AsyncRemoteFrame":
        pb = self._pb
        resp = await self._call("ReadFile", pb.ReadFileRequest(
            path=path, format="parquet", columns=list(columns or []),
            n_rows=n_rows), pb.HandleResponse)
        return AsyncRemoteFrame(self, resp.handle, json.loads(resp.schema_json))

    async def sql(self, query: str) -> "AsyncRemoteFrame":
        pb = self._pb
        resp = await self._call("Sql", pb.SqlRequest(query=query),
                                pb.HandleResponse)
        return AsyncRemoteFrame(self, resp.handle, json.loads(resp.schema_json))

    async def heartbeat(self) -> dict:
        pb = self._pb
        r = await self._call("Heartbeat", pb.HeartbeatRequest(client_id="aio"),
                             pb.HeartbeatResponse)
        return {"ok": r.ok, "active_handles": r.active_handles}

    async def close(self):
        await self._channel.close()


class AsyncRemoteFrame:
    def __init__(self, client: AsyncRemoteClient, handle: str,
                 schema: Dict[str, str]):
        self._c = client
        self.handle = handle
        self._schema = schema

    @property
    def columns(self) -> List[str]:
        return list(self._schema)

    def _wrap(self, resp) -> "AsyncRemoteFrame":
        return AsyncRemoteFrame(self._c, resp.handle,
                                json.loads(resp.schema_json))

    async def filter(self, *predicates) -> "AsyncRemoteFrame":
        pb = self._c._pb
        resp = await self._c._call("Filter", pb.ExprOpRequest(
            handle=self.handle,
            exprs_json=json.dumps(exprs_to_obj(_to_exprs(predicates)))),
            pb.HandleResponse)
        return self._wrap(resp)

    async def select(self, *exprs) -> "AsyncRemoteFrame":
        pb = self._c._pb
        resp = await self._c._call("Select", pb.ExprOpRequest(
            handle=self.handle,
            exprs_json=json.dumps(exprs_to_obj(_to_exprs(exprs)))),
            pb.HandleResponse)
        return self._wrap(resp)

    async def group_by_agg(self, keys, aggs,
                           maintain_order: bool = False) -> "AsyncRemoteFrame":
        pb = self._c._pb
        resp = await self._c._call("GroupByAgg", pb.GroupByRequest(
            handle=self.handle,
            keys_json=json.dumps(exprs_to_obj(_to_exprs(keys))),
            aggs_json=json.dumps(exprs_to_obj(_to_exprs(aggs))),
            maintain_order=maintain_order), pb.HandleResponse)
        return self._wrap(resp)

    async def head(self, n: int = 5) -> "AsyncRemoteFrame":
        pb = self._c._pb
        resp = await self._c._call("Slice", pb.SliceRequest(
            handle=self.handle, offset=0, length=n), pb.HandleResponse)
        return self._wrap(resp)

    async def collect(self):
        import pyarrow as pa
        pb = self._c._pb
        stub = self._c._channel.unary_stream(
            f"/{_SERVICE}/Collect",
            request_serializer=pb.HandleRequest.SerializeToString,
            response_deserializer=pb.ArrowBatch.FromString)
        buf = io.BytesIO()
        async for msg in stub(pb.HandleRequest(handle=self.handle)):
            buf.write(msg.data)
        buf.seek(0)
        from .api.frame import DataFrame
        if buf.getbuffer().nbytes == 0:
            return DataFrame()
        with pa.ipc.open_stream(buf) as r:
            at = r.read_all()
        return DataFrame(at)

    async def release(self) -> None:
        pb = self._c._pb
        await self._c._call("ReleaseHandle",
                            pb.HandleRequest(handle=self.handle),
                            pb.StatusResponse)


def connect_async(address: str = "localhost:50051") -> AsyncRemoteClient:
    return AsyncRemoteClient(address)
