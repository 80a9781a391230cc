"""Arrow IPC (Feather V2) IO. Reference analogue: `polars-io/src/ipc/`."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.ipc as paipc

from ..batch import Table
from .arrow_interop import table_from_arrow, table_to_arrow


def read_ipc_table(source, columns=None, n_rows=None) -> Table:
    if hasattr(source, "read") or isinstance(source, (bytes, bytearray)):
        if isinstance(source, (bytes, bytearray)):
            import io as _io
            source = _io.BytesIO(source)
        t = paipc.open_file(source).read_all()
    else:
        with pa.memory_map(str(source), "r") as f:
            t = paipc.open_file(f).read_all()
    if columns:
        t = t.select(list(columns))
    if n_rows is not None:
        t = t.slice(0, n_rows)
    return table_from_arrow(t)


def write_ipc(df, file, compression: str = "zstd") -> None:
    at = table_to_arrow(df._table)
    opts = paipc.IpcWriteOptions(
        compression=compression if compression else None)
    if hasattr(file, "write"):
        with paipc.new_file(file, at.schema, options=opts) as w:
            w.write_table(at)
        return
    with pa.OSFile(str(file), "wb") as f:
        with paipc.new_file(f, at.schema, options=opts) as w:
            w.write_table(at)
