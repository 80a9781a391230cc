"""Arrow IPC (Feather) IO. Reference analogue: `polars-io/src/ipc/`."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.feather as paf

from ..batch import Table
from .arrow_interop import table_from_arrow, table_to_arrow


def read_ipc_table(source, columns=None, n_rows=None) -> Table:
    t = paf.read_table(str(source), columns=list(columns) if columns else None)
    if n_rows is not None:
        t = t.slice(0, n_rows)
    return table_from_arrow(t)


def write_ipc(df, file, compression: str = "zstd") -> None:
    at = table_to_arrow(df._table)
    paf.write_feather(at, str(file),
                      compression=compression if compression else "uncompressed")
