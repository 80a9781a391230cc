"""JSON / NDJSON IO. Reference analogue: `polars-json`, `polars-io` json."""

from __future__ import annotations

import io as _io
import json as _json

import pyarrow as pa
import pyarrow.json as pajson

from ..batch import Table
from .arrow_interop import table_from_arrow, table_to_arrow


def read_ndjson_table(source, n_rows=None) -> Table:
    if isinstance(source, str) and "\n" in source:
        source = _io.BytesIO(source.encode())
    elif isinstance(source, bytes):
        source = _io.BytesIO(source)
    t = pajson.read_json(source if hasattr(source, "read") else str(source))
    if n_rows is not None:
        t = t.slice(0, n_rows)
    return table_from_arrow(t)


def read_json_table(source) -> Table:
    if hasattr(source, "read"):
        data = _json.load(source)
    elif isinstance(source, (str,)) and source.strip().startswith(("[", "{")):
        data = _json.loads(source)
    else:
        with open(source) as f:
            data = _json.load(f)
    if isinstance(data, dict):
        data = [data]
    cols = {}
    for row in data:
        for k in row:
            cols.setdefault(k, [])
    for row in data:
        for k in cols:
            cols[k].append(row.get(k))
    return Table.from_dict(cols)


def write_ndjson(df, file=None):
    d = df._table.to_numpy_dict()
    names = list(d.keys())
    n = len(d[names[0]]) if names else 0
    lines = []
    import numpy as np
    for i in range(n):
        row = {}
        for k in names:
            v = d[k][i]
            if isinstance(v, np.generic):
                v = v.item()
            elif v is not None and not isinstance(v, (int, float, str, bool)):
                v = str(v)
            row[k] = v
        lines.append(_json.dumps(row))
    out = "\n".join(lines) + ("\n" if lines else "")
    if file is None:
        return out
    with open(file, "w") as f:
        f.write(out)
    return None
