"""CSV IO (pyarrow C++ parser on host).

Reference analogue: `polars-io/src/csv/`.
"""

from __future__ import annotations

import io as _io
from typing import Optional

import pyarrow as pa
import pyarrow.csv as pacsv

from ..batch import Table
from .arrow_interop import table_from_arrow, table_to_arrow


def read_csv_table(source, has_header: bool = True, separator: str = ",",
                   columns=None, n_rows: Optional[int] = None,
                   schema_overrides=None, try_parse_dates: bool = False,
                   null_values=None, comment_prefix=None,
                   skip_rows: int = 0) -> Table:
    read_opts = pacsv.ReadOptions(autogenerate_column_names=not has_header,
                                  skip_rows=skip_rows)
    parse_opts = pacsv.ParseOptions(delimiter=separator)
    conv = {}
    if null_values is not None:
        conv["null_values"] = ([null_values] if isinstance(null_values, str)
                               else list(null_values))
        conv["strings_can_be_null"] = True
    if schema_overrides:
        from ..dtypes import DataType
        from .arrow_interop import dtype_to_arrow
        conv["column_types"] = {
            k: dtype_to_arrow(v() if isinstance(v, type)
                              and issubclass(v, DataType) else v)
            for k, v in dict(schema_overrides).items()}
    convert_opts = pacsv.ConvertOptions(**conv)
    if isinstance(source, (str, bytes)) and isinstance(source, str) and \
            "\n" in source:
        source = _io.BytesIO(source.encode())
    t = pacsv.read_csv(str(source) if not hasattr(source, "read") else source,
                       read_options=read_opts, parse_options=parse_opts,
                       convert_options=convert_opts)
    if not has_header:
        t = t.rename_columns([f"column_{i+1}" for i in range(t.num_columns)])
    if columns:
        t = t.select(list(columns))
    if n_rows is not None:
        t = t.slice(0, n_rows)
    return table_from_arrow(t)


def write_csv(df, file=None, separator: str = ",", include_header: bool = True):
    at = table_to_arrow(df._table)
    opts = pacsv.WriteOptions(include_header=include_header,
                              delimiter=separator)
    if file is None:
        buf = _io.BytesIO()
        pacsv.write_csv(at, buf, write_options=opts)
        return buf.getvalue().decode()
    pacsv.write_csv(at, str(file), write_options=opts)
    return None
