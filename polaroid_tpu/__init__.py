"""polaroid-tpu: a TPU-native vectorized DataFrame / query-execution engine.

Built from scratch with the capability surface of ThotDjehuty/polaroid
("Polarway": Polars + gRPC/storage layers) — see SURVEY.md — re-designed
for TPU hardware: fixed-capacity columnar batches in HBM, XLA fused
kernels + Pallas for hot paths, lazy query plans with pushdown
optimization, and multi-chip scale via `shard_map` hash shuffles over ICI.

Import as `import polaroid_tpu as pl` — the API mirrors polars.
"""

from __future__ import annotations

import os as _os

import jax as _jax

# 64-bit ints/floats are part of the dataframe contract (Int64 default like
# polars). On TPU, Float64 storage is downgraded to f32 unless PT_STRICT_F64
# (see batch.storage_numpy_dtype); int64 stays exact.
if _os.environ.get("PT_NO_X64") not in ("1", "true"):
    _jax.config.update("jax_enable_x64", True)

from .config import CONFIG, _ConfigProxy  # noqa: E402
Config = _ConfigProxy()  # usable as class-style pl.Config and context mgr
from .dtypes import (  # noqa: E402
    Array, Binary, Boolean, Categorical, DataType, Date, Datetime, Decimal,
    Duration, Enum, Field, Float16, Float32,
    Float64, Int8, Int16, Int32, Int64, Int128, List, Null, Object, Schema,
    String, Struct, Time,
    UInt8, UInt16, UInt32, UInt64, UInt128, Unknown, Utf8,
)
from .errors import (  # noqa: E402
    ColumnNotFoundError, ComputeError, DuplicateError, InvalidOperationError,
    NoDataError, OutOfBoundsError, PolaroidError, SchemaError, ShapeError,
    SQLInterfaceError, SQLSyntaxError,
)
from . import exceptions  # noqa: E402  (pl.exceptions parity namespace)
from . import testing  # noqa: E402  (pl.testing assertion helpers)
from . import selectors  # noqa: E402  (pl.selectors / cs column selectors)
from . import monads  # noqa: E402  (Result/Option/Lazy, Polarway addition)
from .expr.expr import (  # noqa: E402
    Expr, col, element, len_ as len, lit, nth, when,
)
from .api.frame import DataFrame  # noqa: E402
from .api.series import Series  # noqa: E402
from .api.lazyframe import LazyFrame, scan_parquet, scan_csv, scan_ipc, \
    scan_ndjson  # noqa: E402
from .api.functions import (  # noqa: E402
    align_frames, all, all_horizontal, any, any_horizontal,
    approx_n_unique, arange,
    arctan2, arctan2d, arg_sort_by, arg_where, business_day_count,
    coalesce, collect_all, collect_all_async, concat, concat_arr,
    concat_list, concat_str, corr, count,
    cov, cum_count, cum_fold, cum_reduce,
    date, date_range, datetime, duration, escape_regex, exclude,
    explain_all, field, first, fold, format,
    from_arrow, from_dict, from_epoch, from_numpy, from_pandas,
    from_records, head, implode, int_range, int_ranges, last,
    linear_space,
    map_batches,
    max, max_horizontal, mean, mean_horizontal, median, min,
    min_horizontal, n_unique,
    ones, quantile, read_csv, read_ipc, read_json, read_ndjson,
    read_parquet,
    read_avro, read_clipboard, read_csv_batched, read_database,
    read_database_uri, read_delta, read_excel, read_ipc_schema,
    read_ipc_stream, read_ods, read_parquet_metadata,
    read_parquet_schema, reduce, register_io_source, repeat,
    rolling_corr, rolling_cov, row_index, scan_delta, scan_iceberg,
    scan_pyarrow_dataset, select,
    set_random_seed, sql_expr, std, struct, sum, sum_horizontal,
    tail, var, zeros,
    CompatLevel, GPUEngine, QueryOptFlags, StringCache, build_info,
    cum_sum, cum_sum_horizontal, date_ranges, datetime_range,
    datetime_ranges, disable_string_cache, enable_string_cache,
    from_dataframe, from_dicts, from_repr, from_torch, get_index_type,
    json_normalize, show_versions, thread_pool_size, threadpool_size,
    time, time_range, time_ranges, union, using_string_cache,
    Catalog, Categories, CredentialProvider, CredentialProviderAWS,
    CredentialProviderAzure, CredentialProviderFunction,
    CredentialProviderFunctionReturn, CredentialProviderGCP,
    PartitionByKey, PartitionMaxSize, PartitionParted,
    ScanCastOptions, linear_spaces,
    KeyedPartition, BasePartitionContext, KeyedPartitionContext,
    defer, groups, map_groups,
)
from . import plugins  # noqa: E402
from .datatype_expr import (  # noqa: E402
    DataTypeExpr, dtype_of, self_dtype, struct_with_fields,
)
from .dtypes import (  # noqa: E402
    BaseExtension, Extension, get_extension_type, register_extension_type,
    unregister_extension_type,
)
from .sql.context import SQLContext  # noqa: E402
# bind pl.sql AFTER the sql subpackage is imported so the function wins
# over the module attribute (py-polars exposes `pl.sql` as a function)
from .api.functions import sql  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "DataFrame", "LazyFrame", "Series", "Expr", "SQLContext", "Config",
    "CONFIG",
    "col", "lit", "when", "len", "first", "last", "nth",
    "scan_parquet", "scan_csv", "scan_ipc", "scan_ndjson",
    "read_parquet", "read_csv", "read_ipc", "read_json", "read_ndjson",
    "from_arrow", "from_dict", "from_pandas", "from_numpy", "from_records",
    "concat", "concat_str", "arange", "int_range", "date_range", "repeat",
    "all", "any", "min", "max", "sum", "mean", "std", "var", "count",
    "corr", "cov", "coalesce", "exclude", "select", "struct",
    "min_horizontal", "max_horizontal", "sum_horizontal", "mean_horizontal",
    "Int8", "Int16", "Int32", "Int64", "UInt8", "UInt16", "UInt32", "UInt64",
    "Float32", "Float64", "Boolean", "String", "Utf8", "Categorical", "Date",
    "Datetime", "Duration", "Time", "Null", "List", "DataType",
    "PolaroidError", "ColumnNotFoundError", "ComputeError", "SchemaError",
    "ShapeError", "InvalidOperationError", "DuplicateError", "NoDataError",
    "OutOfBoundsError", "SQLSyntaxError", "SQLInterfaceError",
]
