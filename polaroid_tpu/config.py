"""Engine configuration via environment variables.

Analogue of the reference's env-var flag system
(`polars-core/src/config.rs:1-55`, `polars-core/src/lib.rs:192-210`,
`polars-stream/src/lib.rs:28-44`): everything is an env var, read lazily,
overridable programmatically via `Config`.

TPU-specific knobs replace thread-pool sizing: capacity bucketing (static
shapes for XLA), batch rows (the morsel-size analogue of
POLARS_IDEAL_MORSEL_SIZE, `polars-stream/src/morsel.rs:12-16`), and
float64 policy (TPUs emulate f64; we keep f32 storage + compensated
accumulation unless strict mode is requested).
"""

from __future__ import annotations

import os
from typing import Any


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else default


def _env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    return v not in ("0", "false", "False", "no")


class Config:
    """Global engine configuration. Attributes can be set programmatically;
    env vars provide the defaults (PT_* namespace, mirroring POLARS_*)."""

    def __init__(self) -> None:
        self.reload()

    def reload(self) -> None:
        # verbosity (POLARS_VERBOSE analogue)
        self.verbose: bool = _env_bool("PT_VERBOSE")
        # engine selection default: "auto" | "in-memory" | "streaming"
        # (POLARS_ENGINE_AFFINITY, polars-core/src/config.rs:35)
        self.engine_affinity: str = os.environ.get("PT_ENGINE_AFFINITY", "auto")
        # target rows per streamed batch (POLARS_IDEAL_MORSEL_SIZE analogue;
        # larger on TPU: HBM batches want >=1M rows to saturate the VPU)
        self.batch_rows: int = _env_int("PT_BATCH_ROWS", 1 << 21)
        # minimum capacity bucket (keeps XLA recompiles bounded); multiples
        # of 128 for lane alignment, powers of two above that
        self.min_capacity: int = _env_int("PT_MIN_CAPACITY", 128)
        # keep Float64 columns in true f64 on accelerators (slow: emulated)
        self.strict_f64: bool = _env_bool("PT_STRICT_F64")
        # join sample limit for build-side selection
        # (POLARS_JOIN_SAMPLE_LIMIT, polars-stream/src/nodes/joins/mod.rs:20)
        self.join_sample_limit: int = _env_int("PT_JOIN_SAMPLE_LIMIT", 10_000_000)
        # streaming join build-side row budget; past it the grace-hash
        # partitioned spill join bounds memory (reference: per-partition
        # BuildState, equi_join.rs:420)
        self.join_build_budget_rows: int = _env_int(
            "PT_JOIN_BUILD_BUDGET_ROWS", 10_000_000)
        self.join_grace_partitions: int = _env_int(
            "PT_JOIN_GRACE_PARTITIONS", 8)
        # group-by strategy: "auto" | "sort" | "hash"
        self.groupby_strategy: str = os.environ.get("PT_GROUPBY_STRATEGY", "auto")
        # collect per-node timing metrics (POLARS_TRACK_METRICS analogue)
        self.track_metrics: bool = _env_bool("PT_TRACK_METRICS")
        self.log_metrics: bool = _env_bool("PT_LOG_METRICS")
        # print optimized / physical plans (POLARS_VISUALIZE_IR analogue)
        self.visualize_ir: bool = _env_bool("PT_VISUALIZE_IR")
        # raise instead of warn on lossy ops
        self.panic_on_err: bool = _env_bool("PT_PANIC_ON_ERR")
        # max distinct capacity buckets before we reuse the largest
        self.max_buckets: int = _env_int("PT_MAX_BUCKETS", 64)
        # formatting
        self.fmt_max_rows: int = _env_int("PT_FMT_MAX_ROWS", 10)
        self.fmt_max_cols: int = _env_int("PT_FMT_MAX_COLS", 12)
        self.fmt_str_len: int = _env_int("PT_FMT_STR_LEN", 30)

    def set(self, **kwargs: Any) -> "Config":
        for k, v in kwargs.items():
            if not hasattr(self, k):
                raise AttributeError(f"unknown config key: {k}")
            setattr(self, k, v)
        return self

    # --- polars-compatible option surface -------------------------------
    # (py-polars pl.Config context manager / set_* methods)
    _PL_NAMES = {
        "tbl_rows": "fmt_max_rows",
        "tbl_cols": "fmt_max_cols",
        "fmt_str_lengths": "fmt_str_len",
        "verbose": "verbose",
    }

    def __call__(self, **options: Any) -> "Config":
        # pl.Config(tbl_rows=...): applies immediately, restores on exit
        self._saved = {}
        for k, v in options.items():
            key = self._PL_NAMES.get(k, k)
            if not hasattr(self, key):
                raise AttributeError(f"unknown config option: {k}")
            self._saved[key] = getattr(self, key)
            setattr(self, key, v)
        return self

    def __enter__(self) -> "Config":
        return self

    def __exit__(self, *exc) -> None:
        for k, v in getattr(self, "_saved", {}).items():
            setattr(self, k, v)
        self._saved = {}

    def restore_defaults(self) -> "Config":
        self.reload()
        return self

    def set_tbl_rows(self, n: int) -> "Config":
        self.fmt_max_rows = n
        return self

    def set_tbl_cols(self, n: int) -> "Config":
        self.fmt_max_cols = n
        return self

    def set_fmt_str_lengths(self, n: int) -> "Config":
        self.fmt_str_len = n
        return self

    def set_verbose(self, active: bool = True) -> "Config":
        self.verbose = active
        return self


class _ConfigProxy:
    """Lets pl.Config act both as the global instance
    (pl.Config.set_tbl_rows(5)) and as a constructor-style context
    manager (with pl.Config(tbl_rows=5): ...)."""

    def __getattr__(self, name):
        return getattr(CONFIG, name)

    def __setattr__(self, name, value):
        setattr(CONFIG, name, value)

    def __call__(self, **options):
        return CONFIG(**options)

    def __enter__(self):
        return CONFIG.__enter__()

    def __exit__(self, *exc):
        return CONFIG.__exit__(*exc)


CONFIG = Config()


def capacity_for(n: int) -> int:
    """Round a row count up to a capacity bucket.

    Buckets are powers of two (>= CONFIG.min_capacity) so that the number
    of distinct XLA-compiled shapes stays logarithmic in data size. The
    reference has no such constraint (Arrow chunks are ragged); on TPU
    static shapes are what lets XLA tile kernels onto the VPU/MXU.
    """
    c = max(int(n), 1)
    b = CONFIG.min_capacity
    while b < c:
        b <<= 1
    return b
RANDOM_SEED = None  # pl.set_random_seed
