"""Backend-aware binary search.

jnp.searchsorted's default method="scan" is a log(n)-step loop of full
gathers — fine on CPU, slow on TPU where each step is a serialized
dynamic-gather pass. method="sort" reformulates the search as one fused
sort over (haystack ++ queries), which is how the rest of this engine
already does its segment math (sorts are the fast primitive on TPU).

The engine's hot paths (join expansion, explode row-mapping, distributed
range partitioning) call this wrapper instead of jnp.searchsorted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["searchsorted"]

# below this many queries the scan method's latency wins even on TPU
_SORT_METHOD_MIN_QUERIES = 4096


def searchsorted(a, v, side: str = "left"):
    method = "scan"
    if jax.default_backend() != "cpu":
        n = v.size if hasattr(v, "size") else 0
        if n >= _SORT_METHOD_MIN_QUERIES:
            method = "sort"
    return jnp.searchsorted(a, v, side=side, method=method)
