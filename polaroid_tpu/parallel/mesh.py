"""Device mesh helpers.

The scale-out analogue of the reference's rayon pool sizing
(`polars-core/src/lib.rs:192-210` POLARS_MAX_THREADS): rows are sharded
over a 1-D "shards" mesh axis; ICI carries the hash shuffles
(`lax.all_to_all` under `shard_map`), DCN handles the cross-host legs —
replacing the in-process HashPartitioner fan-out
(`polars-utils/src/hashing.rs:72`) and the stubbed gRPC distributed layer
(`polarway-distributed/`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
