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
HOST_AXIS = "hosts"   # DCN (cross-host) axis of the 2-D mesh
CHIP_AXIS = "chips"   # ICI (intra-host) axis of the 2-D mesh


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def make_mesh2(n_hosts: Optional[int] = None,
               chips_per_host: Optional[int] = None, devices=None) -> Mesh:
    """2-D (hosts x chips) mesh: the ICI/DCN hierarchy. Shuffles route in
    two stages — all_to_all over CHIP_AXIS rides ICI inside each host,
    then all_to_all over HOST_AXIS crosses DCN with same-chip-index
    peers only (the DCN-friendly pairing; jax-ml scaling-book recipe).
    On real pods jax.devices() ordering groups devices by process/host,
    so the row-major reshape maps HOST_AXIS onto actual hosts."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_hosts is None:
        try:
            n_hosts = max(jax.process_count(), 1)
        except Exception:
            n_hosts = 1
        if chips_per_host is None and n % n_hosts == 0:
            chips_per_host = n // n_hosts
    if chips_per_host is None:
        chips_per_host = n // n_hosts
    use = n_hosts * chips_per_host
    grid = np.asarray(devices[:use]).reshape(n_hosts, chips_per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
