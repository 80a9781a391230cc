import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding paths are
# exercised without TPU hardware; the real chip is used by bench.py only.
# The image exports JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize imports jax at interpreter start, so env vars are read
# before conftest runs; override via jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def assert_frame_equal_dicts(got: dict, want: dict, rtol=1e-6, atol=1e-9,
                             check_order=True):
    assert list(got.keys()) == list(want.keys()), \
        f"columns differ: {list(got)} vs {list(want)}"
    for k in want:
        g, w = list(got[k]), list(want[k])
        assert len(g) == len(w), f"{k}: length {len(g)} vs {len(w)}"
        for i, (a, b) in enumerate(zip(g, w)):
            if b is None:
                assert a is None, f"{k}[{i}]: {a!r} != None"
            elif isinstance(b, float):
                if b != b:  # NaN
                    assert a != a, f"{k}[{i}]: {a!r} != NaN"
                else:
                    assert a is not None and abs(a - b) <= atol + rtol * abs(b), \
                        f"{k}[{i}]: {a!r} != {b!r}"
            else:
                assert a == b, f"{k}[{i}]: {a!r} != {b!r}"


@pytest.fixture
def assert_frames():
    return assert_frame_equal_dicts
