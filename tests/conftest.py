"""Test harness config: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4.4). Must set env before jax initialises.

Set URESNET_TPU_TESTS=1 to SKIP the CPU pinning and run the on-chip tests:
    URESNET_TPU_TESTS=1 python -m pytest tests/test_tpu_gated.py -q
"""

import os

_ON_CHIP = os.environ.get("URESNET_TPU_TESTS") == "1"
if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# This environment pre-imports jax at interpreter startup (axon sitecustomize)
# with JAX_PLATFORMS=axon, so env vars alone are too late — force the config
# before any backend initialises.
import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

# Single-core box: XLA compiles dominate test time. Persist compilations
# across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def h5_fixture(tmp_path_factory):
    """A small synthetic HDF5 event file shared across tests."""
    from uresnet_pytorch_tpu.iotools.h5_io import generate_h5_file
    path = str(tmp_path_factory.mktemp("data") / "events.h5")
    generate_h5_file(path, n_events=8, spatial_size=64, data_dim=3, seed=7,
                     mean_voxels=512, keys=("data", "label", "weight"))
    return path
