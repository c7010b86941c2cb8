"""Test harness config: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4.4). Must set env before jax initialises."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
