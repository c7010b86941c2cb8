"""Data-parallel device mesh and shardings.

The reference's only parallelism is single-process multi-GPU data parallel:
the global batch is split into per-GPU minibatches and gradients reduce
across devices inside torch autograd/NCCL (SURVEY.md §2.9, §2.16). The
TPU-native equivalent is a 1-D ``('data',)`` jax.sharding Mesh: batch arrays
shard on axis 0, parameters/optimizer state replicate, and XLA GSPMD inserts
the gradient allreduce over ICI (psum) when compiling the jitted train step —
there is no hand-written communication layer to maintain.

Multi-host bring-up: call ``jax.distributed.initialize()`` before building
the mesh (see docs/distributed.md); the same code then spans hosts, with
collectives riding ICI within a slice and DCN across slices.

This is also where the reference's ``--gpus`` flag lands: it selects which
jax devices join the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              device_ids: Sequence[int] = ()) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices.

    device_ids mirrors the reference's --gpus flag (SURVEY.md §2.2)."""
    if devices is None:
        devices = jax.devices()
    if device_ids:
        devices = [devices[i] for i in device_ids]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (events) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place host batch arrays on the mesh, events split across chips."""
    s = batch_sharding(mesh)
    return jax.device_put(batch, s)
