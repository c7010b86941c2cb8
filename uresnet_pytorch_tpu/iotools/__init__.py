"""IO tools: factory + loaders (reference: uresnet/iotools/io_factory,
SURVEY.md §2.8)."""

from __future__ import annotations

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.iotools.io_base import IOBase  # noqa: F401


def io_factory(cfg: URESNetConfig, **kwargs) -> IOBase:
    if cfg.io_type == "h5":
        from uresnet_pytorch_tpu.iotools.io_h5 import IOH5
        return IOH5(cfg)
    if cfg.io_type == "synthetic":
        from uresnet_pytorch_tpu.iotools.io_synthetic import IOSynthetic
        return IOSynthetic(cfg, **kwargs)
    if cfg.io_type in ("larcv_sparse", "larcv_dense"):
        raise NotImplementedError(
            "larcv requires ROOT, unavailable in this environment; convert files "
            "to the HDF5 schema (uresnet_pytorch_tpu/iotools/h5_io.py) and use "
            "--io-type h5. The blob contract is identical (SURVEY.md §2.8).")
    raise ValueError(f"unknown io_type {cfg.io_type!r}")
