"""HDF5-backed IO (reference: uresnet/iotools io_h5, SURVEY.md §2.8) with an
HDF5 prediction writer for ``store_segment`` (reference writes larcv/h5
products back out; SURVEY.md §3.2)."""

from __future__ import annotations

import threading
import numpy as np
from typing import Dict

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.iotools.io_base import IOBase
from uresnet_pytorch_tpu.iotools.h5_io import H5Reader


class IOH5(IOBase):
    def __init__(self, cfg: URESNetConfig):
        super().__init__(cfg)
        # Positional semantics match the reference's --data-keys
        # (SURVEY.md §2.2): first key = data, second = label, third = weight.
        keys = list(cfg.data_keys)
        if cfg.weight_key and cfg.weight_key not in keys:
            keys.append(cfg.weight_key)
        canon_names = ["data", "label", "weight"]
        self._key_map = {canon_names[i]: k for i, k in enumerate(keys[:3])}
        if cfg.weight_key:
            self._key_map["weight"] = cfg.weight_key
        paths = list(cfg.input_file)
        if cfg.limit_num_files > 0:
            paths = paths[: cfg.limit_num_files]
        self._reader = H5Reader(paths, list(self._key_map.values()))
        self._num_entries = len(self._reader)
        self._read_lock = threading.Lock()
        self._writer = None
        self._writer_lock = threading.Lock()
        if self._reader.data_dim != cfg.data_dim:
            raise ValueError(
                f"file data_dim {self._reader.data_dim} != config {cfg.data_dim}")

    def _read_event(self, index: int) -> Dict[str, tuple]:
        with self._read_lock:  # h5py handles are not thread-safe
            raw = self._reader.read(index)
        return {canon: raw[real] for canon, real in self._key_map.items()}

    def store_segment(self, index, blob, softmax) -> None:
        """Append per-voxel predictions for one batch to cfg.output_file.

        softmax: (B, V, num_class) array. Writes, per event: the valid voxel
        coords, argmax class, and full softmax scores.
        """
        import h5py
        cfg = self.cfg
        with self._writer_lock:
            if self._writer is None:
                if not cfg.output_file:
                    raise ValueError("store_segment requires --output-file")
                f = h5py.File(cfg.output_file, "w")
                meta = f.create_group("meta")
                meta.attrs["spatial_size"] = cfg.spatial_size
                meta.attrs["data_dim"] = cfg.data_dim
                g = f.create_group("prediction")
                dim, nc = cfg.data_dim, cfg.num_class
                g.create_dataset("coords", (0, dim), maxshape=(None, dim), dtype="i4")
                g.create_dataset("values", (0,), maxshape=(None,), dtype="f4")
                g.create_dataset("softmax", (0, nc), maxshape=(None, nc), dtype="f4")
                g.create_dataset("row_splits", data=np.zeros(1, "i8"), maxshape=(None,))
                g.create_dataset("entries", (0,), maxshape=(None,), dtype="i8")
                self._writer = f
            g = self._writer["prediction"]
            softmax = np.asarray(softmax)
            for b in range(len(blob["index"])):
                n = int(blob["n_voxels"][b])
                coords = blob["coords"][b, :n]
                sm = softmax[b, :n]
                pred = sm.argmax(axis=-1).astype(np.float32)
                t = g["coords"].shape[0]
                for name, arr in (("coords", coords), ("values", pred), ("softmax", sm)):
                    g[name].resize(t + n, axis=0)
                    g[name][t:] = arr
                rs = g["row_splits"]
                rs.resize(rs.shape[0] + 1, axis=0)
                rs[-1] = t + n
                e = g["entries"]
                e.resize(e.shape[0] + 1, axis=0)
                e[-1] = int(blob["index"][b])

    def finalize(self) -> None:
        super().finalize()
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        self._reader.close()
