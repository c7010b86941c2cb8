"""Per-voxel prediction writer (HDF5).

The reference writes per-voxel class scores back to larcv/h5 products during
inference (``io.store_segment``, SURVEY.md §3.2). Output schema matches the
input event schema (h5_io.py) plus a full softmax dataset:

  /prediction/coords      (T, dim) i32
  /prediction/values      (T,)     f32   argmax class id
  /prediction/softmax     (T, C)   f32
  /prediction/row_splits  (E+1,)   i64
  /prediction/entries     (E,)     i64   original dataset indices
"""

from __future__ import annotations

import threading

import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig


class PredictionWriter:
    def __init__(self, cfg: URESNetConfig):
        if not cfg.output_file:
            raise ValueError("store_segment requires --output-file")
        self.cfg = cfg
        self._f = None
        self._lock = threading.Lock()

    def _ensure_open(self):
        import h5py
        if self._f is not None:
            return
        cfg = self.cfg
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
        self._f = f

    def store_segment(self, index, blob, softmax) -> None:
        with self._lock:
            self._ensure_open()
            g = self._f["prediction"]
            softmax = np.asarray(softmax)
            for b in range(len(blob["index"])):
                n = int(blob["n_voxels"][b])
                coords = blob["coords"][b, :n]
                sm = softmax[b, :n]
                pred = sm.argmax(axis=-1).astype(np.float32)
                t = g["coords"].shape[0]
                for name, arr in (("coords", coords), ("values", pred),
                                  ("softmax", sm)):
                    g[name].resize(t + n, axis=0)
                    g[name][t:] = arr
                rs = g["row_splits"]
                rs.resize(rs.shape[0] + 1, axis=0)
                rs[-1] = t + n
                e = g["entries"]
                e.resize(e.shape[0] + 1, axis=0)
                e[-1] = int(blob["index"][b])

    def close(self) -> None:
        with self._lock:
            if self._f is not None:
                self._f.close()
                self._f = None
