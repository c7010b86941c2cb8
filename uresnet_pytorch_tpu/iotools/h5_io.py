"""HDF5 event file format (reader/writer).

The LArCV2 ROOT backend the reference consumes (SURVEY.md §2.15) is not
available in this environment, so HDF5 is the primary on-disk format. The
schema mirrors LArCV's EventSparseTensor semantics so converted files
round-trip:

  /meta/spatial_size   int         volume edge in voxels
  /meta/data_dim       int         2 or 3
  /<key>/coords        (T, dim) i32   concatenated voxel coords, all events
  /<key>/values        (T,)     f32   voxel values (charge / class id / weight)
  /<key>/row_splits    (E+1,)   i64   CSR offsets: event e = [row_splits[e], row_splits[e+1])

where <key> ∈ data_keys (e.g. ``data``, ``label``, ``weight``). Keys must
share coords row-for-row with ``data`` (the reference's larcv products do the
same; SURVEY.md §3.4).
"""

from __future__ import annotations

import numpy as np
import h5py
from typing import Dict, List, Sequence, Tuple


def write_events(path: str, events: Dict[str, List[Tuple[np.ndarray, np.ndarray]]],
                 spatial_size: int, data_dim: int) -> None:
    """events: key -> list of (coords (N,dim) int32, values (N,) float32)."""
    with h5py.File(path, "w") as f:
        meta = f.create_group("meta")
        meta.attrs["spatial_size"] = spatial_size
        meta.attrs["data_dim"] = data_dim
        for key, evs in events.items():
            g = f.create_group(key)
            coords = np.concatenate([c for c, _ in evs], axis=0).astype(np.int32)
            values = np.concatenate([v for _, v in evs], axis=0).astype(np.float32)
            splits = np.zeros(len(evs) + 1, dtype=np.int64)
            np.cumsum([len(c) for c, _ in evs], out=splits[1:])
            g.create_dataset("coords", data=coords, compression="gzip", compression_opts=1)
            g.create_dataset("values", data=values, compression="gzip", compression_opts=1)
            g.create_dataset("row_splits", data=splits)


class H5Reader:
    """Random-access reader over one or more files sharing the schema."""

    def __init__(self, paths: Sequence[str], data_keys: Sequence[str]):
        if not paths:
            raise ValueError("h5 io requires at least one --input-file")
        self._files = [h5py.File(p, "r") for p in paths]
        self.data_keys = tuple(data_keys)
        f0 = self._files[0]
        self.spatial_size = int(f0["meta"].attrs["spatial_size"])
        self.data_dim = int(f0["meta"].attrs["data_dim"])
        self._counts = []
        for f in self._files:
            for key in self.data_keys:
                if key not in f:
                    raise KeyError(f"key {key!r} missing from {f.filename}")
            self._counts.append(len(f[self.data_keys[0]]["row_splits"]) - 1)
        self._cum = np.concatenate([[0], np.cumsum(self._counts)])

    def __len__(self) -> int:
        return int(self._cum[-1])

    def read(self, index: int) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        fi = int(np.searchsorted(self._cum, index, side="right") - 1)
        local = index - int(self._cum[fi])
        f = self._files[fi]
        out = {}
        for key in self.data_keys:
            g = f[key]
            s, e = g["row_splits"][local], g["row_splits"][local + 1]
            out[key] = (np.asarray(g["coords"][s:e]), np.asarray(g["values"][s:e]))
        return out

    def close(self) -> None:
        for f in self._files:
            f.close()


def generate_h5_file(path: str, n_events: int, spatial_size: int, data_dim: int = 3,
                     seed: int = 0, mean_voxels: int = 2048,
                     keys: Sequence[str] = ("data", "label")) -> str:
    """Write a synthetic-event fixture file (tests, iotest, benchmarks)."""
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    events: Dict[str, list] = {k: [] for k in keys}
    for i in range(n_events):
        coords, vals, labs = generate_event(seed, i, spatial_size, data_dim, mean_voxels)
        for k in keys:
            if k == "data":
                events[k].append((coords, vals))
            elif k == "label":
                events[k].append((coords, labs.astype(np.float32)))
            elif k == "weight":
                # simple class-balancing weights as a fixture
                counts = np.bincount(labs, minlength=5).astype(np.float32)
                w = 1.0 / np.maximum(counts[labs], 1.0)
                events[k].append((coords, (w / w.mean()).astype(np.float32)))
            else:
                raise KeyError(k)
    write_events(path, events, spatial_size, data_dim)
    return path
