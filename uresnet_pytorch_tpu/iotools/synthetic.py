"""Synthetic LArTPC-like event generator.

Produces sparse voxel events resembling liquid-argon TPC particle images:
straight ionisation tracks (HIP/MIP), diffuse electromagnetic showers, delta
rays branching off tracks, and Michel electrons at track ends. Used as the
test/benchmark fixture in place of real LArCV files (SURVEY.md §4.5) — the
reference ships no data either.

Deterministic per (seed, event_index).

Class convention (5 classes, matching the code-family's LArTPC semantics,
SURVEY.md §2.2): 0=HIP, 1=MIP, 2=shower, 3=delta, 4=Michel.
"""

from __future__ import annotations

import numpy as np
from typing import Tuple


def _track(rng, size, n_pts, width, jitter=0.4):
    """Straight track: points along a random chord through the volume."""
    a = rng.uniform(0.1 * size, 0.9 * size, 3)
    direction = rng.normal(size=3)
    direction /= np.linalg.norm(direction) + 1e-9
    t = np.linspace(0.0, rng.uniform(0.3, 0.9) * size, n_pts)
    pts = a[None, :] + t[:, None] * direction[None, :]
    pts = pts + rng.normal(scale=jitter * width, size=pts.shape)
    return pts


def _shower(rng, size, n_pts):
    """EM shower: branching random walk forming a diffuse cone."""
    apex = rng.uniform(0.2 * size, 0.8 * size, 3)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis) + 1e-9
    t = rng.uniform(0.0, 0.35 * size, n_pts)
    spread = 0.08 + 0.25 * t / (0.35 * size + 1e-9)
    perp = rng.normal(size=(n_pts, 3)) * (spread * t)[:, None] * 0.5
    return apex[None, :] + t[:, None] * axis[None, :] + perp


def _blob(rng, center, n_pts, scale):
    return center[None, :] + rng.normal(scale=scale, size=(n_pts, 3))


def generate_event(seed: int, index: int, spatial_size: int, data_dim: int = 3,
                   mean_voxels: int = 2048) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate one event.

    Returns (coords int32 (N, dim), values float32 (N,), labels int32 (N,))
    with unique coordinates, N >= 1.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, index]))
    size = spatial_size
    budget = max(32, int(rng.poisson(mean_voxels)))
    pts_list, val_list, lab_list = [], [], []

    def add(pts, label, dedx):
        vals = rng.gamma(2.0, dedx / 2.0, len(pts)).astype(np.float32)
        pts_list.append(pts)
        val_list.append(vals)
        lab_list.append(np.full(len(pts), label, dtype=np.int32))

    # event size scales with the voxel budget
    scale = max(0.05, budget / 2048.0)
    n_tracks = int(rng.integers(1, 4))
    for _ in range(n_tracks):
        # MIP (long, thin, ~2 MeV/cm) or HIP (short, dense)
        if rng.random() < 0.5:
            n = max(8, int(rng.integers(50, 400) * scale))
            pts = _track(rng, size, n, width=1.0)
            add(pts, 1, dedx=2.0)  # MIP
            if rng.random() < 0.5:  # Michel at the end
                m = max(4, int(rng.integers(10, 60) * scale))
                add(_track(rng, size, m, width=1.5, jitter=1.5) * 0.15
                    + pts[-1][None, :] * 0.85, 4, dedx=2.5)
            if rng.random() < 0.5:  # delta ray off the track
                k = max(3, int(rng.integers(5, 30) * scale))
                origin = pts[rng.integers(0, len(pts))]
                add(_blob(rng, origin, k, scale=3.0), 3, dedx=1.5)
        else:
            n = max(6, int(rng.integers(20, 120) * scale))
            add(_track(rng, size, n, width=1.2), 0, dedx=8.0)  # HIP
    n_showers = int(rng.integers(0, 3))
    for _ in range(n_showers):
        n = max(16, int(rng.integers(100, max(101, mean_voxels)) * scale))
        add(_shower(rng, size, n), 2, dedx=1.2)

    pts = np.concatenate(pts_list, axis=0)
    vals = np.concatenate(val_list, axis=0)
    labs = np.concatenate(lab_list, axis=0)

    coords = np.clip(np.round(pts), 0, size - 1).astype(np.int32)
    if data_dim == 2:
        coords = coords[:, :2]

    # dedupe voxels (sum values, keep label of the max-value hit)
    dim = coords.shape[1]
    keys = np.zeros(len(coords), dtype=np.int64)
    for d in range(dim):
        keys = keys * size + coords[:, d]
    order = np.argsort(keys, kind="stable")
    keys, coords, vals, labs = keys[order], coords[order], vals[order], labs[order]
    uniq, inv = np.unique(keys, return_inverse=True)
    out_vals = np.zeros(len(uniq), np.float32)
    np.add.at(out_vals, inv, vals)
    # label: hit with max value wins within each voxel
    best = np.full(len(uniq), -1.0, np.float32)
    out_labs = np.zeros(len(uniq), np.int32)
    for i in range(len(coords)):  # N is a few thousand; fine on host
        j = inv[i]
        if vals[i] > best[j]:
            best[j] = vals[i]
            out_labs[j] = labs[i]
    first = np.searchsorted(keys, uniq)
    return coords[first], out_vals, out_labs
