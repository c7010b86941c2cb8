"""Typed configuration for the TPU-native U-ResNet stack.

Mirrors the reference's flag surface (SURVEY.md §2.2, expected at
``uresnet/flags.py`` in the public repo) as a frozen dataclass. The CLI in
:mod:`uresnet_pytorch_tpu.flags` parses the same flag names and produces one
of these; library users construct it directly.

Unlike the reference's UPPERCASE-attribute argparse object, this is a plain
typed dataclass — but :class:`URESNetConfig` also answers UPPERCASE attribute
access (``cfg.BATCH_SIZE``) for drop-in familiarity.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class URESNetConfig:
    # ---- model (reference: uresnet/flags.py --model-name etc.) ----
    model_name: str = "uresnet_sparse"  # {uresnet_sparse, uresnet_dense}
    num_class: int = 5                  # 5 LArTPC particle classes
    uresnet_filters: int = 16           # base filter count m
    uresnet_num_strides: int = 5        # resolution levels S
    spatial_size: int = 192             # cube/square edge (power of two preferred)
    data_dim: int = 3                   # 2 or 3
    reps: int = 2                       # residual blocks per level
    # width ramp: reference SCN UNet uses linear nPlanes = m*(i+1) (SURVEY §2.5)
    width_ramp: str = "linear"          # {linear, geometric}
    leaky_relu_slope: float = 0.0       # SCN BatchNormLeakyReLU default 0 => ReLU-like; see models/
    bn_momentum: float = 0.9            # torch BN momentum 0.1 => decay 0.9 in flax convention
    bn_eps: float = 1e-4                # SCN BatchNormalization default eps=1e-4
    input_merge_mode: str = "sum"       # InputLayer duplicate-coordinate merge: {sum, mean, max, last}

    # ---- sparse capacity (TPU static shapes; no reference analog) ----
    max_voxels: int = 0                 # per-event active-site capacity at level 0; 0 => auto
    capacity_factor: float = 1.0        # cap[l+1] = cap[l] * factor (<=1.0 always safe)
    min_level_capacity: int = 256       # floor so deep levels keep MXU-friendly tiles
    # multiplier on every exact-correction-list budget (halo specs, link
    # child/parent specs, monotone-lookup scratch). 0 = auto: scale each
    # level linearly with its voxel capacity over the 131072 (512^3 /
    # ~1e5-voxel) baseline the fixed budgets were validated at — the
    # 768^3 scale audit measured 19980 silently dropped pairs/batch with
    # the unscaled budgets (benchmarks/scale_audit.py; VERDICT r4 #5).
    # <= 512^3 configs resolve to 1x everywhere: bit-identical programs.
    corr_scale: int = 0

    # ---- sparse engine selection (TPU-native; see docs/ARCHITECTURE.md) ----
    sparse_engine: str = "tile"         # {tile, gather}: tiled-dense MXU engine
    #                                     vs row-gather oracle/fallback
    tile_size: int = 4                  # tile edge t (power of two)
    # capacity divisor: tile capacity = level voxel capacity / this.
    # Measured on synthetic LArTPC tracks at 512^3/t=4: 4.8-6.1 voxels per
    # occupied tile, so 4.5 leaves ~1.2-1.8x headroom (was 3.0 when relay
    # closure inflated tile sets). Tiles beyond capacity are dropped AND
    # counted: graph_spills / the tile_spill+vox_spill TrainVal metrics
    # surface them per step, main_funcs warns (ops/tile_graph.py).
    tile_occupancy: float = 4.5
    # optional PER-LEVEL tile edge schedule (len == uresnet_num_strides),
    # e.g. (4, 2, 2, 2, 2). t may stay or HALVE from one level to the
    # next: a halving transition keeps the parent TILE GRID (spatial and
    # t both halve -> same grid) so the down/up links are identities and
    # the level inherits the parent's tile set with 8x fewer cells —
    # denser tiles where per-tile occupancy is worst
    # (ops/tile_graph.build_tile_graph's t_c*2 == t_l branch).
    # None => tile_size at every level (clamped to level spatial size).
    tile_sizes: Optional[Tuple[int, ...]] = None
    # optional per-level occupancy divisors matching tile_sizes. None =>
    # tile_occupancy scaled by t_l/t_0 (track-like events cross ~t cells
    # per tile, so voxels-per-occupied-tile scales ~linearly with t).
    tile_occupancies: Optional[Tuple[float, ...]] = None
    min_tiles: int = 64                 # floor on per-level tile capacity
    # training rematerialization: "stage" checkpoints whole encoder/decoder
    # stages (least memory; backward re-runs each stage's convs);
    # "stage_dots" additionally SAVES the conv-kernel outputs so backward
    # re-runs only elementwise glue (more memory than "stage", far less
    # than "none" — measured 34G at 512^3 batch 4); "none" saves everything
    remat_mode: str = "stage"    # {stage, stage_dots, stage_dots_deep, none}

    # ---- io (reference: --io-type/-io etc.) ----
    io_type: str = "h5"                 # {h5, larcv_sparse, larcv_dense, synthetic}
    input_file: Tuple[str, ...] = ()
    output_file: str = ""
    data_keys: Tuple[str, ...] = ("data", "label")  # optional 3rd key = per-voxel weight
    batch_size: int = 1
    minibatch_size: int = -1            # per-device slice; -1 => batch_size / n_devices
    shuffle: bool = True
    limit_num_files: int = 0
    num_threads: int = 1                # prefetch threads
    prefetch_depth: int = 2

    # ---- train (reference: --learning-rate etc.) ----
    train: bool = True
    learning_rate: float = 0.001
    iteration: int = 10000
    report_step: int = 1
    checkpoint_step: int = 500
    weight_prefix: str = "./weights/snapshot"
    log_dir: str = "./log"
    seed: int = 0
    weight_key: str = ""                # non-empty => per-voxel loss weighting from this blob key

    # ---- restore / inference ----
    model_path: str = ""                # checkpoint path or glob (inference sweeps the glob)
    gpus: Tuple[int, ...] = ()          # reference flag name kept; selects jax devices
    resume: bool = False                # auto-discover latest checkpoint under weight_prefix

    # ---- precision / performance (TPU-native additions) ----
    compute_dtype: str = "bfloat16"     # matmul/conv compute dtype
    param_dtype: str = "float32"
    profile_dir: str = ""               # non-empty => jax.profiler traces here

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.data_dim not in (2, 3):
            raise ValueError(f"data_dim must be 2 or 3, got {self.data_dim}")
        if self.model_name not in ("uresnet_sparse", "uresnet_dense"):
            raise ValueError(f"unknown model_name {self.model_name!r}")
        if self.remat_mode not in ("stage", "stage_dots",
                                   "stage_dots_deep", "none"):
            raise ValueError(f"unknown remat_mode {self.remat_mode!r}")
        if self.width_ramp not in ("linear", "geometric"):
            raise ValueError(f"unknown width_ramp {self.width_ramp!r}")
        if self.input_merge_mode not in ("sum", "mean", "max", "last"):
            raise ValueError(f"unknown input_merge_mode {self.input_merge_mode!r}")
        if self.spatial_size & (self.spatial_size - 1):
            # the reference accepts any edge (192 is its common default —
            # SURVEY.md §2.2); the tile/fold engines need a power-of-two
            # grid, and coords < spatial_size always fit the padded one
            rounded = 1 << (self.spatial_size - 1).bit_length()
            import warnings
            warnings.warn(
                f"spatial_size {self.spatial_size} is not a power of two; "
                f"padding the compute grid to {rounded} (voxel coordinates "
                "are unchanged)", stacklevel=2)
            object.__setattr__(self, "spatial_size", rounded)
        if self.uresnet_num_strides < 1:
            raise ValueError("uresnet_num_strides must be >= 1")
        if (self.spatial_size >> (self.uresnet_num_strides - 1)) < 1:
            raise ValueError("too many strides for spatial_size")
        if self.sparse_engine not in ("tile", "gather"):
            raise ValueError(f"unknown sparse_engine {self.sparse_engine!r}")
        if self.tile_size & (self.tile_size - 1) or self.tile_size < 2:
            raise ValueError("tile_size must be a power of two >= 2")
        if self.tile_sizes is not None:
            ts = tuple(int(t) for t in self.tile_sizes)
            if len(ts) != self.uresnet_num_strides:
                raise ValueError("tile_sizes must have one entry per level")
            for i, t in enumerate(ts):
                if t & (t - 1) or t < 2:
                    raise ValueError("tile_sizes entries must be powers of "
                                     "two >= 2")
                if i and ts[i] not in (ts[i - 1], ts[i - 1] // 2):
                    raise ValueError(
                        "tile_sizes may only stay or halve between levels "
                        f"(got {ts[i - 1]} -> {ts[i]} at level {i})")
            object.__setattr__(self, "tile_sizes", ts)
        if self.tile_occupancies is not None:
            to = tuple(float(o) for o in self.tile_occupancies)
            if len(to) != self.uresnet_num_strides:
                raise ValueError(
                    "tile_occupancies must have one entry per level")
            object.__setattr__(self, "tile_occupancies", to)
        if (self.sparse_engine == "tile"
                and (self.spatial_size >> (self.uresnet_num_strides - 1)) < 2):
            raise ValueError(
                "tile engine needs spatial_size >= 2 at the deepest level; "
                "reduce uresnet_num_strides or use sparse_engine='gather'")
        if self.max_voxels == 0:
            # Auto capacity: enough for typical LArTPC occupancy (~1e5 at 512^3),
            # scaled by volume, MXU-aligned, never below the floor.
            frac = 1e5 / float(512 ** 3)
            auto = int(frac * self.spatial_size ** self.data_dim * 2)
            object.__setattr__(
                self, "max_voxels",
                max(self.min_level_capacity, _round_up(auto, 128)))

    # UPPERCASE attribute access for reference-flag familiarity.
    def __getattr__(self, name: str):
        if name.isupper():
            try:
                return object.__getattribute__(self, name.lower())
            except AttributeError:
                pass
        raise AttributeError(name)

    # ---- derived quantities ----
    @property
    def dim(self) -> int:
        return self.data_dim

    @property
    def n_planes(self) -> Tuple[int, ...]:
        m, s = self.uresnet_filters, self.uresnet_num_strides
        if self.width_ramp == "linear":
            return tuple(m * (i + 1) for i in range(s))
        return tuple(m * (2 ** i) for i in range(s))

    @property
    def axis_bits(self) -> int:
        return max(1, int(math.ceil(math.log2(self.spatial_size))))

    def level_spatial_size(self, level: int) -> int:
        return max(1, self.spatial_size >> level)

    def tile_occupancy_at(self, level: int) -> float:
        """Capacity divisor (voxels per occupied tile) at `level`. With a
        per-level tile_sizes schedule and no explicit tile_occupancies,
        scales tile_occupancy linearly with the tile edge (see field
        comments). Global-t configs return tile_occupancy unchanged so
        existing programs stay bit-identical."""
        if self.tile_occupancies is not None:
            return self.tile_occupancies[level]
        if self.tile_sizes is None:
            return self.tile_occupancy
        return max(1.0, self.tile_occupancy
                   * self.tile_sizes[level] / self.tile_sizes[0])

    def corr_scale_at(self, level: int) -> int:
        """Correction-budget multiplier for `level` (see corr_scale)."""
        if self.corr_scale:
            return self.corr_scale
        return max(1, -(-self.level_capacity(level) // 131072))

    def level_capacity(self, level: int) -> int:
        """Static active-site capacity (padded rows) at resolution `level`."""
        cap = self.max_voxels * (self.capacity_factor ** level)
        cap = max(self.min_level_capacity, int(cap))
        # never exceed the number of cells at this level
        cells = self.level_spatial_size(level) ** self.data_dim
        return _round_up(min(cap, cells), 8)

    def replace(self, **kw) -> "URESNetConfig":
        return dataclasses.replace(self, **kw)
