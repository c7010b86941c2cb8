"""Train/val core (reference: uresnet/trainval.py, SURVEY.md §2.4).

Same surface as the reference class: ``initialize()``, ``train_step(blob)``,
``forward(blob)``, ``save_state(iteration)``, ``restore_state(path)``.

TPU-native internals: one fused, jitted update (forward + backward + Adam) —
there is no separate "backward kernel launch" as on GPU; XLA compiles the
whole step into one program. Data-parallel sharding is applied by
:mod:`uresnet_pytorch_tpu.parallel` when more than one device is visible
(reference splits the batch into per-GPU minibatches manually; here a
jax.sharding Mesh shards the same batch arrays and XLA inserts the ICI
gradient allreduce).
"""

from __future__ import annotations

import glob
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.models import construct
from uresnet_pytorch_tpu.models.losses import segmentation_loss
from uresnet_pytorch_tpu.parallel import (
    batch_sharding, make_mesh, replicated_sharding)
from uresnet_pytorch_tpu.utils.checkpoint import (
    checkpoint_path, latest_checkpoint, restore_checkpoint, save_checkpoint)


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (512^3 programs take
    minutes to compile; a cold CLI inference run was measured 0.25 ev/s
    end-to-end purely from per-process recompiles). Off with
    URESNET_JAX_CACHE=0; directory override via URESNET_JAX_CACHE."""
    import os
    where = os.environ.get("URESNET_JAX_CACHE", "")
    if where == "0":
        return
    if not where:
        where = os.path.join(os.path.expanduser("~"), ".cache",
                             "uresnet_tpu_jax")
    try:
        os.makedirs(where, exist_ok=True)
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", where)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass   # cache is an optimization; never fail initialization on it


def _batch_from_blob(blob: Dict[str, np.ndarray], use_weight: bool) -> Dict[str, np.ndarray]:
    batch = {
        "coords": blob["coords"],
        "values": blob["values"],
        "n_voxels": blob["n_voxels"],
    }
    if "label" in blob:
        batch["label"] = blob["label"]
    if use_weight and "weight" in blob:
        batch["weight"] = blob["weight"]
    return batch


class TrainVal:
    def __init__(self, cfg: URESNetConfig, mesh=None):
        self.cfg = cfg
        self.model = None
        self.state: Optional[Dict[str, Any]] = None
        self.tx = None
        self._jit_train = None
        self._jit_forward = None
        self.mesh = mesh

    # ------------------------------------------------------------------
    def initialize(self) -> None:
        cfg = self.cfg
        _enable_compilation_cache()
        if self.mesh is None:
            # 1-D data mesh over all (or --gpus selected) devices; a
            # single-device mesh compiles to a plain single-chip program.
            # Without an explicit device selection, use the largest device
            # count that divides the batch (mirrors the reference's implicit
            # "batch splits across the GPUs you gave it", SURVEY.md §2.9).
            if cfg.gpus:
                self.mesh = make_mesh(device_ids=cfg.gpus)
            else:
                import jax as _jax
                n = len(_jax.devices())
                while cfg.batch_size % n:
                    n -= 1
                self.mesh = make_mesh(devices=_jax.devices()[:n])
        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by {n_dev} "
                f"devices (set -bs to a multiple, or -mbs per-device size)")
        if cfg.minibatch_size > 0 and cfg.minibatch_size * n_dev != cfg.batch_size:
            raise ValueError(
                f"minibatch_size*n_devices = {cfg.minibatch_size * n_dev} "
                f"!= batch_size {cfg.batch_size}")
        self.model = construct(cfg.model_name)(cfg)
        rng = jax.random.PRNGKey(cfg.seed)
        B = max(1, cfg.batch_size)
        dummy = (
            jnp.zeros((B, cfg.max_voxels, cfg.data_dim), jnp.int32),
            jnp.zeros((B, cfg.max_voxels), jnp.float32),
            jnp.ones((B,), jnp.int32),
        )
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            rng, *dummy, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.tx = optax.adam(cfg.learning_rate)
        self.state = {
            "step": jnp.zeros((), jnp.int32),
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
        }
        if cfg.model_path:
            self.restore_state(sorted(glob.glob(cfg.model_path))[-1]
                               if glob.glob(cfg.model_path) else cfg.model_path)
        elif cfg.resume:
            latest = latest_checkpoint(cfg.weight_prefix)
            if latest:
                self.restore_state(latest)
        self._build_steps()

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(train=train)
        mutable = ["batch_stats", "diag"] if train else ["diag"]
        logits, mut = self.model.apply(
            variables, batch["coords"], batch["values"], batch["n_voxels"],
            mutable=mutable, **kwargs)
        new_stats = mut["batch_stats"] if train else batch_stats
        metrics = segmentation_loss(
            logits, batch["label"], batch["n_voxels"],
            weights=batch.get("weight"), num_class=self.cfg.num_class,
            return_softmax=not train)
        # tile-engine health counters (main_funcs warns on report steps):
        # overflow = dropped correction pairs (corrupted halo values);
        # tile_spill/vox_spill = tiles/voxels dropped by capacity (zero
        # logits for those voxels)
        diag = mut.get("diag", {})
        zero = jnp.zeros((), jnp.int32)
        metrics["overflow"] = diag.get("overflow", zero)
        metrics["tile_spill"] = diag.get("tile_spill", zero)
        metrics["vox_spill"] = diag.get("vox_spill", zero)
        return metrics["loss"], (new_stats, metrics)

    def _build_steps(self) -> None:
        def train_step(state, batch):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (_, (new_stats, metrics)), grads = grad_fn(
                state["params"], state["batch_stats"], batch, True)
            updates, new_opt = self.tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_state = {
                "step": state["step"] + 1,
                "params": new_params,
                "batch_stats": new_stats,
                "opt_state": new_opt,
            }
            return new_state, metrics

        def forward_step(state, batch):
            _, (_, metrics) = self._loss_fn(
                state["params"], state["batch_stats"], batch, False)
            from uresnet_pytorch_tpu.models.losses import iou_counts
            # iou_counts only argmaxes, so softmax stands in for logits
            metrics.update(iou_counts(metrics["softmax"], batch["label"],
                                      batch["n_voxels"]))
            return metrics

        # pure (unjitted) step fns, used by the benchmark harness
        self.train_step_fn = train_step
        self.forward_step_fn = forward_step
        # Parameters/optimizer replicate; the batch shards events across the
        # 'data' mesh axis. XLA GSPMD derives the gradient allreduce (psum
        # over ICI) from these shardings (SURVEY.md §2.9, §5.8).
        rep = replicated_sharding(self.mesh)
        bsh = batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, rep)
        self._batch_sharding = bsh
        self._jit_train = jax.jit(
            train_step, donate_argnums=(0,),
            in_shardings=(rep, bsh), out_shardings=(rep, rep))
        self._jit_forward = jax.jit(
            forward_step, in_shardings=(rep, bsh))

    # ------------------------------------------------------------------
    def train_step(self, blob: Dict[str, np.ndarray]) -> Dict[str, Any]:
        batch = _batch_from_blob(blob, use_weight=bool(self.cfg.weight_key)
                                 or "weight" in blob)
        self.state, metrics = self._jit_train(self.state, batch)
        return metrics

    def forward(self, blob: Dict[str, np.ndarray]) -> Dict[str, Any]:
        batch = _batch_from_blob(blob, use_weight=bool(self.cfg.weight_key)
                                 or "weight" in blob)
        if "label" not in batch:  # pure inference without labels
            batch["label"] = np.zeros(blob["values"].shape, np.int32)
        return self._jit_forward(self.state, batch)

    # ------------------------------------------------------------------
    @property
    def global_step(self) -> int:
        return int(self.state["step"])

    def save_state(self, iteration: int) -> str:
        path = checkpoint_path(self.cfg.weight_prefix, iteration)
        # multi-host: params/opt-state replicate, so only process 0 writes
        # (docs/distributed.md); every process still computes the path so
        # restore/--resume is identical everywhere
        if jax.process_index() == 0:
            save_checkpoint(path, self.state)
        return path

    def restore_state(self, path: str) -> None:
        self.state = restore_checkpoint(path, self.state)
