"""Driver loops (reference: uresnet/main_funcs.py, SURVEY.md §2.3, §3.1-3.2).

CSV schema keeps the reference's columns (iter, epoch, loss, accuracy,
titer/tio/tforward/tbackward/tsave, lr — SURVEY.md §5.5) for easy diffing.
On TPU forward+backward+update fuse into one XLA program, so ``tforward``
carries the whole fused device step and ``tbackward`` is 0 by construction.
"""

from __future__ import annotations

import glob
import os
import sys
import time
from typing import Optional

import numpy as np

from uresnet_pytorch_tpu.config import URESNetConfig
from uresnet_pytorch_tpu.iotools import io_factory
from uresnet_pytorch_tpu.trainval import TrainVal
from uresnet_pytorch_tpu.utils import CSVData, StopWatch


def _maybe_start_profiler(cfg: URESNetConfig):
    if cfg.profile_dir:
        import jax
        jax.profiler.start_trace(cfg.profile_dir)
        return lambda: jax.profiler.stop_trace()
    return lambda: None


def train(cfg: URESNetConfig, io=None) -> TrainVal:
    import jax
    io = io or io_factory(cfg)
    tv = TrainVal(cfg)
    io.initialize()
    tv.initialize()
    os.makedirs(cfg.log_dir, exist_ok=True)
    csv = CSVData(os.path.join(cfg.log_dir, "train_log.csv"))
    watch = StopWatch()
    stop_profiler = _maybe_start_profiler(cfg)
    epoch_per_iter = cfg.batch_size / max(1, len(io))
    start_step = tv.global_step
    try:
        for it in range(start_step, cfg.iteration):
            watch.start("iter")
            watch.start("io")
            blob = io.next()
            tio = watch.stop("io")
            watch.start("forward")
            metrics = tv.train_step(blob)
            report = cfg.report_step > 0 and (it + 1) % cfg.report_step == 0
            if report:
                # fetch scalars only on report steps; off-step iterations
                # stay fully asynchronous on device
                loss = float(metrics["loss"])
                acc = float(metrics["accuracy"])
                overflow = int(metrics.get("overflow", 0))
                tile_spill = int(metrics.get("tile_spill", 0))
                vox_spill = int(metrics.get("vox_spill", 0))
                if overflow:
                    print(f"WARNING: iter {it + 1}: {overflow} halo pairs "
                          "exceeded the correction capacity and were DROPPED "
                          "(corrupted halo values) — raise "
                          "ops/halo.HALO_CORR_CAP (halo specs; the usual "
                          "culprit) or ops/tile_graph.CORR_CAP (up/down link "
                          "specs), or reduce event density",
                          file=sys.stderr, flush=True)
                if tile_spill:
                    print(f"WARNING: iter {it + 1}: {tile_spill} tiles "
                          f"({vox_spill} input voxels) exceeded the tile "
                          "capacity and were DROPPED (zero logits for those "
                          "voxels) — raise tile_occupancy headroom / "
                          "capacity_factor or reduce event density",
                          file=sys.stderr, flush=True)
            tfwd = watch.stop("forward")
            tsave = 0.0
            if cfg.checkpoint_step > 0 and (it + 1) % cfg.checkpoint_step == 0:
                watch.start("save")
                tv.save_state(it + 1)
                tsave = watch.stop("save")
            titer = watch.stop("iter")
            if report:
                # reference columns first (schema continuity, SURVEY.md §5.5);
                # 'overflow' appended as a TPU-engine health column
                csv.record(
                    ["iter", "epoch", "loss", "accuracy", "titer", "tio",
                     "tforward", "tbackward", "tsave", "lr", "overflow",
                     "tile_spill"],
                    [it + 1, (it + 1) * epoch_per_iter, loss, acc, titer, tio,
                     tfwd, 0.0, tsave, cfg.learning_rate, overflow,
                     tile_spill])
                csv.write()
                csv.flush()
                print(f"iter {it + 1}/{cfg.iteration} epoch "
                      f"{(it + 1) * epoch_per_iter:.3f} loss {loss:.4f} "
                      f"acc {acc:.4f} titer {titer:.3f}s (io {tio:.3f}s)",
                      flush=True)
        if cfg.checkpoint_step > 0 and cfg.iteration % cfg.checkpoint_step != 0:
            tv.save_state(cfg.iteration)
    finally:
        stop_profiler()
        csv.close()
        io.finalize()
    return tv


def inference(cfg: URESNetConfig, io=None) -> dict:
    io = io or io_factory(cfg)
    tv = TrainVal(cfg.replace(train=False, model_path=""))
    io.initialize()
    tv.initialize()
    os.makedirs(cfg.log_dir, exist_ok=True)
    csv = CSVData(os.path.join(cfg.log_dir, "inference_log.csv"))
    ckpts = sorted(glob.glob(cfg.model_path)) if cfg.model_path else [None]
    if cfg.model_path and not ckpts:
        raise FileNotFoundError(f"no checkpoint matches {cfg.model_path!r}")
    n_iters = max(1, len(io) // cfg.batch_size)
    last_summary = {}
    try:
        for ckpt in ckpts:
            if ckpt is not None:
                tv.restore_state(ckpt)
            # metrics accumulate ON DEVICE (tiny async adds); the single
            # host fetch below is the only device sync of the whole pass —
            # per-batch float() syncs capped throughput once the step got
            # fast. Softmax is only pulled when predictions are written.
            import jax
            acc = None
            t0 = time.perf_counter()
            for it in range(n_iters):
                blob = io.next()
                res = tv.forward(blob)
                upd = {
                    "loss": res["loss"], "accuracy": res["accuracy"],
                    "cls_correct": res["per_class_accuracy"] * res["class_count"],
                    "cls_count": res["class_count"],
                    "inter": res["intersection"], "union": res["union"],
                }
                acc = upd if acc is None else jax.tree_util.tree_map(
                    lambda a, b: a + b, acc, upd)
                if cfg.output_file:
                    io.store_segment(blob["index"], blob,
                                     np.asarray(res["softmax"]))
                if it == 0:
                    # fence batch 0 (tiny fetch — block_until_ready is not
                    # reliable on the tunneled platform) and restart the
                    # clock: the reported rate is STEADY-STATE, excluding
                    # the first batch's XLA compile (minutes at 512^3)
                    np.asarray(res["loss"])
                    t0 = time.perf_counter()
            # fetch = the honest completion fence (inside the timing window)
            acc = jax.tree_util.tree_map(np.asarray, acc)
            dt = time.perf_counter() - t0
            rate_iters = max(n_iters - 1, 1)
            tot_loss, tot_acc = float(acc["loss"]), float(acc["accuracy"])
            cls_count = acc["cls_count"]
            inter, union = acc["inter"], acc["union"]
            per_class = acc["cls_correct"] / np.maximum(cls_count, 1.0)
            iou = inter / np.maximum(union, 1.0)
            miou = float(iou[cls_count > 0].mean()) if (cls_count > 0).any() else 0.0
            row_keys = (["ckpt", "loss", "accuracy", "miou",
                         "events_per_sec"] +
                        [f"acc_class{c}" for c in range(cfg.num_class)] +
                        [f"iou_class{c}" for c in range(cfg.num_class)])
            row_vals = ([os.path.basename(ckpt) if ckpt else "none",
                         tot_loss / n_iters, tot_acc / n_iters, miou,
                         rate_iters * cfg.batch_size / dt] + list(per_class)
                        + list(iou))
            csv.record(row_keys, row_vals)
            csv.write()
            csv.flush()
            last_summary = dict(zip(row_keys, row_vals))
            print(f"inference {last_summary['ckpt']}: loss "
                  f"{last_summary['loss']:.4f} acc {last_summary['accuracy']:.4f} "
                  f"({last_summary['events_per_sec']:.2f} ev/s)", flush=True)
    finally:
        csv.close()
        io.finalize()
    return last_summary


def iotest(cfg: URESNetConfig, io=None) -> float:
    """Loader-only throughput test (reference iotest mode, SURVEY.md §2.3)."""
    io = io or io_factory(cfg)
    io.initialize()
    n = max(1, cfg.iteration)
    try:
        io.next()  # warmup / thread spin-up
        t0 = time.perf_counter()
        for _ in range(n):
            blob = io.next()
        dt = time.perf_counter() - t0
    finally:
        io.finalize()
    eps = n * cfg.batch_size / dt
    print(f"iotest: {n} batches, {eps:.1f} events/s", flush=True)
    return eps
