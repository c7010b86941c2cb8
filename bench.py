#!/usr/bin/env python
"""Headline benchmark — BASELINE.json config 3: sparse submanifold U-ResNet
inference on 512^3 sparse LArTPC events (~1e5 active voxels), events/sec on
one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), and no
GPU is attached here; the denominator is the north-star's H100-SparseConvNet
anchor estimated at 100 events/s/chip for this workload (BASELINE.md context:
V100-era ~15-30 ev/s for this code lineage; H100 ≈ 3-5x V100). The ≥5x
north-star target therefore corresponds to vs_baseline >= 5.0.

Env knobs: BENCH_BATCH (default 4), BENCH_ITERS (default 16),
BENCH_VOXELS (default 100000), BENCH_SMOKE=1 shrinks everything (CI).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H100_SCN_EVENTS_PER_SEC = 100.0  # documented anchor, see module docstring


def main():
    import jax
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.models import construct

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    batch = int(os.environ.get("BENCH_BATCH", 2 if smoke else 4))
    iters = int(os.environ.get("BENCH_ITERS", 3 if smoke else 16))
    n_vox = int(os.environ.get("BENCH_VOXELS", 2000 if smoke else 100_000))
    spatial = 64 if smoke else 512

    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=spatial, data_dim=3, reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(n_vox * 1.3)))),
        capacity_factor=1.0, batch_size=batch, compute_dtype="bfloat16")

    # synthetic 512^3 events with ~n_vox active voxels
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    coords = np.zeros((batch, cfg.max_voxels, 3), np.int32)
    values = np.zeros((batch, cfg.max_voxels), np.float32)
    n_voxels = np.zeros((batch,), np.int32)
    for b in range(batch):
        c, v, _ = generate_event(0, b, spatial, 3,
                                 mean_voxels=n_vox)
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], n_voxels[b] = c[:n], v[:n], n

    model = construct(cfg.model_name)(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), coords, values, n_voxels, train=False)

    @jax.jit
    def fwd(variables, coords, values, n_voxels):
        return model.apply(variables, coords, values, n_voxels, train=False)

    args = jax.device_put((variables, jax.numpy.asarray(coords),
                           jax.numpy.asarray(values),
                           jax.numpy.asarray(n_voxels)))
    fwd(*args).block_until_ready()  # compile + warmup
    fwd(*args).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ev_per_sec = iters * batch / dt

    print(json.dumps({
        "metric": "sparse_uresnet_inference_512c_events_per_sec_per_chip",
        "value": round(ev_per_sec, 3),
        "unit": "events/s",
        "vs_baseline": round(ev_per_sec / H100_SCN_EVENTS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
