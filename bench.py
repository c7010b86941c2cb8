#!/usr/bin/env python
"""Headline benchmark — BASELINE.json config 3: sparse submanifold U-ResNet
inference on 512^3 sparse LArTPC events (~1e5 active voxels), events/sec on
one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing method: on this tunneled TPU platform `block_until_ready` does not
reliably block, so the forward pass runs inside a jitted `lax.fori_loop`
(iterations chained through a data dependency) and the wall clock is anchored
on fetching a scalar to host. Per-event time = slope between an N1-iteration
and an N2-iteration run, cancelling the constant dispatch+fetch overhead
(~28 ms measured).

vs_baseline: the reference repo publishes no numbers (BASELINE.md) and no GPU
is attached here; the denominator anchors H100-SparseConvNet at 100 events/s
for this workload (BASELINE.md: V100-era ~15-30 ev/s for this code lineage;
H100 ≈ 3-5x V100). The ≥5x north-star target is vs_baseline >= 5.0.

Env knobs: BENCH_BATCH (default 4), BENCH_VOXELS (default 100000),
BENCH_SMOKE=1 shrinks everything, BENCH_CONFIG selects other BASELINE
configs (see benchmarks/run_all.py for the full suite).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H100_SCN_EVENTS_PER_SEC = 100.0  # documented anchor, see module docstring


def timed_loop(step_fn, args_template, n1=1, n2=5):
    """Per-iteration seconds via two chained fori_loop runs (see module
    docstring). step_fn(carry, i) -> scalar contribution; here we wrap a
    model forward whose output feeds the next iteration's input."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(vr, c, v, nv, eps, n):
        # dynamic trip count: ONE compilation serves both calibration points
        def body(i, carry):
            v2, acc = carry
            out = step_fn(vr, c, v2, nv)
            s = (out.astype(jnp.float32).sum() * eps)
            return (v2 + s, acc + s)
        _, acc = jax.lax.fori_loop(0, n, body, (v, jnp.float32(0.0)))
        return acc

    eps = np.float32(1e-30)
    times = {}
    for n in (n1, n2):
        np.asarray(f(*args_template, eps, n))  # compile (first) + warm
        t0 = time.perf_counter()
        np.asarray(f(*args_template, eps, n))
        times[n] = time.perf_counter() - t0
    return max(times[n2] - times[n1], 1e-9) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.trainval import _enable_compilation_cache
    _enable_compilation_cache()   # 512^3 programs compile for minutes;
    #                               persist them across bench invocations
    from uresnet_pytorch_tpu.models import construct
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    # batch 8 became the sweet spot once the fused halo+conv kernel removed
    # the ext arrays (r3 sweep: b4=4.94, b8=5.66, b8+group_win_mult3=6.00
    # ev/s; the r2-era b8 rematerializer collapse no longer reproduces)
    batch = int(os.environ.get("BENCH_BATCH", 2 if smoke else 8))
    n_vox = int(os.environ.get("BENCH_VOXELS", 2000 if smoke else 100_000))
    spatial = int(os.environ.get("BENCH_SPATIAL", 64 if smoke else 512))

    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=spatial, data_dim=3, reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(n_vox * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048 if not smoke else 64,
        tile_size=int(os.environ.get("BENCH_TILE", 4)),
        tile_occupancy=float(os.environ.get("BENCH_TILE_OCC", 4.5)),
        # per-level schedule (config.tile_sizes). Default at the full
        # 512^3/5-stride shape is the measured-best [4,2,2,2,2]
        # (13.65 ev/s vs global-4's 10.17, r5 on-chip A/B); explicit
        # BENCH_TILE or BENCH_TILE_SIZES overrides.
        tile_sizes=tuple(
            int(s) for s in os.environ["BENCH_TILE_SIZES"].split(","))
        if os.environ.get("BENCH_TILE_SIZES")
        else ((4, 2, 2, 2, 2) if not smoke
              and "BENCH_TILE" not in os.environ else None),
        batch_size=batch, compute_dtype="bfloat16")

    coords = np.zeros((batch, cfg.max_voxels, 3), np.int32)
    values = np.zeros((batch, cfg.max_voxels), np.float32)
    n_voxels = np.zeros((batch,), np.int32)
    for b in range(batch):
        # generator dedupe eats ~35%: inflate the target to land near n_vox
        c, v, _ = generate_event(0, b, spatial, 3,
                                 mean_voxels=int(n_vox * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], n_voxels[b] = c[:n], v[:n], n

    model = construct(cfg.model_name)(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), coords, values, n_voxels, train=False)

    def fwd(vr, c, v, nv):
        return model.apply(vr, c, v, nv, train=False)

    args = jax.device_put((variables, jnp.asarray(coords),
                           jnp.asarray(values), jnp.asarray(n_voxels)))
    sec_per_batch = timed_loop(fwd, args, n1=1, n2=3 if smoke else 5)
    ev_per_sec = batch / sec_per_batch

    print(json.dumps({
        "metric": "sparse_uresnet_inference_512c_events_per_sec_per_chip",
        "value": round(ev_per_sec, 3),
        "unit": "events/s",
        "vs_baseline": round(ev_per_sec / H100_SCN_EVENTS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
