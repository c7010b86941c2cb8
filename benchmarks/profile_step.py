"""Profile one bench-scale forward step and print the top TPU ops.

Runs the headline config's jitted forward under jax.profiler, then parses
the perfetto trace for device-side op durations — the ground-truth
breakdown the slope timers cannot give.

Usage: python benchmarks/profile_step.py [--train] [--batch 8]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--voxels", type=int, default=100_000)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.models import construct
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.trainval import _enable_compilation_cache
    _enable_compilation_cache()

    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=512, data_dim=3, reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(args.voxels * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048,
        batch_size=args.batch, compute_dtype="bfloat16")
    B = args.batch
    coords = np.zeros((B, cfg.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    labels = np.zeros((B, cfg.max_voxels), np.int32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, l = generate_event(0, b, 512, 3, int(args.voxels * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], labels[b, :n], nv[b] = \
            c[:n], v[:n], l[:n], n

    model = construct(cfg.model_name)(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), coords, values, nv, train=False)

    if args.train:
        from uresnet_pytorch_tpu.models.losses import segmentation_loss

        def step(vr, c, v, nv, lb):
            def loss_fn(params):
                logits, _ = model.apply(
                    {"params": params,
                     "batch_stats": vr.get("batch_stats", {})},
                    c, v, nv, train=True, mutable=["batch_stats", "diag"])
                return segmentation_loss(logits, lb, nv, weights=None,
                                         num_class=5)["loss"]
            return jax.grad(loss_fn)(vr["params"])
        fn = jax.jit(step)
        call = lambda: fn(variables, coords, values, nv, labels)
    else:
        fn = jax.jit(lambda vr, c, v, nv: model.apply(vr, c, v, nv,
                                                      train=False))
        call = lambda: fn(variables, coords, values, nv)

    out = jax.block_until_ready(call())   # compile + warm
    out = jax.block_until_ready(call())

    logdir = "/tmp/jaxprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = jax.block_until_ready(call())

    # parse perfetto trace
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES FOUND under", logdir)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU op track(s): pick pids whose process name mentions TPU/device
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        # skip steps/traceme aggregates heuristically: keep XLA op events
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[name] += dur
        cnt_by_name[name] += 1
        total += dur
    print(f"trace: {paths[0]}")
    print(f"total device op time (3 steps): {total:.1f} ms "
          f"-> {total / 3:.1f} ms/step")
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:args.top]
    for name, d in rows:
        print(f"{d / 3:9.3f} ms/step  x{cnt_by_name[name] // 3:4d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
