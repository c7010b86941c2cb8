"""Micro-benchmarks for the tile-engine hot ops on the real TPU chip.

Times the parts of one L0-scale submanifold conv (the step's dominant cost)
plus primitive costs (copy bandwidth, conv/matmul formulations at our
shapes), so kernel-design decisions are measured, not guessed.

The axon tunnel's block_until_ready is unreliable (see utils/benchmark.py),
so every timing uses the fori_loop slope method: run the op N times inside
one jitted loop with data dependencies, fetch a scalar, time the slope.

Usage: python benchmarks/micro.py [--scale small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, args, iters=24, warmup=True):
    """Per-iteration seconds of fn(*args), measured as the slope between an
    n=1 and an n=iters jitted fori_loop run (cancels the ~25 ms tunnel
    dispatch+fetch overhead).

    CRITICAL: the loop must carry the ARRAYS themselves (each iteration's
    inputs = previous inputs + tiny function-of-output). A scalar-eps
    perturbation is NOT enough: XLA splits linear ops like conv(x + eps)
    into a hoisted conv(x) plus scalar terms, and the whole loop measures
    nothing (bench.py uses the same array-carry recipe)."""
    flat, treedef = jax.tree_util.tree_flatten(args)
    is_float = [jnp.issubdtype(x.dtype, jnp.floating) for x in flat]

    @jax.jit
    def loop(n, *flat_args):
        def body(i, carry):
            fl = list(carry)
            out = fn(*jax.tree_util.tree_unflatten(treedef, fl))
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l[(0,) * (l.ndim - 1)][..., :1]
                            .astype(jnp.float32)) for l in leaves) * 1e-30
            fl = [x + s.astype(x.dtype) if f else x
                  for x, f in zip(fl, is_float)]
            return tuple(fl)
        final = jax.lax.fori_loop(0, n, body, tuple(flat_args))
        ff = [x for x, f in zip(final, is_float) if f][0]
        return jnp.sum(ff[(0,) * (ff.ndim - 1)][..., :1].astype(jnp.float32))

    if warmup:
        float(loop(1, *flat))  # compile + warm
    times = {}
    for n in (1, iters):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(loop(n, *flat))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max(times[iters] - times[1], 1e-9) / (iters - 1)


def report(name, t, useful_bytes=None, flops=None):
    line = f"{name:55s} {t * 1e3:9.3f} ms"
    if useful_bytes:
        line += f"  {useful_bytes / t / 1e9:8.1f} GB/s"
    if flops:
        line += f"  {flops / t / 1e12:7.2f} TFLOP/s"
    print(line, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="l0", choices=["l0", "small"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.scale == "l0":
        B, T, C, Cout, t = 8, 8192, 32, 32, 4
    else:
        B, T, C, Cout, t = 2, 1024, 32, 32, 4
    cells = t ** 3
    dt = jnp.bfloat16
    N = B * T

    print(f"== primitives (B={B} T={T} C={C} t={t}, bf16) ==", flush=True)

    # 1. HBM copy bandwidth baseline: flat-packed body-sized array
    x_flat = jnp.asarray(rng.normal(size=(B, T, cells * C)), dt)
    nbytes = x_flat.size * 2
    tt = slope_time(lambda a: a * 1.0001, (x_flat,))
    report("flat copy (B,T,64C)", tt, useful_bytes=2 * nbytes)

    # 2. same array, C-minor logical shape (XLA layout choice for convs)
    x_cm = jnp.asarray(rng.normal(size=(B, T, cells, C)), dt)
    tt = slope_time(lambda a: a * 1.0001, (x_cm,))
    report("C-minor copy (B,T,64,C)", tt, useful_bytes=2 * nbytes)

    # 3. XLA direct conv on the halo-extended array (today's conv path)
    ext = jnp.asarray(rng.normal(size=(N, t + 2, t + 2, t + 2, C)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Cout)) * 0.1, dt)
    conv_flops = 2 * N * cells * 27 * C * Cout

    def conv_direct(e, w):
        return jax.lax.conv_general_dilated(
            e, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    tt = slope_time(conv_direct, (ext, w))
    report("lax.conv VALID (N,6,6,6,C)->(4,4,4,Cout)", tt, flops=conv_flops)

    # 4. conv consuming a FLAT (B,T,216C) producer output (the Pallas halo
    # kernel's natural layout): measures reshape/relayout cost on top of #3
    ext_flat = jnp.asarray(
        rng.normal(size=(B, T, (t + 2) ** 3 * C)), dt)

    def conv_from_flat(e, w):
        er = e.reshape(N, t + 2, t + 2, t + 2, C)
        return jax.lax.conv_general_dilated(
            er, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    tt = slope_time(conv_from_flat, (ext_flat, w))
    report("lax.conv from flat (B,T,216C) input", tt, flops=conv_flops)

    # 4b. conv at the other channel widths the model uses
    for (ci, co) in [(16, 16), (48, 32), (96, 32)]:
        e2 = jnp.asarray(rng.normal(size=(N, t + 2, t + 2, t + 2, ci)), dt)
        w2 = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)) * 0.1, dt)
        tt = slope_time(conv_direct, (e2, w2))
        report(f"lax.conv C={ci}->{co}", tt, flops=2 * N * cells * 27 * ci * co)

    # 5. plain matmul MXU efficiency at conv-like shapes
    for (M, K, Nn) in [(N * cells, 27 * C, Cout), (N * cells, 27 * C, 128),
                       (8192, 8192, 8192)]:
        a = jnp.asarray(rng.normal(size=(M, K)), dt)
        b = jnp.asarray(rng.normal(size=(K, Nn)), dt)
        tt = slope_time(lambda a, b: a @ b, (a, b))
        report(f"matmul M={M} K={K} N={Nn}", tt, flops=2 * M * K * Nn)

    # 6. einsum (B,T,cells,C)@(C,Cout) — the 1x1/NiN shape
    w1 = jnp.asarray(rng.normal(size=(C, Cout)), dt)
    tt = slope_time(
        lambda x, w: jnp.einsum("btvc,cd->btvd", x, w), (x_cm, w1))
    report("einsum btvc,cd (1x1 conv)", tt, flops=2 * N * cells * C * Cout)

    # 7. today's full submanifold conv at L0 shape (graph build excluded)
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.ops.tile_graph import build_tile_graph
    from uresnet_pytorch_tpu.ops import tile_conv

    cfg = URESNetConfig(
        model_name="uresnet_sparse", spatial_size=512 if args.scale == "l0"
        else 64, uresnet_num_strides=5 if args.scale == "l0" else 3,
        max_voxels=131072 if args.scale == "l0" else 4096,
        batch_size=B, compute_dtype="bfloat16")
    coords = np.zeros((B, cfg.max_voxels, 3), np.int32)
    values = np.zeros((B, cfg.max_voxels), np.float32)
    nv = np.zeros((B,), np.int32)
    for b in range(B):
        c, v, _ = generate_event(1, b, cfg.spatial_size, 3,
                                 100000 if args.scale == "l0" else 2000)
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n
    graph = jax.jit(lambda c, v, n: build_tile_graph(c, v, n, cfg))(
        coords, values, nv)
    graph = jax.block_until_ready(graph)
    lev0 = graph.levels[0]
    T0 = lev0.keys.shape[1]
    print(f"== tile engine at L0: T0 capacity={T0} ==", flush=True)
    x0 = jnp.asarray(rng.normal(size=(B, T0, cells, C)), dt)
    w27 = jnp.asarray(rng.normal(size=(27, C, Cout)) * 0.1, jnp.float32)

    from uresnet_pytorch_tpu.ops.halo import halo26_extend
    tt = slope_time(lambda x: halo26_extend(x, lev0.halo, t, 3), (x0,))
    report("halo26_extend (direct neighbor gather)", tt)
    tt = slope_time(
        lambda x, w: tile_conv.submanifold_conv_tiled(
            x, lev0.occ, lev0.halo, t, 3, w), (x0, w27))
    report("submanifold_conv_tiled (full)", tt,
           flops=2 * B * T0 * cells * 27 * C * Cout)

    tt = slope_time(lambda c, v, n: build_tile_graph(c, v, n, cfg),
                    (jnp.asarray(coords), jnp.asarray(values),
                     jnp.asarray(nv)), iters=8)
    report("build_tile_graph (whole batch)", tt)

    # occupancy statistics: how much of the padded tile capacity / cells the
    # events actually use (drives tile-size and capacity decisions)
    for l, lev in enumerate(graph.levels):
        num = np.asarray(lev.num)
        occ = np.asarray(lev.occ)
        used = occ.sum() / max(1, num.sum())
        print(f"level {l}: Tcap={lev.keys.shape[1]} used_tiles(avg)="
              f"{num.mean():.0f} cells/tile(avg)={used:.2f} "
              f"occupancy={used / occ.shape[-1]:.3f}", flush=True)


if __name__ == "__main__":
    main()
