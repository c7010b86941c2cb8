"""Measure per-block window-start spread when the 3^d-1 halo offsets are
grouped by leading-axis shift d0 in {-1,0,+1}.

Motivation: the fused halo+conv kernel issues one window DMA per offset per
grid step (27 x ~460 issues per conv) and is DMA-ISSUE-bound, not
bytes-bound. Offsets sharing d0 occupy CONTIGUOUS packed lanes (lex offset
order) and their neighbor keys differ only by +-(grid+1) tile-keys, so one
window per GROUP can serve all 9 (or 8) of them if the within-group spread
of per-offset window starts is small. This script measures that spread on
bench-scale synthetic events: the grouped window height must be
  spread + win  (win = per-offset window = WIN_MULT * Bk)
rows to keep every currently-in-band pair in-band. Prints quantiles of
spread per level, in units of Bk.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from uresnet_pytorch_tpu.config import URESNetConfig
    from uresnet_pytorch_tpu.iotools.synthetic import generate_event
    from uresnet_pytorch_tpu.ops import tile_graph
    from uresnet_pytorch_tpu.ops.halo import halo_offsets

    n_vox = int(os.environ.get("BENCH_VOXELS", 100_000))
    batch = 4
    cfg = URESNetConfig(
        model_name="uresnet_sparse", num_class=5, uresnet_filters=16,
        uresnet_num_strides=5, spatial_size=512, data_dim=3, reps=2,
        max_voxels=max(256, 1 << int(np.ceil(np.log2(n_vox * 1.3)))),
        capacity_factor=0.5, min_level_capacity=2048,
        batch_size=batch, compute_dtype="bfloat16")
    coords = np.zeros((batch, cfg.max_voxels, 3), np.int32)
    nv = np.zeros((batch,), np.int32)
    values = np.zeros((batch, cfg.max_voxels), np.float32)
    for b in range(batch):
        c, v, _ = generate_event(0, b, 512, 3, int(n_vox * 1.5))
        n = min(len(c), cfg.max_voxels)
        coords[b, :n], values[b, :n], nv[b] = c[:n], v[:n], n

    graph = jax.jit(
        lambda c, v, n: tile_graph.build_tile_graph(c, v, n, cfg),
    )(jnp.asarray(coords), jnp.asarray(values), jnp.asarray(nv))

    offs = halo_offsets(3)
    d0 = np.array([o[0] for o in offs])
    groups = [np.where(d0 == s)[0] for s in (-1, 0, 1)]

    for li, lev in enumerate(graph.levels):
        starts = np.asarray(lev.halo.starts)      # (B, K, nb)
        T = lev.keys.shape[1]
        nb = starts.shape[2]
        Bk = T // nb
        win = lev.halo.window.shape[-1]
        rows = []
        for g in groups:
            sp = starts[:, g, :].max(1) - starts[:, g, :].min(1)  # (B, nb)
            rows.append(sp.reshape(-1))
        sp = np.stack(rows)                       # (3, B*nb)
        q = np.quantile(sp, [0.5, 0.9, 0.99, 1.0], axis=1)
        print(f"level {li}: T={T} Bk={Bk} win={win} nb={nb}")
        for gi, s in enumerate((-1, 0, 1)):
            print(f"  d0={s:+d}: spread q50={q[0, gi]:6.0f} q90={q[1, gi]:6.0f}"
                  f" q99={q[2, gi]:6.0f} max={q[3, gi]:6.0f}"
                  f"  (spread/Bk max = {q[3, gi] / Bk:.2f})")
        # whole-26 spread for reference (single shared window alternative)
        allsp = starts.max(1) - starts.min(1)
        print(f"  ALL: spread max={allsp.max():6.0f} "
              f"({allsp.max() / Bk:.2f} Bk)")


if __name__ == "__main__":
    main()
