"""Tiled-dense sparse convolutions: windowed-permutation halo + folded convs.

Compute layer of the tile engine (rationale in ops/tile_graph.py). Replaces
SCN's CUDA gather-GEMM-scatter (SURVEY.md §2.13) with MXU-native forms:

  * the submanifold-conv halo is a DIRECT 3^d-1 neighbor gather
    (ops/halo.py, one Pallas kernel on TPU) followed by ONE VALID lax.conv
    over the extended tiles.
  * `windowed_gather` — tile up/down link movement runs as block-banded
    one-hot matmuls against dynamically positioned source windows (a
    permutation on the MXU; XLA row-gathers measured ~0.4 µs/row are
    avoided), plus an exact small correction list for out-of-window pairs.
  * space-to-depth fold (2x/axis): the 3^d small-channel submanifold conv
    becomes a 2^d-tap dense conv with (2^d*C)-wide channels, executed by ONE
    `lax.conv_general_dilated` per layer — full 128-lane MXU utilization and
    on-chip accumulation. Derivation: output fine cell F=2w+1+o reads input
    F+δ-1 = 2(w+d)+q with d=(o+δ)>>1, q=(o+δ)&1 (fold_weights builds the
    tap kernel).
  * stride-2 down/up convs are single GEMMs on the folded representation
    (kernel-2/stride-2 IS the fold), with corner assembly/extraction via
    windowed gathers between tile grids.

All ops preserve the submanifold invariant: outputs are masked by cell
occupancy so inactive cells hold exact zeros between layers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uresnet_pytorch_tpu.ops.tile_graph import GatherSpec


# ---------------------------------------------------------------------------
# windowed permutation
# ---------------------------------------------------------------------------

# None = auto (Pallas kernel on TPU, XLA elsewhere); tests can force a path.
USE_PALLAS = None


def _windowed_gather_xla(src: jnp.ndarray, spec: GatherSpec) -> jnp.ndarray:
    """XLA reference implementation (CPU path / oracle)."""
    B, S, F = src.shape
    N = spec.idx.shape[1]
    nb = spec.starts.shape[1]
    Bk = N // nb
    win = spec.window.shape[-1]
    dt = src.dtype

    # spec starts are clamped to [0, S - win] at build time — windows never
    # cross the row end, so no row padding (dynamic_slice's own clamp is a
    # no-op here, keeping local-index correspondence exact)
    windows = jax.vmap(lambda p, st: jax.vmap(
        lambda s: jax.lax.dynamic_slice(p, (s, 0), (win, F)))(st)
    )(src, spec.starts)                                     # (B, nb, win, F)
    local = spec.idx - jnp.repeat(spec.starts, Bk, axis=1)  # (B, N)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, nb, Bk, win), 3)
    oh = (local.reshape(B, nb, Bk)[..., None] == pos) \
        & spec.ok.reshape(B, nb, Bk)[..., None]
    out = jnp.einsum("bnkw,bnwf->bnkf", oh.astype(dt), windows,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, N, F).astype(dt)

    # exact out-of-window corrections (few hundred rows at most)
    cv = jax.vmap(lambda s, i: jnp.take(s, i, axis=0))(src, spec.corr_src)
    cv = cv * spec.corr_ok[..., None].astype(dt)
    dst = jnp.where(spec.corr_ok, spec.corr_dst, N)
    out = jax.vmap(lambda o, d, v: o.at[d].set(v, mode="drop"))(out, dst, cv)
    return out


def _wg_impl(src: jnp.ndarray, spec: GatherSpec) -> jnp.ndarray:
    use = USE_PALLAS
    if use is None:
        # auto: Pallas moves bf16 rows bit-exactly; f32 would round through
        # the MXU's bf16 passes, so it stays on the exact XLA path
        use = (jax.default_backend() == "tpu"
               and src.dtype == jnp.bfloat16)
    if use:
        from uresnet_pytorch_tpu.ops.pallas.windowed_gather import (
            gather_forward)
        return gather_forward(src, spec)
    return _windowed_gather_xla(src, spec)


@jax.custom_vjp
def windowed_gather(src: jnp.ndarray, spec: GatherSpec) -> jnp.ndarray:
    """out[b, i] = src[b, spec.idx[b, i]] (0 where invalid), exactly.

    src (B, S, F) -> (B, N, F). In-window pairs run as block one-hot MXU
    matmuls (Pallas kernel on TPU); out-of-window pairs through the exact
    correction list. Custom VJP: the transpose is a scatter-add (each source
    row sums the cotangents of its readers)."""
    return _wg_impl(src, spec)


def _wg_fwd(src, spec):
    return _wg_impl(src, spec), (spec, src.shape)


def _wg_bwd(res, g):
    spec, (B, S, F) = res
    d = jnp.zeros((B, S, F), g.dtype)
    idx = jnp.where(spec.ok, spec.idx, S)
    d = jax.vmap(lambda dd, i, gg: dd.at[i].add(gg, mode="drop"))(d, idx, g)
    csrc = jnp.where(spec.corr_ok, spec.corr_src, S)
    gv = jax.vmap(lambda gg, i: jnp.take(gg, i, axis=0))(g, spec.corr_dst)
    gv = gv * spec.corr_ok[..., None].astype(g.dtype)
    d = jax.vmap(lambda dd, i, v: dd.at[i].add(v, mode="drop"))(d, csrc, gv)
    d_spec = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), spec)
    return d, d_spec


windowed_gather.defvjp(_wg_fwd, _wg_bwd)


# ---------------------------------------------------------------------------
# space-to-depth fold
# ---------------------------------------------------------------------------

def fold2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, *spatial(even), C) -> (B, T, *spatial/2, 2^dim*C); block bits
    x-major over channels."""
    B, T = x.shape[:2]
    sp = x.shape[2:-1]
    C = x.shape[-1]
    dim = len(sp)
    shape = (B, T)
    for s in sp:
        shape += (s // 2, 2)
    shape += (C,)
    x = x.reshape(shape)
    perm = [0, 1] + [2 + 2 * d for d in range(dim)] \
        + [3 + 2 * d for d in range(dim)] + [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape((B, T) + tuple(s // 2 for s in sp) + (2 ** dim * C,))


def unfold2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of fold2."""
    B, T = x.shape[:2]
    sp = x.shape[2:-1]
    dim = len(sp)
    C = x.shape[-1] // (2 ** dim)
    x = x.reshape((B, T) + sp + (2,) * dim + (C,))
    perm = [0, 1]
    for d in range(dim):
        perm += [2 + d, 2 + dim + d]
    perm += [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape((B, T) + tuple(2 * s for s in sp) + (C,))


def fold_weights(w: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(3^dim, Cin, Cout) offset stack -> folded tap kernel
    (*(2,)*dim, 2^dim*Cin, 2^dim*Cout) in DHWIO layout for lax.conv."""
    K, Cin, Cout = w.shape
    assert K == 3 ** dim
    wf = jnp.zeros((2 ** dim, 2 ** dim * Cin, 2 ** dim * Cout), w.dtype)
    for o in range(2 ** dim):
        obits = [(o >> (dim - 1 - d)) & 1 for d in range(dim)]
        for k in range(3 ** dim):
            tmp, dg = k, []
            for _ in range(dim):
                dg.append(tmp % 3)
                tmp //= 3
            dg = dg[::-1]
            didx = qidx = 0
            for d in range(dim):
                s = obits[d] + dg[d]
                didx = (didx << 1) | (s >> 1)
                qidx = (qidx << 1) | (s & 1)
            wf = wf.at[didx, qidx * Cin:(qidx + 1) * Cin,
                       o * Cout:(o + 1) * Cout].set(w[k])
    return wf.reshape((2,) * dim + (2 ** dim * Cin, 2 ** dim * Cout))


# ---------------------------------------------------------------------------
# convolutions
# ---------------------------------------------------------------------------

_CONV_DN = {3: ("NDHWC", "DHWIO", "NDHWC"), 2: ("NHWC", "HWIO", "NHWC")}


# None = auto (fused Pallas kernel on TPU, XLA halo+conv elsewhere);
# tests can force a path.
USE_FUSED = None


def submanifold_conv_tiled(x, occ, halo, t: int, dim: int, w) -> jnp.ndarray:
    """x (B,T,t^dim,Cin), occ (B,T,t^dim) -> (B,T,t^dim,Cout).

    TPU: ONE fused Pallas kernel per conv — halo gather into VMEM +
    in-kernel Toeplitz conv dots (ops/pallas/halo_conv.py); deletes the
    round-2 ext HBM round trip and its XLA layout glue (measured ~460
    ms/step). Elsewhere: halo-extend via the direct 3^dim-1 neighbor
    gather (ops/halo.py) then ONE 3^dim VALID lax.conv on the extended
    tiles — the exact oracle the kernel is validated against.

    x may be a PAIR (x1, x2) standing for their channel concat (the
    decoder skip path, VERDICT r3 weak #5): the conv is linear in Cin, so
    the pair runs as two convs against the matching w row slices, summed
    in f32 — the same structure as the kernel's own Cin chunking, with no
    (B, T, cells, 2C) concat copy in HBM."""
    from uresnet_pytorch_tpu.ops.halo import halo26_extend
    if isinstance(x, tuple):
        x1, x2 = x
        C1 = x1.shape[-1]
        o1 = submanifold_conv_tiled(x1, occ, halo, t, dim, w[:, :C1])
        o2 = submanifold_conv_tiled(x2, occ, halo, t, dim, w[:, C1:])
        return (o1.astype(jnp.float32)
                + o2.astype(jnp.float32)).astype(o1.dtype)
    dt = x.dtype
    B, T = x.shape[:2]
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    use = USE_FUSED
    if use is None:
        # auto: fused kernel for bf16 on TPU; f32 keeps the exact XLA
        # oracle path (same policy as ops/halo.py — the kernel's one-hot
        # gathers round f32 through the MXU's bf16 passes)
        use = (jax.default_backend() == "tpu"
               and x.dtype == jnp.bfloat16)
    if use:
        from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
            _v2_layout, fused_halo_conv)
        if Cin < 8 and _v2_layout(t, dim, 8) is not None:
            # tiny-Cin convs (the stem: Cin=1) miss the v2 lane alignment
            # (t^2*C % 128) and fall to the v1 kernel + its full preslice
            # pack (~12 ms/step measured). Zero-pad input channels to 8:
            # the pad rows multiply zero weight rows, and autodiff's pad
            # transpose slices d_x/d_w back. 8x gather bytes on a tiny
            # input is cheap next to the deleted XLA pass.
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8 - Cin)))
            w = jnp.pad(w, ((0, 0), (0, 8 - Cin), (0, 0)))
        out = fused_halo_conv(x, w.astype(dt), halo, t, dim)
        return out * occ[..., None].astype(dt)
    ext = halo26_extend(x, halo, t, dim)
    xin = ext.reshape((B * T,) + (t + 2,) * dim + (Cin,))
    kernel = w.reshape((3,) * dim + (Cin, Cout)).astype(dt)
    # no preferred_element_type: the MXU accumulates bf16 inputs in f32
    # internally, and a f32 output would break dtype symmetry in the conv's
    # transpose (VJP) rule
    out = jax.lax.conv_general_dilated(
        xin, kernel, window_strides=(1,) * dim, padding="VALID",
        dimension_numbers=_CONV_DN[dim])
    out = out.astype(dt).reshape(B, T, t ** dim, Cout)
    return out * occ[..., None].astype(dt)


def submanifold_conv_bn_act_tiled(x, occ, halo, t: int, dim: int, w,
                                  a, b, alpha: float, mask,
                                  flat_out: bool = False) -> jnp.ndarray:
    """Inference megafusion: mask * leaky_{alpha}(conv(x) * a + b).

    Folds the BNAct that FOLLOWS a submanifold conv (plus the submanifold
    re-masking) into the conv kernel's epilogue — one HBM pass instead of
    conv + elementwise. An identity affine (a=1, b=0, alpha=1) fuses plain
    conv + occupancy masking. Dispatch mirrors `submanifold_conv_tiled`;
    the unfused XLA composition below is the exact oracle (and the CPU/f32
    path). mask (B, T, cells) bool is the full active-cell mask.

    Flat chaining: x may be the raw padded (B, T, lanes_p) row from a
    previous call's flat_out=True, and flat_out=True returns the same form
    — consecutive fused convs then skip the slice+pad HBM round trip.
    Both are BEST-EFFORT: callers must accept a rank-4 result (fallback
    paths reshape), and this function accepts either rank on input."""
    use = USE_FUSED
    if use is None:
        use = (jax.default_backend() == "tpu"
               and x.dtype == jnp.bfloat16)
    if use:
        from uresnet_pytorch_tpu.ops.pallas.halo_conv import (
            _v2_layout, fused_halo_conv_bn_act)
        xk, wk = x, w
        if (x.ndim == 4 and w.shape[1] < 8
                and _v2_layout(t, dim, 8) is not None):
            # tiny-Cin pad to the v2 alignment floor (see
            # submanifold_conv_tiled) — the stem's eval path
            pad = 8 - w.shape[1]
            xk = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
            wk = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
        out = fused_halo_conv_bn_act(xk, wk.astype(x.dtype), a, b, mask,
                                     alpha, halo, t, dim, flat_out=flat_out)
        if out is not None:
            return out
    if x.ndim == 3:     # flat row from a previous fused conv: un-flatten
        B, T = x.shape[:2]
        cells = t ** dim
        Cin = w.shape[1]
        x = x[:, :, :cells * Cin].reshape(B, T, cells, Cin)
    y = submanifold_conv_tiled(x, occ, halo, t, dim, w)
    z = y * a.astype(y.dtype) + b.astype(y.dtype)
    z = jnp.where(z >= 0, z, jnp.asarray(alpha, z.dtype) * z)
    return z * mask[..., None].astype(z.dtype)


def _assemble_impl(blocks: jnp.ndarray, children: Tuple[GatherSpec, ...],
                   t_c: int, dim: int) -> jnp.ndarray:
    B, Tf, cells_h, C = blocks.shape
    th = t_c // 2
    flat = blocks.reshape(B, Tf, cells_h * C)
    Tc = children[0].idx.shape[1]
    out = jnp.zeros((B, Tc) + (t_c,) * dim + (C,), blocks.dtype)
    for o, spec in enumerate(children):
        obits = [(o >> (dim - 1 - d)) & 1 for d in range(dim)]
        g = windowed_gather(flat, spec).reshape(
            (B, Tc) + (th,) * dim + (C,))
        idx = (slice(None), slice(None)) + tuple(
            slice(b * th, (b + 1) * th) for b in obits) + (slice(None),)
        out = out.at[idx].set(g)
    return out.reshape(B, Tc, t_c ** dim, C)


def _parent_corner_impl(xc: jnp.ndarray, link, t_c: int,
                        dim: int) -> jnp.ndarray:
    """(B, Tc, t_c^dim, C) coarse tiles -> (B, Tf, (t_c/2)^dim, C): each
    fine tile pulls its own corner of its parent tile straight from the
    coarse CORNER VIEW, one windowed permutation per octant (per-octant
    the fine->parent rank map is strictly monotone — see
    tile_graph.TileDownLink.parents). Specs have disjoint valid rows, so
    the per-octant results sum."""
    th = t_c // 2
    C = xc.shape[-1]
    cv = _corner_view(xc, t_c, dim)          # (B, Tc*2^dim, th^dim*C)
    out = None
    for spec in link.parents:
        g = windowed_gather(cv, spec)        # zeros where not this octant
        out = g if out is None else out + g
    B, Tf = out.shape[:2]
    return out.reshape(B, Tf, th ** dim, C)


def _zero_link(link):
    return jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), link)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def assemble_children_link(blocks: jnp.ndarray, link, t_c: int,
                           dim: int) -> jnp.ndarray:
    """Per-fine-tile half-blocks (B, Tf, (t_c/2)^dim, C) -> coarse tiles
    (B, Tc, t_c^dim, C): each corner pulls its child's block (gather-form —
    no scatters anywhere in this engine).

    Custom VJP: the transpose is `parent_corner_link` — down-links are
    injective (every fine tile has exactly ONE (parent, octant)), so the
    adjoint of the children-gather is the parent-gather + corner select,
    another windowed permutation. No scatter-add anywhere in the graph."""
    return _assemble_impl(blocks, link.children, t_c, dim)


def _acl_fwd(blocks, link, t_c, dim):
    return _assemble_impl(blocks, link.children, t_c, dim), link


def _acl_bwd(t_c, dim, link, g):
    d = _parent_corner_impl(g, link, t_c, dim)
    return d, _zero_link(link)


assemble_children_link.defvjp(_acl_fwd, _acl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def parent_corner_link(xc: jnp.ndarray, link, t_c: int,
                       dim: int) -> jnp.ndarray:
    """Decoder movement: coarse tiles -> per-fine-tile corner half-blocks.
    Transpose of `assemble_children_link` (see its docstring)."""
    return _parent_corner_impl(xc, link, t_c, dim)


def _pcl_fwd(xc, link, t_c, dim):
    return _parent_corner_impl(xc, link, t_c, dim), link


def _pcl_bwd(t_c, dim, link, g):
    d = _assemble_impl(g, link.children, t_c, dim)
    return d, _zero_link(link)


parent_corner_link.defvjp(_pcl_fwd, _pcl_bwd)


def assemble_children(blocks: jnp.ndarray, children: Tuple[GatherSpec, ...],
                      t_c: int, dim: int) -> jnp.ndarray:
    """Back-compat wrapper (graph build / occupancy path): plain forward
    assemble without the linked VJP."""
    if len(children) == 1:
        # tile grid unchanged (shrinking tile edge): blocks ARE the tiles
        return blocks
    return _assemble_impl(blocks, children, t_c, dim)


def _corner_view(xc: jnp.ndarray, tc: int, dim: int) -> jnp.ndarray:
    """(B, Tc, tc^dim, C) -> (B, Tc*2^dim, (tc/2)^dim * C): contiguous corner
    half-regions, corner bits x-major (matches the parent spec rows)."""
    B, Tc = xc.shape[:2]
    C = xc.shape[-1]
    th = tc // 2
    shape = (B, Tc)
    for _ in range(dim):
        shape += (2, th)
    shape += (C,)
    x = xc.reshape(shape)
    perm = [0, 1] + [2 + 2 * d for d in range(dim)] \
        + [3 + 2 * d for d in range(dim)] + [2 + 2 * dim]
    x = x.transpose(perm)
    return x.reshape(B, Tc * 2 ** dim, th ** dim * C)


def downsample_conv_tiled(x, link, t_f: int, t_c: int, dim: int,
                          w) -> jnp.ndarray:
    """Stride-2 kernel-2 conv between tile grids (gather-formulated).

    x (B,Tf,t_f^dim,Cin), w (2^dim,Cin,Cout) -> (B,Tc,t_c^dim,Cout)."""
    dt = x.dtype
    B, Tf = x.shape[:2]
    Cin, Cout = w.shape[1], w.shape[2]
    xs = x.reshape((B, Tf) + (t_f,) * dim + (Cin,))
    xf = fold2(xs).reshape(B, Tf, (t_f // 2) ** dim, 2 ** dim * Cin)
    wd = w.reshape(2 ** dim * Cin, Cout).astype(dt)
    blocks = jnp.einsum("btvc,cd->btvd", xf.astype(dt), wd,
                        preferred_element_type=jnp.float32).astype(dt)
    if len(link.children) == 1:
        # tile grid unchanged (shrinking tile edge): blocks ARE the tiles
        return blocks
    return assemble_children_link(blocks, link, t_c, dim)


def upsample_conv_tiled(xc, link, occ_f, t_f: int, t_c: int, dim: int,
                        w) -> jnp.ndarray:
    """Stride-2 kernel-2 transposed conv (decoder): reuses the down link
    transposed so the encoder's exact sites come back.

    xc (B,Tc,t_c^dim,Cin) -> (B,Tf,t_f^dim,Cout), masked by fine occupancy."""
    dt = xc.dtype
    Cin, Cout = w.shape[1], w.shape[2]
    th = t_f // 2
    if len(link.children) == 1:
        blocks = xc  # identity link: whole coarse tile = the half-block
        B, Tf = blocks.shape[:2]
        blocks = blocks.reshape(B, Tf, th ** dim, Cin)
    else:
        # gather whole parent tiles (unscaled indices keep the windowed
        # permutation exact), then select each fine tile's corner with an
        # octant one-hot contraction; the custom VJP transposes this to
        # the children-gather (no scatter)
        blocks = parent_corner_link(xc.astype(dt), link, t_c, dim)
        B, Tf = blocks.shape[:2]
    wu = jnp.transpose(w, (1, 0, 2)).reshape(Cin, 2 ** dim * Cout).astype(dt)
    outf = jnp.einsum("btvc,cd->btvd", blocks.astype(dt), wu,
                      preferred_element_type=jnp.float32).astype(dt)
    outf = outf.reshape((B, Tf) + (th,) * dim + (2 ** dim * Cout,))
    out = unfold2(outf).reshape(B, Tf, t_f ** dim, Cout)
    return out * occ_f[..., None].astype(dt)
