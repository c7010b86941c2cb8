"""Voxel-coordinate keys: pack integer coords into sortable int32 scalars.

This replaces SparseConvNet's C++ hash maps (SCN/Metadata, SURVEY.md §2.11)
with the TPU-native formulation: coordinates become packed integer keys, the
active set is a *sorted* key array, and lookups are vectorized binary
searches — static shapes, no pointer chasing (design per SURVEY.md §7 and the
sort/merge sparse-conv mapping of PointAcc, arXiv:2110.07600).

Keys are per-event (batch handled by vmap), so for dim*axis_bits <= 30 an
int32 holds the key with INT32_MAX reserved as the invalid/padding sentinel
(3D up to 1024^3, 2D up to 32768^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.int32(np.iinfo(np.int32).max)


def check_key_capacity(spatial_size: int, data_dim: int) -> int:
    bits = max(1, int(np.ceil(np.log2(spatial_size))))
    if data_dim * bits > 30:
        raise ValueError(
            f"coordinate key needs {data_dim * bits} bits > 30; reduce "
            f"spatial_size (per-axis bits={bits}, dim={data_dim})")
    return bits


def encode(coords: jnp.ndarray, valid: jnp.ndarray, spatial_size: int) -> jnp.ndarray:
    """(..., dim) int coords + (...) bool valid -> (...) int32 keys.

    Out-of-bounds coordinates and invalid rows map to SENTINEL.
    """
    dim = coords.shape[-1]
    bits = check_key_capacity(spatial_size, dim)
    in_bounds = jnp.all((coords >= 0) & (coords < spatial_size), axis=-1)
    key = coords[..., 0].astype(jnp.int32)
    for d in range(1, dim):
        key = (key << bits) | coords[..., d].astype(jnp.int32)
    return jnp.where(valid & in_bounds, key, SENTINEL)


def decode(keys: jnp.ndarray, spatial_size: int, data_dim: int) -> jnp.ndarray:
    """(...) int32 keys -> (..., dim) int32 coords (sentinel rows -> 0...)."""
    bits = check_key_capacity(spatial_size, data_dim)
    mask = (1 << bits) - 1
    valid = keys != SENTINEL
    k = jnp.where(valid, keys, 0)
    cs = []
    for d in reversed(range(data_dim)):
        cs.append(k & mask)
        k = k >> bits
    return jnp.stack(list(reversed(cs)), axis=-1)


def parent_key(keys: jnp.ndarray, spatial_size: int, data_dim: int) -> jnp.ndarray:
    """Key of the stride-2 coarse cell containing each site (sentinel-safe).

    With per-axis bit packing, halving every axis is a per-field shift; done
    via decode -> >>1 -> encode to stay obviously correct.
    """
    coords = decode(keys, spatial_size, data_dim)
    valid = keys != SENTINEL
    return encode(coords >> 1, valid, max(1, spatial_size // 2))


def lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray):
    """Resolve query keys against a sorted (sentinel-padded) key array.

    Returns (idx, found): idx in [0, V) (garbage where not found), found bool.

    method='sort': the default binary-search lowering is a log(V)-trip while
    loop of full-array gathers — measured as ~65% of an entire forward step
    on TPU (profile_step.py). TPU sorts are fast, and our query arrays are
    themselves near-sorted (neighbor keys of sorted keys), so the
    concatenate-and-sort lowering wins by >10x.
    """
    V = sorted_keys.shape[0]
    idx = jnp.searchsorted(sorted_keys, queries, method="sort")
    idx_c = jnp.clip(idx, 0, V - 1)
    found = (sorted_keys[idx_c] == queries) & (queries != SENTINEL)
    return idx_c, found


# ---------------------------------------------------------------------------
# scatter-free compaction (shared by halo/tile_graph/lookup_monotone)
# ---------------------------------------------------------------------------

def flat_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a flat int array via a two-level decomposition:
    XLA's single-axis cumsum over millions of elements lowers poorly on TPU
    (profiled ~29 ms per call at 6M elements); a (rows, 512) lane cumsum +
    a short row-offset scan is >10x faster."""
    n = x.shape[0]
    lane = 512
    if n <= lane:
        return jnp.cumsum(x)
    rows = -(-n // lane)
    xp = jnp.pad(x, (0, rows * lane - n)).reshape(rows, lane)
    within = jnp.cumsum(xp, axis=1)
    base = jnp.concatenate([jnp.zeros((1,), x.dtype),
                            jnp.cumsum(within[:, -1])[:-1]])
    return (within + base[:, None]).reshape(-1)[:n]


def monotone_positions(csum: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Positions of the first `cap` marked entries given the inclusive
    cumsum of a 0/1 mark array: p_s = first index with csum[index] == s+1.

    Scatter-free compaction: XLA's scatter lowering was measured at ~28 ms
    PER compaction at bench scale (five per level in the graph build); this
    two-level monotone search is pure vector ops (row-tail counts + one
    small row gather). Returns (cap,) int32, n where fewer than s+1 marks
    exist."""
    n = csum.shape[0]
    lane = 512
    rows = -(-n // lane)
    cp = jnp.pad(csum, (0, rows * lane - n), mode="edge").reshape(rows, lane)
    row_tail = cp[:, -1]                                  # (rows,) monotone
    q = jnp.arange(1, cap + 1, dtype=csum.dtype)          # (cap,)
    # first row whose tail reaches q = count of rows with tail < q
    r = jnp.sum(row_tail[None, :] < q[:, None], axis=1)
    r_c = jnp.minimum(r, rows - 1)
    rowvals = jnp.take(cp, r_c, axis=0)                   # (cap, lane)
    within = jnp.sum(rowvals < q[:, None], axis=1)
    pos = (r_c * lane + within).astype(jnp.int32)
    total = csum[-1]
    return jnp.where(q <= total, pos, n)


def compact_marked(bad: jnp.ndarray, cap: int):
    """First-`cap` flat positions of True entries in `bad` (1-D bool), plus
    (ok mask, total count). The scatter-free replacement for the
    cumsum + .at[tgt].set compaction pattern."""
    csum = flat_cumsum(bad.astype(jnp.int32))
    pos = monotone_positions(csum, cap)
    n = bad.shape[0]
    ok = pos < n
    return jnp.minimum(pos, n - 1), ok, csum[-1]


# ---------------------------------------------------------------------------
# rank-windowed lookup for near-sorted queries
# ---------------------------------------------------------------------------

def lookup_monotone(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                    block: int = 128, win_mult: int = 4,
                    corr_cap: int = 2048):
    """`lookup` for NEAR-SORTED query rows, without the big sort.

    queries (K, T): each row must be non-decreasing in its non-SENTINEL
    entries (e.g. constant-offset neighbor keys of a sorted key array —
    the packed codec is linear in coords, so offset queries are sorted
    wherever valid). Exploits that monotonicity: each block of `block`
    queries searches only a `win_mult*block`-row window of `sorted_keys`
    anchored at its leader's rank (one tiny searchsorted for all leaders),
    built from hop-strided overlapped VIEWS of the key array — pure layout,
    no per-query gather, no (K+1)·T concat-sort (measured ~146 ms/step at
    bench scale, the graph build's dominant cost).

    Queries whose insertion point cannot be bracketed by their window
    (structural stragglers) are resolved EXACTLY through a small compaction
    + plain `lookup` of at most `corr_cap` of them; beyond that they are
    dropped-and-counted (returned so callers can surface it like every
    other capacity in this codebase). Defaults measured on 512^3 / 1e5-voxel
    events, batch 8 (26-offset halo queries at T=29184): worst event used
    1155 corrections — corr_cap=2048 gives 1.8x margin at 41 ms vs the
    concat-sort's 176 ms; win_mult=6 halves corrections but costs 54 ms.

    Returns (idx (K, T) int32, found (K, T) bool, n_dropped () int32).
    Matches `lookup` exactly except for the counted drops."""
    V = sorted_keys.shape[0]
    K, T = queries.shape
    h = min(block, T)
    while T % h:
        h //= 2
    nhop = -(-V // h)
    win = min(win_mult * h, nhop * h)
    if V <= win or h < 8:
        # window would cover everything — the plain sort is already small
        idx, found = lookup(sorted_keys, queries)
        return idx, found, jnp.zeros((), jnp.int32)
    nb = T // h

    qb = queries.reshape(K, nb, h)
    valid_q = qb != SENTINEL
    leader = jnp.min(qb, axis=2)                       # (K, nb) min = first
    #                    valid query (SENTINEL sorts above all valid keys)
    lead_pos = jnp.searchsorted(sorted_keys, leader.reshape(-1),
                                method="sort").reshape(K, nb)
    j = jnp.clip(lead_pos // h, 0, nhop - 1)           # hop index per block

    # overlapped hop views: Wv[j] = keys_padded[j*h : j*h + win]
    kp = jnp.concatenate([sorted_keys,
                          jnp.full((win,), SENTINEL, sorted_keys.dtype)])
    parts = [jax.lax.dynamic_slice_in_dim(kp, i * h, nhop * h).reshape(
        nhop, h) for i in range(win // h)]
    Wv = jnp.concatenate(parts, axis=1)                # (nhop, win)
    wk = jnp.take(Wv, j.reshape(-1), axis=0).reshape(K, nb, 1, win)

    q = qb[..., None]                                  # (K, nb, h, 1)
    lt = jnp.sum((wk < q).astype(jnp.int32), axis=-1)  # insertion pos local
    eq = jnp.any(wk == q, axis=-1)
    idx_w = j[..., None] * h + lt                      # absolute insertion
    # bracketed: the window provably contains q's insertion point, so
    # eq alone decides existence; unbracketed blocks fall to the exact path
    bracketed = eq | ((lt > 0) & (lt < win))
    resolved = valid_q & bracketed
    found = resolved & eq
    idx = jnp.where(found, idx_w, 0).reshape(K * T)
    okf = found.reshape(K * T)

    unres = (valid_q & ~bracketed).reshape(K * T)
    fi, cok, n_unres = compact_marked(unres, corr_cap)
    cand = jnp.where(cok, jnp.take(queries.reshape(-1), fi), SENTINEL)
    cidx, cfound = lookup(sorted_keys, cand)           # small: V + corr_cap
    tgt = jnp.where(cok, fi, K * T)
    idx = idx.at[tgt].set(jnp.where(cfound, cidx, 0), mode="drop")
    okf = okf.at[tgt].set(cfound, mode="drop")
    n_dropped = jnp.maximum(n_unres - corr_cap, 0).astype(jnp.int32)
    return (jnp.clip(idx.reshape(K, T), 0, V - 1), okf.reshape(K, T),
            n_dropped)
