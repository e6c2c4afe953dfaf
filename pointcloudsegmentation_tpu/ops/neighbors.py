"""Neighborhood gather/scatter and masked reductions over [N, K] tensors.

TPU-native equivalents of the reference's ``libTFNeighborOps.so`` CUDA ops
(SURVEY.md §2.1).  A note on naming: the reference calls points→edges
"scatter" and edges→points "gather" (tf_ops/TFNeighborScatter.cc,
TFNeighborSumFeatGather.cc).  Here the edge axis is the dense K axis, so
points→edges is a plain XLA ``take`` (we call it *gather by neighbor index*)
and edges→points is a masked reduction over K.  All reductions are
deterministic, unlike the reference's atomicAdd backward kernels
(tf_ops/TFNeighborKernel.cu:83,112-121,245).

Every function is pure, jit-safe and differentiable where meaningful; XLA
fuses the mask arithmetic into the surrounding matmuls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .types import Neighborhood, WindowedNeighborhood

_NEG_INF = -1e30


def _slab_stack(padded: jnp.ndarray, nt: int, tile: int,
                slab: int) -> jnp.ndarray:
    """[N + 2W, F] -> [nt, S, F] overlapping slabs (slab t starts at t*tile
    in the padded array).  One [nt*S]-row gather; its transpose is a cheap
    ~nt*S-row scatter-add."""
    idx = (jnp.arange(nt, dtype=jnp.int32) * tile)[:, None] \
        + jnp.arange(slab, dtype=jnp.int32)[None, :]
    return jnp.take(padded, idx, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _windowed_take(feats, gidx, lidx, window, tile):
    """take(feats, gidx) whose BACKWARD is a windowed one-hot MXU matmul
    instead of XLA's row-DMA scatter-add.

    The forward row gather is cheap (~0.5 ms for 262k rows); the generic
    scatter-add adjoint is 3.6x slower (measured).  Because every index is
    within its row's slab by construction, the adjoint is exactly

        dslab[t, s, :] = sum_{i in tile t, k} g[i, k, :] * [lidx[i,k] == s]

    — one [T*K, S]^T @ [T*K, F] matmul per tile batched over tiles, plus a
    cheap ~(nt*S)-row overlap-add of the slabs back into point rows.
    Measured fwd+bwd ~8x faster than take/scatter-add at K=32, W=256.
    """
    return jnp.take(feats, gidx, axis=0)


def _windowed_take_fwd(feats, gidx, lidx, window, tile):
    return jnp.take(feats, gidx, axis=0), (lidx, feats.shape[0])


def _windowed_take_bwd(window, tile, res, g):
    lidx, n = res
    assert window % tile == 0, (window, tile)
    s = tile + 2 * window
    nt = n // tile
    k = lidx.shape[-1]
    f = g.shape[-1]
    if _use_pallas_gather():
        from .pallas import window_gather as _wg

        dslab = _wg.dslab_bwd(g, lidx, window, tile)        # [nt, S, F]
    else:
        oh = jax.nn.one_hot(lidx.reshape(nt, tile, k), s, dtype=g.dtype)
        dslab = jnp.einsum("ntks,ntkf->nsf", oh,
                           g.reshape(nt, tile, k, f),
                           preferred_element_type=g.dtype)  # [nt, S, F]
    # overlap-add slabs back into padded rows.  Slab t covers padded rows
    # [t*tile, t*tile + s); with s an exact multiple of tile, slab chunk j
    # (rows [j*tile, (j+1)*tile)) lands at padded rows [(t+j)*tile, ...) —
    # so the adjoint is s/tile SHIFTED DENSE ADDS, zero scatters.
    dpad = jnp.zeros((n + 2 * window, f), g.dtype)
    for j in range(s // tile):
        chunk = dslab[:, j * tile:(j + 1) * tile, :].reshape(n, f)
        dpad = dpad + jnp.pad(chunk,
                              ((j * tile, 2 * window - j * tile), (0, 0)))
    return dpad[window:window + n], None, None


_windowed_take.defvjp(_windowed_take_fwd, _windowed_take_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _onehot_take(feats, lidx, window, tile):
    """Windowed gather where BOTH directions are one-hot MXU matmuls, with
    an explicit custom VJP so XLA never has to transpose/fuse the slab
    machinery itself (auto-diff of this graph compiles pathologically).

    Device traces show the in-model take-forward runs at only ~16 GB/s
    (row-descriptor-bound); the one-hot form moves the same movement onto
    the MXU at a few percent of the cost.
    """
    return _onehot_fwd_impl(feats, lidx, window, tile)


def _use_pallas_gather() -> bool:
    """Route the windowed one-hot gather pair through the Pallas kernels
    (ops/pallas/window_gather.py) — in-VMEM one-hot build, no HBM one-hot
    or slab-stack materialization.  Bit-exact vs the XLA einsum pair, but
    MEASURED SLOWER in-graph (324k vs 394k points/s/chip full step, r3):
    XLA fuses masks/selects into its einsums and keeps packed layouts,
    while pallas_call boundaries force layout copies.  Off by default;
    PCS_PALLAS_GATHER=1 opts in (see BASELINE.md)."""
    import os

    return os.environ.get("PCS_PALLAS_GATHER", "") == "1"


def _onehot_fwd_impl(feats, lidx, window, tile):
    n, f = feats.shape
    s = tile + 2 * window
    nt = n // tile
    k = lidx.shape[-1]
    if _use_pallas_gather():
        from .pallas import window_gather as _wg

        return _wg.gather_fwd(feats, lidx, window, tile)
    fp = jnp.pad(feats, ((window, window), (0, 0)))
    slabs = _slab_stack(fp, nt, tile, s)                     # [nt, S, F]
    oh = jax.nn.one_hot(lidx.reshape(nt, tile, k), s, dtype=feats.dtype)
    e = jnp.einsum("ntks,nsf->ntkf", oh, slabs,
                   preferred_element_type=feats.dtype)
    return e.reshape(n, k, f)


def _onehot_take_fwd(feats, lidx, window, tile):
    return _onehot_fwd_impl(feats, lidx, window, tile), (lidx,
                                                         feats.shape[0])


_onehot_take.defvjp(_onehot_take_fwd,
                    lambda window, tile, res, g: (
                        _windowed_take_bwd(window, tile, res, g)[0], None))


def windowed_gather(feats: jnp.ndarray,
                    wn: WindowedNeighborhood) -> jnp.ndarray:
    """Windowed-slot gather [N, F] -> [N, K, F] (overflow slots excluded —
    see ``gather_neighbors`` for the combined view).

    On TPU both directions run as one-hot MXU matmuls (_onehot_take).  On
    CPU the one-hot einsums are slower than plain gathers and the interpret
    overhead dominates, so the forward stays a row gather with the one-hot
    backward (_windowed_take).  Both variants are bit-exact vs take().
    PCS_ONEHOT_FWD=0/1 overrides the backend default.
    """
    from .search import use_onehot_fwd

    if use_onehot_fwd():
        return _onehot_take(feats, wn.lidx, wn.window, wn.tile)
    n = feats.shape[0]
    tile_start = (jnp.arange(n, dtype=jnp.int32) // wn.tile) * wn.tile
    gidx = jnp.clip(wn.lidx + (tile_start - wn.window)[:, None], 0, n - 1)
    return _windowed_take(feats, gidx, wn.lidx, wn.window, wn.tile)


def gather_neighbors(feats: jnp.ndarray, nbr) -> jnp.ndarray:
    """Point features -> per-slot neighbor features.

    Equivalent of ``NeighborScatter(use_diff=False)``
    (tf_ops/TFNeighborKernel.cu:5-59).

    feats: [N, F] -> [N, K, F]; invalid slots hold the center's own features
    (idx is self-padded) — callers must mask before reducing.

    WindowedNeighborhood inputs take the windowed fast path (plain gather
    forward, one-hot MXU backward) for the windowed slots and a plain row
    gather for the overflow slots; the result is the [N, K + Ko, F]
    combined view.  Invalid slots self-pad in both paths (lidx points at
    the center's own slab position), preserving the ``neighbor_diff == 0
    on padding`` contract.
    """
    if isinstance(nbr, WindowedNeighborhood):
        win = windowed_gather(feats, nbr)
        if nbr.ov_idx.shape[-1] == 0:
            return win
        if nbr.pool_idx is not None:
            ov = _pool_gather(feats, nbr)
        elif nbr.ov_window > 0:
            ov = _tiered_gather(feats, nbr.ov_idx, nbr.ov_window, nbr.tile)
        else:
            ov = jnp.take(feats, nbr.ov_idx, axis=0)
        return jnp.concatenate([win, ov], axis=1)
    return jnp.take(feats, nbr.idx, axis=0)


def _pool_gather(feats: jnp.ndarray,
                 wn: WindowedNeighborhood) -> jnp.ndarray:
    """Overflow gather through the tile-shared pool: ONE [nt*P]-row gather
    (vs N*Ko rows for per-point slots), then per-point reads are local
    one-hot matmuls over the pool (search._pool_take — the single
    implementation of the bit-exact pool read and its backend split).  The
    take's scatter-add adjoint touches only nt*P rows — cheap — and the
    one-hot transpose is another einsum, so no custom VJP is needed.

    Invalid slots (ov_idx == P) hit _pool_take's null row; the final select
    restores the self-padding contract (invalid slot == center features,
    so neighbor_diff is exactly 0 there)."""
    from .search import _pool_take

    n, f = feats.shape
    nt, p = wn.pool_idx.shape
    tile = n // nt
    pf = jnp.take(feats, wn.pool_idx.reshape(-1), axis=0).reshape(nt, p, f)
    ov = _pool_take(pf, wn.ov_idx, tile)
    return jnp.where(wn.ov_mask[..., None], ov, feats[:, None, :])


def _tiered_gather(feats, lidx, window, tile):
    """Gather in a wider window tier — one-hot on TPU, row gather on CPU."""
    from .search import use_onehot_fwd

    if use_onehot_fwd():
        return _onehot_take(feats, lidx, window, tile)
    n = feats.shape[0]
    tile_start = (jnp.arange(n, dtype=jnp.int32) // tile) * tile
    gidx = jnp.clip(lidx + (tile_start - window)[:, None], 0, n - 1)
    return _windowed_take(feats, gidx, lidx, window, tile)


def neighbor_diff(vals: jnp.ndarray, nbr) -> jnp.ndarray:
    """Per-edge difference ``x_j - x_i`` (NeighborScatter(use_diff=True),
    tf_ops/TFNeighborKernel.cu:255-288).  Invalid slots are exactly zero
    (self minus self), so no extra masking is needed.

    vals: [N, F] -> [N, K, F].
    """
    return gather_neighbors(vals, nbr) - vals[:, None, :]


def neighbor_concat(feats: jnp.ndarray, nbr) -> jnp.ndarray:
    """Per-edge ``[center ‖ neighbor]`` concat (the reference's
    ``graph_concat_scatter``, tf_ops/graph_conv_layer.py:788-792).

    feats: [N, F] -> [N, K, 2F].
    """
    neigh = gather_neighbors(feats, nbr)
    cen = jnp.broadcast_to(feats[:, None, :], neigh.shape)
    return jnp.concatenate([cen, neigh], axis=-1)


def masked_max(edge_feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Max over valid neighbor slots (the reference's ``graph_pool`` /
    ``NeighborMaxFeatGather``, tf_ops/TFNeighborKernelNew.cu:84-172).

    Points with zero valid neighbors produce 0 (matching the CUDA kernel,
    which leaves zero-initialized output for empty segments).

    edge_feats: [N, K, F] -> [N, F].
    """
    mask = nbr.mask[..., None]
    masked = jnp.where(mask, edge_feats, _NEG_INF)
    out = jnp.max(masked, axis=1)
    any_valid = jnp.any(nbr.mask, axis=1)[..., None]
    return jnp.where(any_valid, out, 0.0)


def masked_sum(edge_feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Sum over valid neighbor slots (``NeighborSumFeatGather``,
    tf_ops/TFNeighborKernelNew.cu:5-27).  [N, K, F] -> [N, F]."""
    return jnp.sum(edge_feats * nbr.mask[..., None].astype(edge_feats.dtype),
                   axis=1)


def masked_mean(edge_feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Mean over valid neighbor slots (``graph_avg_pool`` semantics,
    tf_ops/graph_conv_layer.py:286-289).  Zero-neighbor points produce 0."""
    cnt = nbr.counts()[:, None]
    return masked_sum(edge_feats, nbr) / jnp.maximum(cnt, 1.0)


def masked_mean_eps(edge_feats: jnp.ndarray, nbr: Neighborhood,
                    eps: float = 1e-3) -> jnp.ndarray:
    """The reference ECD layers' eps-regularized mean
    ``(1+eps)/(n+eps) * sum`` (tf_ops/graph_layer_new.py:24-26,
    tf_ops/graph_conv_layer.py:684).  [N, K, F] -> [N, F]."""
    inv = (1.0 + eps) / (nbr.counts()[:, None] + eps)
    return inv * masked_sum(edge_feats, nbr)


def eliminate_center(nbr: Neighborhood) -> Neighborhood:
    """Strip self-edges from a neighborhood (``EliminateCenter``,
    tf_ops/TFNeighborKernelNew.cu:337-392).  With static [N, K] shapes this
    is a pure mask update — no repacking needed."""
    n = nbr.idx.shape[0]
    self_idx = jnp.arange(n, dtype=nbr.idx.dtype)[:, None]
    keep = nbr.mask & (nbr.idx != self_idx)
    idx = jnp.where(keep, nbr.idx, self_idx)
    return Neighborhood(idx=idx, mask=keep)


def concat_non_center(feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """[center ‖ neighbor] over non-self edges
    (``graph_concat_non_center_scatter``, tf_ops/graph_conv_layer.py:297-302).
    Returns ([N, K, 2F], Neighborhood without self-edges)."""
    nc = eliminate_center(nbr)
    return neighbor_concat(feats, nc), nc
