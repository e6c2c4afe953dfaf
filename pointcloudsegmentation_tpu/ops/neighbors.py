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

import jax.numpy as jnp

from .types import Neighborhood

_NEG_INF = -1e30


def gather_neighbors(feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Point features -> per-slot neighbor features.

    Equivalent of ``NeighborScatter(use_diff=False)``
    (tf_ops/TFNeighborKernel.cu:5-59).

    feats: [N, F] -> [N, K, F]; invalid slots hold the center's own features
    (idx is self-padded) — callers must mask before reducing.
    """
    return jnp.take(feats, nbr.idx, axis=0)


def neighbor_diff(vals: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Per-edge difference ``x_j - x_i`` (NeighborScatter(use_diff=True),
    tf_ops/TFNeighborKernel.cu:255-288).  Invalid slots are exactly zero
    (self minus self), so no extra masking is needed.

    vals: [N, F] -> [N, K, F].
    """
    return jnp.take(vals, nbr.idx, axis=0) - vals[:, None, :]


def neighbor_concat(feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Per-edge ``[center ‖ neighbor]`` concat (the reference's
    ``graph_concat_scatter``, tf_ops/graph_conv_layer.py:788-792).

    feats: [N, F] -> [N, K, 2F].
    """
    neigh = jnp.take(feats, nbr.idx, axis=0)
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
