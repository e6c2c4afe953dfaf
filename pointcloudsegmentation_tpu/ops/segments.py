"""Deterministic masked segment reductions with static segment counts.

These back the voxel pooling hierarchy: points carry a segment id into the
next level's voxel slots (``[0, V)`` valid, ``V`` = overflow slot for
invalid/overflowed points).  Equivalents of the reference's voxel ops
``NeighborMaxFeatGather`` (max-pool, tf_ops/TFNeighborKernelNew.cu:84-172),
``NeighborSumFeatGather`` (sum, tf_ops/TFNeighborKernelNew.cu:5-27) and
``NeighborSumFeatScatter`` (unpool broadcast,
tf_ops/TFNeighborKernelNew.cu:32-79), rebuilt on ``jax.ops.segment_*`` so
the accumulation order is deterministic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def segment_sum(data: jnp.ndarray, seg: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """[N, F] summed into [V, F].  ``seg`` values == num_segments (overflow)
    are accumulated into a scratch slot and dropped."""
    out = jax.ops.segment_sum(data, seg, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(seg: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Number of points in each segment, float32 [V]."""
    ones = jnp.ones(seg.shape, jnp.float32)
    return segment_sum(ones[:, None], seg, num_segments)[:, 0]


def segment_mean(data: jnp.ndarray, seg: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Mean per segment; empty segments produce 0 (``graph_avg_pool``
    semantics, tf_ops/graph_conv_layer.py:286-289)."""
    s = segment_sum(data, seg, num_segments)
    cnt = segment_count(seg, num_segments)[:, None]
    return s / jnp.maximum(cnt, 1.0)


def segment_max(data: jnp.ndarray, seg: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    """Max per segment; empty segments produce 0, matching the CUDA
    max-gather's zero-initialized output (the reference's ``graph_pool``,
    tf_ops/graph_conv_layer.py:277-279)."""
    out = jax.ops.segment_max(data, seg, num_segments=num_segments + 1)
    out = out[:num_segments]
    cnt = segment_count(seg, num_segments)[:, None]
    return jnp.where(cnt > 0, out, 0.0)


def segment_unpool(voxel_feats: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
    """Broadcast voxel features back to their member points (the reference's
    ``graph_unpool`` / NeighborSumFeatScatter).  Overflow segment ids gather
    row 0 of a zero pad, producing zeros.

    voxel_feats: [V, F], seg: [N] -> [N, F].
    """
    padded = jnp.concatenate(
        [voxel_feats, jnp.zeros((1,) + voxel_feats.shape[1:],
                                voxel_feats.dtype)], axis=0)
    return jnp.take(padded, seg, axis=0)
