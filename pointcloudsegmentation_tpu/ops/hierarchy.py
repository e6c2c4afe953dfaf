"""In-graph voxel pooling hierarchy builder.

TPU-native equivalent of the reference's ``points_pooling`` /
``points_pooling_two_layers`` / ``points_pooling_three_layers``
(tf_ops/graph_pooling_layer.py:39-64,110-146,261-322).  The reference sorts
points into voxel-contiguous order at each level and then re-permutes the
finer level after the coarser sort (ComputeRepermutationInfo); we keep points
in place and carry segment-id maps (see types.Pyramid), so features, labels
and any auxiliary per-point array never move.

Shapes are fully static: each level has a fixed capacity, points/voxels
beyond it fall into the overflow slot and are masked everywhere downstream.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from . import segments as seg_ops
from . import voxelize as vox
from .types import Level, Pyramid


def build_pyramid(xyz: jnp.ndarray, mask: jnp.ndarray,
                  voxel_sizes: Sequence[float],
                  caps: Sequence[int],
                  block_size: float = 3.0,
                  morton_sorted: bool = False) -> Pyramid:
    """Build an L+1-level pyramid from a padded point set.

    xyz: [N, 3]; mask: [N]; len(voxel_sizes) == len(caps) == L.
    Level 0 is the input; level i+1 holds the voxel centers of level i
    voxelized at voxel_sizes[i] with static capacity caps[i].
    ``morton_sorted``: assert that the INPUT points are Morton-sorted
    (ops.morton.sort_block) — gates the windowed search fast path at level 0
    (coarser levels are Morton-ordered by construction either way).

    Matches the reference two-layer recipe (voxel_size1=0.15,
    voxel_size2=0.45, block_size=3.0 for S3DIS —
    train_graph_pool_new.py:54) when called with those sizes.
    """
    levels = [Level(xyz=xyz, mask=mask)]
    segs: Tuple[jnp.ndarray, ...] = ()
    dxyzs: Tuple[jnp.ndarray, ...] = ()
    cur_xyz, cur_mask = xyz, mask
    for vs, cap in zip(voxel_sizes, caps):
        info = vox.voxelize(cur_xyz, cur_mask, vs, block_size, cap)
        dxyz = vox.diff_to_center(cur_xyz, info.centers, info.seg)
        dxyz = jnp.where(cur_mask[:, None], dxyz, 0.0)
        segs += (info.seg,)
        dxyzs += (dxyz,)
        cur_xyz, cur_mask = info.centers, info.mask
        levels.append(Level(xyz=cur_xyz, mask=cur_mask))
    return Pyramid(levels=tuple(levels), seg=segs, dxyz=dxyzs,
                   morton_sorted=morton_sorted)


def pool_max(feats: jnp.ndarray, pyramid: Pyramid, level: int) -> jnp.ndarray:
    """Voxel max-pool level -> level+1 (``graph_pool``,
    tf_ops/graph_conv_layer.py:277-279)."""
    cap = pyramid.levels[level + 1].xyz.shape[0]
    return seg_ops.segment_max(feats, pyramid.seg[level], cap)


def pool_avg(feats: jnp.ndarray, pyramid: Pyramid, level: int) -> jnp.ndarray:
    """Voxel average-pool (``graph_avg_pool``,
    tf_ops/graph_conv_layer.py:286-289)."""
    cap = pyramid.levels[level + 1].xyz.shape[0]
    mask = pyramid.levels[level].mask[:, None].astype(feats.dtype)
    return seg_ops.segment_mean(feats * mask, pyramid.seg[level], cap)


def unpool(feats: jnp.ndarray, pyramid: Pyramid, level: int) -> jnp.ndarray:
    """Broadcast level+1 voxel features to level points (``graph_unpool``,
    tf_ops/graph_conv_layer.py:292-294)."""
    return seg_ops.segment_unpool(feats, pyramid.seg[level])


def build_class_pyramid(xyz: jnp.ndarray, mask: jnp.ndarray,
                        labels: jnp.ndarray, num_classes: int,
                        voxel_size: float, cap: int,
                        block_size: float = 3.0,
                        morton_sorted: bool = False) -> Pyramid:
    """Two-level pyramid whose voxels are class-pure: the packed voxel key
    includes the (predicted) class label, so points of different classes
    never share a segment (``class_pooling``,
    tf_ops/graph_pooling_layer.py:230-257 backed by
    ComputePermutationInfoWithClass) — the refine cascade's second
    hierarchy (train_graph_pool_refine.py:64-65).

    Unlike the reference, points are NOT physically re-permuted, so every
    per-point array stays aligned across the cascade (the reference trainer
    passes the un-permuted ``feats`` into the refine net after
    class_pooling reordered everything else)."""
    info = vox.voxelize_with_labels(xyz, mask, labels, voxel_size,
                                    block_size, cap, num_classes)
    dxyz = vox.diff_to_center(xyz, info.centers, info.seg)
    dxyz = jnp.where(mask[:, None], dxyz, 0.0)
    return Pyramid(levels=(Level(xyz=xyz, mask=mask),
                           Level(xyz=info.centers, mask=info.mask)),
                   seg=(info.seg,), dxyz=(dxyz,),
                   morton_sorted=morton_sorted)


def average_downsample(xyz: jnp.ndarray, feats: jnp.ndarray,
                       mask: jnp.ndarray, ds_size: float,
                       block_size: float, v_max: int):
    """Voxel-mean downsample of coordinates AND features
    (``average_downsample``, tf_ops/graph_pooling_layer.py:67-85; also the
    in-graph prep reused by the Semantic3D context pipeline,
    semantic3d_context_util.py:96-108).

    Returns (center_xyz [v_max,3], center_feats [v_max,F], vmask [v_max]).
    """
    from . import voxelize as vox

    info = vox.voxelize(xyz, mask, ds_size, block_size, v_max)
    mf = mask[:, None].astype(feats.dtype)
    cf = seg_ops.segment_mean(feats * mf, info.seg, v_max)
    return info.centers, cf, info.mask
