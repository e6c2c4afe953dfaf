"""Context-branch models: large-receptive-field fusion for Semantic3D.

Rebuilds the reference context pipeline (SURVEY.md §5 "long-context"):
each 10 m block is paired with a 50 m, 5 m-voxel-averaged context cloud; a
small ECD net processes the context cloud through its own one-level voxel
pyramid, and each block point gathers the features of its nearest context
point (tracked indices), concatenated onto the main branch's global feats
before the classifier (model_pooling.py:393-427 graph_conv_pool_context*,
semantic3d_context_util.py:322-333, train_gpn_semantic3d_context.py:50-71).

Level-0-only fusion is NOT a simplification: the reference's
"context threading" (graph_pooling_layer.py:149-189
context_points_pooling_two_layers) only PERMUTES ctx_idxs alongside the
level-0 points through its physical voxel re-sorts — the indices stay
per-level-0-point and fuse once, at level 0.  Here the segment-id pyramid
never physically permutes, so the only alignment duty is the in-model
Morton sort, which carries ctx_idx; tests/test_components.py::
test_context_fusion_model asserts per-point logits are invariant to that
permutation (the property the repermutation machinery guarantees).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import hierarchy as hier
from ..ops.types import Pyramid
from .ecd import ECDStage, ECDStageSpec, _masked_global_max, \
    _masked_global_mean
from .layers import SegClassifier


class ContextNet(nn.Module):
    """graph_conv_pool_context_with_pool (model_pooling.py:393-427): ECD
    stage on context points -> voxel pool -> ECD stage on voxel centers ->
    global max/mean tiled back -> unpool-concat.  Input is the context
    cloud's own 2-level pyramid (5 m voxels over a 50 m block)."""

    stage0: ECDStageSpec = ECDStageSpec(
        radius=5.0, k=16, gxyz_dim=16, gc_dims=(16, 16, 16),
        gfc_dims=(16, 16, 16), final_dim=64, dxyz_scale=5.0)
    stage1: ECDStageSpec = ECDStageSpec(
        radius=15.0, k=16, gxyz_dim=16, gc_dims=(32, 32, 32),
        gfc_dims=(32, 32, 64), final_dim=256, dxyz_scale=50.0)
    search_chunk: int = 512

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray) -> jnp.ndarray:
        lvl0, lvl1 = pyramid.levels[0], pyramid.levels[1]
        fc0, lf0 = ECDStage(self.stage0, self.search_chunk, name="stage0")(
            lvl0.xyz, lvl0.mask, pyramid.dxyz[0], feats)
        pooled = jnp.concatenate([hier.pool_max(fc0, pyramid, 0),
                                  hier.pool_avg(lf0, pyramid, 0)], axis=-1)
        fc1, lf1 = ECDStage(self.stage1, self.search_chunk, name="stage1")(
            lvl1.xyz, lvl1.mask, lvl1.xyz, pooled)
        gvec = jnp.concatenate([_masked_global_max(fc1, lvl1.mask),
                                _masked_global_mean(lf1, lvl1.mask)], axis=0)
        up1 = jnp.broadcast_to(gvec[None, :], (fc1.shape[0], gvec.shape[0]))
        up1 = jnp.concatenate([up1, fc1, lf1], axis=-1)
        up0 = jnp.concatenate([hier.unpool(up1, pyramid, 0), fc0, lf0],
                              axis=-1)
        return up0  # [n_ctx, C] — gathered per block point via ctx indices


class ContextFusionModel(nn.Module):
    """Full two-resolution fusion (train_gpn_semantic3d_context tower_loss):
    main ECD branch on the block + ContextNet on the context cloud; each
    block point gathers its nearest context point's features; concat onto
    the main branch's global feats, classifier_v3 head."""

    encoder: nn.Module          # main branch: (pyramid, feats) -> (gf, lf)
    num_classes: int
    voxel_sizes: Tuple[float, ...] = (0.25, 1.0)
    caps: Tuple[int, ...] = (5120, 1280)
    block_size: float = 10.0
    ctx_voxel_size: float = 5.0
    # a 50 m window at 5 m voxels holds up to ~11*11*z occupied cells and
    # the input cloud is already 5 m-averaged (1 point/voxel) — 512 keeps
    # the voxel level from silently saturating on large scenes
    ctx_cap: int = 512
    ctx_block_size: float = 50.0
    # Morton-sort the block (in-jit) so the main branch's windowed search
    # fast path applies; ctx_idx is per-point and permutes along; logits are
    # mapped back to the input order (same contract as SegmentationModel)
    morton_sort: bool = True

    @nn.compact
    def __call__(self, xyz, feats, mask, ctx_xyz, ctx_feats, ctx_mask,
                 ctx_idx, train: bool = False) -> jnp.ndarray:
        from ..ops import morton

        inv = None
        if self.morton_sort:
            cell = self.voxel_sizes[0] / 4.0
            xyz, mask, order, feats, ctx_idx = morton.sort_block(
                xyz, mask, cell, self.block_size, feats, ctx_idx)
            inv = morton.inverse_permutation(order)

        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size,
                                 morton_sorted=self.morton_sort)
        gf, lf = self.encoder(pyr, feats)

        ctx_pyr = hier.build_pyramid(ctx_xyz, ctx_mask,
                                     (self.ctx_voxel_size,), (self.ctx_cap,),
                                     self.ctx_block_size)
        ctx_up = ContextNet(name="context")(ctx_pyr, ctx_feats)
        per_point_ctx = jnp.take(ctx_up, jnp.clip(ctx_idx, 0,
                                                  ctx_up.shape[0] - 1),
                                 axis=0)
        per_point_ctx = per_point_ctx * mask[:, None].astype(
            per_point_ctx.dtype)
        gf = jnp.concatenate([gf, per_point_ctx], axis=-1)
        logits = SegClassifier(self.num_classes, name="head")(gf, lf, train)
        if inv is not None:
            logits = jnp.take(logits, inv, axis=0)
        return logits
