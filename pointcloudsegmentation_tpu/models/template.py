"""Pluggable stage-fn model harness + refine cascade.

- ``TemplateSegModel`` = ``model_template`` (model_new.py:5-52): the generic
  3-stage skeleton that accepts ANY stage module constructor (pointnet /
  anchor / ECD stages) — the reference's ablation harness used by
  analysis_2.py and the conv-comparison experiments.
- ``SemanticPoolRefine`` = ``graph_conv_semantic_pool_v1``
  (model_pooling.py:147-176): the second network of the cascade-refine
  trainer (train_graph_pool_refine.py:62-74), consuming the first model's
  per-point probabilities/features and producing refinement feats that
  concat onto the first model's outputs before a classifier_v5 head.
"""
from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import hierarchy as hier
from ..ops.types import Pyramid
from .ecd import ECDStage, ECDStageSpec, _masked_global_max, \
    _masked_global_mean
from .layers import Dense


class TemplateSegModel(nn.Module):
    """model_template: 3 stages of a pluggable stage constructor
    ``make_stage(stage_idx, spec) -> Module`` with the standard pooled
    encoder + tile/unpool decoder.  Defaults reproduce the template dims
    (model_new.py:10-30)."""

    make_stage: Callable[[int, ECDStageSpec], nn.Module] = \
        lambda i, spec: ECDStage(spec, name=f"stage{i}")
    specs: Tuple[ECDStageSpec, ...] = (
        ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(16,),
                     gfc_dims=(8, 8, 8), final_dim=64, dxyz_scale=0.15),
        ECDStageSpec(radius=0.3, k=16, gxyz_dim=32, gc_dims=(32,),
                     gfc_dims=(32, 32, 32), final_dim=128, dxyz_scale=0.45),
        ECDStageSpec(radius=0.5, k=16, gxyz_dim=32, gc_dims=(32,),
                     gfc_dims=(32, 32, 32), final_dim=256, dxyz_scale=3.0),
    )

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        fcs, lfs = [], []
        cur = feats
        top = len(self.specs) - 1
        for s, spec in enumerate(self.specs):
            lvl = pyramid.levels[s]
            dxyz = pyramid.dxyz[s] if s == 0 else lvl.xyz
            fc, lf = self.make_stage(s, spec)(
                lvl.xyz, lvl.mask, dxyz, cur,
                is_sorted=pyramid.level_sorted(s))
            fcs.append(fc)
            lfs.append(lf)
            if s < top:
                cur = jnp.concatenate([hier.pool_max(fc, pyramid, s),
                                       hier.pool_avg(lf, pyramid, s)],
                                      axis=-1)
        tmask = pyramid.levels[top].mask
        gvec = jnp.concatenate([_masked_global_max(fcs[top], tmask),
                                _masked_global_mean(lfs[top], tmask)], axis=0)
        up = jnp.broadcast_to(gvec[None, :],
                              (fcs[top].shape[0], gvec.shape[0]))
        up = jnp.concatenate([up, fcs[top], lfs[top]], axis=-1)
        for s in range(top - 1, -1, -1):
            up = jnp.concatenate(
                [hier.unpool(up, pyramid, s), fcs[s], lfs[s]], axis=-1)
        return up, jnp.concatenate([fcs[0], lfs[0]], axis=-1)


class GenericStage(nn.Module):
    """The reference's pluggable stage skeleton (model_new.py:105-469):
    radius search -> xyz conv -> concat feats -> per-gc_dim (embed FC ->
    conv -> concat growth) -> global FC tail on [cfeats ‖ dxyz/voxel].
    Only the conv primitive differs between the reference's stage fns:

    - ``conv='pointnet'``   = pointnet_stage (model_new.py:105-142)
    - ``conv='anchor'``     = anchor_conv_stage (:189-230): plain v1
      anchor conv — exp(−‖sxyz−anchor‖²) weights on raw feats, masked sum,
      ReLU out FC (tf_ops/graph_layer_new.py:202-222)
    - ``conv='mlp_anchor'`` = the mlp_anchor flavor of conv_compare.sh
      (MLPAnchorConv, tf_ops/graph_layer_new.py:388-433)
    - ``conv='diffusion_anchor'`` =
      edge_condition_diffusion_anchor_stage (model_new.py:236-300)
    """

    spec: ECDStageSpec
    conv: str = "pointnet"
    anchor_num: int = 16
    search_chunk: int = 1024

    def _conv(self, dim: int, name: str):
        from .layers import AnchorConv, PointNetConv
        from .variants import DiffusionAnchorConv
        from .ecd import MLPAnchorConv

        half = max(dim // 2, 4)
        if self.conv == "pointnet":
            return PointNetConv((half, half), dim, name=name)
        if self.conv == "mlp_anchor":
            return MLPAnchorConv((half, half), dim, self.anchor_num,
                                 name=name)
        if self.conv == "diffusion_anchor":
            return DiffusionAnchorConv(
                2, self.anchor_num, dim, (half, half),
                embed_dim=max(dim // self.anchor_num, 1), name=name)
        raise ValueError(self.conv)

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, mask: jnp.ndarray,
                 dxyz: jnp.ndarray, feats: jnp.ndarray,
                 is_sorted: bool = False):
        from ..ops import search
        from ..ops import neighbors as nb
        from ..ops import anchors as anchor_gen

        sp = self.spec
        (nbr, sxyz_raw), = search.band_neighbors_auto(
            xyz, mask, ((0.0, sp.radius, sp.k),),
            cand_k=min(4 * sp.k, xyz.shape[0]),
            chunk=min(self.search_chunk, xyz.shape[0]), return_sxyz=True,
            sorted=is_sorted)
        sxyz = sxyz_raw / sp.radius

        def apply_conv(dim, name, f):
            if self.conv == "anchor":
                # anchor_conv v1 (graph_layer_new.py:202-222): raw feats
                # weighted by exp(-d²) to fixed anchors, masked sum
                edge = nb.gather_neighbors(f, nbr)             # [N,K,F]
                anchors = self.param(
                    f"{name}_anchor",
                    lambda k: jnp.asarray(
                        anchor_gen.sphere_kmeans_anchors(self.anchor_num).T))
                d2 = jnp.sum((sxyz[:, :, None, :]
                              - anchors[None, None, :, :]) ** 2, axis=-1)
                w = jnp.exp(-d2) * nbr.mask[..., None]         # [N,K,an]
                agg = jnp.einsum("nka,nkf->naf", w, edge)
                agg = agg.reshape(agg.shape[0], -1)            # [N,an*F]
                return nn.relu(Dense(dim, name=f"{name}_fc_out")(agg))
            return self._conv(dim, name)(sxyz, f, nbr)

        g = sp.gxyz_dim
        xyz_gc = apply_conv(g, "xyz_gc", xyz)
        cfeats = jnp.concatenate([xyz_gc, feats], axis=-1)
        for li, gd in enumerate(sp.gc_dims):
            h = nn.relu(Dense(gd, name=f"embed_{li}")(cfeats))
            conv = apply_conv(gd, f"gc_{li}", h)
            cfeats = jnp.concatenate([cfeats, conv], axis=-1)

        fc_feats = jnp.concatenate([cfeats, dxyz / sp.dxyz_scale], axis=-1)
        for i, gfd in enumerate(sp.gfc_dims):
            h = nn.relu(Dense(gfd, name=f"gfc_{i}")(fc_feats))
            fc_feats = jnp.concatenate([h, fc_feats], axis=-1)
        return Dense(sp.final_dim, name="final_gfc")(fc_feats), cfeats


class SemanticPoolRefine(nn.Module):
    """graph_conv_semantic_pool_v1: embed the first model's semantic feats
    to 256, two ECD stages over a (class-pure) 1-level pyramid, global max
    tiled back, unpool-concat.  Returns (refine_global, refine_local)."""

    stage0: ECDStageSpec = ECDStageSpec(
        radius=0.1, k=16, gxyz_dim=16, gc_dims=(16, 16),
        gfc_dims=(128, 128, 128), final_dim=256, dxyz_scale=0.2)
    stage1: ECDStageSpec = ECDStageSpec(
        radius=1.5, k=16, gxyz_dim=16, gc_dims=(64, 64, 64, 64),
        gfc_dims=(128, 128, 128), final_dim=256, dxyz_scale=3.0)

    @nn.compact
    def __call__(self, pyramid: Pyramid, sem_feats: jnp.ndarray):
        feats = nn.relu(Dense(256, name="semantic_embed")(sem_feats))
        lvl0, lvl1 = pyramid.levels[0], pyramid.levels[1]
        fc0, lf0 = ECDStage(self.stage0, name="stage0")(
            lvl0.xyz, lvl0.mask, pyramid.dxyz[0], feats,
            is_sorted=pyramid.level_sorted(0))
        pooled = hier.pool_max(fc0, pyramid, 0)
        fc1, lf1 = ECDStage(self.stage1, name="stage1")(
            lvl1.xyz, lvl1.mask, lvl1.xyz, pooled,
            is_sorted=pyramid.level_sorted(1))
        gvec = _masked_global_max(fc1, lvl1.mask)
        up1 = jnp.broadcast_to(gvec[None, :], (fc1.shape[0], gvec.shape[0]))
        up1 = jnp.concatenate([up1, fc1, lf1], axis=-1)
        up0 = jnp.concatenate([hier.unpool(up1, pyramid, 0), fc0, lf0],
                              axis=-1)
        return up0, jnp.concatenate([lf0, fc0], axis=-1)
