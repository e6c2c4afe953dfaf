"""GPN (Gaussian-anchored location-weighted) models.

The reference's first model family (model.py:484-727,979-1260): per-stage
``graph_conv_xyz``/``graph_conv_feats`` anchored convs sharing one set of
location weights ``lw = exp(sxyz·pmiu)`` per neighborhood, DenseNet-style
feature growth, voxel max-pool between stages, and either

- a segmentation decoder (tile global + unpool,
  ``graph_conv_pool_v7_nosum_lpmiu`` model.py:1222-…), or
- a classification head: global max over fc/lf of all stages concatenated
  (``graph_conv_pool_model_v1`` model.py:1193-1229, used by
  train_modelnet40.py:46-49).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import hierarchy as hier
from ..ops import search
from ..ops.types import Pyramid
from .layers import Dense, GPNConv


@dataclass(frozen=True)
class GPNStageSpec:
    radius: float
    k: int
    gxyz_dim: int = 8
    gc_dims: Tuple[int, ...] = (8, 16, 32)
    fc_dims: Tuple[int, ...] = (8, 16, 32)
    gfc_dims: Tuple[int, ...] = (32, 32, 32)
    final_dim: int = 32


# graph_conv_pool_model_v1's stage dims (model.py:1199-1218); radii sized for
# unit-sphere-normalized ModelNet40 clouds.
MODELNET_SPEC = (
    GPNStageSpec(radius=0.12, k=16, gxyz_dim=8, gc_dims=(8, 16, 32),
                 fc_dims=(8, 16, 32), gfc_dims=(32, 32, 32), final_dim=32),
    GPNStageSpec(radius=0.3, k=16, gxyz_dim=8,
                 gc_dims=(32, 32, 32, 64, 64, 64),
                 fc_dims=(32, 32, 32, 64, 64, 64),
                 gfc_dims=(128, 128, 128), final_dim=128),
    GPNStageSpec(radius=0.6, k=16, gxyz_dim=8, gc_dims=(128, 128, 256),
                 fc_dims=(128, 128, 256), gfc_dims=(256, 256),
                 final_dim=256),
)


class GPNStage(nn.Module):
    """graph_pmiu_nosum_all_conv_pool_stage (model.py): one anchored-conv
    stage sharing lw/lw_sum across all its convs."""

    spec: GPNStageSpec
    m: int = 26
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, mask: jnp.ndarray,
                 dxyz: jnp.ndarray, feats: jnp.ndarray,
                 is_sorted: bool = False):
        sp = self.spec
        # 4x slack pool: approx_max_k recall misses land in the unused tail
        (nbr, sxyz), = search.band_neighbors_auto(
            xyz, mask, ((0.0, sp.radius, sp.k),),
            cand_k=min(4 * sp.k, xyz.shape[0]), return_sxyz=True,
            sorted=is_sorted)
        # raw diffs: lw = exp(sxyz @ pmiu)

        xyz_gc, lw, lw_sum = GPNConv(self.m, sp.gxyz_dim, mode="xyz",
                                     no_sum=True, name="xyz_gc")(
            sxyz, None, nbr)
        xyz_gc = nn.relu(Dense(sp.gxyz_dim, name="xyz_fc")(xyz_gc))
        cfeats = jnp.concatenate([xyz_gc, feats], axis=-1)

        # graph_diff_conv_pool_block, use_diff=False branch (model.py)
        for li, (gd, fd) in enumerate(zip(sp.gc_dims, sp.fc_dims)):
            gc, _, _ = GPNConv(self.m, gd, mode="feats", no_sum=True,
                               name=f"gc_{li}")(sxyz, cfeats, nbr,
                                                lw=lw, lw_sum=lw_sum)
            gc = jnp.concatenate([gc, cfeats], axis=-1)
            fc = nn.relu(Dense(fd, name=f"fc_{li}")(gc))
            cfeats = jnp.concatenate([fc, cfeats], axis=-1)

        # plain (non-growth) global MLP on [cfeats ‖ dxyz] (model.py)
        x = jnp.concatenate([cfeats, dxyz], axis=-1)
        for i, gfd in enumerate(sp.gfc_dims):
            x = nn.relu(Dense(gfd, name=f"gfc_{i}")(x))
        fc_final = Dense(sp.final_dim, name="gfc_final")(x)
        return fc_final, cfeats


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask[:, None], x, -1e30), axis=0)


class GPNClassModel(nn.Module):
    """graph_conv_pool_model_v1 (model.py:1193-1229): 3 GPN stages with voxel
    max-pool between, global max of every stage's fc/lf concatenated into a
    single cloud descriptor."""

    specs: Tuple[GPNStageSpec, ...] = MODELNET_SPEC
    m: int = 26
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray) -> jnp.ndarray:
        fcs, lfs = [], []
        cur = feats
        for s, sp in enumerate(self.specs):
            lvl = pyramid.levels[s]
            dxyz = pyramid.dxyz[s] if s < len(pyramid.dxyz) else lvl.xyz
            fc, lf = GPNStage(sp, self.m, self.search_chunk,
                              name=f"stage{s}")(lvl.xyz, lvl.mask, dxyz, cur,
                                                is_sorted=pyramid.level_sorted(s))
            fcs.append(fc)
            lfs.append(lf)
            if s < len(self.specs) - 1:
                cur = hier.pool_max(fc, pyramid, s)

        parts = [_masked_max(fc, pyramid.levels[s].mask)
                 for s, fc in enumerate(fcs)]
        parts += [_masked_max(lf, pyramid.levels[s].mask)
                  for s, lf in enumerate(lfs)]
        return jnp.concatenate(parts, axis=0)


class GPNSegModel(nn.Module):
    """GPN segmentation net (graph_conv_pool_v7_nosum_lpmiu family,
    model.py:1222+): stages + voxel pools, global max at the top, tiled and
    unpooled back down with per-stage concat."""

    specs: Tuple[GPNStageSpec, ...] = MODELNET_SPEC
    m: int = 26
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        fcs, lfs = [], []
        cur = feats
        top = len(self.specs) - 1
        for s, sp in enumerate(self.specs):
            lvl = pyramid.levels[s]
            dxyz = pyramid.dxyz[s] if s < len(pyramid.dxyz) else lvl.xyz
            fc, lf = GPNStage(sp, self.m, self.search_chunk,
                              name=f"stage{s}")(lvl.xyz, lvl.mask, dxyz, cur,
                                                is_sorted=pyramid.level_sorted(s))
            fcs.append(fc)
            lfs.append(lf)
            if s < top:
                cur = hier.pool_max(fc, pyramid, s)

        gvec = _masked_max(fcs[top], pyramid.levels[top].mask)
        up = jnp.broadcast_to(gvec[None, :],
                              (fcs[top].shape[0], gvec.shape[0]))
        up = jnp.concatenate([up, fcs[top], lfs[top]], axis=-1)
        for s in range(top - 1, -1, -1):
            up = jnp.concatenate(
                [hier.unpool(up, pyramid, s), fcs[s], lfs[s]], axis=-1)
        local = jnp.concatenate([fcs[0], lfs[0]], axis=-1)
        return up, local


class ClassifierHead(nn.Module):
    """model_classifier_v1 (model.py:1231-1262): 512 -> concat(input) ->
    dropout(keep .7) -> 256 -> concat(input) -> dropout -> logits."""

    num_classes: int
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.relu(Dense(512, name="class_fc1")(feats))
        x = jnp.concatenate([x, feats], axis=-1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.relu(Dense(256, name="class_fc2")(x))
        x = jnp.concatenate([x, feats], axis=-1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return Dense(self.num_classes, name="class_fc3")(x)
