"""Model registry: config key -> end-to-end flax Module (pyramid + encoder +
head), the analog of each train_*.py's hardwired model choice
(e.g. train_graph_pool_new.py:55-59)."""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models import (ClassifierHead, ECDSegModel, GPNClassModel,
                      PGNetHybrid, PointNetSegEncoder, S3DIS_ARCH,
                      S3DIS_ECD_SPEC, SCANNET_ARCH, SCANNET_ECD_SPEC,
                      SEMANTIC3D_ARCH, SegClassifier)
from ..ops import hierarchy as hier
from .config import TrainConfig


class SegmentationModel(nn.Module):
    """Per-block pipeline: points_pooling hierarchy -> encoder ->
    classifier_v3 head -> per-point logits (the reference's ``tower_loss``
    body, train_graph_pool_new.py:51-61).  ``diffusion_steps > 0`` smooths
    the output probabilities over the level-0 neighborhood (the
    --use_diffusion path, model.py:920-945 graph_probs_diffusion)."""

    encoder: nn.Module
    num_classes: int
    voxel_sizes: Tuple[float, ...]
    caps: Tuple[int, ...]
    block_size: float
    diffusion_steps: int = 0
    diffusion_radius: float = 0.1

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..models.layers import ProbsDiffusion
        from ..ops import search

        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size)
        gf, lf = self.encoder(pyr, feats)
        logits = SegClassifier(self.num_classes, name="head")(gf, lf, train)
        if self.diffusion_steps > 0:
            nbr = search.radius_neighbors(xyz, mask, self.diffusion_radius,
                                          8, chunk=min(1024, xyz.shape[0]))
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = ProbsDiffusion(self.diffusion_steps,
                                   name="diffusion")(probs, nbr)
            logits = jnp.log(jnp.maximum(probs, 1e-12))
        return logits


class ClassificationModel(nn.Module):
    """Per-cloud pipeline for ModelNet40 (train_modelnet40.py:41-58)."""

    encoder: nn.Module
    num_classes: int
    voxel_sizes: Tuple[float, ...]
    caps: Tuple[int, ...]
    block_size: float

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size)
        vec = self.encoder(pyr, feats)
        return ClassifierHead(self.num_classes, name="head")(
            vec[None, :], train)[0]


def build_model(cfg: TrainConfig, search_chunk: int = 1024) -> nn.Module:
    d = cfg.data
    common = dict(num_classes=d.num_classes, voxel_sizes=d.voxel_sizes,
                  caps=d.caps, block_size=d.block_size)
    seg_extra = dict(diffusion_steps=getattr(cfg, "diffusion_steps", 0))
    enc_map: Dict[str, Callable[[], nn.Module]] = {
        "pointnet_s3dis": lambda: PointNetSegEncoder(
            arch=S3DIS_ARCH, search_chunk=search_chunk),
        "pointnet_scannet": lambda: PointNetSegEncoder(
            arch=SCANNET_ARCH, search_chunk=search_chunk),
        "pointnet_semantic3d": lambda: PointNetSegEncoder(
            arch=SEMANTIC3D_ARCH, search_chunk=search_chunk),
        "ecd_scannet": lambda: ECDSegModel(
            specs=SCANNET_ECD_SPEC, search_chunk=search_chunk),
        "ecd_s3dis": lambda: ECDSegModel(
            specs=S3DIS_ECD_SPEC, search_chunk=search_chunk),
        "pgnet_v8": lambda: PGNetHybrid(search_chunk=search_chunk),
        "gpn_seg": lambda: __import__(
            "pointcloudsegmentation_tpu.models.gpn", fromlist=["GPNSegModel"]
        ).GPNSegModel(search_chunk=search_chunk),
    }
    if cfg.model in enc_map:
        return SegmentationModel(encoder=enc_map[cfg.model](), **common,
                                 **seg_extra)
    if cfg.model == "gpn_modelnet40":
        return ClassificationModel(
            encoder=GPNClassModel(search_chunk=search_chunk), **common)
    if cfg.model == "context_semantic3d":
        # two-resolution fusion (train_gpn_semantic3d_context.py:50-71)
        from ..models import ContextFusionModel
        from ..models.ecd import S3DIS_ECD_SPEC

        return ContextFusionModel(
            encoder=ECDSegModel(specs=S3DIS_ECD_SPEC,
                                search_chunk=search_chunk),
            num_classes=d.num_classes, voxel_sizes=d.voxel_sizes,
            caps=d.caps, block_size=d.block_size)
    raise KeyError(
        f"unknown model '{cfg.model}'; known: "
        f"{sorted(enc_map) + ['gpn_modelnet40', 'context_semantic3d']}")
