"""Model registry: config key -> end-to-end flax Module (pyramid + encoder +
head), the analog of each train_*.py's hardwired model choice
(e.g. train_graph_pool_new.py:55-59)."""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models import (ClassifierHead, ECDSegModel, GPNClassModel,
                      PGNET_V3_SPEC, PGNET_V4_SPEC, PGNET_V5_SPEC,
                      PGNetHybrid, PGNetV6, PGNetV7, PointNetSegEncoder,
                      S3DIS_ARCH, S3DIS_ECD_SPEC, SCANNET_ARCH,
                      SCANNET_ECD_SPEC, SEMANTIC3D_ARCH,
                      SEMANTIC3D_DILATE_ARCH, SegClassifier)
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
    # Morton-sort the input points (in-jit, one argsort + three row gathers)
    # so the encoder's windowed search/conv fast path applies; per-point
    # logits are mapped back to the input order before returning, so the
    # sort is invisible to callers.
    morton_sort: bool = True
    # the encoder returns the classifier's first Dense pre-activation
    # instead of the wide decoder concat (PointNetSegEncoder.head_dim)
    head_premixed: bool = False

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..models.layers import ProbsDiffusion
        from ..ops import morton, search

        inv = None
        if self.morton_sort:
            cell = self.voxel_sizes[0] / 4.0
            xyz, mask, order, feats = morton.sort_block(
                xyz, mask, cell, self.block_size, feats)
            inv = morton.inverse_permutation(order)

        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size,
                                 morton_sorted=self.morton_sort)
        gf, lf = self.encoder(pyr, feats)
        logits = SegClassifier(self.num_classes, name="head",
                               premixed=self.head_premixed)(gf, lf, train)
        if self.diffusion_steps > 0:
            nbr = search.radius_neighbors(xyz, mask, self.diffusion_radius,
                                          8, chunk=min(1024, xyz.shape[0]))
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = ProbsDiffusion(self.diffusion_steps,
                                   name="diffusion")(probs, nbr)
            logits = jnp.log(jnp.maximum(probs, 1e-12))
        if inv is not None:
            logits = jnp.take(logits, inv, axis=0)
        return logits


class RefineCascadeModel(nn.Module):
    """Two-model refine cascade (train_graph_pool_refine.py:44-84):

    base encoder + classifier_v3 -> base logits; argmax predictions
    (stop-gradient) build a class-pure 0.75 m voxel pyramid
    (``class_pooling``); ``SemanticPoolRefine`` consumes the base model's
    global feats over it; a ``classifier_v5`` head on
    [refine_global ‖ base_global] with [base_local ‖ refine_local] skip
    produces the refined logits.  Returns [2, N, C]: (refine, base) — the
    trainer weights the base loss by ``base_loss_weight``
    (FLAGS.base_weight, :33).

    Deviation from the reference (documented): the reference feeds the
    *un-re-permuted* input feats into the refine net after class_pooling
    physically reordered the points (:65-67) — a feature/point misalignment
    its own design invites.  Segment-id pyramids never reorder points, so
    this cascade is alignment-correct by construction; we pass the base
    global feats (the semantic features the refine net's ``semantic_embed``
    expects, model_pooling.py:150-151).
    """

    encoder: nn.Module
    num_classes: int
    voxel_sizes: Tuple[float, ...]
    caps: Tuple[int, ...]
    block_size: float
    refine_voxel: float = 0.75
    refine_cap: int = 0  # 0 -> caps[-1]
    morton_sort: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray,
                 mask: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..models import SemanticPoolRefine
        from ..ops import morton

        inv = None
        if self.morton_sort:
            cell = self.voxel_sizes[0] / 4.0
            xyz, mask, order, feats = morton.sort_block(
                xyz, mask, cell, self.block_size, feats)
            inv = morton.inverse_permutation(order)

        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size,
                                 morton_sorted=self.morton_sort)
        gf, lf = self.encoder(pyr, feats)
        base_logits = SegClassifier(self.num_classes, name="head")(
            gf, lf, train)

        preds = jax.lax.stop_gradient(
            jnp.argmax(base_logits, axis=-1).astype(jnp.int32))
        cap = self.refine_cap or self.caps[-1]
        cpyr = hier.build_class_pyramid(xyz, mask, preds, self.num_classes,
                                        self.refine_voxel, cap,
                                        self.block_size,
                                        morton_sorted=self.morton_sort)
        rgf, rlf = SemanticPoolRefine(name="refine")(
            cpyr, jax.lax.stop_gradient(gf))
        rgf = jnp.concatenate([rgf, gf], axis=-1)
        rlf = jnp.concatenate([lf, rlf], axis=-1)
        refine_logits = SegClassifier(self.num_classes,
                                      name="refine_head")(rgf, rlf, train)
        out = jnp.stack([refine_logits, base_logits])
        if inv is not None:
            out = jnp.take(out, inv, axis=1)
        return out


class DenseSegModel(nn.Module):
    """Dense-pipeline model (train_gpn_semantic3d_dense.py:52-65): a
    ``DenseFeats`` pre-encoder pools a fixed-K dense->sampled neighborhood
    onto the sampled points, then the standard pyramid + encoder + head run
    on the (enriched) sampled points.  The batch carries the dense cloud in
    ``dense_xyz/dense_feats/dense_mask`` next to the sampled
    ``xyz/feats/mask/labels``."""

    encoder: nn.Module
    num_classes: int
    voxel_sizes: Tuple[float, ...]
    caps: Tuple[int, ...]
    block_size: float
    morton_sort: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: jnp.ndarray,
                 mask: jnp.ndarray, dense_xyz: jnp.ndarray,
                 dense_feats: jnp.ndarray, dense_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        from ..models import DenseFeats
        from ..ops import morton

        feats = DenseFeats(name="dense_feats")(
            dense_xyz, dense_feats, dense_mask, xyz, feats, mask)
        inv = None
        if self.morton_sort:
            cell = self.voxel_sizes[0] / 4.0
            xyz, mask, order, feats = morton.sort_block(
                xyz, mask, cell, self.block_size, feats)
            inv = morton.inverse_permutation(order)
        pyr = hier.build_pyramid(xyz, mask, self.voxel_sizes, self.caps,
                                 self.block_size,
                                 morton_sorted=self.morton_sort)
        gf, lf = self.encoder(pyr, feats)
        logits = SegClassifier(self.num_classes, name="head")(gf, lf, train)
        if inv is not None:
            logits = jnp.take(logits, inv, axis=0)
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
    import os

    d = cfg.data
    # perf-tuning knobs for A/B runs without code edits.  The windowed
    # backward's dense overlap-add requires window % tile == 0, so either
    # the window is a multiple of the 256 tile, or (for window < 256 A/Bs)
    # the tile shrinks to the window.
    _win = int(os.environ.get("PCS_WIN_WINDOW", 256))
    _enc_kw = dict(search_chunk=search_chunk)
    if _win != 256:
        if _win <= 0:
            raise ValueError(f"PCS_WIN_WINDOW={_win}: must be positive")
        if _win % 256 == 0:
            _enc_kw["win_window"] = _win
        elif 256 % _win == 0:
            _enc_kw["win_window"] = _win
            _enc_kw["win_tile"] = _win
        else:
            raise ValueError(
                f"PCS_WIN_WINDOW={_win}: must be a multiple of the tile "
                "(256) or a divisor of it — window % tile == 0 is required "
                "by the windowed conv backward's dense overlap-add")
    # tile-shared overflow pool size (0 = per-point global slot gathers).
    # 384 measured 355k vs 273k points/s/chip (bench, r3).  After the
    # lattice-frame fix, P=256 benches 422-426k vs 406-408k at P=384
    # (3 clean runs, tight chains) and passes the 0.94 recall contract on
    # every band at slab/ck=32 (min 0.9513, verify_search_recall
    # slab:32:256), so it is the default; pre-fix P=256/512 compile
    # pathologies did not recur post-fix.
    _ovp = int(os.environ.get("PCS_OV_POOL", 256))
    if _ovp < 0:
        raise ValueError(f"PCS_OV_POOL={_ovp}: must be >= 0")
    _enc_kw["ov_pool_size"] = _ovp
    # windowed-selection candidate-pool size (A/B knob; clamped to the
    # widest band's slot count in the encoder; the global-fallback search
    # keeps the encoder's cand_k)
    _ck = int(os.environ.get("PCS_CAND_K", 0))
    if _ck:
        _enc_kw["win_cand_k"] = _ck
    # backward rematerialization of the conv stacks (A/B knob; see
    # PointNetSegEncoder.remat)
    if os.environ.get("PCS_REMAT", "") == "1":
        _enc_kw["remat"] = True
    # windowed candidate-selection strategy (see PointNetSegEncoder.sel_mode)
    _sm = os.environ.get("PCS_SEL_MODE", "")
    if _sm:
        if _sm not in ("global", "slab"):
            raise ValueError(f"PCS_SEL_MODE={_sm}: must be global|slab")
        _enc_kw["sel_mode"] = _sm
    common = dict(num_classes=d.num_classes, voxel_sizes=d.voxel_sizes,
                  caps=d.caps, block_size=d.block_size)
    seg_extra = dict(diffusion_steps=getattr(cfg, "diffusion_steps", 0))
    def _tiny_arch():
        # 2-stage / 3-conv miniature of the flagship machine (same code
        # paths: dilated band, embed bottleneck, pool block, decoder) for
        # CI-fast trainer tests — the full specs compile in minutes on CPU
        from ..models.pointnet import Arch, ConvSpec, StageSpec

        return Arch(stages=(
            StageSpec(rescale=0.3, convs=(
                ConvSpec(radius=0.3, k=8, fc_dims=(4, 4), out=8),
                ConvSpec(radius=0.4, min_radius=0.3, k=6, embed=8,
                         fc_dims=(4, 4), out=8),
            ), pool_fc_dims=(4, 4), pool_out=8),
            StageSpec(rescale=0.9, convs=(
                ConvSpec(radius=0.9, k=8, embed=8, fc_dims=(4, 4), out=8),
            ), pool_fc_dims=None),
        ), global_dims=(8, 8), global_out=16)

    enc_map: Dict[str, Callable[[], nn.Module]] = {
        "pointnet_s3dis": lambda: PointNetSegEncoder(
            arch=S3DIS_ARCH, **_enc_kw),
        "tiny_s3dis": lambda: PointNetSegEncoder(
            arch=_tiny_arch(), **_enc_kw),
        "pointnet_scannet": lambda: PointNetSegEncoder(
            arch=SCANNET_ARCH, **_enc_kw),
        "pointnet_semantic3d": lambda: PointNetSegEncoder(
            arch=SEMANTIC3D_ARCH, **_enc_kw),
        # pointnet_13_dilate_embed_semantic3d (the 3rd Semantic3D variant,
        # model_pointnet_semantic3d.py:327-441)
        "pointnet_semantic3d_dilate": lambda: PointNetSegEncoder(
            arch=SEMANTIC3D_DILATE_ARCH, **_enc_kw),
        # ablation tail (model_pointnet.py:106-929) + pointnet2 baseline
        # (model_pgnet.py:1133-1223) — the reference's operator-comparison
        # span, reproduced by conv_compare
        "pointnet_baseline20": lambda: PointNetSegEncoder(
            arch=__import__(
                "pointcloudsegmentation_tpu.models.pointnet",
                fromlist=["S3DIS_BASELINE20_ARCH"]).S3DIS_BASELINE20_ARCH,
            **_enc_kw),
        "pointnet_concat10_deconv": lambda: PointNetSegEncoder(
            arch=__import__(
                "pointcloudsegmentation_tpu.models.pointnet",
                fromlist=["S3DIS_CONCAT10_DECONV_ARCH"]
            ).S3DIS_CONCAT10_DECONV_ARCH, **_enc_kw),
        "pointnet_embed_only": lambda: PointNetSegEncoder(
            arch=__import__(
                "pointcloudsegmentation_tpu.models.pointnet",
                fromlist=["S3DIS_EMBED_ARCH"]).S3DIS_EMBED_ARCH, **_enc_kw),
        "pointnet2_s3dis": lambda: __import__(
            "pointcloudsegmentation_tpu.models.pointnet",
            fromlist=["PointNet2Baseline"]).PointNet2Baseline(
            search_chunk=search_chunk),
        "ecd_scannet": lambda: ECDSegModel(
            specs=SCANNET_ECD_SPEC, search_chunk=search_chunk),
        "ecd_s3dis": lambda: ECDSegModel(
            specs=S3DIS_ECD_SPEC, search_chunk=search_chunk),
        "pgnet_v3": lambda: ECDSegModel(
            specs=PGNET_V3_SPEC, search_chunk=search_chunk),
        "pgnet_v4": lambda: ECDSegModel(
            specs=PGNET_V4_SPEC, search_chunk=search_chunk),
        "pgnet_v5": lambda: ECDSegModel(
            specs=PGNET_V5_SPEC, search_chunk=search_chunk),
        "pgnet_v6": lambda: PGNetV6(search_chunk=search_chunk),
        "pgnet_v7": lambda: PGNetV7(search_chunk=search_chunk),
        "pgnet_v8": lambda: PGNetHybrid(search_chunk=search_chunk),
        "gpn_seg": lambda: __import__(
            "pointcloudsegmentation_tpu.models.gpn", fromlist=["GPNSegModel"]
        ).GPNSegModel(search_chunk=search_chunk),
    }

    def _template(conv: str) -> Callable[[], nn.Module]:
        # model_template with the reference's pluggable stage library
        # (model_new.py:105-469) — the conv-comparison ablation harness
        # driven by conv_compare.sh:23-29
        from ..models.template import GenericStage, TemplateSegModel

        return lambda: TemplateSegModel(
            make_stage=lambda i, spec: GenericStage(
                spec, conv=conv, search_chunk=search_chunk,
                name=f"stage{i}"))

    for _conv in ("pointnet", "anchor", "mlp_anchor", "diffusion_anchor"):
        enc_map[f"template_{_conv}"] = _template(_conv)
    if cfg.model in enc_map:
        enc = enc_map[cfg.model]()
        # factored classifier head (head_dim comment in models/pointnet.py):
        # measured win on the flagship — the wide decoder concat chain was
        # ~15% of the step trace.  PCS_FACTORED_HEAD=0 restores the
        # reference-layout concat decoder for A/Bs.
        factored = (isinstance(enc, PointNetSegEncoder)
                    and enc.arch.decoder != "deconv"
                    and os.environ.get("PCS_FACTORED_HEAD", "1") != "0")
        if factored:
            enc = enc.clone(head_dim=512)
        return SegmentationModel(encoder=enc, head_premixed=factored,
                                 **common, **seg_extra)
    if cfg.model == "dense_semantic3d":
        # dense pre-encoder + pointnet_13_dilate_embed_semantic3d
        # (train_gpn_semantic3d_dense.py:55-60)
        return DenseSegModel(
            encoder=PointNetSegEncoder(arch=SEMANTIC3D_DILATE_ARCH,
                                       search_chunk=search_chunk), **common)
    if cfg.model == "refine_s3dis":
        # two-model cascade (train_graph_pool_refine.py:44-84); base net =
        # the 2-stage ECD model over a 1-level 0.3 m pyramid
        return RefineCascadeModel(
            encoder=ECDSegModel(specs=S3DIS_ECD_SPEC[:2],
                                search_chunk=search_chunk), **common)
    if cfg.model == "gpn_modelnet40":
        return ClassificationModel(
            encoder=GPNClassModel(search_chunk=search_chunk), **common)
    if cfg.model == "context_semantic3d":
        # two-resolution fusion (train_gpn_semantic3d_context.py:50-71)
        from ..models import ContextFusionModel

        return ContextFusionModel(
            encoder=ECDSegModel(specs=S3DIS_ECD_SPEC,
                                search_chunk=search_chunk),
            num_classes=d.num_classes, voxel_sizes=d.voxel_sizes,
            caps=d.caps, block_size=d.block_size)
    raise KeyError(
        f"unknown model '{cfg.model}'; known: "
        f"{sorted(enc_map) + ['gpn_modelnet40', 'context_semantic3d', 'refine_s3dis']}")
