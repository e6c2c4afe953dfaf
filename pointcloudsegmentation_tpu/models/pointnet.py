"""PointNet-conv segmentation encoders (the reference's flagship family).

The reference hand-writes each variant as ~110 lines of repeated
search/scatter/conv/concat (``pointnet_13_dilated_embed``
model_pointnet.py:930-1037, ``..._scannet`` :1440-1547,
``pointnet_10_concat_pre_embed_semantic3d``
model_pointnet_semantic3d.py:114-213).  All of them are the same machine:

  per stage s (= pyramid level):
    for each conv: (dilated) radius search -> sxyz/rescale ->
      optional fc_embed bottleneck -> pointnet_conv -> concat growth
    voxel pool: pointnet_pool + max pool + avg-pooled raw feats, concat
  global MLP on [xyz ‖ feats] at the top level
  decoder: unpool-concat back down (model_pointnet.py:1030-1036)

Here that machine is one spec-driven flax Module; each reference variant is
a declarative ``Arch`` constant.  Neighborhoods with identical search specs
are computed once per level and reused (the reference reuses ``nidxs`` across
consecutive convs the same way).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import hierarchy as hier
from ..ops import search
from ..ops.types import Pyramid
from .fast_conv import PointNetConvFast
from .layers import FCEmbed, GrowthMLP, PointNetConv, PointNetPoolMLP


@dataclass(frozen=True)
class ConvSpec:
    """One pointnet_conv application inside a stage."""

    radius: float
    k: int
    min_radius: float = 0.0
    embed: Optional[int] = None       # fc_embed bottleneck dim (None = skip)
    fc_dims: Tuple[int, ...] = (8, 8, 16)
    out: int = 32
    nofeats: bool = False             # xyz-only first conv (scannet variant)
    # plain-MLP edge stack without the growth concat
    # (pointnet_conv_noconcat, model_pointnet.py:41-54 — the conv family of
    # the pointnet_20_baseline ablation)
    noconcat: bool = False


@dataclass(frozen=True)
class StageSpec:
    convs: Tuple[ConvSpec, ...]
    rescale: float                    # sxyz divisor for the whole stage
    pool_fc_dims: Optional[Tuple[int, ...]] = (8, 8, 16)
    pool_out: int = 32


@dataclass(frozen=True)
class PreStageSpec:
    """Semantic3D 'stage_pre': a conv on level 1 whose output is unpooled and
    concatenated onto the level-0 features
    (model_pointnet_semantic3d.py:119-127)."""

    radius: float
    k: int
    rescale: float
    fc_dims: Tuple[int, ...] = (16, 16, 16)
    out: int = 32


@dataclass(frozen=True)
class Arch:
    stages: Tuple[StageSpec, ...]
    global_dims: Tuple[int, ...] = (32, 32, 48)
    global_out: int = 128
    pre_stage: Optional[PreStageSpec] = None
    # ScanNet has no input features, hence no avg-pooled raw-feature cascade
    # (model_pointnet.py:1440 signature vs :930-933)
    use_avg_feats: bool = True
    # decoder: "concat" = unpool-concat (model_pointnet.py:1030-1036);
    # "deconv" = per-level growth-MLP refinement of [up ‖ stage ‖ dxyz]
    # (pointnet_deconv / pointnet_10_concat_pre_deconv,
    # model_pointnet.py:87-104, :620-636)
    decoder: str = "concat"
    deconv_dims: Tuple[Tuple[int, ...], ...] = ((128, 128), (64, 128))
    deconv_out: int = 256


# pointnet_13_dilated_embed (model_pointnet.py:930-1037).  Ks sized from the
# average neighbor counts noted in the reference's comments (29/22/16/12 ...).
S3DIS_ARCH = Arch(
    stages=(
        StageSpec(rescale=0.15, convs=(
            ConvSpec(radius=0.15, k=32, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.2, min_radius=0.15, k=24,
                     fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.15, min_radius=0.1, k=16,
                     fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.1, k=16, embed=32, fc_dims=(8, 8, 16), out=32),
        ), pool_fc_dims=(8, 8, 16), pool_out=32),
        StageSpec(rescale=0.45, convs=(
            ConvSpec(radius=0.45, k=32, embed=64, fc_dims=(16, 16, 32),
                     out=64),
            ConvSpec(radius=0.6, min_radius=0.45, k=24, embed=48,
                     fc_dims=(16, 16, 16), out=48),
            ConvSpec(radius=0.6, min_radius=0.45, k=24, embed=48,
                     fc_dims=(16, 16, 16), out=48),
            ConvSpec(radius=0.45, min_radius=0.3, k=16, embed=64,
                     fc_dims=(16, 16, 16), out=48),
            ConvSpec(radius=0.45, min_radius=0.3, k=16, embed=64,
                     fc_dims=(16, 16, 16), out=48),
            ConvSpec(radius=0.3, k=16, embed=96, fc_dims=(16, 16, 16),
                     out=48),
            ConvSpec(radius=0.3, k=16, embed=96, fc_dims=(16, 16, 16),
                     out=48),
        ), pool_fc_dims=(16, 16, 16), pool_out=48),
        StageSpec(rescale=0.9, convs=(
            ConvSpec(radius=0.9, k=32, embed=128, fc_dims=(16, 16, 32),
                     out=64),
            ConvSpec(radius=0.9, k=32, embed=128, fc_dims=(16, 16, 32),
                     out=64),
        ), pool_fc_dims=None),
    ),
    global_dims=(32, 32, 48), global_out=128,
)

# pointnet_13_dilated_embed_scannet (model_pointnet.py:1440-1547): identical
# geometry, but the first conv is xyz-only (no input colors on ScanNet).
SCANNET_ARCH = Arch(
    stages=(
        StageSpec(rescale=0.15, convs=(
            ConvSpec(radius=0.15, k=32, fc_dims=(16, 16, 16), out=48,
                     nofeats=True),
        ) + S3DIS_ARCH.stages[0].convs[1:],
            pool_fc_dims=(8, 8, 16), pool_out=32),
    ) + S3DIS_ARCH.stages[1:],
    global_dims=(32, 32, 48), global_out=128,
    use_avg_feats=False,
)

# pointnet_10_concat_pre_embed_semantic3d
# (model_pointnet_semantic3d.py:114-213): 10 m blocks, larger radii, a
# level-1 pre-stage conv unpooled onto level 0, fc_embed before every conv.
SEMANTIC3D_ARCH = Arch(
    pre_stage=PreStageSpec(radius=0.6, k=16, rescale=0.6,
                           fc_dims=(16, 16, 16), out=32),
    stages=(
        StageSpec(rescale=1.0, convs=(
            # per-conv radii differ within the stage -> rescale encoded via
            # per-conv radius (sxyz /= radius): 0.3 then 0.2
            ConvSpec(radius=0.3, k=16, embed=16, fc_dims=(4, 4, 8), out=16),
            ConvSpec(radius=0.3, k=16, embed=16, fc_dims=(4, 4, 8), out=16),
            ConvSpec(radius=0.2, k=12, embed=32, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.2, k=12, embed=32, fc_dims=(8, 8, 16), out=32),
        ), pool_fc_dims=(8, 8, 16), pool_out=24),
        StageSpec(rescale=1.0, convs=(
            ConvSpec(radius=0.6, k=16, embed=48, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.6, k=16, embed=48, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.4, k=12, embed=64, fc_dims=(16, 16, 24),
                     out=48),
            ConvSpec(radius=0.4, k=12, embed=96, fc_dims=(16, 16, 32),
                     out=64),
        ), pool_fc_dims=(16, 16, 16), pool_out=48),
        StageSpec(rescale=1.0, convs=(
            ConvSpec(radius=2.0, k=24, embed=128, fc_dims=(32, 32, 32),
                     out=96),
            ConvSpec(radius=2.0, k=24, embed=160, fc_dims=(32, 32, 64),
                     out=128),
        ), pool_fc_dims=None),
    ),
    global_dims=(32, 32, 64), global_out=128,
)


# pointnet_13_dilate_embed_semantic3d (model_pointnet_semantic3d.py:327-441):
# the dilated-annulus S3DIS recipe at Semantic3D scale — stage rescales
# 0.3/1.25/4.0 (every conv in a stage divides sxyz by the same constant),
# K caps from the reference's avg-count comments (22/20/16/18; 22; 14).
SEMANTIC3D_DILATE_ARCH = Arch(
    stages=(
        StageSpec(rescale=0.3, convs=(
            ConvSpec(radius=0.3, k=24, embed=32, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.4, min_radius=0.3, k=20, embed=32,
                     fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.3, min_radius=0.2, k=16, embed=32,
                     fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.2, k=18, embed=32, fc_dims=(8, 8, 16), out=32),
        ), pool_fc_dims=(8, 8, 16), pool_out=32),
        StageSpec(rescale=1.25, convs=(
            ConvSpec(radius=1.25, k=22, embed=64, fc_dims=(16, 16, 32),
                     out=64),
            ConvSpec(radius=1.6, min_radius=1.25, k=22, embed=64,
                     fc_dims=(12, 12, 24), out=48),
            ConvSpec(radius=1.6, min_radius=1.25, k=22, embed=64,
                     fc_dims=(12, 12, 24), out=48),
            ConvSpec(radius=1.25, min_radius=0.9, k=22, embed=64,
                     fc_dims=(12, 12, 24), out=48),
            ConvSpec(radius=1.25, min_radius=0.9, k=22, embed=64,
                     fc_dims=(12, 12, 24), out=48),
            ConvSpec(radius=0.9, k=22, embed=64, fc_dims=(12, 12, 24),
                     out=48),
            ConvSpec(radius=0.9, k=22, embed=64, fc_dims=(12, 12, 24),
                     out=48),
        ), pool_fc_dims=(16, 16, 32), pool_out=64),
        StageSpec(rescale=4.0, convs=(
            ConvSpec(radius=4.0, k=14, embed=128, fc_dims=(32, 32, 32),
                     out=96),
            ConvSpec(radius=4.0, k=14, embed=160, fc_dims=(32, 32, 64),
                     out=128),
        ), pool_fc_dims=None),
    ),
    global_dims=(32, 32, 64), global_out=128,
)


# pointnet_20_baseline (model_pointnet.py:106-214): the no-growth ablation —
# 20 plain-MLP convs (pointnet_conv_noconcat), two radius tiers per stage,
# no annuli, no fc_embed.  K caps follow the flagship's per-radius choices.
def _nc(radius, k, fc_dims, out):
    return ConvSpec(radius=radius, k=k, fc_dims=fc_dims, out=out,
                    noconcat=True)


S3DIS_BASELINE20_ARCH = Arch(
    stages=(
        StageSpec(rescale=0.15, convs=(
            _nc(0.15, 32, (8, 8), 8), _nc(0.15, 32, (8, 8), 8),
            _nc(0.15, 32, (10, 12), 12), _nc(0.15, 32, (10, 12), 12),
            _nc(0.1, 16, (16, 16), 16), _nc(0.1, 16, (16, 16), 16),
            _nc(0.1, 16, (16, 16), 16), _nc(0.1, 16, (16, 16), 16),
        ), pool_fc_dims=(16, 16), pool_out=64),
        StageSpec(rescale=0.45, convs=(
            _nc(0.6, 32, (16, 16), 16), _nc(0.6, 32, (16, 16), 16),
            _nc(0.6, 32, (16, 16), 16), _nc(0.6, 32, (16, 16), 16),
            _nc(0.3, 16, (24, 24), 24), _nc(0.3, 16, (24, 24), 24),
            _nc(0.3, 16, (32, 32), 32), _nc(0.3, 16, (32, 32), 32),
        ), pool_fc_dims=(32, 32), pool_out=128),
        StageSpec(rescale=0.9, convs=(
            _nc(0.9, 32, (32, 32), 32), _nc(0.9, 32, (32, 32), 32),
            _nc(0.9, 32, (48, 48), 48), _nc(0.9, 32, (48, 48), 48),
        ), pool_fc_dims=None),
    ),
    global_dims=(64, 64, 128), global_out=256,
)


# pointnet_10_concat_pre_deconv (model_pointnet.py:563-637): the growth-conv
# 10-layer net (no embed, no annuli) with the DECONV decoder.
S3DIS_CONCAT10_DECONV_ARCH = Arch(
    stages=(
        StageSpec(rescale=0.15, convs=(
            ConvSpec(radius=0.15, k=32, fc_dims=(4, 4, 8), out=16),
            ConvSpec(radius=0.15, k=32, fc_dims=(4, 4, 8), out=16),
            ConvSpec(radius=0.1, k=16, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.1, k=16, fc_dims=(8, 8, 16), out=32),
        ), pool_fc_dims=(16, 16), pool_out=64),
        StageSpec(rescale=0.45, convs=(
            ConvSpec(radius=0.6, k=32, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.6, k=32, fc_dims=(8, 8, 16), out=32),
            ConvSpec(radius=0.3, k=16, fc_dims=(16, 16, 24), out=48),
            ConvSpec(radius=0.3, k=16, fc_dims=(16, 16, 32), out=64),
        ), pool_fc_dims=(32, 32), pool_out=128),
        StageSpec(rescale=0.9, convs=(
            ConvSpec(radius=0.9, k=32, fc_dims=(32, 32, 32), out=64),
            ConvSpec(radius=0.9, k=32, fc_dims=(32, 32, 48), out=96),
        ), pool_fc_dims=None),
    ),
    global_dims=(64, 64), global_out=256,
    decoder="deconv", deconv_dims=((128, 128), (64, 128)), deconv_out=256,
)


def no_dilation(arch: Arch) -> Arch:
    """Derive the embed-only ablation: the same net with every annulus
    collapsed to a plain radius search (pointnet_13_embed,
    model_pointnet.py:1236-1330, vs the dilated flagship :930-1037)."""
    from dataclasses import replace

    stages = tuple(
        replace(st, convs=tuple(replace(c, min_radius=0.0)
                                for c in st.convs))
        for st in arch.stages)
    return replace(arch, stages=stages)


S3DIS_EMBED_ARCH = no_dilation(S3DIS_ARCH)


class PointNet2Baseline(nn.Module):
    """pointnet2_v2 (model_pgnet.py:1133-1223): the PointNet++-style
    baseline — per unit, a narrow pointnet_conv feeds a second wider
    pointnet_conv and BOTH outputs join the growth concat; stage 2 pairs
    pointnet_conv with mlp_anchor_conv.  Produces the standard
    (local_feats, stage0_feats) contract."""

    search_chunk: int = 1024
    cand_k: int = 64

    # (radius, k, fc_a, out_a, fc_b, out_b) per unit; stage 2 units use
    # (radius, k, fc_a, out_a, anchor_weights, anchor_out, anchor_num)
    STAGE0 = ((0.15, 32, (8,), 8, (8, 16), 16),
              (0.15, 32, (8,), 8, (8, 16), 16),
              (0.1, 16, (16,), 16, (16, 32), 32),
              (0.1, 16, (16,), 16, (16, 32), 32))
    STAGE1 = ((0.6, 32, (16,), 16, (16, 32), 32),
              (0.6, 32, (16,), 16, (16, 32), 32),
              (0.3, 16, (16,), 16, (24, 48), 48),
              (0.3, 16, (20,), 20, (32, 64), 64))
    STAGE2 = ((0.9, 32, (24,), 24, (32,), 64, 12),
              (0.9, 32, (24,), 24, (48,), 96, 16))

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        from .ecd import MLPAnchorConv

        def stage_nbrs(s, specs):
            lvl = pyramid.levels[s]
            uniq = []
            for sp in specs:
                if sp not in uniq:
                    uniq.append(sp)
            bands = tuple((0.0, r, k) for (r, k) in uniq)
            res = search.band_neighbors_auto(
                lvl.xyz, lvl.mask, bands, cand_k=min(self.cand_k,
                                                     lvl.xyz.shape[0]),
                chunk=min(self.search_chunk, lvl.xyz.shape[0]),
                return_sxyz=True, sorted=pyramid.level_sorted(s))
            return dict(zip(uniq, res))

        stage_feats = []
        ci = 0
        for s, units in enumerate((self.STAGE0, self.STAGE1, self.STAGE2)):
            nbrs = stage_nbrs(s, [(u[0], u[1]) for u in units])
            for u in units:
                nbr, sxyz_raw = nbrs[(u[0], u[1])]
                sxyz = sxyz_raw / u[0]
                pn = PointNetConv(u[2], u[3], name=f"pn{ci}")(
                    sxyz, feats, nbr)
                if len(u) == 7:        # stage-2 anchor unit
                    second = MLPAnchorConv(u[4], u[5], u[6],
                                           name=f"anchor{ci}")(sxyz, pn, nbr)
                else:
                    second = PointNetConv(u[4], u[5], name=f"pn{ci}b")(
                        sxyz, pn, nbr)
                feats = jnp.concatenate([feats, second, pn], axis=-1)
                ci += 1
            stage_feats.append(feats)
            if s < 2:
                pooled = PointNetPoolMLP(
                    (16, 16) if s == 0 else (32, 32),
                    64 if s == 0 else 128, name=f"pool{s}")(
                    pyramid.dxyz[s], feats)
                feats = hier.pool_max(pooled, pyramid, s)

        gin = jnp.concatenate([pyramid.levels[2].xyz, feats], axis=-1)
        gfc = GrowthMLP((64, 64, 128), 256, name="global")(gin)
        lf = jnp.concatenate([gfc, stage_feats[2]], axis=-1)
        for s in (1, 0):
            lf = jnp.concatenate(
                [hier.unpool(lf, pyramid, s), stage_feats[s]], axis=-1)
        return lf, stage_feats[0]


class PointNetSegEncoder(nn.Module):
    """Spec-driven encoder/decoder producing (global_feats, local_feats) at
    level 0, the contract every reference model function satisfies
    (e.g. model_pointnet.py:1037 ``return lf0, feats_stage0``)."""

    arch: Arch = S3DIS_ARCH
    search_chunk: int = 1024
    # candidate pool size for the shared per-level selection pass; must cover
    # the densest band's true neighbor count (reference avg counts peak ~30)
    cand_k: int = 64
    # project-then-gather conv (fast_conv.PointNetConvFast): same function
    # family, avoids materializing the [N,K,2F+3] edge concat in HBM
    fast_conv: bool = True
    # windowed fast path: REQUIRES Morton-sorted levels (SegmentationModel
    # sorts level 0; Morton voxel keys sort the rest).  Levels too small or
    # not tile-aligned fall back to the global path automatically.
    windowed: bool = True
    win_tile: int = 256
    win_window: int = 256
    ov_slots: int = 8
    # out-of-slab neighbor representation: "slots" ([N, Ko] per band —
    # fastest at Ko=8; measured 253k vs 191k points/s/chip for "edges") or
    # "edges" (shared EdgeOverflow list — full overflow-pool recall, no
    # per-point truncation; use when accuracy is at a premium)
    ov_mode: str = "slots"
    # tile-shared overflow pool size P (0 = per-point global slot gathers):
    # with P > 0 every conv's overflow gather touches nt*P rows instead of
    # N*Ko and the per-point reads become local one-hot matmuls
    ov_pool_size: int = 0
    # candidate selection strategy for the windowed path: "slab" (exhaustive
    # per-tile slab top-k + a small out-of-slab-only global pass) or
    # "global" (one [chunk, N] approx_max_k feeding both tiers).  Measured
    # on TPU (BASELINE.md): slab recall dominates global at every cand_k
    # (its in-slab pool ranks against all S slab columns instead of the
    # global-cut survivors), letting win_cand_k shrink to 32 — faster AND
    # higher-recall than the round-2 global/64 default.
    sel_mode: str = "slab"
    # candidate-pool size for the WINDOWED selection only (None -> cand_k).
    # The global-fallback search (small/unsorted levels) keeps cand_k: its
    # single pool must absorb out-of-slab neighbors too.  Clamped below to
    # the widest band's slot count.
    win_cand_k: Optional[int] = 32
    # factored classifier-head input: instead of returning the wide decoder
    # concat ``lf0 = [unpool(lf1) ‖ sf0]`` (1388-wide f32 at level 0 for the
    # flagship — its unpool gather + scatter-add backward and the classifier
    # concats were ~15% of the step trace), return the classifier's FIRST
    # Dense applied to it, computed per source at its own level:
    #     Dense(concat(up, sf)) == Dense_up(up) + Dense_sf(sf)
    #     Dense(unpool(x))      == unpool(Dense(x))        (unpool = row gather)
    # so only head_dim-wide tensors ever cross levels, and each source is
    # projected at its own (coarser) row count.  Same function family as
    # SegClassifier's class_mlp1 — exact parameter mapping tested in
    # tests/test_models.py.  Pair with SegClassifier(premixed=True).
    # Only valid for the concat decoder (deconv's per-level MLP is nonlinear).
    head_dim: Optional[int] = None
    # rematerialize each conv in the backward pass (jax.checkpoint): the
    # step is HBM-bound (MFU ~12%), so NOT storing the [N, K, d] edge
    # activations for the backward and recomputing them from the conv
    # inputs trades cheap MXU FLOPs for the dominant HBM traffic
    remat: bool = False

    def _stage_neighborhoods(self, xyz, mask, specs,
                             edge_ratio: int = 3,
                             is_sorted: bool = False,
                             need_sxyz: bool = True) -> Dict:
        """ALL of a stage's (min_radius, radius, k) searches in one
        candidate-selection pass (search.multi_band_neighbors) — the
        reference runs 4 independent O(N²) brute-force searches per stage
        (model_pointnet.py:935-953).

        Returns spec -> (nbr, sxyz, edges-or-None); on the windowed path the
        out-of-slab neighbors arrive as ONE shared EdgeOverflow list per
        level (edges is identical across the level's specs).

        ``need_sxyz=False`` (every consumer is a fold-path PointNetConvFast,
        which reconstructs sxyz from gathered coordinates): skip the
        per-band sxyz compaction einsums and [N, K, 3] materializations
        entirely; the returned sxyz entries are None."""
        import os

        uniq = []
        for s in specs:
            if s not in uniq:
                uniq.append(s)
        bands = tuple((mn, mx, k) for (mx, mn, k) in uniq)
        n = xyz.shape[0]
        # the windowed path REQUIRES Morton-sorted points — eligibility is
        # asserted by the caller (pyramid.level_sorted), never inferred from
        # shape alone
        windowed = self.windowed and is_sorted \
            and os.environ.get("PCS_DISABLE_WINDOWED", "") != "1"
        if windowed and n % self.win_tile == 0 and n >= 4 * self.win_tile:
            res = search.windowed_multi_band_neighbors(
                xyz, mask, bands, tile=self.win_tile,
                window=self.win_window,
                cand_k=search.effective_win_cand_k(
                    self.win_cand_k, self.cand_k, bands, n),
                ov_slots=self.ov_slots, chunk=min(self.search_chunk, n),
                return_sxyz=need_sxyz, ov_mode=self.ov_mode,
                ov_pool_size=self.ov_pool_size,
                sel_mode=search.resolve_sel_mode(self.sel_mode),
                edge_ratio=edge_ratio,
                # NOTE: ov_window tiers were measured too lossy as default
                # (Morton's tail is fat: 3-5% of neighbors sit at index
                # distance ~N/2 across octant boundaries), so overflow
                # stays on global slots; see BASELINE.md.
                ov_window=0)
            if self.ov_mode == "edges":
                return dict(zip(uniq, res))
            if not need_sxyz:
                return {spec: (nbr, None, None) for spec, nbr in
                        zip(uniq, res)}
            return {spec: (nbr, sx, None) for spec, (nbr, sx) in
                    zip(uniq, res)}
        pairs = search.multi_band_neighbors(
            xyz, mask, bands, cand_k=min(self.cand_k, n),
            chunk=min(self.search_chunk, n), return_sxyz=need_sxyz)
        if not need_sxyz:
            return {spec: (nbr, None, None) for spec, nbr in
                    zip(uniq, pairs)}
        return {spec: (nbr, sx, None) for spec, (nbr, sx) in
                zip(uniq, pairs)}

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        arch = self.arch
        n_stages = len(arch.stages)
        assert pyramid.num_levels >= n_stages

        # cascade of avg-pooled raw features (model_pointnet.py:932-933)
        avg_feats = [feats]
        if arch.use_avg_feats:
            for lvl in range(n_stages - 1):
                avg_feats.append(hier.pool_avg(avg_feats[-1], pyramid, lvl))

        # one shared search pass per level, covering every conv's band;
        # raw sxyz gathered once per distinct neighborhood (the per-conv
        # xyz gather showed up as ~25 ms/step in device traces); overflow
        # neighbors come as one shared edge list per level
        caches = []
        sxyz_caches = []
        edge_caches = []
        for s, stage in enumerate(arch.stages):
            specs = [(c.radius, c.min_radius, c.k) for c in stage.convs]
            # xyz fold (PCS_XYZ_FOLD=1, off by default): PointNetConvFast
            # reconstructs sxyz from gathered hi/mid coordinate columns
            # instead of consuming the search's per-band sxyz.  Measured on
            # TPU v5e (r5): the XLA lowering of the fold is a net LOSS
            # (505k vs 544k points/s/chip) — the +6 gathered columns cross
            # the 128-lane boundary at stage 1 (SumD=128 -> 134) and the
            # per-conv fp_ext concats/casts outweigh the removed sxyz
            # compaction — so the search-sxyz path stays the XLA default.
            # The fold IS the layout of the fused Pallas conv kernel
            # (ops/pallas/fused_conv.py), which builds fp_ext once in VMEM.
            # sxyz is always required by the non-fold convs (nofeats /
            # noconcat variants run layers.PointNetConv) and the Semantic3D
            # pre-stage.
            need_sxyz = (not self.fast_conv) or any(
                c.nofeats or c.noconcat for c in stage.convs) \
                or os.environ.get("PCS_XYZ_FOLD", "") != "1"
            if s == 1 and arch.pre_stage is not None:
                specs.append((arch.pre_stage.radius, 0.0, arch.pre_stage.k))
                need_sxyz = True
            # deeper levels see proportionally more out-of-slab neighbors
            # (larger radii vs the same window) — give them more edge room
            triples = self._stage_neighborhoods(
                pyramid.levels[s].xyz, pyramid.levels[s].mask, specs,
                edge_ratio=3 if s == 0 else 5,
                is_sorted=pyramid.level_sorted(s),
                need_sxyz=need_sxyz or self.ov_mode == "edges")
            caches.append({spec: p[0] for spec, p in triples.items()})
            # cast sxyz to the compute dtype HERE so XLA fuses the cast into
            # the search's compaction einsum epilogue and the f32 [N, K, 3]
            # intermediates never reach HBM — every consumer (Dense sx_mods
            # / the per-edge concat) casts to bf16 anyway
            from .layers import compute_dtype
            cdt = compute_dtype()
            sxyz_caches.append({
                spec: (p[1] if p[1] is None or cdt is None
                       else p[1].astype(cdt))
                for spec, p in triples.items()})
            edge_caches.append(next(iter(triples.values()))[2])

        # optional Semantic3D pre-stage on level 1, unpooled onto level 0
        if arch.pre_stage is not None:
            ps = arch.pre_stage
            nbr = caches[1][(ps.radius, 0.0, ps.k)]
            sxyz = sxyz_caches[1][(ps.radius, 0.0, ps.k)] / ps.rescale
            pre = PointNetConv(ps.fc_dims, ps.out, name="feats_pre")(
                sxyz, avg_feats[1], nbr, edges=edge_caches[1],
                edge_band=(0.0, ps.radius), edge_rescale=ps.rescale)
            pre = hier.unpool(pre, pyramid, 0)
            feats = jnp.concatenate([pre, feats], axis=-1)

        stage_feats = []   # per-stage concat-grown features
        conv_idx = 0
        embed_idx = 0
        prev_feats = feats  # value before the last concat of the top stage
        for s, stage in enumerate(arch.stages):
            xyz_s = pyramid.levels[s].xyz
            mask_s = pyramid.levels[s].mask
            for c in stage.convs:
                prev_feats = feats
                spec = (c.radius, c.min_radius, c.k)
                nbr = caches[s][spec]
                edges = edge_caches[s]
                band = (c.min_radius, c.radius)
                rescale = stage.rescale if stage.rescale != 1.0 else c.radius
                sxyz_raw = sxyz_caches[s][spec]
                sxyz = None if sxyz_raw is None else sxyz_raw / rescale
                if c.nofeats:
                    feats = PointNetConv(
                        c.fc_dims, c.out, use_feats=False,
                        name=f"feats{conv_idx}")(
                        sxyz, None, nbr, edges=edges, edge_band=band,
                        edge_rescale=rescale)
                else:
                    fin = feats
                    if c.embed is not None:
                        fin = FCEmbed(c.embed, name=f"embed{embed_idx}")(feats)
                        embed_idx += 1
                    if c.noconcat:
                        fpn = PointNetConv(c.fc_dims, c.out,
                                           concat_growth=False,
                                           name=f"feats{conv_idx}")(
                            sxyz, fin, nbr, edges=edges, edge_band=band,
                            edge_rescale=rescale)
                    else:
                        conv_cls = (PointNetConvFast if self.fast_conv
                                    else PointNetConv)
                        if self.remat:
                            conv_cls = nn.remat(conv_cls)
                        kw = {}
                        if sxyz is None:
                            # xyz fold: the conv reconstructs sxyz from
                            # gathered hi/mid coordinate columns
                            kw = dict(xyz=xyz_s, inv_rescale=1.0 / rescale)
                        fpn = conv_cls(c.fc_dims, c.out,
                                       name=f"feats{conv_idx}")(
                            sxyz, fin, nbr, edges=edges, edge_band=band,
                            edge_rescale=rescale, **kw)
                    feats = jnp.concatenate([feats, fpn], axis=-1)
                conv_idx += 1
            stage_feats.append(feats)

            if s < n_stages - 1:
                # voxel pooling block (model_pointnet.py:960-962)
                pooled_parts = ([avg_feats[s + 1]] if arch.use_avg_feats
                                else [])
                pooled_parts.append(hier.pool_max(feats, pyramid, s))
                if stage.pool_fc_dims is not None:
                    pf = PointNetPoolMLP(stage.pool_fc_dims, stage.pool_out,
                                         name=f"pool{s}")(
                        pyramid.dxyz[s], feats)
                    pooled_parts.append(hier.pool_max(pf, pyramid, s))
                feats = jnp.concatenate(pooled_parts, axis=-1)

        # global MLP on [xyz ‖ feats] at the deepest level — the reference
        # feeds the features *before* the top stage's final concat
        # (model_pointnet.py:1025-1028: uses `feats`, not feats_stage2)
        top = n_stages - 1
        gin = jnp.concatenate([pyramid.levels[top].xyz, prev_feats], axis=-1)
        gfc = GrowthMLP(arch.global_dims, arch.global_out, name="global")(gin)

        # factored head: project each decoder source at its own level and
        # carry only head_dim-wide sums through the unpools (see head_dim
        # field comment).  Bias lives on the level-0 projection; the
        # per-source kernels are the row slices of class_mlp1's kernel.
        if self.head_dim is not None:
            assert arch.decoder != "deconv", \
                "head_dim factoring requires the linear concat decoder"
            from .layers import Dense
            z = Dense(self.head_dim, use_bias=False,
                      name=f"head_sf{top}")(stage_feats[top]) \
                + Dense(self.head_dim, use_bias=False, name="head_g")(gfc)
            for s in range(top - 1, -1, -1):
                z = hier.unpool(z, pyramid, s) \
                    + Dense(self.head_dim, use_bias=(s == 0),
                            name=f"head_sf{s}")(stage_feats[s])
            return z, stage_feats[0]

        # decoder: unpool-concat (model_pointnet.py:1030-1036) or the deconv
        # variant — per-level growth MLP on [up ‖ stage feats ‖ dxyz]
        # (pointnet_deconv, model_pointnet.py:87-104; decoder structure of
        # pointnet_10_concat_pre_deconv :620-636)
        lf = jnp.concatenate([stage_feats[top], gfc], axis=-1)
        for s in range(top - 1, -1, -1):
            up = hier.unpool(lf, pyramid, s)
            if arch.decoder == "deconv":
                din = jnp.concatenate([up, stage_feats[s], pyramid.dxyz[s]],
                                      axis=-1)
                dd = arch.deconv_dims[min(s, len(arch.deconv_dims) - 1)]
                upf = GrowthMLP(dd, arch.deconv_out, new_first=False,
                                name=f"deconv{s}")(din)
                lf = jnp.concatenate([upf, up, stage_feats[s]], axis=-1)
            else:
                lf = jnp.concatenate([up, stage_feats[s]], axis=-1)
        return lf, stage_feats[0]
