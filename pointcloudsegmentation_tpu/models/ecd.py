"""Edge-conditioned diffusion (ECD) and PGNet model families.

Covers the reference's thesis architecture:

- ``ECDStage`` = ``ecd_stage`` (model_pgnet.py:65-105) /
  ``graph_conv_pool_stage_edge_simp`` (model_pooling.py): xyz-ECD conv,
  n x (FC -> feats-ECD) with concat growth, then a global FC block on
  [cfeats ‖ dxyz/voxel_size].
- ``ECDSegModel`` = ``graph_conv_pool_edge_simp_2layers[_s3d]``
  (model_pooling.py:268-369): three ECD stages over the pyramid with
  max+avg pooled features between stages, global max/mean at the top,
  tile + unpool-concat decoder.
- ``MLPAnchorConv`` = ``mlp_anchor_conv`` (model_pointnet.py:1592+):
  geometry-MLP edge weights, l2-normalized with a learned per-anchor scale,
  anchor-weighted neighbor sum, count-normalized, leaky-ReLU out.
- ``PGNetHybrid`` = ``pgnet_model_v8`` (model_pgnet.py:1042-1131): pairs of
  (pointnet_conv -> mlp_anchor_conv) with triple concat growth, pointnet_pool
  between stages, growth global MLP, unpool decoder.  Used by the Semantic3D
  eval pipeline (interpolate_semantic3d_new.py:26).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import hierarchy as hier
from ..ops import neighbors as nb
from ..ops import search
from ..ops.types import Neighborhood, Pyramid
from .layers import Dense, ECDConv


def _masked_global_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    big = jnp.where(mask[:, None], x, -1e30)
    return jnp.max(big, axis=0)


def _masked_global_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask[:, None].astype(x.dtype)
    return jnp.sum(x * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)


@dataclass(frozen=True)
class ECDStageSpec:
    radius: float
    k: int
    gxyz_dim: int = 16
    gc_dims: Tuple[int, ...] = (16, 16)
    gfc_dims: Tuple[int, ...] = (8, 8, 8)
    final_dim: int = 64
    dxyz_scale: float = 1.0  # voxel_size divisor applied to dxyz
    # condition the global FC on the level's dxyz instead of raw xyz on
    # stages >0 (pgnet_model_v3/v4/v5 pass dxyzs[1], model_pgnet.py:168 —
    # vs the _bug variant and the 2layers models that pass xyzs)
    use_dxyz: bool = False


# graph_conv_pool_edge_simp_2layers (model_pooling.py:268-318), as trained by
# train_gpn_scannet.py / the semantic3d context pipeline.
SCANNET_ECD_SPEC = (
    ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(16, 16),
                 gfc_dims=(8, 8, 8), final_dim=64, dxyz_scale=0.15),
    ECDStageSpec(radius=0.3, k=16, gxyz_dim=16, gc_dims=(32,) * 9,
                 gfc_dims=(32, 32, 32), final_dim=256, dxyz_scale=0.45),
    ECDStageSpec(radius=0.5, k=16, gxyz_dim=16, gc_dims=(32,) * 9,
                 gfc_dims=(32, 32, 32), final_dim=512, dxyz_scale=3.0),
)

# graph_conv_pool_edge_simp_2layers_s3d (model_pooling.py:322-369):
# voxel_size/2 scaling, slimmer stages.
S3DIS_ECD_SPEC = (
    ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(16,),
                 gfc_dims=(16, 16, 16), final_dim=64, dxyz_scale=0.075),
    ECDStageSpec(radius=0.3, k=16, gxyz_dim=16, gc_dims=(16, 16, 32, 32),
                 gfc_dims=(32, 32, 32), final_dim=128, dxyz_scale=0.225),
    ECDStageSpec(radius=0.5, k=16, gxyz_dim=16, gc_dims=(32, 32, 64, 64),
                 gfc_dims=(64, 64, 64), final_dim=384, dxyz_scale=1.5),
)


# pgnet_model_v3/v4/v5 (model_pgnet.py:155-311): the same ecd_stage machine
# at different widths/depths, radii (0.15, 0.3, 0.5), dxyz scales = S3DIS
# voxel sizes (0.15, 0.45) + block 3.0; stage 1 conditions on dxyz.
PGNET_V3_SPEC = (
    ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(16, 16),
                 gfc_dims=(8, 8, 8), final_dim=64, dxyz_scale=0.15),
    ECDStageSpec(radius=0.3, k=16, gxyz_dim=16, gc_dims=(32,) * 9,
                 gfc_dims=(32, 32, 32), final_dim=256, dxyz_scale=0.45,
                 use_dxyz=True),
    ECDStageSpec(radius=0.5, k=16, gxyz_dim=16, gc_dims=(32,) * 9,
                 gfc_dims=(32, 32, 32), final_dim=512, dxyz_scale=3.0),
)

# pgnet_model_v4 (model_pgnet.py:202-263): thin 16-wide but 18-deep stages.
PGNET_V4_SPEC = (
    ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(8,) * 4,
                 gfc_dims=(8, 8, 8), final_dim=64, dxyz_scale=0.15),
    ECDStageSpec(radius=0.3, k=16, gxyz_dim=16, gc_dims=(16,) * 18,
                 gfc_dims=(16,) * 6, final_dim=256, dxyz_scale=0.45,
                 use_dxyz=True),
    ECDStageSpec(radius=0.5, k=16, gxyz_dim=16, gc_dims=(16,) * 18,
                 gfc_dims=(16,) * 6, final_dim=512, dxyz_scale=3.0),
)

# pgnet_model_v5 (model_pgnet.py:265-311): shallow 1/3/3-conv stages.
PGNET_V5_SPEC = (
    ECDStageSpec(radius=0.15, k=16, gxyz_dim=16, gc_dims=(16,),
                 gfc_dims=(8, 8, 8), final_dim=64, dxyz_scale=0.15),
    ECDStageSpec(radius=0.3, k=16, gxyz_dim=16, gc_dims=(32, 32, 32),
                 gfc_dims=(32, 32, 32), final_dim=256, dxyz_scale=0.45,
                 use_dxyz=True),
    ECDStageSpec(radius=0.5, k=16, gxyz_dim=16, gc_dims=(32, 32, 32),
                 gfc_dims=(32, 32, 32), final_dim=512, dxyz_scale=3.0),
)


class ECDStage(nn.Module):
    """One ECD stage (ecd_stage, model_pgnet.py:65-105)."""

    spec: ECDStageSpec
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, mask: jnp.ndarray,
                 dxyz: jnp.ndarray, feats: jnp.ndarray,
                 is_sorted: bool = False):
        sp = self.spec
        # slack candidate pool (4x k): approx_max_k recall misses must land
        # in the unused tail, not drop true in-band neighbors
        (nbr, sxyz_raw), = search.band_neighbors_auto(
            xyz, mask, ((0.0, sp.radius, sp.k),),
            cand_k=min(4 * sp.k, xyz.shape[0]), return_sxyz=True,
            sorted=is_sorted)
        sxyz = sxyz_raw / sp.radius

        g = sp.gxyz_dim
        xyz_gc = ECDConv((g // 2, g // 2), (g // 2, g // 2), g,
                         use_xyz_only=True, name="xyz_gc")(sxyz, None, nbr)
        cfeats = jnp.concatenate([xyz_gc, feats], axis=-1)

        for li, fdim in enumerate(sp.gc_dims):
            h = nn.relu(Dense(fdim, name=f"fc_{li}")(cfeats))
            conv = ECDConv((fdim // 2, fdim // 2), (fdim // 2, fdim // 2),
                           fdim, name=f"gc_{li}")(sxyz, h, nbr)
            cfeats = jnp.concatenate([cfeats, conv], axis=-1)

        fc_feats = jnp.concatenate([cfeats, dxyz / sp.dxyz_scale], axis=-1)
        for i, gfd in enumerate(sp.gfc_dims):
            h = nn.relu(Dense(gfd, name=f"gfc_{i}")(fc_feats))
            fc_feats = jnp.concatenate([h, fc_feats], axis=-1)
        fc_final = Dense(sp.final_dim, name="final_gfc")(fc_feats)
        return fc_final, cfeats


class ECDSegModel(nn.Module):
    """Three-stage ECD segmentation net over the pyramid
    (graph_conv_pool_edge_simp_2layers, model_pooling.py:268-318).
    Returns (global_feats upf0, local_feats [fc0 ‖ lf0])."""

    specs: Tuple[ECDStageSpec, ...] = SCANNET_ECD_SPEC
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        n_stages = len(self.specs)
        fcs, lfs = [], []
        cur = feats
        for s, sp in enumerate(self.specs):
            lvl = pyramid.levels[s]
            # stage 0 conditions the global FC on dxyz (offsets inside the
            # voxel); coarser stages use the raw coordinates
            # (model_pooling.py:273 vs :282 passes xyzs[1] as dxyz) unless
            # the spec opts into dxyz (pgnet_model_v3/v4/v5 stage 1)
            use_d = s == 0 or (sp.use_dxyz and s < len(pyramid.dxyz))
            dxyz = pyramid.dxyz[s] if use_d else lvl.xyz
            fc, lf = ECDStage(sp, self.search_chunk, name=f"stage{s}")(
                lvl.xyz, lvl.mask, dxyz, cur,
                is_sorted=pyramid.level_sorted(s))
            fcs.append(fc)
            lfs.append(lf)
            if s < n_stages - 1:
                cur = jnp.concatenate([hier.pool_max(fc, pyramid, s),
                                       hier.pool_avg(lf, pyramid, s)],
                                      axis=-1)

        # global max/mean over the top level (model_pooling.py:295-297)
        top = n_stages - 1
        tmask = pyramid.levels[top].mask
        gvec = jnp.concatenate([_masked_global_max(fcs[top], tmask),
                                _masked_global_mean(lfs[top], tmask)], axis=0)
        up = jnp.broadcast_to(gvec[None, :],
                              (fcs[top].shape[0], gvec.shape[0]))
        up = jnp.concatenate([up, fcs[top], lfs[top]], axis=-1)
        for s in range(top - 1, -1, -1):
            up = jnp.concatenate(
                [hier.unpool(up, pyramid, s), fcs[s], lfs[s]], axis=-1)
        local = jnp.concatenate([fcs[0], lfs[0]], axis=-1)
        return up, local


class MLPAnchorConv(nn.Module):
    """mlp_anchor_conv (model_pointnet.py:1592+): anchor weights predicted by
    a growth MLP on [sxyz ‖ (f_j - f_i)], l2-normalized with a trainable
    per-anchor rescale, applied to gathered neighbor feats, count-normalized
    sum, leaky-ReLU projection."""

    weights_dims: Tuple[int, ...]
    out_dim: int
    anchor_num: int
    l2_norm: bool = True

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood) -> jnp.ndarray:
        ew_in = jnp.concatenate([sxyz, nb.neighbor_diff(feats, nbr)], axis=-1)
        for i, d in enumerate(self.weights_dims):
            c = nn.relu(Dense(d, name=f"fc_weights_{i}")(ew_in))
            ew_in = jnp.concatenate([c, ew_in], axis=-1)
        ew = Dense(self.anchor_num, name="fc_weights_final")(ew_in)
        if self.l2_norm:
            norm = jnp.sqrt(jnp.sum(ew ** 2, axis=-1, keepdims=True) + 1e-5)
            ew = ew / (norm + 1e-5)
            scale = self.param("edge_weights_trans", nn.initializers.ones,
                               (1, 1, self.anchor_num))
            ew = ew * scale

        edge = nb.gather_neighbors(feats, nbr)                 # [N,K,F]
        m = nbr.mask[..., None].astype(ew.dtype)
        w = ew * m                                             # [N,K,an]
        agg = jnp.einsum("nka,nkf->naf", w, edge)              # [N,an,F]
        agg = agg.reshape(agg.shape[0], -1)
        agg = agg / jnp.maximum(nbr.counts()[:, None], 1.0)
        return nn.leaky_relu(Dense(self.out_dim, name="fc_out")(agg))


@dataclass(frozen=True)
class PGPairSpec:
    """One (pointnet_conv, mlp_anchor_conv) pair of pgnet_model_v8."""

    radius: float
    k: int
    pn_dims: Tuple[int, ...]
    pn_out: int
    aw_dims: Tuple[int, ...]
    a_out: int
    anchors: int


@dataclass(frozen=True)
class PGStageSpec:
    pairs: Tuple[PGPairSpec, ...]
    pool_dims: Optional[Tuple[int, ...]] = None
    pool_out: int = 0


# pgnet_model_v8 exact dims (model_pgnet.py:1042-1131)
PGNET_V8_SPEC = (
    PGStageSpec(pairs=(
        PGPairSpec(0.15, 16, (8,), 8, (16,), 16, 9),
        PGPairSpec(0.15, 16, (8,), 8, (16,), 16, 9),
        PGPairSpec(0.1, 12, (16,), 16, (32,), 32, 9),
        PGPairSpec(0.1, 12, (16,), 16, (32,), 32, 9),
    ), pool_dims=(16, 16), pool_out=64),
    PGStageSpec(pairs=(
        PGPairSpec(0.6, 16, (16,), 16, (32,), 32, 9),
        PGPairSpec(0.6, 16, (16,), 16, (32,), 32, 9),
        PGPairSpec(0.3, 12, (16,), 16, (24,), 48, 12),
        PGPairSpec(0.3, 12, (20,), 20, (32,), 64, 12),
    ), pool_dims=(32, 32), pool_out=128),
    PGStageSpec(pairs=(
        PGPairSpec(0.9, 16, (24,), 24, (32,), 64, 12),
        PGPairSpec(0.9, 16, (24,), 24, (48,), 96, 16),
    )),
)


class PGNetHybrid(nn.Module):
    """pgnet_model_v8: per stage, pairs of pointnet_conv -> mlp_anchor_conv
    with [feats ‖ anchor_out ‖ pn_out] concat growth; pointnet_pool between
    stages; growth global MLP (old-first concat) -> 256; unpool decoder."""

    specs: Tuple[PGStageSpec, ...] = PGNET_V8_SPEC
    global_dims: Tuple[int, ...] = (64, 64, 128)
    global_out: int = 256
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        from .layers import PointNetConv, PointNetPoolMLP

        stage_feats = []
        pair_idx = 0
        prev = feats
        for s, stage in enumerate(self.specs):
            lvl = pyramid.levels[s]
            cache: Dict = {}
            for p in stage.pairs:
                key = (p.radius, p.k)
                if key not in cache:
                    # 4x slack pool so approx_max_k misses can't drop
                    # true in-band neighbors
                    cache[key], = search.band_neighbors_auto(
                        lvl.xyz, lvl.mask, ((0.0, p.radius, p.k),),
                        cand_k=min(4 * p.k, lvl.xyz.shape[0]),
                        return_sxyz=True, sorted=pyramid.level_sorted(s))
                nbr, sxyz_raw = cache[key]
                sxyz = sxyz_raw / p.radius
                prev = feats
                pn = PointNetConv(p.pn_dims, p.pn_out,
                                  name=f"pointnet{pair_idx}")(
                    sxyz, feats, nbr)
                an = MLPAnchorConv(p.aw_dims, p.a_out, p.anchors,
                                   name=f"anchor_conv{pair_idx}")(
                    sxyz, pn, nbr)
                feats = jnp.concatenate([feats, an, pn], axis=-1)
                pair_idx += 1
            stage_feats.append(feats)
            if stage.pool_dims is not None:
                pf = PointNetPoolMLP(stage.pool_dims, stage.pool_out,
                                     name=f"pool{s}")(pyramid.dxyz[s], feats)
                feats = hier.pool_max(pf, pyramid, s)

        top = len(self.specs) - 1
        # global growth MLP on [xyz ‖ pre-final feats], old-first concat
        # (model_pgnet.py:1109-1115)
        g = jnp.concatenate([pyramid.levels[top].xyz, prev], axis=-1)
        for i, d in enumerate(self.global_dims):
            c = nn.relu(Dense(d, name=f"global_{i}")(g))
            g = jnp.concatenate([g, c], axis=-1)
        gfc = Dense(self.global_out, name="global_out")(g)

        up = jnp.concatenate([gfc, stage_feats[top]], axis=-1)
        for s in range(top - 1, -1, -1):
            up = jnp.concatenate(
                [hier.unpool(up, pyramid, s), stage_feats[s]], axis=-1)
        return up, stage_feats[0]


@dataclass(frozen=True)
class V2StageSpec:
    """ecd_stage_v2 hyperparameters (model_pgnet.py:455-483)."""

    radius: float
    k: int
    # xyz conv: feats_dims, final_feats_dim, diffusion_dims, trans_dims, out
    xyz_param: Tuple
    # per feats conv: (embed_dim, diffusion_dims, trans_dims, out_dim)
    feats_params: Tuple[Tuple, ...]
    embed_dims: Tuple[int, ...]
    final_dim: int
    sxyz_scale: float
    dxyz_scale: float


# pgnet_model_v6 exact params (model_pgnet.py:485-549)
PGNET_V6_SPEC = (
    V2StageSpec(radius=0.15, k=16,
                xyz_param=((8, 8), 16, (8, 8), (8, 8), 32),
                feats_params=((16, (8, 8), (8, 8), 32),
                              (16, (8, 8), (8, 8), 32)),
                embed_dims=(16, 16, 16), final_dim=128,
                sxyz_scale=3.0 / 0.15, dxyz_scale=3.0 / 0.15),
    V2StageSpec(radius=0.3, k=16,
                xyz_param=((16, 16), 32, (16, 16), (16, 16), 32),
                feats_params=((32, (16, 16), (16, 16), 32),) * 3,
                embed_dims=(32, 32, 32), final_dim=256,
                sxyz_scale=3.0 / 0.3, dxyz_scale=3.0 / 0.45),
    V2StageSpec(radius=0.5, k=16,
                xyz_param=((16, 16), 32, (16, 16), (16, 16), 32),
                feats_params=((48, (16, 16), (16, 16), 48),) * 3,
                embed_dims=(64, 64, 64, 128), final_dim=512,
                sxyz_scale=3.0 / 0.9, dxyz_scale=3.0 / 3.0),
)


class ECDStageV2(nn.Module):
    """``ecd_stage_v2`` (model_pgnet.py:455-483): ecd_xyz_v2 opener, chains
    of ecd_feats_v2 with concat growth, global growth FC on
    [cfeats ‖ dxyz·scale].  Returns (cfeats, fc_final) — note the reference
    binds them as (fc, lf) in pgnet_model_v6, i.e. the names are swapped."""

    spec: V2StageSpec

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, mask: jnp.ndarray,
                 dxyz: jnp.ndarray, feats: jnp.ndarray,
                 is_sorted: bool = False):
        from .variants import ECDFeatsV2, ECDXyzV2

        sp = self.spec
        (nbr, sxyz_raw), = search.band_neighbors_auto(
            xyz, mask, ((0.0, sp.radius, sp.k),),
            cand_k=min(4 * sp.k, xyz.shape[0]), return_sxyz=True,
            sorted=is_sorted)
        sxyz = sxyz_raw * sp.sxyz_scale

        fd, ffd, dd, td, od = sp.xyz_param
        xyz_feats = ECDXyzV2(fd, ffd, dd, td, od, name="xyz")(
            sxyz, nbr, mask)
        cfeats = jnp.concatenate([feats, xyz_feats], axis=-1)
        for fi, (ed, fdd, ftd, fod) in enumerate(sp.feats_params):
            v = ECDFeatsV2(ed, fdd, ftd, fod, name=f"feats_{fi}")(
                sxyz, cfeats, nbr, mask)
            cfeats = jnp.concatenate([cfeats, v], axis=-1)

        fc_feats = jnp.concatenate([cfeats, dxyz * sp.dxyz_scale], axis=-1)
        for i, gfd in enumerate(sp.embed_dims):
            fc = nn.relu(Dense(gfd, name=f"global_{i}")(fc_feats))
            fc_feats = jnp.concatenate([fc, fc_feats], axis=-1)
        fc_final = Dense(sp.final_dim, name="final_global")(fc_feats)
        return cfeats, fc_final


class PGNetV6(nn.Module):
    """pgnet_model_v6 (model_pgnet.py:485-549): three ecd_stage_v2 stages;
    between stages, max-pool of the stage's cfeats + a cascade of
    avg-pooled features (stage 0 pools the RAW input feats, stage 1 pools
    that average again — :506-507, :521-522); top global max of cfeats2
    tiled back; unpool-concat decoder.  Returns (upf0, fc_final0)."""

    specs: Tuple[V2StageSpec, ...] = PGNET_V6_SPEC
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        lvl0, lvl1, lvl2 = pyramid.levels[:3]

        fc0, lf0 = ECDStageV2(self.specs[0], name="stage0")(
            lvl0.xyz, lvl0.mask, pyramid.dxyz[0], feats,
            is_sorted=pyramid.level_sorted(0))
        fc0_pool = hier.pool_max(fc0, pyramid, 0)
        lf0_avg = hier.pool_avg(feats, pyramid, 0)
        ifeats0 = jnp.concatenate([lf0_avg, fc0_pool], axis=-1)

        fc1, lf1 = ECDStageV2(self.specs[1], name="stage1")(
            lvl1.xyz, lvl1.mask, pyramid.dxyz[1], ifeats0,
            is_sorted=pyramid.level_sorted(1))
        fc1_pool = hier.pool_max(fc1, pyramid, 1)
        lf1_avg = hier.pool_avg(lf0_avg, pyramid, 1)
        ifeats1 = jnp.concatenate([fc1_pool, lf1_avg], axis=-1)

        fc2, lf2 = ECDStageV2(self.specs[2], name="stage2")(
            lvl2.xyz, lvl2.mask, lvl2.xyz, ifeats1,
            is_sorted=pyramid.level_sorted(2))
        gvec = _masked_global_max(fc2, lvl2.mask)

        up2 = jnp.broadcast_to(gvec[None, :], (fc2.shape[0], gvec.shape[0]))
        up2 = jnp.concatenate([up2, fc2, lf2], axis=-1)
        up1 = jnp.concatenate([hier.unpool(up2, pyramid, 1), fc1, lf1],
                              axis=-1)
        up0 = jnp.concatenate([hier.unpool(up1, pyramid, 0), fc0, lf0],
                              axis=-1)
        return up0, lf0


@dataclass(frozen=True)
class V7ConvSpec:
    """One conv of pgnet_model_v7: 'pn' = pointnet_conv, 'ecd' =
    ecd_feats_v4."""

    kind: str
    radius: float
    k: int
    dims: Tuple[int, ...]
    out: int


@dataclass(frozen=True)
class V7StageSpec:
    convs: Tuple[V7ConvSpec, ...]
    pool_dims: Optional[Tuple[int, ...]] = None
    pool_out: int = 0


# pgnet_model_v7 exact dims (model_pgnet.py:920-996)
PGNET_V7_SPEC = (
    V7StageSpec(convs=(
        V7ConvSpec("pn", 0.15, 16, (4, 4, 8), 16),
        V7ConvSpec("ecd", 0.15, 16, (16,), 16),
        V7ConvSpec("ecd", 0.1, 16, (32,), 32),
        V7ConvSpec("ecd", 0.1, 16, (32,), 32),
    ), pool_dims=(16, 16), pool_out=64),
    V7StageSpec(convs=(
        V7ConvSpec("pn", 0.6, 16, (8, 8, 16), 32),
        V7ConvSpec("ecd", 0.6, 16, (32,), 32),
        V7ConvSpec("ecd", 0.3, 16, (32,), 32),
        V7ConvSpec("ecd", 0.3, 16, (48,), 48),
        V7ConvSpec("ecd", 0.3, 16, (64,), 64),
    ), pool_dims=(32, 32), pool_out=128),
    V7StageSpec(convs=(
        V7ConvSpec("ecd", 0.9, 16, (64,), 64),
        V7ConvSpec("ecd", 0.9, 16, (96,), 96),
    )),
)


class PGNetV7(nn.Module):
    """pgnet_model_v7 (model_pgnet.py:920-996): per stage, a pointnet_conv
    opener then chains of ecd_feats_v4 at two radii with concat growth;
    pointnet_pool between stages; global growth MLP (old-first) -> 384;
    unpool decoder.  Returns (lf0, feats_stage0)."""

    specs: Tuple[V7StageSpec, ...] = PGNET_V7_SPEC
    global_dims: Tuple[int, ...] = (64, 64, 64, 128)
    global_out: int = 384
    search_chunk: int = 1024

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats: jnp.ndarray):
        from .layers import PointNetConv, PointNetPoolMLP
        from .variants import ECDFeatsV4

        stage_feats = []
        conv_idx = 0
        prev = feats
        for s, stage in enumerate(self.specs):
            lvl = pyramid.levels[s]
            cache: Dict = {}
            for c in stage.convs:
                key = (c.radius, c.k)
                if key not in cache:
                    cache[key], = search.band_neighbors_auto(
                        lvl.xyz, lvl.mask, ((0.0, c.radius, c.k),),
                        cand_k=min(4 * c.k, lvl.xyz.shape[0]),
                        return_sxyz=True, sorted=pyramid.level_sorted(s))
                nbr, sxyz_raw = cache[key]
                sxyz = sxyz_raw / c.radius
                prev = feats
                if c.kind == "pn":
                    out = PointNetConv(c.dims, c.out,
                                       name=f"feats{conv_idx}")(
                        sxyz, feats, nbr)
                else:
                    out = ECDFeatsV4(c.dims, c.out, name=f"ecd{conv_idx}")(
                        sxyz, feats, nbr)
                feats = jnp.concatenate([feats, out], axis=-1)
                conv_idx += 1
            stage_feats.append(feats)
            if stage.pool_dims is not None:
                pf = PointNetPoolMLP(stage.pool_dims, stage.pool_out,
                                     name=f"pool{s}")(pyramid.dxyz[s], feats)
                feats = hier.pool_max(pf, pyramid, s)

        top = len(self.specs) - 1
        g = jnp.concatenate([pyramid.levels[top].xyz, prev], axis=-1)
        for i, d in enumerate(self.global_dims):
            c = nn.relu(Dense(d, name=f"global_{i}")(g))
            g = jnp.concatenate([g, c], axis=-1)
        gfc = Dense(self.global_out, name="global_out")(g)

        up = jnp.concatenate([gfc, stage_feats[top]], axis=-1)
        for s in range(top - 1, -1, -1):
            up = jnp.concatenate(
                [hier.unpool(up, pyramid, s), stage_feats[s]], axis=-1)
        return up, stage_feats[0]
