"""Conv-variant tail of the reference zoo: GPN v2 (weight-after-aggregate),
wlw pre-normalized edge-weight convs, MLP-predicted anchor weights, and the
diffusion-anchor conv family v1-v4.

These are the reference's ablation operators (tf_ops/graph_conv_layer.py
:327-570, tf_ops/graph_layer_new.py:258-433).  Everything operates on the
static [N, K] neighborhood with masks; segment sums are deterministic masked
reductions (vs the reference's atomicAdd backward kernels).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import neighbors as nb
from ..ops.types import Neighborhood
from .layers import Dense, glorot


class GPNConvV2(nn.Module):
    """Weight-AFTER-aggregate anchored conv (``graph_conv_xyz_v2`` /
    ``graph_conv_feats_v2``, tf_ops/graph_conv_layer.py:327-450):

    wfeats[n,m,f] = (Σ_k lw[n,k,m]·sfeats[n,k,f]) / (lw_sum[n,m]+1e-6);
    out = reshape(wfeats, [n, m·f]) @ pw[m·f, ofn] + bias.

    vs GPNConv (v1), which projects with a per-anchor weight tensor before
    normalizing.  ``mode='xyz'`` feeds sxyz·scale (graph_conv_xyz_v2_impl
    :358-388), ``mode='feats'`` the gathered neighbor feats (:417-443).
    """

    m: int
    out_dim: int
    mode: str = "xyz"  # xyz | feats
    scale_val: float = 1.0
    activation: Optional[callable] = nn.relu
    pmiu_trainable: bool = False

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 nbr: Neighborhood,
                 lw: Optional[jnp.ndarray] = None,
                 lw_sum: Optional[jnp.ndarray] = None):
        from ..ops import anchors as anchor_gen

        if self.mode == "xyz":
            sfeats = sxyz                                       # [N,K,3]
        else:
            assert feats is not None
            sfeats = nb.gather_neighbors(feats, nbr)            # [N,K,F]
        ifn = sfeats.shape[-1]

        if lw is None:
            pmiu_init = jnp.asarray(anchor_gen.sphere_kmeans_anchors(self.m))
            if self.pmiu_trainable:
                pmiu = self.param("pmiu", lambda k: pmiu_init)
            else:
                pmiu = pmiu_init
            lw = jnp.exp((sxyz * self.scale_val) @ pmiu)        # [N,K,m]
            lw = lw * nbr.mask[..., None].astype(lw.dtype)
            lw_sum = jnp.sum(lw, axis=1)                        # [N,m]

        agg = jnp.einsum("nkm,nkf->nmf", lw, sfeats)            # [N,m,F]
        wfeats = agg / (lw_sum[..., None] + 1e-6)
        wfeats = wfeats.reshape(wfeats.shape[0], self.m * ifn)
        pw = self.param("pw", glorot, (self.m * ifn, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        out = wfeats @ pw + bias
        if self.activation is not None:
            out = self.activation(out)
        return out, lw, lw_sum


def compute_wlw(sxyz: jnp.ndarray, nbr: Neighborhood, pmiu: jnp.ndarray,
                scale_val: float = 1.0) -> jnp.ndarray:
    """Pre-normalized Gaussian edge weights (``compute_wlw``,
    tf_ops/graph_conv_layer.py:479-489): lw/Σ_k lw broadcast back to edges.
    Returns [N, K, m] (already masked)."""
    lw = jnp.exp((sxyz * scale_val) @ pmiu)
    lw = lw * nbr.mask[..., None].astype(lw.dtype)
    lw_sum = jnp.sum(lw, axis=1, keepdims=True)                 # [N,1,m]
    return lw / (lw_sum + 1e-6)


class DiffFeatsWLW(nn.Module):
    """MLP-predicted pre-normalized anchor weights from feature diffs
    (``compute_diff_feats_wlw``, tf_ops/graph_conv_layer.py:543-570):
    plain-MLP on (f_j - f_i) -> m logits, clip ±10, exp, normalize."""

    m: int
    fc_dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, feats: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
        x = nb.neighbor_diff(feats, nbr)
        for i, d in enumerate(self.fc_dims):
            x = nn.relu(Dense(d, name=f"fc_{i}")(x))
        lw = Dense(self.m, name="fc_weights")(x)
        lw = jnp.exp(jnp.clip(lw, -10.0, 10.0))
        lw = lw * nbr.mask[..., None].astype(lw.dtype)
        lw_sum = jnp.sum(lw, axis=1, keepdims=True)
        return lw / (lw_sum + 1e-6)


class WLWConv(nn.Module):
    """Edge-weighted transform convs over pre-normalized weights
    (``graph_conv_{xyz,feats}_{sum,concat}``,
    tf_ops/graph_conv_layer.py:453-541).

    sum:    per-edge embed to [m, ofn] -> Σ_m Σ_k wlw·feats -> activation
    concat: Σ_k wlw·raw-edge-feats per anchor -> [N, m·F] -> Dense(ofn)
    ``use_xyz=True`` feeds sxyz (diff) edges, else gathered neighbor feats
    (embedded BEFORE the gather in the feats_sum variant, :506-518 — the
    projection commutes with the gather, so we keep weight-before-gather).
    """

    m: int
    out_dim: int
    mode: str = "sum"  # sum | concat
    use_xyz: bool = True
    activation: Optional[callable] = nn.relu

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 nbr: Neighborhood, wlw: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "sum":
            if self.use_xyz:
                edge = Dense(self.m * self.out_dim, name="embed")(sxyz)
            else:
                proj = Dense(self.m * self.out_dim, name="embed")(feats)
                edge = nb.gather_neighbors(proj, nbr)
            edge = edge.reshape(edge.shape[:2] + (self.m, self.out_dim))
            out = jnp.einsum("nkm,nkmo->no", wlw, edge)
            if self.activation is not None:
                out = self.activation(out)
            return out
        # concat: anchor-weighted sums of the raw edge features
        edge = sxyz if self.use_xyz else nb.gather_neighbors(feats, nbr)
        agg = jnp.einsum("nkm,nkf->nmf", wlw, edge)             # [N,m,F]
        agg = agg.reshape(agg.shape[0], -1)
        out = Dense(self.out_dim, name="embed")(agg)
        return self.activation(out) if self.activation else out


class ECDFeatsV4(nn.Module):
    """pgnet_model_v7's conv operator (``ecd_feats_v4``,
    model_pgnet.py:889-918): growth MLP on [f_j - f_i ‖ sxyz] -> linear
    per-feature edge weights, L2-normalized with a trainable rescale,
    element-wise applied to gathered neighbor feats, eps-regularized mean,
    linear out projection."""

    ifc_dims: Tuple[int, ...]
    out_dim: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood) -> jnp.ndarray:
        ifn = feats.shape[-1]
        x = jnp.concatenate([nb.neighbor_diff(feats, nbr), sxyz], axis=-1)
        for i, d in enumerate(self.ifc_dims):
            c = nn.relu(Dense(d, name=f"ifc_{i}")(x))
            x = jnp.concatenate([c, x], axis=-1)
        ew = Dense(ifn, name="fc_ew")(x)                        # [N,K,ifn]
        norm = jnp.sqrt(jnp.sum(ew ** 2, axis=-1, keepdims=True) + 1e-5)
        ew = ew / (norm + 1e-5)
        scale = self.param("edge_weights_trans", nn.initializers.ones,
                           (1, ifn))
        ew = ew * scale
        edge = nb.gather_neighbors(feats, nbr) * ew
        pooled = nb.masked_mean_eps(edge, nbr, self.eps)
        return Dense(self.out_dim, name="fc_out")(pooled)


class MaskedBatchNorm(nn.Module):
    """Batch normalization over valid points only (the v2 ECD layers'
    ``tf.contrib.layers.batch_norm(scale=True)``, model_pgnet.py:404-406).

    Statistics are computed per block over the masked point axis — padded
    rows must not pollute them.  Normalizes by current-batch statistics in
    both modes (the reference's v2 models are analysis-only experiments,
    analysis.py:209; no moving-average state is kept, which also keeps the
    trainer's parameter tree pure)."""

    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        m = mask[:, None].astype(x.dtype)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=0, keepdims=True) / cnt
        var = jnp.sum(((x - mean) ** 2) * m, axis=0, keepdims=True) / cnt
        gamma = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) / jnp.sqrt(var + self.eps) * gamma + beta


class ECDXyzV2(nn.Module):
    """``ecd_xyz_v2`` (model_pgnet.py:363-406): growth MLP (old-first) on
    sxyz -> linear edge feats; tanh diffusion weights from a second growth
    MLP on sxyz; weighted, trans-grown, eps-mean pooled, ReLU out + BN."""

    feats_dims: Tuple[int, ...]
    final_feats_dim: int
    diffusion_dims: Tuple[int, ...]
    trans_dims: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, nbr: Neighborhood,
                 mask: jnp.ndarray) -> jnp.ndarray:
        e = sxyz
        for i, d in enumerate(self.feats_dims):
            c = nn.relu(Dense(d, name=f"feats_fc_{i}")(e))
            e = jnp.concatenate([e, c], axis=-1)
        edge_feats = Dense(self.final_feats_dim, name="final_feats_fc")(e)

        w = sxyz
        for i, d in enumerate(self.diffusion_dims):
            c = nn.relu(Dense(d, name=f"diffusion_fc_{i}")(w))
            w = jnp.concatenate([w, c], axis=-1)
        ew = nn.tanh(Dense(self.final_feats_dim, name="final_diffusion_fc")(w))

        x = ew * edge_feats
        for i, d in enumerate(self.trans_dims):
            c = nn.relu(Dense(d, name=f"embed_fc_{i}")(x))
            x = jnp.concatenate([x, c], axis=-1)
        pooled = nb.masked_mean_eps(x, nbr)
        out = nn.relu(Dense(self.out_dim, name="out_embed_fc")(pooled))
        return MaskedBatchNorm(name="out_bn")(out, mask)


class ECDFeatsV2(nn.Module):
    """``ecd_feats_v2`` (model_pgnet.py:409-452): linear embed, tanh
    diffusion weights from [f_j - f_i ‖ sxyz], weighted gathered feats,
    trans growth, eps-mean, ReLU out + BN."""

    embed_dim: int
    diffusion_dims: Tuple[int, ...]
    trans_dims: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood, mask: jnp.ndarray) -> jnp.ndarray:
        emb = Dense(self.embed_dim, name="in_embed_fc")(feats)
        w = jnp.concatenate([nb.neighbor_diff(emb, nbr), sxyz], axis=-1)
        for i, d in enumerate(self.diffusion_dims):
            c = nn.relu(Dense(d, name=f"diffusion_fc_{i}")(w))
            w = jnp.concatenate([w, c], axis=-1)
        ew = nn.tanh(Dense(self.embed_dim, name="final_diffusion_fc")(w))

        x = ew * nb.gather_neighbors(emb, nbr)
        for i, d in enumerate(self.trans_dims):
            c = nn.relu(Dense(d, name=f"embed_fc_{i}")(x))
            x = jnp.concatenate([x, c], axis=-1)
        pooled = nb.masked_mean_eps(x, nbr)
        out = nn.relu(Dense(self.out_dim, name="out_embed_fc")(pooled))
        return MaskedBatchNorm(name="out_bn")(out, mask)


class DiffusionAnchorConv(nn.Module):
    """Edge-condition diffusion-anchor conv family
    (``edge_condition_diffusion_anchor`` v1-v4,
    tf_ops/graph_layer_new.py:258-433).  An anchor-weight MLP on the edge
    geometry (optionally + feature diffs / concat) predicts per-edge anchor
    weights; gathered neighbor feats are anchor-weighted, segment-summed and
    projected.  The versions differ in weight normalization:

    - v1: exp(clip(w)) + 1e-5, normalized by the per-point per-anchor weight
      sum; weights from sxyz only; raw feats weighted (:258-300).
    - v2: sigmoid weights, count-normalized; feats embedded to [an·ed]
      (:304-341).
    - v3: L2-normalized linear weights, count-normalized, linear out
      (:345-384).
    - v4: weights from [sxyz ‖ f_j - f_i] (or center-concat), optional
      L2-norm + trainable per-anchor rescale, count-normalized (:388-433)
      == ecd.MLPAnchorConv; kept there as the main operator.
    """

    version: int
    anchor_num: int
    out_dim: int
    weights_dims: Tuple[int, ...]
    embed_dim: int = 0  # v2/v3 per-anchor embed width

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood) -> jnp.ndarray:
        assert self.version in (1, 2, 3)
        an = self.anchor_num

        if self.version == 1:
            pfeats = feats
        else:
            pfeats = Dense(an * self.embed_dim, name="fc_embed")(feats)

        # anchor-weight growth MLP on the edge geometry
        x = sxyz
        for i, d in enumerate(self.weights_dims):
            c = nn.relu(Dense(d, name=f"fc_weights_{i}")(x))
            x = jnp.concatenate([c, x], axis=-1)
        ew = Dense(an, name="fc_weights_final")(x)              # [N,K,an]

        if self.version == 1:
            ew = jnp.exp(jnp.clip(ew, -10.0, 10.0)) + 1e-5
        elif self.version == 2:
            ew = nn.sigmoid(ew)
        else:
            norm = jnp.sqrt(jnp.sum(ew ** 2, axis=-1, keepdims=True) + 1e-5)
            ew = ew / (norm + 1e-5)
        m = nbr.mask[..., None].astype(ew.dtype)
        ew = ew * m

        edge = nb.gather_neighbors(pfeats, nbr)                 # [N,K,F|an·ed]
        if self.version == 1:
            wf = jnp.einsum("nka,nkf->naf", ew, edge)           # [N,an,F]
            ew_sum = jnp.sum(ew, axis=1)                        # [N,an]
            wf = wf / jnp.maximum(ew_sum[..., None], 1e-12)
            out = wf.reshape(wf.shape[0], -1)
            return nn.relu(Dense(self.out_dim, name="fc_out")(out))
        edge = edge.reshape(edge.shape[0], edge.shape[1], an, self.embed_dim)
        wf = jnp.einsum("nka,nkae->nae", ew, edge)              # [N,an,ed]
        wf = wf.reshape(wf.shape[0], -1)
        wf = wf / jnp.maximum(nbr.counts()[:, None], 1.0)
        out = Dense(self.out_dim, name="fc_out")(wf)
        return nn.relu(out) if self.version == 2 else out
