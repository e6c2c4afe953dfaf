"""Layer primitives shared by the model zoo.

The reference builds every conv out of the same DenseNet-style concat-growth
MLP applied per edge (model_pointnet.py:10-24, tf_ops/graph_layer_new.py) —
``for d in dims: x = concat([relu(Dense(d)(x)), x]); out = Dense(ofn)(x)``.
Here the edge axis is the dense K axis, so each Dense is one big
``[N*K, C] @ [C, D]`` matmul on the MXU.

Init matches the reference's ``tf.contrib.layers.fully_connected`` defaults:
Xavier/Glorot-uniform kernels, zero biases, ReLU activation.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import neighbors as nb
from ..ops.types import Neighborhood

glorot = nn.initializers.glorot_uniform()

# Global compute-dtype policy: bfloat16 halves HBM traffic and doubles MXU
# rate; params and the loss stay float32.  Set before model init/apply
# (read at trace time).
_COMPUTE_DTYPE = [None]


def set_compute_dtype(dtype) -> None:
    """None -> full f32; jnp.bfloat16 -> mixed precision."""
    _COMPUTE_DTYPE[0] = dtype


def compute_dtype():
    return _COMPUTE_DTYPE[0]


class Dense(nn.Dense):
    """nn.Dense with the reference's Xavier-uniform default init and the
    global compute-dtype policy."""

    kernel_init: Callable = glorot

    def __post_init__(self):
        if self.dtype is None and _COMPUTE_DTYPE[0] is not None:
            object.__setattr__(self, "dtype", _COMPUTE_DTYPE[0])
        super().__post_init__()


def fc(x: jnp.ndarray, dim: int, name: str,
       activation: Optional[Callable] = nn.relu):
    """Functional helper used inside Modules via nn.Dense submodule."""
    y = Dense(dim, name=name)(x)
    return activation(y) if activation is not None else y


class GrowthMLP(nn.Module):
    """Concat-growth MLP: each hidden layer's output is concatenated onto the
    running feature vector, then a final linear projection.

    ``new_first=True`` matches pointnet_conv/mlp (concat([cfeats, sfeats]),
    model_pointnet.py:15-21); ``new_first=False`` matches pointnet_deconv
    (model_pointnet.py:91-94).
    """

    dims: Sequence[int]
    out_dim: int
    out_activation: Optional[Callable] = None
    new_first: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dims):
            c = nn.relu(Dense(d, name=f"fc_{i}")(x))
            x = jnp.concatenate([c, x] if self.new_first else [x, c], axis=-1)
        y = Dense(self.out_dim, name="fc_out")(x)
        return self.out_activation(y) if self.out_activation else y


class FCEmbed(nn.Module):
    """Bottleneck embedding before a conv (``fc_embed``,
    model_pointnet.py:101-104) — leaky-ReLU Dense."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.leaky_relu(Dense(self.dim, name="fc_embed")(x))


class PointNetConv(nn.Module):
    """PointNet-style concat conv + segment max
    (``pointnet_conv``, model_pointnet.py:10-24):
    per edge concat [center ‖ neighbor ‖ sxyz] -> GrowthMLP -> linear ->
    masked max over the neighborhood.

    ``concat_growth=False`` gives the plain-MLP variant
    (``pointnet_conv_noconcat``, model_pointnet.py:41-54).
    ``use_feats=False`` gives the xyz-only variant
    (``pointnet_conv_nofeats``, model_pointnet.py:26-39).

    ``edges``/``edge_band``/``edge_rescale``: optional shared EdgeOverflow
    list (see fast_conv.PointNetConvFast) whose in-band edges join the max.
    """

    fc_dims: Sequence[int]
    out_dim: int
    concat_growth: bool = True
    use_feats: bool = True

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 nbr, edges=None, edge_band=None,
                 edge_rescale: float = 1.0) -> jnp.ndarray:
        import jax

        fcs = [Dense(d, name=f"fc_{i}")
               for i, d in enumerate(self.fc_dims)]
        fc_out = Dense(self.out_dim, name="fc_out")

        def mlp(x):
            for fc in fcs:
                c = nn.relu(fc(x))
                x = jnp.concatenate([c, x], axis=-1) if self.concat_growth \
                    else c
            return fc_out(x)

        if self.use_feats:
            assert feats is not None
            x = jnp.concatenate([nb.neighbor_concat(feats, nbr), sxyz],
                                axis=-1)
        else:
            x = sxyz
        out = mlp(x)
        neg = jnp.where(nbr.mask[..., None], out, -1e30)
        best = jnp.max(neg, axis=1)
        any_valid = jnp.any(nbr.mask, axis=1)

        if edges is not None:
            mn, mx = edge_band
            emask = edges.band_mask(mn, mx)
            e_sx = (edges.sxyz / edge_rescale).astype(sxyz.dtype)
            if self.use_feats:
                xe = jnp.concatenate(
                    [jnp.take(feats, edges.center, axis=0),
                     jnp.take(feats, edges.nbr, axis=0), e_sx], axis=-1)
            else:
                xe = e_sx
            oe = mlp(xe)
            n = (feats if feats is not None else sxyz).shape[0]
            neg_e = jnp.where(emask[:, None], oe, -1e30)
            seg = jax.ops.segment_max(neg_e, edges.center, num_segments=n,
                                      indices_are_sorted=True)
            best = jnp.maximum(best, jnp.maximum(seg, -1e30).astype(
                best.dtype))
            any_e = jax.ops.segment_max(
                emask.astype(jnp.float32), edges.center, num_segments=n,
                indices_are_sorted=True) > 0.5
            any_valid = any_valid | any_e
        return jnp.where(any_valid[:, None], best, 0.0)


class PointNetPoolMLP(nn.Module):
    """Per-point MLP on [dxyz ‖ feats] whose output feeds a voxel max-pool
    (``pointnet_pool``, model_pointnet.py:56-69).  Returns the per-point
    features; the caller segment-max-pools them (keeps pooling
    hierarchy-agnostic)."""

    fc_dims: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, dxyz: jnp.ndarray, feats: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([dxyz, feats], axis=-1)
        return GrowthMLP(self.fc_dims, self.out_dim, name="mlp")(x)


class ECDConv(nn.Module):
    """Edge-Conditioned Diffusion conv (``diff_feats_ecd`` / ``ecd_feats``,
    tf_ops/graph_layer_new.py:4-30, model_pgnet.py:4-32):

    phi-MLP on [x_j - x_i ‖ sxyz] -> tanh edge weights [ifn] ->
    weight neighbor feats -> g-MLP (concat growth) ->
    eps-regularized mean over neighbors -> ReLU out FC.

    ``use_xyz_only=True`` is ``ecd_xyz`` (model_pgnet.py:35-62): the edge
    feature is the phi-grown sxyz itself and weights match its width.
    """

    phi_dims: Sequence[int]
    g_dims: Sequence[int]
    out_dim: int
    use_xyz_only: bool = False
    eps: float = 1e-3

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 nbr: Neighborhood) -> jnp.ndarray:
        if self.use_xyz_only:
            phi = sxyz
        else:
            assert feats is not None
            phi = jnp.concatenate([nb.neighbor_diff(feats, nbr), sxyz],
                                  axis=-1)
        for i, d in enumerate(self.phi_dims):
            c = nn.relu(Dense(d, name=f"ifc_{i}")(phi))
            phi = jnp.concatenate([c, phi], axis=-1)

        if self.use_xyz_only:
            ifn = phi.shape[-1]
            edge = phi
        else:
            ifn = feats.shape[-1]
            edge = nb.gather_neighbors(feats, nbr)
        ew = nn.tanh(Dense(ifn, name="fc_ew")(phi))
        x = ew * edge
        for i, d in enumerate(self.g_dims):
            c = nn.relu(Dense(d, name=f"ofc_{i}")(x))
            x = jnp.concatenate([c, x], axis=-1)
        pooled = nb.masked_mean_eps(x, nbr, self.eps)
        return nn.relu(Dense(self.out_dim, name="fc_out")(pooled))


class AnchorConv(nn.Module):
    """Explicit-anchor Gaussian conv (``anchor_conv_v2``,
    tf_ops/graph_layer_new.py:224-255): per-point embed to [an*ed], gather to
    edges, weight by exp(-rescale·‖sxyz - anchor‖²), segment-sum, out FC.

    Deterministic segment sums replace the reference's atomicAdd gather.
    """

    out_dim: int
    anchor_num: int
    embed_dim: int
    rescale_ratio: float = 4.0
    trainable_anchor: bool = True

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood) -> jnp.ndarray:
        from ..ops import anchors as anchor_gen

        an, ed = self.anchor_num, self.embed_dim
        emb = Dense(an * ed, name="fc_embed")(feats)           # [N, an*ed]
        edge = nb.gather_neighbors(emb, nbr)                   # [N, K, an*ed]
        edge = edge.reshape(edge.shape[0], edge.shape[1], an, ed)

        init = anchor_gen.sphere_kmeans_anchors(an).T          # [an, 3]
        if self.trainable_anchor:
            anchors = self.param("anchor", lambda k: jnp.asarray(init))
        else:
            anchors = jnp.asarray(init)
        d2 = jnp.sum(
            (sxyz[:, :, None, :] - anchors[None, None, :, :]) ** 2, axis=-1)
        w = jnp.exp(-d2 * self.rescale_ratio)                  # [N, K, an]
        w = w * nbr.mask[..., None].astype(w.dtype)
        agg = jnp.einsum("nka,nkae->nae", w, edge)             # [N, an, ed]
        agg = agg.reshape(agg.shape[0], an * ed)
        return nn.relu(Dense(self.out_dim, name="fc_out")(agg))


class GPNConv(nn.Module):
    """Gaussian-anchored location-weighted conv (the thesis "GPN" conv,
    ``graph_conv_xyz_feats`` family, tf_ops/graph_conv_layer.py:74-275):

    lw = exp(sxyz · pmiu)  [N,K,m]; tfeats = (cat(sxyz, sfeats)) @ pw
    reshaped to [N,K,m,ofn]; out = Σ_k lw·tfeats / Σ_k lw  summed over m.

    ``mode='xyz'`` omits feats (graph_conv_xyz), ``mode='feats'`` omits sxyz
    from the projection (graph_conv_feats, weight applied on point feats
    before the gather — weight-before-scatter, graph_conv_layer.py:147-156).
    """

    m: int
    out_dim: int
    mode: str = "xyz_feats"  # xyz | feats | xyz_feats
    use_bias: bool = True
    activation: Optional[Callable] = nn.relu
    pmiu_trainable: bool = False
    # no_sum=True returns the per-anchor features flattened to [N, m*ofn]
    # instead of summing over anchors (graph_conv_layer.py:97-100)
    no_sum: bool = False

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 nbr: Neighborhood,
                 lw: Optional[jnp.ndarray] = None,
                 lw_sum: Optional[jnp.ndarray] = None):
        from ..ops import anchors as anchor_gen

        if self.mode == "xyz":
            cfeats = sxyz                                      # [N,K,3]
        elif self.mode == "feats":
            cfeats = nb.gather_neighbors(feats, nbr)           # [N,K,F]
        else:
            cfeats = jnp.concatenate(
                [sxyz, nb.gather_neighbors(feats, nbr)], axis=-1)
        ifn = cfeats.shape[-1]
        pw = self.param("pw", glorot, (ifn, self.m * self.out_dim))

        if lw is None:
            pmiu_init = jnp.asarray(anchor_gen.sphere_kmeans_anchors(self.m))
            if self.pmiu_trainable:
                pmiu = self.param("pmiu", lambda k: pmiu_init)
            else:
                pmiu = pmiu_init
            lw = jnp.exp(sxyz @ pmiu)                          # [N,K,m]
            lw = lw * nbr.mask[..., None].astype(lw.dtype)
            lw_sum = jnp.sum(lw, axis=1)                       # [N,m]

        # Factored bilinear aggregation — the fused LocationWeightFeatSum
        # (TFNeighborKernel.cu:179-211) computes Σ_k lw[n,k,m]·(cfeats@pw);
        # factoring the sum over k INSIDE the projection avoids the
        # [N,K,m,ofn] intermediate entirely:
        #   A[n,m,f] = Σ_k lw[n,k,m]·cfeats[n,k,f]     (small)
        #   num[n,m,o] = Σ_f A[n,m,f]·pw[f,m,o]
        pw3 = pw.reshape(ifn, self.m, self.out_dim)
        agg = jnp.einsum("nkm,nkf->nmf", lw, cfeats)           # [N,m,ifn]
        num = jnp.einsum("nmf,fmo->nmo", agg, pw3)             # [N,m,ofn]
        out = num / (lw_sum[..., None] + 1e-6)
        if self.no_sum:
            out = out.reshape(out.shape[0], self.m * self.out_dim)
            bdim = self.m * self.out_dim
        else:
            out = jnp.sum(out, axis=1)
            bdim = self.out_dim
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (bdim,))
        if self.activation is not None:
            out = self.activation(out)
        return out, lw, lw_sum


class SegClassifier(nn.Module):
    """The reference's segmentation-head family, one parametric machine
    (1x1 convs become Dense):

    - default = ``classifier_v3`` (model.py:762-799) == ``classifier_v5``
      (:801-841, identical structure, only a name-scope arg): 512 ->
      concat(local) -> dropout(keep 0.7) -> 256 -> concat -> dropout ->
      logits.  v3 is used by every main trainer; v5 by the refine cascade
      (train_graph_pool_refine.py:69).
    - ``dims=(256,128)`` = ``classifier_v4`` (model.py:843-883).
    - ``dims=(256,128), use_pfeats=False`` = ``classifier_v2`` (:885-918).
    - ``use_dropout=False`` = the original ``classifier`` (:724-760).
    """

    num_classes: int
    dims: Tuple[int, int] = (512, 256)
    use_pfeats: bool = True
    use_dropout: bool = True
    dropout_rate: float = 0.3  # tf.nn.dropout keep_prob 0.7
    # feats is already ``class_mlp1 @ lf + b`` (the encoder's factored
    # head_dim projection, models/pointnet.py) — apply the relu directly.
    # feats.shape[-1] must equal dims[0].
    premixed: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 pfeats: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.premixed:
            assert feats.shape[-1] == self.dims[0], \
                (feats.shape, self.dims)
        x = feats
        for i, d in enumerate(self.dims):
            if i == 0 and self.premixed:
                x = nn.relu(x)
            else:
                x = nn.relu(Dense(d, name=f"class_mlp{i + 1}")(x))
            if self.use_pfeats:
                assert pfeats is not None
                x = jnp.concatenate([x, pfeats], axis=-1)
            if self.use_dropout:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not train)(x)
        return Dense(self.num_classes,
                     name=f"class_mlp{len(self.dims) + 1}")(x)


def classifier_v2(num_classes: int, **kw) -> "SegClassifier":
    """``classifier_v2`` (model.py:885-918): 256/128, no local-feat skip."""
    return SegClassifier(num_classes, dims=(256, 128), use_pfeats=False,
                         **kw)


def classifier_v4(num_classes: int, **kw) -> "SegClassifier":
    """``classifier_v4`` (model.py:843-883): 256/128 with local-feat skip."""
    return SegClassifier(num_classes, dims=(256, 128), **kw)


def classifier_v5(num_classes: int, **kw) -> "SegClassifier":
    """``classifier_v5`` (model.py:801-841): structurally identical to v3;
    kept as a named constructor for refine-cascade parity
    (train_graph_pool_refine.py:69)."""
    return SegClassifier(num_classes, **kw)


class ProbsDiffusion(nn.Module):
    """Iterative label smoothing over edges (``graph_probs_diffusion``,
    model.py:920-945): probs are repeatedly averaged over the neighborhood
    with a learned mixing weight."""

    steps: int = 3

    @nn.compact
    def __call__(self, probs: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
        alpha = nn.sigmoid(
            self.param("alpha", nn.initializers.zeros, (1,)))
        for _ in range(self.steps):
            neigh = nb.masked_mean(nb.gather_neighbors(probs, nbr), nbr)
            probs = (1.0 - alpha) * probs + alpha * neigh
        return probs
