"""Numerics-parity fixtures (BASELINE.md layer-level parity target):

Each core conv is checked against a STRAIGHT-LINE numpy implementation of
the reference formula with matched eps constants — 1e-6 in the lw_sum
division (tf_ops/graph_conv_layer.py:94), (1+1e-3)/(n+1e-3) in the ECD mean
(graph_conv_layer.py:684, graph_layer_new.py:24-26) — using the *same*
parameters extracted from the flax module.  This pins the implemented math
to the reference's, independent of implementation (factored einsums,
gather-minimal decompositions).
"""
import jax
import jax.numpy as jnp
import numpy as np

from oracles import random_cloud
from pointcloudsegmentation_tpu.models import (ECDConv, GPNConv,
                                               PointNetConv)
from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast
from pointcloudsegmentation_tpu.ops import anchors as anchor_gen
from pointcloudsegmentation_tpu.ops import search
from pointcloudsegmentation_tpu.ops.types import Neighborhood

# realistic padded size (VERDICT r3 item 7): errors accumulate over K and
# the lw_sum/eps denominators only stress at real neighbor counts
N, K, F = 512, 16, 6


def setup(rng):
    xyz, mask = random_cloud(rng, N, n_valid=N - 37)
    nbr = search.radius_neighbors(jnp.asarray(xyz), jnp.asarray(mask),
                                  0.8, K, chunk=32)
    sxyz = (np.take(xyz, np.asarray(nbr.idx), 0)
            - xyz[:, None, :]) * np.asarray(nbr.mask)[..., None]
    feats = rng.randn(N, F).astype(np.float32)
    return (jnp.asarray(sxyz), jnp.asarray(feats), nbr,
            sxyz, feats, np.asarray(nbr.idx), np.asarray(nbr.mask))


def relu(x):
    return np.maximum(x, 0.0)


def dense_p(params, name):
    p = params["params"][name]
    k = np.asarray(p["kernel"], np.float64)
    b = np.asarray(p["bias"], np.float64) if "bias" in p else None
    return k, b


def test_gpn_conv_matches_reference_formula(rng):
    """graph_conv_xyz_feats (tf_ops/graph_conv_layer.py:74-275):
    lw = exp(sxyz·pmiu); tfeats = cfeats@pw -> [.., m, ofn];
    out = relu(Σ_m (Σ_k lw·tfeats) / (lw_sum + 1e-6) + bias)."""
    sxyz, feats, nbr, sxyz_np, feats_np, idx, nmask = setup(rng)
    m, ofn = 5, 7
    for mode in ("xyz", "feats", "xyz_feats"):
        for no_sum in (False, True):
            conv = GPNConv(m=m, out_dim=ofn, mode=mode, no_sum=no_sum)
            params = conv.init(jax.random.PRNGKey(0), sxyz, feats, nbr)
            out, lw, lw_sum = conv.apply(params, sxyz, feats, nbr)

            pmiu = np.asarray(anchor_gen.sphere_kmeans_anchors(m),
                              np.float64)
            nbr_feats = feats_np[idx].astype(np.float64)
            cfeats = {"xyz": sxyz_np.astype(np.float64),
                      "feats": nbr_feats,
                      "xyz_feats": np.concatenate(
                          [sxyz_np.astype(np.float64), nbr_feats], -1)}[
                mode]
            pw = np.asarray(params["params"]["pw"], np.float64)
            bias = np.asarray(params["params"]["bias"], np.float64)

            lw_np = np.exp(sxyz_np.astype(np.float64) @ pmiu) \
                * nmask[..., None]
            lw_sum_np = lw_np.sum(1)
            t = (cfeats @ pw).reshape(N, K, m, ofn)
            num = (lw_np[..., None] * t).sum(1)          # [N, m, ofn]
            o = num / (lw_sum_np[..., None] + 1e-6)
            o = o.reshape(N, m * ofn) if no_sum else o.sum(1)
            want = relu(o + bias)
            np.testing.assert_allclose(np.asarray(out), want,
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"{mode} no_sum={no_sum}")
            np.testing.assert_allclose(np.asarray(lw), lw_np, rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(lw_sum), lw_sum_np,
                                       rtol=1e-4, atol=1e-5)


def test_ecd_conv_matches_reference_formula(rng):
    """diff_feats_ecd / ecd_feats (graph_layer_new.py:4-30,
    model_pgnet.py:4-32): phi growth MLP on [f_j - f_i ‖ sxyz] ->
    tanh(Dense) edge weights -> weighted gathered feats -> g growth MLP ->
    (1+eps)/(n+eps) mean -> relu out."""
    sxyz, feats, nbr, sxyz_np, feats_np, idx, nmask = setup(rng)
    phi_dims, g_dims, ofn = (5, 4), (6, 3), 7
    conv = ECDConv(phi_dims, g_dims, ofn)
    params = conv.init(jax.random.PRNGKey(1), sxyz, feats, nbr)
    out = conv.apply(params, sxyz, feats, nbr)

    f64 = feats_np.astype(np.float64)
    diff = f64[idx] - f64[:, None, :]
    phi = np.concatenate([diff, sxyz_np.astype(np.float64)], -1)
    for i in range(len(phi_dims)):
        k, b = dense_p(params, f"ifc_{i}")
        phi = np.concatenate([relu(phi @ k + b), phi], -1)
    k, b = dense_p(params, "fc_ew")
    ew = np.tanh(phi @ k + b)
    x = ew * f64[idx]
    for i in range(len(g_dims)):
        k, b = dense_p(params, f"ofc_{i}")
        x = np.concatenate([relu(x @ k + b), x], -1)
    eps = 1e-3
    n = nmask.sum(1).astype(np.float64)
    pooled = ((1.0 + eps) / (n + eps))[:, None] * (
        x * nmask[..., None]).sum(1)
    k, b = dense_p(params, "fc_out")
    want = relu(pooled @ k + b)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def np_pointnet_conv(params, sxyz_np, feats_np, idx, nmask, fc_dims):
    """pointnet_conv (model_pointnet.py:10-24): concat
    [center ‖ neighbor ‖ sxyz] -> concat-growth MLP -> linear -> masked max
    (zero for empty neighborhoods, NeighborMaxFeatGather semantics)."""
    f64 = feats_np.astype(np.float64)
    cen = np.broadcast_to(f64[:, None, :], (N, K, f64.shape[-1]))
    x = np.concatenate([cen, f64[idx], sxyz_np.astype(np.float64)], -1)
    for i in range(len(fc_dims)):
        k, b = dense_p(params, f"fc_{i}")
        x = np.concatenate([relu(x @ k + b), x], -1)
    k, b = dense_p(params, "fc_out")
    x = x @ k + b
    x = np.where(nmask[..., None], x, -1e30).max(1)
    return np.where(nmask.any(1)[:, None], x, 0.0)


def test_pointnet_conv_matches_reference_formula(rng):
    sxyz, feats, nbr, sxyz_np, feats_np, idx, nmask = setup(rng)
    fc_dims, ofn = (5, 4), 7
    conv = PointNetConv(fc_dims, ofn)
    params = conv.init(jax.random.PRNGKey(2), sxyz, feats, nbr)
    out = conv.apply(params, sxyz, feats, nbr)
    want = np_pointnet_conv(params, sxyz_np, feats_np, idx, nmask, fc_dims)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_fast_conv_matches_reference_formula(rng):
    """PointNetConvFast implements the SAME function family with decomposed
    per-source projections; map its parameters onto the reference
    formulation and compare against the numpy oracle."""
    sxyz, feats, nbr, sxyz_np, feats_np, idx, nmask = setup(rng)
    fc_dims, ofn = (5, 4), 7
    conv = PointNetConvFast(fc_dims, ofn)
    params = conv.init(jax.random.PRNGKey(3), sxyz, feats, nbr)
    out = conv.apply(params, sxyz, feats, nbr)

    # reconstruct the monolithic growth-MLP weights from the per-source
    # blocks: layer i's input is [cen ‖ nbr ‖ sxyz ‖ h_{i-1} … h_0]
    p = params["params"]
    dims = list(fc_dims) + [ofn]
    mono = {"params": {}}
    hidden_widths = []
    for i, d in enumerate(dims):
        k_cen = np.asarray(p[f"fc_{i}_cen"]["kernel"], np.float64)
        k_nbr = np.asarray(p[f"fc_{i}_nbr"]["kernel"], np.float64)
        k_sx = np.asarray(p[f"fc_{i}_sxyz"]["kernel"], np.float64)
        blocks = []
        # reference layout after growth concats: [h_{i-1} … h_0,
        # cen ‖ nbr ‖ sxyz] with new-first concat
        for j in reversed(range(len(hidden_widths))):
            blocks.append(np.asarray(p[f"fc_{i}_h{j}"]["kernel"],
                                     np.float64))
        blocks += [k_cen, k_nbr, k_sx]
        kernel = np.concatenate(blocks, 0)
        bias = np.asarray(p[f"fc_{i}_cen"]["bias"], np.float64)
        name = f"fc_{i}" if i < len(fc_dims) else "fc_out"
        mono["params"][name] = {"kernel": kernel, "bias": bias}
        hidden_widths.append(d)
    want = np_pointnet_conv(mono, sxyz_np, feats_np, idx, nmask, fc_dims)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-4)
