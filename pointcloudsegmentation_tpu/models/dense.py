"""Dense-pipeline pre-encoder (Semantic3D "dense" variant).

``DenseFeats`` = the reference's ``dense_feats``
(model_pointnet_semantic3d.py:307-324): a fixed-K graph connects every
*sampled* point to its dense-cloud neighbors; per edge concat
[dxyz ‖ sampled feats ‖ dense feats] -> growth MLP -> max over the dense
neighborhood; the pooled descriptor concats onto the sampled features before
the main encoder (train_gpn_semantic3d_dense.py:52-65).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import search
from .layers import GrowthMLP


class DenseFeats(nn.Module):
    """(dense cloud, sampled subset) -> enriched sampled features."""

    fc_dims: Sequence[int] = (16, 16, 16)
    out_dim: int = 48
    k: int = 16

    @nn.compact
    def __call__(self, dense_xyz: jnp.ndarray, dense_feats: jnp.ndarray,
                 dense_mask: jnp.ndarray, sampled_xyz: jnp.ndarray,
                 sampled_feats: jnp.ndarray, sampled_mask: jnp.ndarray
                 ) -> jnp.ndarray:
        idx, d2, valid = search.knn_in_support(
            sampled_xyz, sampled_mask, dense_xyz, dense_mask, self.k,
            chunk=min(1024, sampled_xyz.shape[0]))
        nbr_xyz = jnp.take(dense_xyz, idx, axis=0)           # [Ns, K, 3]
        nbr_feats = jnp.take(dense_feats, idx, axis=0)       # [Ns, K, Fd]
        dxyz = nbr_xyz - sampled_xyz[:, None, :]
        cen = jnp.broadcast_to(sampled_feats[:, None, :],
                               nbr_feats.shape[:2] + sampled_feats.shape[-1:])
        edge = jnp.concatenate([dxyz, cen, nbr_feats], axis=-1)
        edge = GrowthMLP(self.fc_dims, self.out_dim, name="dense_feats")(edge)
        pooled = jnp.max(jnp.where(valid[..., None], edge, -1e30), axis=1)
        pooled = jnp.where(jnp.any(valid, axis=1)[:, None], pooled, 0.0)
        return jnp.concatenate([pooled, sampled_feats], axis=-1)
