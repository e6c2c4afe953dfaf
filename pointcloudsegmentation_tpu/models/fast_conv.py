"""Gather-minimal pointnet_conv.

TPU gathers are row-DMA-bound (~66M rows/s, nearly independent of row
width — measured via device trace), so the unit of cost is *gathered rows*,
i.e. one N·K-row gather per conv is the floor for any neighbor conv.  This
layer hits that floor: every Dense over the growth concat
``[cen ‖ nbr ‖ sxyz ‖ c_1 …]`` is decomposed into per-source projections
(same function family as layers.PointNetConv — verified by parameter-mapping
tests), and all layers' neighbor projections are computed from the SAME conv
input, so they are fused into one wide projection and gathered ONCE:

    nbr_all = take(feats @ [W_0^nbr ‖ W_1^nbr ‖ … ‖ W_out^nbr], idx)

The per-edge residents are then just the (narrow) hidden activations plus
one pre-gathered projection block — the [N, K, 2F+3] concat of the naive
formulation (reference pointnet_conv, model_pointnet.py:10-24) never exists.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import neighbors as nb
from ..ops.types import Neighborhood
from .layers import Dense


class PointNetConvFast(nn.Module):
    """Drop-in equivalent of layers.PointNetConv (concat-growth variant)."""

    fc_dims: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, sxyz: jnp.ndarray, feats: jnp.ndarray,
                 nbr: Neighborhood) -> jnp.ndarray:
        dims = list(self.fc_dims) + [self.out_dim]

        # ONE fused neighbor projection + ONE gather for all layers
        nbr_proj = jnp.concatenate(
            [Dense(d, use_bias=False, name=f"fc_{i}_nbr")(feats)
             for i, d in enumerate(dims)], axis=-1)
        nbr_all = nb.gather_neighbors(nbr_proj, nbr)        # [N, K, ΣD]
        offs = [0]
        for d in dims:
            offs.append(offs[-1] + d)

        hiddens = []
        for i, d in enumerate(dims):
            cen = Dense(d, name=f"fc_{i}_cen")(feats)       # bias lives here
            sx = Dense(d, use_bias=False, name=f"fc_{i}_sxyz")(sxyz)
            acc = cen[:, None, :] + nbr_all[..., offs[i]:offs[i + 1]] + sx
            for j, h in enumerate(hiddens):
                acc = acc + Dense(d, use_bias=False, name=f"fc_{i}_h{j}")(h)
            if i < len(self.fc_dims):
                hiddens.append(nn.relu(acc))
            else:
                out = acc
        return nb.masked_max(out, nbr)
