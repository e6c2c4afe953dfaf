"""Memory-optimal pointnet_conv: project-then-gather decomposition.

The naive formulation (layers.PointNetConv, matching the reference's
``pointnet_conv`` model_pointnet.py:10-24) materializes the per-edge concat
``[center ‖ neighbor ‖ sxyz]`` of width 2F+3 (F up to ~300 late in a stage),
an [N, K, 2F+3] HBM tensor touched by every growth layer.  On TPU the conv
is HBM-bandwidth-bound, so we decompose every Dense over the concat into
per-source projections:

    W @ [cen ‖ nbr ‖ sxyz ‖ c_1 … c_{i-1}]
      = W_c·cen  (no K axis — [N, D] broadcast)
      + gather(feats @ W_n)           (project FIRST, gather D ≪ F dims)
      + sxyz @ W_s                    ([N, K, 3] @ [3, D])
      + Σ_j c_j @ W_j                 (hidden tensors, 16-dim each)

Only the D-dim hidden activations ever live on the [N, K] edge grid.  Same
function family as the reference layer (a reparametrization of the same
linear maps), verified against the naive layer in tests/test_fast_conv.py.
"""
from __future__ import annotations

from typing import Optional, Sequence

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
        n, k = nbr.idx.shape

        def parts_dense(i: int, d: int, hiddens):
            """Dense(d) over [c_{i-1}…c_1 ‖ cen ‖ nbr ‖ sxyz] as a sum of
            per-source projections (one bias)."""
            cen = Dense(d, name=f"fc_{i}_cen")(feats)            # [N, d]
            nbr_proj = Dense(d, use_bias=False,
                             name=f"fc_{i}_nbr")(feats)          # [N, d]
            nbr_part = jnp.take(nbr_proj, nbr.idx, axis=0)       # [N, K, d]
            sx_part = Dense(d, use_bias=False,
                            name=f"fc_{i}_sxyz")(sxyz)           # [N, K, d]
            acc = cen[:, None, :] + nbr_part + sx_part
            for j, h in enumerate(hiddens):
                acc = acc + Dense(d, use_bias=False,
                                  name=f"fc_{i}_h{j}")(h)
            return acc

        hiddens = []
        for i, d in enumerate(self.fc_dims):
            c = nn.relu(parts_dense(i, d, hiddens))
            hiddens.append(c)
        out = parts_dense(len(self.fc_dims), self.out_dim, hiddens)
        return nb.masked_max(out, nbr)
