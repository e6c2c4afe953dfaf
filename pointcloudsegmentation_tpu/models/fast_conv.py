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

With a WindowedNeighborhood the slot gather runs as a one-hot MXU matmul
(ops.neighbors), and out-of-slab neighbors arrive as a compact shared
``EdgeOverflow`` list: the same layer stack runs per edge (two [E, ΣD]
gathers — fused neighbor AND center projections) and merges into the final
max via a sorted segment-max.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import neighbors as nb
from ..ops.types import EdgeOverflow
from .layers import Dense

_NEG = -1e30


class PointNetConvFast(nn.Module):
    """Drop-in equivalent of layers.PointNetConv (concat-growth variant).

    edges/edge_band/edge_rescale: optional EdgeOverflow list shared across
    the level's bands; ``edge_band=(min_radius, max_radius)`` selects this
    conv's band, ``edge_rescale`` applies the same sxyz normalization the
    caller applied to the windowed ``sxyz``.

    xyz fold (``xyz``/``inv_rescale`` given, ``sxyz`` may be None): instead
    of consuming the search's per-edge ``sxyz`` tensor, gather the neighbor
    COORDINATES alongside the projections — two extra bf16 columns per axis
    (hi = bf16(xyz), mid = bf16(xyz - hi): one-hot/pool/row gathers move
    them exactly, and hi + mid reconstructs xyz to 2^-16 relative, tighter
    than the bf16 cast the sxyz path feeds the Dense anyway) — and compute
    ``sxyz = (xyz_j - xyz_i) * inv_rescale`` in-layer.  This removes the
    per-band sxyz compaction einsums and every [N, K, 3] materialization
    from the step (measured ~4.5 ms/step of sxyz-shaped fusions in the r5
    trace); the 6 extra gathered columns ride the existing lane padding.
    sxyz is data, not params, so it is stop-gradient (matching the search
    path, where the cotangent chain into xyz was dead code).
    """

    fc_dims: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, sxyz: Optional[jnp.ndarray], feats: jnp.ndarray, nbr,
                 edges: Optional[EdgeOverflow] = None,
                 edge_band: Optional[Tuple[float, float]] = None,
                 edge_rescale: float = 1.0,
                 xyz: Optional[jnp.ndarray] = None,
                 inv_rescale: float = 1.0) -> jnp.ndarray:
        dims = list(self.fc_dims) + [self.out_dim]
        offs = [0]
        for d in dims:
            offs.append(offs[-1] + d)

        # fused per-source projections, applied once on [N, F]
        nbr_proj = jnp.concatenate(
            [Dense(d, use_bias=False, name=f"fc_{i}_nbr")(feats)
             for i, d in enumerate(dims)], axis=-1)          # [N, ΣD]
        cens = [Dense(d, name=f"fc_{i}_cen")(feats)          # bias lives here
                for i, d in enumerate(dims)]
        sx_mods = [Dense(d, use_bias=False, name=f"fc_{i}_sxyz")
                   for i, d in enumerate(dims)]
        hid_mods = [[Dense(d, use_bias=False, name=f"fc_{i}_h{j}")
                     for j in range(i)] for i, d in enumerate(dims)]

        def stack(nbr_block, cen_blocks, sx_in):
            """The growth layer stack on one block of edges/slots."""
            hiddens = []
            out = None
            for i in range(len(dims)):
                acc = cen_blocks[i] + nbr_block[..., offs[i]:offs[i + 1]] \
                    + sx_mods[i](sx_in)
                for j, h in enumerate(hiddens):
                    acc = acc + hid_mods[i][j](h)
                if i < len(self.fc_dims):
                    hiddens.append(nn.relu(acc))
                else:
                    out = acc
            return out

        # windowed / slot path
        if xyz is not None:
            sd = nbr_proj.shape[-1]
            cdt = nbr_proj.dtype
            hi = xyz.astype(cdt)
            mid = (xyz - hi.astype(jnp.float32)).astype(cdt)
            fp_ext = jnp.concatenate([nbr_proj, hi, mid], axis=-1)
            g = nb.gather_neighbors(fp_ext, nbr)             # [N, K, ΣD+6]
            nbr_all = g[..., :sd]
            xyz_j = g[..., sd:sd + 3].astype(jnp.float32) \
                + g[..., sd + 3:].astype(jnp.float32)
            sxyz = jax.lax.stop_gradient(
                (xyz_j - xyz[:, None, :]) * inv_rescale).astype(cdt)
        else:
            nbr_all = nb.gather_neighbors(nbr_proj, nbr)     # [N, K, ΣD]
        out_win = stack(nbr_all, [c[:, None, :] for c in cens], sxyz)
        neg_win = jnp.where(nbr.mask[..., None], out_win, _NEG)
        best = jnp.max(neg_win, axis=1)                      # [N, Dout]
        any_valid = jnp.any(nbr.mask, axis=1)

        if edges is not None:
            mn, mx = edge_band
            emask = edges.band_mask(mn, mx)
            cen_proj = jnp.concatenate(cens, axis=-1)        # [N, ΣD+biases]
            e_nbr = jnp.take(nbr_proj, edges.nbr, axis=0)    # [E, ΣD]
            e_cen = jnp.take(cen_proj, edges.center, axis=0)
            e_sx = (edges.sxyz / edge_rescale).astype(sxyz.dtype)
            e_out = stack(e_nbr,
                          [e_cen[..., offs[i]:offs[i + 1]]
                           for i in range(len(dims))], e_sx)
            neg_e = jnp.where(emask[:, None], e_out, _NEG)
            n = feats.shape[0]
            seg = jax.ops.segment_max(neg_e, edges.center, num_segments=n,
                                      indices_are_sorted=True)
            # empty segments come back as the dtype min; clamp to _NEG
            seg = jnp.maximum(seg, _NEG)
            best = jnp.maximum(best, seg.astype(best.dtype))
            any_e = jax.ops.segment_max(
                emask.astype(jnp.float32), edges.center, num_segments=n,
                indices_are_sorted=True) > 0.5
            any_valid = any_valid | any_e

        return jnp.where(any_valid[:, None], best, 0.0)
