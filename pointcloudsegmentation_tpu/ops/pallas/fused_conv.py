"""Fused windowed PointNet-conv Pallas kernel.

One kernel per (level, band, conv) replaces the whole windowed-slot chain of
fast_conv.PointNetConvFast — one-hot gather -> sxyz reconstruction -> the
concat-growth layer stack -> masked max — with everything edge-shaped living
only in VMEM:

    for each tile t (grid):
      slab = fpx[t*T : t*T + S]                # [S, SumD+6] (padded feats)
      for k in range(K):                       # static unroll
        oh    = (lidx[:, k] == iota_S)         # [T, S] one-hot, in-register
        g     = oh @ slab                      # [T, SumD+6] MXU
        xyz_j = g[hi] + g[mid]                 # exact coordinate splits
        base  = cen + g[:SumD] + (xyz_j - xyz_i) @ (wsx/rescale)
        layer stack (growth MLP) on [T, D_i] slices
        best  = max(best, where(lidx[:,k] >= 0, out_k, -inf))
      out[t] = best                            # [T, Dout] — ONLY HBM write

The XLA lowering of the same math materializes the one-hot, the slab stack
and every [N, K, D] edge tensor in HBM (measured ~13 ms/step of one-hot
builds + slab stacks + layout copies + edge elementwise in the r5 trace).
Replaces the reference's per-conv CUDA gather/scatter + TF dense stack
(tf_ops/TFNeighborKernel.cu:5-59, model_pointnet.py:10-24).

Coordinate precision: xyz rides the gathered stream as TWO bf16 columns per
axis (hi = bf16(xyz), mid = bf16(xyz - hi)); one-hot products move them
exactly and hi + mid reconstructs xyz to 2^-16 relative — tighter than the
bf16 cast the sxyz path feeds the layer stack anyway.

Backward: custom VJP (fused_conv_bwd) — recomputes the per-k edge
activations from the same VMEM inputs (cheap MXU re-gather beats storing
[N, K, D] residuals in HBM), routes the max gradient to argmax slots, and
emits dslab (overlap-added into point rows by the caller), dcen and per-tile
weight-gradient partials.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _offs(dims: Sequence[int]) -> Tuple[int, ...]:
    o = [0]
    for d in dims:
        o.append(o[-1] + d)
    return tuple(o)


def _fwd_kernel(lidx_ref, fpx_ref, cen_ref, xyzc_ref, wsx_ref, *whid_refs,
                out_ref, tile, window, k, dims, sumd):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    s = tile + 2 * window
    ndims = len(dims)
    offs = _offs(dims)
    slab = fpx_ref[pl.ds(t * tile, s), :]                    # [S, SumD+6]
    cen = cen_ref[0]                                         # [T, SumD]
    xyz_i = xyzc_ref[0][:, :3].astype(jnp.float32)           # [T, 3]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1)
    cdt = fpx_ref.dtype

    best = None
    for kk in range(k):
        lk = lidx_ref[0, :, kk:kk + 1]                       # [T, 1]
        oh = (lk == iota_s)                                  # [T, S]
        g = jax.lax.dot(oh.astype(cdt), slab,
                        preferred_element_type=jnp.float32)  # [T, SumD+6]
        xyz_j = g[:, sumd:sumd + 3] + g[:, sumd + 3:sumd + 6]
        sx = (xyz_j - xyz_i).astype(cdt)                     # [T, 3]
        # sxp via 3 VPU outer products (inner dim 3 wastes the MXU)
        sxp = (sx[:, 0:1] * wsx_ref[0:1, :]
               + sx[:, 1:2] * wsx_ref[1:2, :]
               + sx[:, 2:3] * wsx_ref[2:3, :]).astype(jnp.float32)
        base = g[:, :sumd] + cen.astype(jnp.float32) + sxp   # [T, SumD] f32

        hs = []
        out_k = None
        for i in range(ndims):
            a = base[:, offs[i]:offs[i + 1]]
            if i > 0:
                hcat = hs[0] if i == 1 else jnp.concatenate(hs, axis=-1)
                a = a + jax.lax.dot(hcat, whid_refs[i - 1][...],
                                    preferred_element_type=jnp.float32)
            if i < ndims - 1:
                hs.append(jnp.maximum(a, 0.0).astype(cdt))
            else:
                out_k = a
        neg = jnp.where(lk >= 0, out_k, _NEG)
        best = neg if best is None else jnp.maximum(best, neg)
    out_ref[0] = best.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "dims"))
def fused_window_conv_fwd(fpx: jnp.ndarray, cen: jnp.ndarray,
                          xyzc: jnp.ndarray, lidx: jnp.ndarray,
                          wsx: jnp.ndarray, whids: Tuple[jnp.ndarray, ...],
                          window: int, tile: int,
                          dims: Tuple[int, ...]) -> jnp.ndarray:
    """Forward only (no VJP wiring — see fused_window_conv).

    fpx:  [N + 2W, SumD + 6]  padded per-point stream
          [nbr_proj ‖ xyz_hi ‖ xyz_mid], compute dtype.
    cen:  [N, SumD]           center projections (biases folded in).
    xyzc: [N, 4]              f32 raw coordinates (lane-padded; col 3 unused).
    lidx: [N, K]              slab-local neighbor indices, -1 = invalid slot.
    wsx:  [3, SumD]           sxyz kernels, PRE-SCALED by 1/rescale.
    whids: per layer i>=1, [sum(dims[:i]), dims[i]] hidden-growth kernels.
    Returns best: [N, Dout] — masked max over the K windowed slots
    (points with zero valid slots return -1e30; caller merges with the
    overflow branch and applies the any_valid floor).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = lidx.shape
    nt = n // tile
    sumd = cen.shape[-1]
    dout = dims[-1]
    kern = functools.partial(
        _fwd_kernel, tile=tile, window=window, k=k, dims=tuple(dims),
        sumd=sumd)

    def wrapped(*refs):
        kern(*refs[:-1], out_ref=refs[-1])

    out = pl.pallas_call(
        wrapped,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # fpx whole
            pl.BlockSpec((1, tile, sumd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # wsx
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in whids],
        out_specs=pl.BlockSpec((1, tile, dout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, tile, dout), fpx.dtype),
        interpret=_interpret(),
    )(lidx.reshape(nt, tile, k), fpx, cen.reshape(nt, tile, sumd),
      xyzc.reshape(nt, tile, 4), wsx, *whids)
    return out.reshape(n, dout)


def reference_window_conv(fpx, cen, xyzc, lidx, wsx, whids, window, tile,
                          dims):
    """Plain-XLA oracle implementing the same math (for tests and CPU):
    gather rows by global index, reconstruct xyz, run the stack, masked
    max."""
    n, k = lidx.shape
    sumd = cen.shape[-1]
    offs = _offs(dims)
    row = jnp.arange(n, dtype=jnp.int32)
    tile_start = (row // tile) * tile
    fp_rows = jnp.take(fpx, jnp.clip(lidx + (tile_start)[:, None], 0,
                                     fpx.shape[0] - 1), axis=0)
    g = fp_rows.astype(jnp.float32)                          # [N, K, SumD+6]
    xyz_j = g[..., sumd:sumd + 3] + g[..., sumd + 3:sumd + 6]
    sx = (xyz_j - xyzc[:, None, :3]).astype(fpx.dtype)
    sxp = jnp.einsum("nkc,cd->nkd", sx, wsx,
                     preferred_element_type=jnp.float32)
    base = g[..., :sumd] + cen[:, None, :].astype(jnp.float32) + sxp
    hs = []
    out = None
    for i in range(len(dims)):
        a = base[..., offs[i]:offs[i + 1]]
        if i > 0:
            hcat = jnp.concatenate(hs, axis=-1)
            a = a + jnp.einsum("nkh,hd->nkd", hcat, whids[i - 1],
                               preferred_element_type=jnp.float32)
        if i < len(dims) - 1:
            hs.append(jnp.maximum(a, 0.0).astype(fpx.dtype))
        else:
            out = a
    neg = jnp.where((lidx >= 0)[..., None], out, _NEG)
    return jnp.max(neg, axis=1).astype(fpx.dtype)
