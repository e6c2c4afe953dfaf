"""Pallas TPU kernel: fused linear projection + masked max over neighbors.

The tail of every pointnet_conv is ``masked_max(edge @ W + b)`` — the
reference's fc_out + NeighborMaxFeatGather pair (model_pointnet.py:20-22,
TFNeighborKernelNew.cu:84-172).  XLA materializes the projected edge tensor
[N, K, O] in HBM between the matmul and the reduction; this kernel computes
the projection on the MXU one point-tile at a time and reduces the max in
VMEM, so only [N, O] ever reaches HBM.

Forward-only Pallas; the backward is a custom VJP in plain XLA (the argmax
re-derivation is cheap and XLA fuses it well).  Falls back to pure XLA when
Pallas is unavailable (CPU tests run the same code via the fallback).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NEG = -1e30


def _xla_reference(x, w, b, mask):
    y = jnp.einsum("nkd,do->nko", x, w,
                   preferred_element_type=jnp.float32) + b
    y = jnp.where(mask[..., None], y, _NEG)
    out = jnp.max(y, axis=1)
    return jnp.where(jnp.any(mask, axis=1)[:, None], out, 0.0)


def _pallas_forward(x, w, b, mask, tile_n: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k, d = x.shape
    o = w.shape[1]

    def kernel(x_ref, w_ref, b_ref, m_ref, out_ref):
        xt = x_ref[...].reshape(tile_n * k, d)
        y = jnp.dot(xt, w_ref[...],
                    preferred_element_type=jnp.float32)
        y = y.reshape(tile_n, k, o) + b_ref[...][None, None, :]
        # arithmetic masking: Mosaic can't insert a minor dim on i1 vectors,
        # so the mask arrives as f32 and selects additively
        m = m_ref[...]                                    # [T, K] f32
        y = y + (m[:, :, None] - 1.0) * (-_NEG)
        red = jnp.max(y, axis=1)                          # [T, O]
        gate = jnp.minimum(jnp.max(m, axis=1, keepdims=True) * 2.0, 1.0)
        out_ref[...] = red * gate                         # 0 where no valid

    grid = (n // tile_n,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, k, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((d, o), lambda i: (0, 0)),
            pl.BlockSpec((o,), lambda i: (0,)),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, o), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, o), jnp.float32),
    )(x, w, b, mask.astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def project_max(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                mask: jnp.ndarray, tile_n: int = 128,
                use_pallas: bool = True) -> jnp.ndarray:
    """max_k over valid slots of (x[n,k,:] @ w + b).

    x: [N, K, D] float; w: [D, O]; b: [O]; mask: [N, K] bool -> [N, O].
    """
    return _forward_impl(x, w, b, mask, tile_n, use_pallas)


def _forward_impl(x, w, b, mask, tile_n, use_pallas):
    n = x.shape[0]
    if use_pallas and jax.default_backend() == "tpu" and n % tile_n == 0:
        return _pallas_forward(x.astype(jnp.float32), w.astype(jnp.float32),
                               b.astype(jnp.float32), mask, tile_n)
    return _xla_reference(x, w, b, mask)


def _fwd(x, w, b, mask, tile_n, use_pallas):
    out = _forward_impl(x, w, b, mask, tile_n, use_pallas)
    return out, (x, w, b, mask, out)


def _bwd(tile_n, use_pallas, res, g):
    x, w, b, mask, out = res
    # re-derive the argmax one-hot; ties split gradient like XLA's max
    y = jnp.einsum("nkd,do->nko", x, w,
                   preferred_element_type=jnp.float32) + b
    y = jnp.where(mask[..., None], y, _NEG)
    is_max = (y == out[:, None, :]) & mask[..., None]
    cnt = jnp.maximum(jnp.sum(is_max, axis=1, keepdims=True), 1)
    gy = (is_max / cnt) * g[:, None, :]                  # [N,K,O]
    gx = jnp.einsum("nko,do->nkd", gy, w)
    gw = jnp.einsum("nkd,nko->do", x, gy)
    gb = jnp.sum(gy, axis=(0, 1))
    return gx.astype(x.dtype), gw.astype(w.dtype), gb.astype(b.dtype), None


project_max.defvjp(_fwd, _bwd)
