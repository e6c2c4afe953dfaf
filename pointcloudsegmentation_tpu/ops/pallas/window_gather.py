"""Pallas TPU kernels for the windowed one-hot gather pair.

The windowed fast path moves neighbor features with one-hot MXU matmuls
(ops/neighbors.py:_onehot_take): XLA materializes the [nt, T*K, S] one-hot
tensor and the [nt, S, F] slab stack in HBM between the build fusion and the
einsum (~3.4 ms/step of one-hot builds + ~6 ms of layout copies in the r3
step trace).  These kernels build the one-hot in VMEM one slot at a time
and consume it immediately on the MXU, so neither the one-hot nor the slab
stack ever reaches HBM:

- ``gather_fwd``:  out[i, k, :] = feats_padded[tile(i)*T + lidx[i, k], :]
  (the windowed-slot gather; slab slices come straight out of the padded
  feature array held in VMEM).
- ``dslab_bwd``:   dslab[t, s, :] = sum_{i in tile t, k} g[i,k,:] * [lidx==s]
  (the one-hot transpose; the caller overlap-adds slabs into point rows,
  see neighbors._windowed_take_bwd).

Bit-exactness contract (tests/test_pallas.py): gather_fwd is identical to
``jnp.take`` for bf16, and for f32 via a 3-way bf16 split of the operand
(one-hot entries are exactly 1.0, so the split terms reconstruct the
selected row exactly); dslab_bwd matches the XLA einsum (f32 accumulation).

Replaces the CUDA neighbor gather/scatter pair the reference launches per
conv (tf_ops/TFNeighborKernel.cu:5-59, :83-121) — there as row-parallel
kernels, here as MXU matmuls because TPU row-DMA gathers are
descriptor-bound (~66M rows/s).

Mosaic notes: everything stays 2D inside the kernel — per-slot one-hots are
built by comparing a [T, 1] (or [1, T]) index slice against a 2D iota, and
the K axis lives in the minor dimension as K*F columns (XLA reshapes
[N, K*F] <-> [N, K, F] for free), because Mosaic cannot shape-cast across
the lane dimension.  Grid is (nt,); under vmap (batched models) pallas_call
lifts the batch axis to an outer grid dimension automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interpret() -> bool:
    """Interpreter mode off-TPU so the kernels stay testable on the CPU
    mesh (tests/test_pallas.py)."""
    return jax.default_backend() != "tpu"


def _f32_split3(x):
    """3-term bf16 decomposition of f32: hi + mid + lo reconstructs the
    value to full f32 precision when re-summed through exact one-hot
    products (each bf16 term carries 8 mantissa bits)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r1 - mid).astype(jnp.bfloat16)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo


def _gather_kernel(lidx_ref, fp_ref, out_ref, *, tile, window, k, f):
    """One tile: out[T, k*F] with columns [kF:(k+1)F] = fp[tT + lidx[:,k]]."""
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    s = tile + 2 * window
    slab = fp_ref[pl.ds(t * tile, s), :]                      # [S, F]
    f32 = fp_ref.dtype == jnp.float32
    parts = _f32_split3(slab) if f32 else (slab,)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (tile, s), 1)
    for kk in range(k):
        oh = (lidx_ref[0, :, kk:kk + 1] == iota_s)            # [T, S]
        acc = None
        for p in parts:
            y = jax.lax.dot(oh.astype(p.dtype), p,
                            preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        out_ref[0, :, kk * f:(kk + 1) * f] = acc.astype(out_ref.dtype)


def _dslab_kernel(lidxT_ref, g_ref, out_ref, acc_ref, *, tile, window,
                  k, f):
    """One tile: dslab[S, F] = sum_k onehot(lidx[:, k])^T @ g[:, k, :]."""
    s = tile + 2 * window
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s, tile), 0)
    acc_ref[...] = jnp.zeros((s, f), jnp.float32)
    for kk in range(k):
        ohT = (iota_s == lidxT_ref[0, kk:kk + 1, :])          # [S, T]
        gk = g_ref[0, :, kk * f:(kk + 1) * f]                 # [T, F]
        acc_ref[...] += jax.lax.dot(ohT.astype(gk.dtype), gk,
                                    preferred_element_type=jnp.float32)
    out_ref[0, :, :] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tile"))
def gather_fwd(feats: jnp.ndarray, lidx: jnp.ndarray, window: int,
               tile: int) -> jnp.ndarray:
    """[N, F], [N, K] slab-local -> [N, K, F].  TPU only; callers fall back
    to the XLA one-hot einsum elsewhere (ops/neighbors.py)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, f = feats.shape
    k = lidx.shape[-1]
    nt = n // tile
    fp = jnp.pad(feats, ((window, window), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, window=window,
                          k=k, f=f),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # fp whole, sliced
        ],
        out_specs=pl.BlockSpec((1, tile, k * f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, tile, k * f), feats.dtype),
        interpret=_interpret(),
    )(lidx.reshape(nt, tile, k), fp)
    return out.reshape(n, k, f)


@functools.partial(jax.jit, static_argnames=("window", "tile"))
def dslab_bwd(g: jnp.ndarray, lidx: jnp.ndarray, window: int,
              tile: int) -> jnp.ndarray:
    """[N, K, F] edge grads + [N, K] slab-local indices -> [nt, S, F] slab
    grads (caller overlap-adds into point rows)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k, f = g.shape
    nt = n // tile
    s = tile + 2 * window
    lidx_t = jnp.swapaxes(lidx.reshape(nt, tile, k), 1, 2)    # [nt, K, T]

    return pl.pallas_call(
        functools.partial(_dslab_kernel, tile=tile, window=window,
                          k=k, f=f),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, k, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, k * f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, s, f), g.dtype),
        scratch_shapes=[pltpu.VMEM((s, f), jnp.float32)],
        interpret=_interpret(),
    )(lidx_t, g.reshape(nt, tile, k * f))
