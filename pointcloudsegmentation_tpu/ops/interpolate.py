"""Gaussian k-NN probability interpolation to full-resolution clouds.

Device-side replacement for the external ``libPointUtil`` pair
``findNeighborInAnotherCPU`` + ``interpolateProbsGPU`` used by every
``interpolate_*.py`` eval script (reference: interpolate.py:135-142,
interpolate_semantic3d_new.py:83-90).  Weights are ``exp(-d² · ratio)``
normalized per query; the reference's ratios are ``1/(2·0.075²)`` for S3DIS
(6-NN) and ``1/(2·0.125²)`` for Semantic3D (8-NN).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import search


@partial(jax.jit, static_argnames=("k", "chunk"))
def interpolate_probs(sxyz: jnp.ndarray, smask: jnp.ndarray,
                      sprobs: jnp.ndarray, qxyz: jnp.ndarray,
                      qmask: jnp.ndarray, k: int = 6,
                      ratio: float = 1.0 / (2 * 0.075 * 0.075),
                      chunk: int = 1024) -> jnp.ndarray:
    """Interpolate class probabilities from sampled to full-resolution points.

    sxyz [Ns,3]/smask [Ns]: support (sampled) points; sprobs [Ns,C].
    qxyz [Nq,3]/qmask [Nq]: query (full-resolution) points.
    Returns qprobs [Nq, C].
    """
    idx, d2, valid = search.knn_in_support(qxyz, qmask, sxyz, smask, k,
                                           chunk=chunk)
    # Shift by the per-query min distance before exponentiating (softmax
    # trick): identical after normalization, but far queries don't underflow
    # to an all-zero weight vector like the reference's raw exp(-d²·ratio).
    d2 = jnp.where(valid, d2, jnp.inf)
    shift = jnp.min(d2, axis=-1, keepdims=True)
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)  # fully-masked rows
    w = jnp.exp(-(d2 - shift) * ratio)
    w = jnp.where(valid, w, 0.0)                           # [Nq, K]
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    neigh_probs = jnp.take(sprobs, idx, axis=0)  # [Nq, K, C]
    return jnp.einsum("qk,qkc->qc", w, neigh_probs)
