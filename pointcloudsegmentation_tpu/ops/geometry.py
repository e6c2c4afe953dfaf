"""Per-point geometric features computed on device.

Replaces the external ``libPointUtil`` host/CUDA routines the reference's
data pipeline depends on (SURVEY.md §2.3): ``computeCovarsGPU`` (9-dim local
covariance features, aug_util.py:189,253) and the device analog of
``gridDownsampleGPU`` (aug_util.py:150,181,245).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import neighbors as nb
from . import search
from .types import Neighborhood


def covariance_feats(xyz: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Flattened 3x3 covariance of each point's neighborhood.

    Matches libPointUtil's computeCovars contract (9 features per point,
    normalized by neighbor count; covariance of neighbor offsets from the
    neighborhood mean).  Points with no valid neighbors get zeros.

    xyz: [N, 3] -> [N, 9] float32.
    """
    pts = nb.gather_neighbors(xyz, nbr)           # [N, K, 3]
    m = nbr.mask[..., None].astype(jnp.float32)
    cnt = jnp.maximum(nbr.counts()[:, None, None], 1.0)
    mean = jnp.sum(pts * m, axis=1, keepdims=True) / cnt
    d = (pts - mean) * m                          # [N, K, 3]
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt  # [N, 3, 3]
    # Scale-normalize like FLANN-style covars: divide by trace (+eps) so the
    # feature is translation- and scale-invariant.
    tr = jnp.trace(cov, axis1=1, axis2=2)[:, None, None]
    cov = cov / (tr + 1e-6)
    return cov.reshape(cov.shape[0], 9)


@partial(jax.jit, static_argnames=("k", "radius", "chunk"))
def covariance_feats_radius(xyz: jnp.ndarray, mask: jnp.ndarray,
                            radius: float, k: int = 16,
                            chunk: int = 1024) -> jnp.ndarray:
    """Convenience: radius search + covariance features in one jit."""
    nbr = search.radius_neighbors(xyz, mask, radius, k, chunk=chunk)
    return covariance_feats(xyz, nbr)


def normalize_rgb(rgb: jnp.ndarray) -> jnp.ndarray:
    """Color to [-1, 1] as the reference's normalize_block does
    (aug_util.py:425-450)."""
    return rgb / 127.5 - 1.0


def estimate_normals(xyz: jnp.ndarray, nbr: Neighborhood) -> jnp.ndarray:
    """Per-point surface normals as the smallest-eigenvalue eigenvector of
    the local covariance (the reference's normal-estimation experiment,
    normal_experiment.py).  Signs are canonicalized to +z hemisphere.

    xyz: [N, 3] -> [N, 3] unit normals (zeros where no valid neighbors).
    """
    pts = nb.gather_neighbors(xyz, nbr)
    m = nbr.mask[..., None].astype(jnp.float32)
    cnt = jnp.maximum(nbr.counts()[:, None, None], 1.0)
    mean = jnp.sum(pts * m, axis=1, keepdims=True) / cnt
    d = (pts - mean) * m
    cov = jnp.einsum("nki,nkj->nij", d, d) / cnt
    # eigh on [N,3,3] batches fine on TPU/CPU
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[:, :, 0]                    # smallest eigenvalue
    sign = jnp.where(normal[:, 2:3] < 0, -1.0, 1.0)
    normal = normal * sign
    has = jnp.any(nbr.mask, axis=1)[:, None]
    return jnp.where(has, normal, 0.0)
