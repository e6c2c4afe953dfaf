"""Microbench: fused Pallas window-conv kernel vs the XLA fast_conv path.

One production-shaped flagship conv (level-0: N=8192, T=W=256, S=768,
K=32, dims (8,8,16,32)), end-to-end from per-point feats: per-point
projections (XLA matmuls in both arms) + the windowed-slot conv.

Arms:
  xla    — PointNetConvFast.apply on a WindowedNeighborhood (production)
  fused  — projections in XLA + ops/pallas/fused_conv kernel
Both forward-only first, then fwd+bwd once the custom VJP lands.

Usage: python scripts/bench_fused_conv.py [--level 0|1]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from microbench import repeat_timed  # noqa: E402

from pointcloudsegmentation_tpu.data import toy  # noqa: E402
from pointcloudsegmentation_tpu.models import layers as L  # noqa: E402
from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast  # noqa: E402
from pointcloudsegmentation_tpu.ops import morton, search  # noqa: E402
from pointcloudsegmentation_tpu.ops.pallas import fused_conv as FC  # noqa: E402


def setup(level: int):
    rng = np.random.RandomState(0)
    if level == 0:
        n, f, radius, k = 8192, 64, 0.15, 32
        dims = (8, 8, 16, 32)
    else:
        n, f, radius, k = 4096, 128, 0.45, 32
        dims = (16, 16, 32, 64)
    b = toy.synthetic_room_block(rng, n)
    xyz = jnp.asarray(b["xyz"])
    mask = jnp.ones((n,), bool)
    xs, ms, _ = morton.sort_block(xyz, mask, 0.0375, 3.0)
    (pair,) = search.windowed_multi_band_neighbors(
        xs, ms, ((0.0, radius, k),), tile=256, window=256, cand_k=32,
        ov_slots=8, ov_pool_size=256, sel_mode="slab", return_sxyz=True,
        chunk=2048)
    wn, sxyz = pair
    feats = jax.random.normal(jax.random.PRNGKey(0), (n, f), jnp.float32)
    return xs, wn, sxyz, feats, dims, radius


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    L.set_compute_dtype(jnp.bfloat16)
    xs, wn, sxyz, feats, dims, radius = setup(args.level)
    n = feats.shape[0]
    fc_dims, out_dim = tuple(dims[:-1]), dims[-1]
    conv = PointNetConvFast(fc_dims, out_dim)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), sxyz / radius,
                                feats, wn)

    # --- arm: XLA production path (sxyz from search) -------------------
    def xla_fwd(c):
        out = conv.apply(params, sxyz / radius, feats + c * 1e-9, wn)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = repeat_timed(xla_fwd, jnp.float32(0), reps=args.reps)
    print(f"xla   fwd      N={n}: {t:.3f} ms")

    def xla_fb(c):
        g = jax.grad(lambda ft: jnp.sum(conv.apply(
            params, sxyz / radius, ft, wn).astype(jnp.float32)))(
            feats + c * 1e-9)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9
    t = repeat_timed(xla_fb, jnp.float32(0), reps=args.reps)
    print(f"xla   fwd+bwd  N={n}: {t:.3f} ms")

    # --- arm: fused kernel (projections in XLA, conv in Pallas) --------
    p = params["params"]
    sumd = sum(dims)
    wnbr = jnp.concatenate([p[f"fc_{i}_nbr"]["kernel"]
                            for i in range(len(dims))], axis=-1)
    wcen = jnp.concatenate([p[f"fc_{i}_cen"]["kernel"]
                            for i in range(len(dims))], axis=-1)
    bcen = jnp.concatenate([p[f"fc_{i}_cen"]["bias"]
                            for i in range(len(dims))], axis=-1)
    wsx = jnp.concatenate([p[f"fc_{i}_sxyz"]["kernel"]
                           for i in range(len(dims))], axis=-1) / radius
    offs = [0]
    for d in dims:
        offs.append(offs[-1] + d)
    whids = []
    for i in range(1, len(dims)):
        whids.append(jnp.concatenate(
            [p[f"fc_{i}_h{j}"]["kernel"] for j in range(i)], axis=0))
    whids = tuple(w.astype(jnp.bfloat16) for w in whids)
    cdt = jnp.bfloat16
    hi_x = xs.astype(cdt)
    mid_x = (xs - hi_x.astype(jnp.float32)).astype(cdt)
    xyzc = jnp.concatenate(
        [xs, jnp.zeros((n, 1), jnp.float32)], axis=-1)

    lidxm_bench = jnp.where(wn.wmask, wn.lidx, -1)

    def fused_fwd(c):
        ft = (feats + c * 1e-9).astype(cdt)
        nbr_proj = (ft @ wnbr.astype(cdt))
        cen = (ft @ wcen.astype(cdt)) + bcen.astype(cdt)
        fpx = jnp.concatenate([nbr_proj, hi_x, mid_x], axis=-1)
        fpx_pad = jnp.pad(fpx, ((wn.window, wn.window), (0, 0)))
        best = FC.fused_window_conv_fwd(
            fpx_pad, cen, xyzc, lidxm_bench, wsx.astype(cdt), whids,
            wn.window, wn.tile, tuple(dims))
        return jnp.sum(best.astype(jnp.float32) *
                       (best > -1e29)) * 1e-9

    t = repeat_timed(fused_fwd, jnp.float32(0), reps=args.reps)
    print(f"fused fwd      N={n}: {t:.3f} ms")

    # correctness cross-check (windowed slots only): compare against the
    # XLA conv with overflow slots disabled via an empty-ov neighborhood
    from pointcloudsegmentation_tpu.ops.types import WindowedNeighborhood
    wn_only = WindowedNeighborhood(
        lidx=wn.lidx, wmask=wn.wmask,
        ov_idx=jnp.zeros((n, 0), jnp.int32),
        ov_mask=jnp.zeros((n, 0), bool), window=wn.window, tile=wn.tile)
    want = conv.apply(params, None, feats, wn_only,
                      xyz=xs, inv_rescale=1.0 / radius)
    lidxm = jnp.where(wn.wmask, wn.lidx, -1)
    ft = feats.astype(cdt)
    nbr_proj = ft @ wnbr.astype(cdt)
    cen = (ft @ wcen.astype(cdt)) + bcen.astype(cdt)
    fpx = jnp.concatenate([nbr_proj, hi_x, mid_x], axis=-1)
    fpx_pad = jnp.pad(fpx, ((wn.window, wn.window), (0, 0)))
    best = FC.fused_window_conv_fwd(
        fpx_pad, cen, xyzc, lidxm, wsx.astype(cdt), whids,
        wn.window, wn.tile, tuple(dims))
    any_valid = jnp.any(wn.wmask, axis=1)
    got = jnp.where(any_valid[:, None], best, 0.0).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got - np.asarray(want).astype(np.float32))))
    print(f"fused vs xla (windowed slots, bf16): max abs diff {err:.4f}")


if __name__ == "__main__":
    main()
