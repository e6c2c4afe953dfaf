"""Primitive-cost microbenchmarks on the real TPU.

Measures the building blocks that dominate the flagship step so optimization
choices are data-driven (round-1 finding: gathers/scatters are row-DMA-bound
at ~66M rows/s):

  gather        jnp.take([N,F], idx[M]) row gather
  scatter       its VJP (scatter-add)
  sortseg       scatter-add alternative: perm-gather + cumsum + boundary diff
  onehot        windowed one-hot matmul gather (MXU path)
  select        multi_band selection pass (approx_max_k over [chunk, N])
  bandcompact   the rank-based band compaction that follows selection

Usage: python scripts/microbench.py [--which all]
"""
import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from pointcloudsegmentation_tpu.utils.profiling import time_fn


def rows_per_sec(ms, rows):
    return rows / (ms * 1e-3)


def bench_gather_scatter():
    print("== gather / scatter-add (row-DMA) ==")
    key = jax.random.PRNGKey(0)
    for n, f, m in [(8192, 64, 262144), (8192, 64, 720896),
                    (8192, 128, 262144), (4096, 64, 589824)]:
        x = jax.random.normal(key, (n, f), jnp.float32)
        idx = jax.random.randint(key, (m,), 0, n, jnp.int32)
        g = jax.random.normal(key, (m, f), jnp.float32)

        take = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
        r = time_fn(take, x, idx, iters=20)
        print(f" gather  N={n} F={f} M={m}: {r['ms_median']:.2f} ms "
              f"({rows_per_sec(r['ms_median'], m)/1e6:.0f}M rows/s)")

        scat = jax.jit(lambda g, i: jax.vjp(
            lambda x: jnp.take(x, i, axis=0), x)[1](g)[0])
        r = time_fn(scat, g, idx, iters=20)
        print(f" scatter N={n} F={f} M={m}: {r['ms_median']:.2f} ms "
              f"({rows_per_sec(r['ms_median'], m)/1e6:.0f}M rows/s)")

        segsum = jax.jit(partial(jax.ops.segment_sum, num_segments=n,
                                 indices_are_sorted=True))
        sidx = jnp.sort(idx)
        r = time_fn(segsum, g, sidx, iters=20)
        print(f" segsum(sorted) N={n} F={f} M={m}: {r['ms_median']:.2f} ms")

        # cumsum alternative: cumsum over [M, F] then 2 small gathers
        def cumdiff(g, begs):
            cs = jnp.cumsum(g, axis=0)
            cs = jnp.concatenate([jnp.zeros((1, g.shape[1]), g.dtype), cs], 0)
            return jnp.take(cs, begs[1:], axis=0) - jnp.take(cs, begs[:-1],
                                                             axis=0)
        begs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(jnp.bincount(idx, length=n))
                                .astype(jnp.int32)])
        cd = jax.jit(cumdiff)
        r = time_fn(cd, g, begs, iters=20)
        print(f" cumsum-diff     N={n} F={f} M={m}: {r['ms_median']:.2f} ms")


def bench_onehot():
    print("== windowed one-hot matmul gather (MXU) ==")
    key = jax.random.PRNGKey(0)
    n, f, k = 8192, 64, 32
    t = 256  # tile
    for w in [256, 512]:
        s = t + 2 * w
        x = jax.random.normal(key, (n, f), jnp.float32)
        # window-local indices [nt, T, K] in [0, S)
        nt = n // t
        lidx = jax.random.randint(key, (nt, t, k), 0, s, jnp.int32)

        def onehot_gather(x, lidx):
            xp = jnp.pad(x, ((w, w), (0, 0)))
            # slabs [nt, S, F]: static strided slices
            slabs = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, i * t, s, 0)
                               for i in range(nt)])
            oh = jax.nn.one_hot(lidx, s, dtype=jnp.bfloat16)   # [nt,T,K,S]
            return jnp.einsum("ntks,nsf->ntkf", oh,
                              slabs.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        fn = jax.jit(onehot_gather)
        r = time_fn(fn, x, lidx, iters=20)
        print(f" onehot W={w} (S={s}): {r['ms_median']:.2f} ms vs "
              f"row-gather of {n*k} rows")


def bench_select():
    print("== selection pass (multi_band core) ==")
    from pointcloudsegmentation_tpu.ops import search
    key = jax.random.PRNGKey(0)
    for n, ck, chunk in [(8192, 64, 2048), (8192, 128, 2048),
                         (4096, 64, 2048), (1024, 64, 1024)]:
        xyz = jax.random.uniform(key, (n, 3), jnp.float32, 0, 3.0)
        mask = jnp.ones((n,), bool)
        bands = ((0.0, 0.15, 32), (0.15, 0.2, 24), (0.1, 0.15, 16),
                 (0.0, 0.1, 16))
        fn = jax.jit(lambda x, m: search.multi_band_neighbors(
            x, m, bands, cand_k=ck, chunk=chunk, return_sxyz=True))
        r = time_fn(fn, xyz, mask, iters=10)
        print(f" multi_band N={n} ck={ck}: {r['ms_median']:.2f} ms")

        # selection-only
        sq = jnp.sum(xyz * xyz, -1)
        def sel(xyz, sq, mask):
            qc = xyz.reshape(n // min(chunk, n), min(chunk, n), 3)
            qn = sq.reshape(n // min(chunk, n), -1)
            def one(args):
                q, qn_ = args
                d2 = qn_[:, None] + sq[None, :] - 2 * (q @ xyz.T)
                neg = jnp.where(mask[None, :], -d2, -1e30)
                return jax.lax.approx_max_k(neg, ck)[1].astype(jnp.int32)
            return jax.lax.map(one, (qc, qn))
        fn2 = jax.jit(sel)
        r = time_fn(fn2, xyz, sq, mask, iters=10)
        print(f"   selection-only: {r['ms_median']:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all",
                   choices=["all", "gather", "onehot", "select"])
    args = p.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if args.which in ("all", "gather"):
        bench_gather_scatter()
    if args.which in ("all", "onehot"):
        bench_onehot()
    if args.which in ("all", "select"):
        bench_select()


if __name__ == "__main__":
    main()
