"""Component-level timing of the flagship step on the real TPU, using the
in-jit repetition harness (microbench.repeat_timed) — the remote tunnel's
~26 ms dispatch+readback makes single-shot timings useless, and no xplane
parser ships in this image, so cost attribution = time the pieces.

Usage: python scripts/model_breakdown.py --which conv|search|sort|all
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from microbench import measure_baseline, repeat_timed  # noqa: E402

from pointcloudsegmentation_tpu.data import toy  # noqa: E402
from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast  # noqa: E402
from pointcloudsegmentation_tpu.models import layers as L  # noqa: E402
from pointcloudsegmentation_tpu.ops import morton, search  # noqa: E402


def sorted_cloud(n=8192):
    rng = np.random.RandomState(0)
    b = toy.synthetic_room_block(rng, n)
    xyz = jnp.asarray(b["xyz"])
    mask = jnp.ones((n,), bool)
    xs, ms, _ = morton.sort_block(xyz, mask, 0.0375, 3.0)
    return xs, ms


BANDS = ((0.0, 0.15, 32), (0.15, 0.2, 24), (0.1, 0.15, 16), (0.0, 0.1, 16))


def bench_conv(bf16: bool):
    n = 8192
    xs, ms = sorted_cloud(n)
    if bf16:
        L.set_compute_dtype(jnp.bfloat16)
    (pair,) = search.windowed_multi_band_neighbors(
        xs, ms, ((0.0, 0.15, 32),), cand_k=64, ov_slots=12,
        return_sxyz=True, chunk=2048)
    wn, sxyz = jax.tree.map(lambda x: x, pair)
    plain = wn.to_neighborhood()
    feats = jax.random.normal(jax.random.PRNGKey(0), (n, 64), jnp.float32)
    conv = PointNetConvFast((8, 8, 16), 32)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), sxyz, feats, wn)

    sx_w = sxyz
    sx_p = sxyz  # same slot layout

    for label, nbr, sx in (("windowed", wn, sx_w), ("plain", plain, sx_p)):
        def fwd(c):
            out = conv.apply(params, sx, feats + c * 1e-9, nbr)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        t = repeat_timed(fwd, jnp.float32(0), reps=16)
        print(f" conv fwd      [{label}] N={n} K+Ko={nbr.k}: {t:.2f} ms")

        def fb(c):
            g = jax.grad(lambda f: jnp.sum(
                conv.apply(params, sx, f, nbr).astype(jnp.float32)))(
                feats + c * 1e-9)
            return jnp.sum(g.astype(jnp.float32)) * 1e-9
        t = repeat_timed(fb, jnp.float32(0), reps=16)
        print(f" conv fwd+bwd  [{label}] N={n} K+Ko={nbr.k}: {t:.2f} ms")
    L.set_compute_dtype(None)


def bench_search():
    n = 8192
    xs, ms = sorted_cloud(n)
    for rt in (0.95, 0.9, 0.8):
        def sel(c):
            res = search.windowed_multi_band_neighbors(
                xs + c * 1e-9, ms, BANDS, cand_k=64, ov_slots=12,
                chunk=2048, recall_target=rt, return_sxyz=True)
            tot = jnp.float32(0)
            for wn, sx in res:
                tot += jnp.sum(wn.lidx) * 1e-9 + jnp.sum(sx) * 1e-9
            return tot
        t = repeat_timed(sel, jnp.float32(0), reps=8)
        print(f" windowed_multi_band rt={rt} 4 bands N={n}: {t:.2f} ms")

    def gsel(c):
        res = search.multi_band_neighbors(
            xs + c * 1e-9, ms, BANDS, cand_k=64, chunk=2048,
            return_sxyz=True)
        tot = jnp.float32(0)
        for nbr, sx in res:
            tot += jnp.sum(nbr.idx) * 1e-9 + jnp.sum(sx) * 1e-9
        return tot
    t = repeat_timed(gsel, jnp.float32(0), reps=8)
    print(f" global multi_band (production) 4 bands N={n}: {t:.2f} ms")


def bench_sort():
    n = 8192
    rng = np.random.RandomState(0)
    b = toy.synthetic_room_block(rng, n)
    xyz = jnp.asarray(b["xyz"])
    feats = jax.random.normal(jax.random.PRNGKey(0), (n, 12))
    mask = jnp.ones((n,), bool)

    def srt(c):
        xs, ms, order, fs = morton.sort_block(xyz + c * 1e-9, mask,
                                              0.0375, 3.0, feats)
        inv = morton.inverse_permutation(order)
        return (jnp.sum(xs) + jnp.sum(fs) + jnp.sum(inv)) * 1e-9
    t = repeat_timed(srt, jnp.float32(0), reps=16)
    print(f" morton sort+inv N={n}: {t:.2f} ms")


def bench_model():
    """Whole-model phase attribution: pyramid, encoder fwd, full fwd,
    loss fwd+bwd, full train step — per ONE block (batch handled by vmap
    scaling) at bench shapes."""
    import flax
    import optax

    from pointcloudsegmentation_tpu.train import (Trainer, s3dis_config)

    n = 8192
    cfg = s3dis_config(data_num_points=n, data_caps=(4096, 1024),
                       data_feat_dim=12)
    tr = Trainer(cfg, search_chunk=2048)
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=4, num_points=n,
                                 kind="room", num_classes=13, feat_dim=12))
    batch = jax.device_put(batch)
    state = tr.init_state(rng, batch)
    model = tr.model
    params = state.params

    xyz = batch["xyz"][0]
    feats = batch["feats"][0]
    mask = batch["mask"][0]

    from pointcloudsegmentation_tpu.ops import hierarchy as hier, morton
    d = cfg.data

    def pyr_fn(c):
        xs, ms, order = morton.sort_block(xyz + c * 1e-9, mask,
                                          d.voxel_sizes[0] / 4, d.block_size)
        p = hier.build_pyramid(xs, ms, d.voxel_sizes, d.caps, d.block_size)
        return sum(jnp.sum(l.xyz) for l in p.levels) * 1e-9 \
            + sum(jnp.sum(s) for s in p.seg) * 1e-9
    t = repeat_timed(pyr_fn, jnp.float32(0), reps=8)
    print(f" sort+pyramid (1 block): {t:.2f} ms")

    def fwd(c):
        lg = model.apply(params, xyz, feats + c * 1e-9, mask, False)
        return jnp.sum(lg.astype(jnp.float32)) * 1e-9
    t = repeat_timed(fwd, jnp.float32(0), reps=8)
    print(f" full model fwd (1 block): {t:.2f} ms")

    def fwdbwd(c):
        g = jax.grad(lambda p: jnp.sum(model.apply(
            p, xyz, feats + c * 1e-9, mask, False).astype(jnp.float32)))(
            params)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g)) * 1e-9
    t = repeat_timed(fwdbwd, jnp.float32(0), reps=8)
    print(f" full model fwd+bwd wrt params (1 block): {t:.2f} ms")

    def step_time():
        import time as _t
        holder = {"s": state}
        for _ in range(2):
            holder["s"], m = tr.train_step(holder["s"], batch, rng)
        float(m["loss"])
        t0 = _t.perf_counter()
        reps = 10
        for _ in range(reps):
            holder["s"], m = tr.train_step(holder["s"], batch, rng)
        float(m["loss"])
        return (_t.perf_counter() - t0) / reps * 1e3
    print(f" full train step (4 blocks, chained): {step_time():.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all",
                   choices=["all", "conv", "convf32", "search", "sort",
                            "model"])
    args = p.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    measure_baseline()
    if args.which in ("all", "conv"):
        bench_conv(bf16=True)
    if args.which == "convf32":
        bench_conv(bf16=False)
    if args.which in ("all", "search"):
        bench_search()
    if args.which in ("all", "sort"):
        bench_sort()
    if args.which == "model":
        bench_model()


if __name__ == "__main__":
    main()
