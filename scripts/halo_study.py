"""Scene-shard halo fidelity study (VERDICT r2 #8).

Measures boundary-point logit error vs halo size on a large synthetic
corridor scene, against the same sharded computation at the maximum halo
(isolates halo truncation from the shard-local frame/voxel structure, which
is identical across halos at fixed shard count), and validates the
data-driven halo rule (parallel.scene_shard.required_halo driven by
model_receptive_field).

Run on the 8-device CPU mesh:
  python scripts/halo_study.py [--n 8192] [--length 48]

Reference analog: the reference controls the same tradeoff with
block-overlap stride (aug_util.py:57-83); here the cut is placed by the
Morton curve and the margin by the halo.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
# pin ONE search path for every arm: the extended shard length L+2*halo
# otherwise toggles the windowed-eligibility check (n % 256 == 0, n >= 1024)
# per halo, mixing windowed-vs-exact search error into the halo-truncation
# measurement this study exists to isolate
os.environ["PCS_DISABLE_WINDOWED"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.ops import morton
from pointcloudsegmentation_tpu.parallel import make_mesh
from pointcloudsegmentation_tpu.parallel.scene_shard import (
    geometric_required_halo, model_receptive_field, required_halo,
    scene_apply)
from pointcloudsegmentation_tpu.train import build_model, s3dis_config
from pointcloudsegmentation_tpu.utils import cache as _cache
from pointcloudsegmentation_tpu.utils.logging import get_logger


def corridor_scene(rng, n, length):
    xyz = np.stack([rng.uniform(0, length, n),
                    rng.uniform(-1.5, 1.5, n),
                    rng.uniform(0, 3.0, n)], 1).astype(np.float32)
    feats = rng.randn(n, 12).astype(np.float32)
    mask = np.ones(n, bool)
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(mask)


def main():
    _cache.enable()
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--length", type=float, default=48.0)
    p.add_argument("--halos", type=int, nargs="*",
                   default=[16, 32, 64, 128, 256])
    p.add_argument("--sort-cell", type=float, default=0.2)
    p.add_argument("--out", default="results/halo_study.json")
    args = p.parse_args()
    log = get_logger("pcs_tpu.halo_study")

    mesh = make_mesh()
    d = mesh.size
    L = args.n // d
    rng = np.random.RandomState(0)
    xyz, feats, mask = corridor_scene(rng, args.n, args.length)

    # reference = the maximum possible halo (full neighbor shards)
    h_max = L
    assert max(args.halos) < h_max

    # one model sized for the largest extended shard; flax modules are
    # shape-polymorphic, so the same params serve every halo
    ext = L + 2 * h_max
    # caps at 1 voxel/point: the corridor is far sparser than a real block,
    # so voxel counts approach the point count; a saturated cap drops
    # points in Morton-rank order and dominates the fidelity signal
    cfg = s3dis_config(model="tiny_s3dis", data_num_points=ext,
                       data_caps=(ext, ext // 2),
                       data_block_size=float(args.length))
    model = build_model(cfg, search_chunk=256)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((ext, 3)),
                        jnp.zeros((ext, 12)), jnp.ones((ext,), bool), False)

    def apply_fn(prm, x, f, m):
        return model.apply(prm, x, f, m, False)

    def run(h, mode):
        return np.asarray(scene_apply(
            apply_fn, params, xyz, feats, mask, mesh, halo=h,
            sort_cell=args.sort_cell, scene_extent=args.length,
            halo_mode=mode, halo_cell=cfg.data.voxel_sizes[-1]))

    ref = run(h_max, "index")         # full neighbor shards, no selection

    # the rules: data-driven halo at the model's receptive field, for both
    # selection modes (geom needs the boundary-band content; index needs to
    # cover the Morton curve's fat-tailed cross-boundary index reach)
    rf = model_receptive_field(model.encoder.arch)
    xyz_s, mask_s, order = morton.sort_block(xyz, mask, args.sort_cell,
                                             args.length)
    need_exact = required_halo(np.asarray(xyz_s), np.asarray(mask_s), d, rf,
                               100.0)
    need_p999 = required_halo(np.asarray(xyz_s), np.asarray(mask_s), d, rf,
                              99.9)
    geom_need, unreachable = geometric_required_halo(
        np.asarray(xyz_s), np.asarray(mask_s), d, rf,
        cell_size=cfg.data.voxel_sizes[-1])   # same selection as the geom arm
    log.info("receptive field %.2f m -> required halo: index exact=%d "
             "p99.9=%d | geom=%d (unreachable pairs=%d) (L=%d)",
             rf, need_exact, need_p999, geom_need, unreachable, L)

    m_np = np.asarray(mask)
    rows = []
    for h in sorted(set(args.halos + [min(need_p999, L - 1),
                                      min(geom_need, L - 1)])):
        row = {"halo": int(h)}
        for mode in ("geom", "index"):
            out = run(h, mode)
            dm = np.abs(out - ref)[m_np]
            agree = float((out.argmax(-1) == ref.argmax(-1))[m_np].mean())
            row[f"{mode}_argmax_agreement"] = round(agree, 5)
            row[f"{mode}_logit_mae"] = round(float(dm.mean()), 6)
            row[f"{mode}_logit_max_err"] = round(float(dm.max()), 4)
            log.info("halo %4d %5s: agree %.4f mae %.5f max %.3f", h, mode,
                     agree, dm.mean(), dm.max())
        rows.append(row)

    res = {"n": args.n, "length": args.length, "shards": d,
           "receptive_field_m": rf, "required_halo_exact": int(need_exact),
           "required_halo_p999": int(need_p999),
           "geom_required_halo": int(geom_need),
           "unreachable_pairs": int(unreachable), "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
