"""Measure on-hardware neighbor recall of the approx-top-k search.

approx_max_k is exact on CPU, so tests/test_search.py can't observe the
TPU's real recall; this script runs the shared-candidate-pass search in
both approx and exact mode on the live backend and reports per-band
recall of (idx, mask) pairs.  Run on the real chip:

    python scripts/verify_search_recall.py

Passes when every band's recall >= 0.99 (the contract the model
call sites rely on via the 4x-k slack candidate pool).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from pointcloudsegmentation_tpu.ops import search
from pointcloudsegmentation_tpu.utils import cache

cache.enable()

BANDS = ((0.0, 0.15, 16), (0.1, 0.2, 24), (0.15, 0.25, 16))


def band_recall(n=8192, cand_k=96, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 1.5, n)  # room-like: flat-ish
    mask = np.ones(n, bool)
    approx = search.multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, cand_k=cand_k,
        use_approx=True, chunk=1024)
    # exact reference on host (f64 distances, no pool truncation)
    d2 = ((xyz[:, None, :].astype(np.float64)
           - xyz[None, :, :].astype(np.float64)) ** 2).sum(-1)
    out = []
    for (mn, mx, k), a in zip(BANDS, approx):
        ai, am = np.asarray(a.idx), np.asarray(a.mask)
        band = (d2 <= mx * mx) & (d2 >= mn * mn)
        if mn > 0:
            np.fill_diagonal(band, False)
        inter = total = 0
        for i in range(n):
            cand = np.where(band[i])[0]
            want = set(cand[np.argsort(d2[i][cand], kind="stable")][:k])
            inter += len(set(ai[i][am[i]]) & want)
            total += len(want)
        out.append(((mn, mx, k), inter / max(total, 1)))
    return out


def windowed_band_recall(n=8192, cand_k=64, seed=0, sel_mode="global",
                         ov_pool_size=0, window=256):
    """TPU recall of the production windowed path (Morton sort + relaxed
    approx selection + windowed/overflow compaction) vs an exact host
    reference.  Threshold 0.94: the windowed pool + rt=0.8 selection trade
    ~1-4pp of (mostly annulus) recall for ~2x step throughput — measured
    and documented in BASELINE.md."""
    from pointcloudsegmentation_tpu.ops import morton

    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0, 1.5, n)
    mask = np.ones(n, bool)
    xs, ms, _ = morton.sort_block(jnp.asarray(xyz), jnp.asarray(mask),
                                  0.0375, 3.0)
    res = search.windowed_multi_band_neighbors(
        xs, ms, BANDS, tile=256, window=window, cand_k=cand_k, ov_slots=8,
        chunk=2048, sel_mode=sel_mode, ov_pool_size=ov_pool_size)
    xn = np.asarray(xs)
    d2 = ((xn[:, None, :].astype(np.float64)
           - xn[None, :, :].astype(np.float64)) ** 2).sum(-1)
    out = []
    for (mn, mx, k), wn in zip(BANDS, res):
        ai = np.asarray(wn.global_idx)
        am = np.asarray(wn.mask)
        band = (d2 <= mx * mx) & (d2 >= mn * mn)
        if mn > 0:
            np.fill_diagonal(band, False)
        inter = total = 0
        for i in range(n):
            cand = np.where(band[i])[0]
            want = set(cand[np.argsort(d2[i][cand], kind="stable")][:k])
            inter += len(set(ai[i][am[i]]) & want)
            total += len(want)
        out.append(((mn, mx, k), inter / max(total, 1)))
    return out


def main(argv=None):
    """Default: the global-search contract + the production windowed
    config.  --grid additionally sweeps sel_mode x cand_k at the
    production tile-pool size (A/B data for choosing defaults).
    Targeted configs: pass ``sel_mode:cand_k:pool`` triples (e.g.
    ``slab:32:256``) — optionally ``sel_mode:cand_k:pool:window`` — to
    validate a candidate default without the full grid; these skip the
    global-contract rows."""
    argv = sys.argv[1:] if argv is None else argv
    grid = "--grid" in argv
    targeted = [a for a in argv if ":" in a]
    ok = True
    if not targeted:
        for seed in (0, 1):
            for band, r in band_recall(seed=seed):
                status = "OK" if r >= 0.99 else "FAIL"
                ok &= r >= 0.99
                print(f"global seed={seed} band={band}: recall={r:.4f} "
                      f"{status}")
    configs = [("slab", 32, 256, 256)]  # the production default (model_zoo)
    if grid:
        configs = [(m, ck, 384, 256) for m in ("global", "slab")
                   for ck in (64, 48, 32)]
    if targeted:
        if grid:
            raise SystemExit("--grid cannot be combined with targeted "
                             "sel_mode:cand_k:pool configs — pick one")
        configs = []
        for t in targeted:
            parts = t.split(":")
            if len(parts) not in (3, 4):
                raise SystemExit(
                    f"bad config {t!r}: expected sel_mode:cand_k:pool"
                    "[:window] (e.g. slab:32:256 or slab:32:256:128)")
            m, ck, pool = parts[:3]
            win = parts[3] if len(parts) == 4 else "256"
            if m not in ("global", "slab"):
                raise SystemExit(f"bad sel_mode in {t!r}")
            try:
                ck, pool, win = int(ck), int(pool), int(win)
            except ValueError:
                raise SystemExit(
                    f"bad config {t!r}: cand_k/pool/window must be ints")
            configs.append((m, ck, pool, win))
        print("targeted configs skip the global-contract rows")
    for sel_mode, ck, pool, win in configs:
        for seed in (0, 1):
            for band, r in windowed_band_recall(seed=seed, cand_k=ck,
                                                sel_mode=sel_mode,
                                                ov_pool_size=pool,
                                                window=win):
                status = "OK" if r >= 0.94 else "FAIL"
                ok &= r >= 0.94
                print(f"windowed[{sel_mode},ck={ck},P={pool},W={win}] "
                      f"seed={seed} band={band}: recall={r:.4f} {status}")
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
