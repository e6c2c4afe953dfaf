"""Primitive-cost microbenchmarks on the real TPU.

The remote-TPU tunnel costs ~25 ms per dispatch+readback and
``block_until_ready`` does not synchronize, so single-shot op timings are
noise.  Every benchmark here runs the op R times INSIDE one jit via
``lax.fori_loop`` with a data dependence between iterations, reads back one
scalar, and reports (total - baseline) / R.

Usage: python scripts/microbench.py [--which all] [--reps 32]
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

REPS = 32


def repeat_timed(op, seed_val, iters: int = 5, reps: int = None) -> float:
    """ms per op: op(carry_scalar) -> scalar, chained reps times in-jit."""
    reps = reps or REPS

    @jax.jit
    def run(s):
        def body(_, c):
            return op(c)
        return jax.lax.fori_loop(0, reps, body, s)

    out = run(seed_val)
    float(out)  # compile + sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(seed_val)
        float(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    total_ms = ts[len(ts) // 2] * 1e3
    return (total_ms - _BASELINE) / reps


_BASELINE = 0.0


def measure_baseline():
    global _BASELINE
    @jax.jit
    def run(s):
        return jax.lax.fori_loop(0, REPS, lambda _, c: c + 1.0, s)
    float(run(jnp.float32(0)))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(run(jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _BASELINE = ts[3] * 1e3
    print(f" dispatch+readback baseline: {_BASELINE:.2f} ms")


def bench_gather_scatter():
    print("== gather / scatter-add (ms/op, dispatch-corrected) ==")
    key = jax.random.PRNGKey(0)
    for n, f, m in [(8192, 64, 262144), (8192, 64, 720896),
                    (8192, 256, 262144)]:
        x = jax.random.normal(key, (n, f), jnp.float32)
        idx = jax.random.randint(key, (m,), 0, n, jnp.int32)
        g = jax.random.normal(key, (m, f), jnp.float32) * 1e-3

        t = repeat_timed(lambda c: jnp.sum(
            jnp.take(x + c * 1e-9, idx, axis=0)) * 1e-9, jnp.float32(0))
        print(f" gather  N={n} F={f} M={m}: {t:.2f} ms "
              f"({m / t * 1e-3:.0f}M rows/s)")

        def scat(c):
            gg = g + c * 1e-9
            out = jax.vjp(lambda xx: jnp.take(xx, idx, axis=0), x)[1](gg)[0]
            return jnp.sum(out) * 1e-9
        t = repeat_timed(scat, jnp.float32(0))
        print(f" scatter N={n} F={f} M={m}: {t:.2f} ms "
              f"({m / t * 1e-3:.0f}M rows/s)")

        sidx = jnp.sort(idx)
        def seg(c):
            out = jax.ops.segment_sum(g + c * 1e-9, sidx, num_segments=n,
                                      indices_are_sorted=True)
            return jnp.sum(out) * 1e-9
        t = repeat_timed(seg, jnp.float32(0))
        print(f" segsum(sorted) N={n} F={f} M={m}: {t:.2f} ms")

        begs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(jnp.bincount(idx, length=n))
                                .astype(jnp.int32)])
        def cumdiff(c):
            cs = jnp.cumsum(g + c * 1e-9, axis=0)
            cs = jnp.concatenate(
                [jnp.zeros((1, g.shape[1]), g.dtype), cs], 0)
            out = jnp.take(cs, begs[1:], axis=0) - jnp.take(cs, begs[:-1],
                                                            axis=0)
            return jnp.sum(out) * 1e-9
        t = repeat_timed(cumdiff, jnp.float32(0))
        print(f" cumsum-diff     N={n} F={f} M={m}: {t:.2f} ms")


def bench_conv_shapes():
    print("== conv-shaped gather+project+max (ms/op) ==")
    key = jax.random.PRNGKey(0)
    n, k, f = 8192, 32, 64
    x = jax.random.normal(key, (n, f), jnp.float32) * 0.1
    idx = jax.random.randint(key, (n, k), 0, n, jnp.int32)
    w = jax.random.normal(key, (f, f), jnp.float32) * 0.05

    def conv(xx):
        e = jnp.take(xx, idx, axis=0)
        y = jnp.einsum("nkf,fo->nko", e, w)
        return jnp.max(y, axis=1)

    t = repeat_timed(lambda c: jnp.sum(conv(x + c * 1e-9)) * 1e-9,
                     jnp.float32(0))
    print(f" conv fwd  N={n} K={k} F={f}: {t:.2f} ms")

    t = repeat_timed(lambda c: jnp.sum(jax.grad(
        lambda xx: jnp.sum(conv(xx)))(x + c * 1e-9)) * 1e-9,
        jnp.float32(0))
    print(f" conv fwd+bwd N={n} K={k} F={f}: {t:.2f} ms")


def bench_onehot_window():
    """Windowed one-hot MXU gather-conv: points assumed sorted so neighbor
    indices fall in [i-W, i+W]; gather+project+max via one-hot matmuls."""
    print("== windowed one-hot conv (MXU) ==")
    key = jax.random.PRNGKey(0)
    n, k, f, t_tile = 8192, 32, 64, 256
    x = jax.random.normal(key, (n, f), jnp.float32) * 0.1
    w = jax.random.normal(key, (f, f), jnp.float32) * 0.05
    for wdw in (256, 512):
        s = t_tile + 2 * wdw
        nt = n // t_tile
        lidx = jax.random.randint(key, (nt, t_tile, k), 0, s, jnp.int32)

        def conv(xx):
            oh = jax.nn.one_hot(lidx, s, dtype=jnp.bfloat16)  # [nt,T,K,S]
            xp = jnp.pad(xx, ((wdw, wdw), (0, 0)))
            slabs = jnp.stack([jax.lax.dynamic_slice_in_dim(
                xp, i * t_tile, s, 0) for i in range(nt)])  # [nt,S,F]
            e = jnp.einsum("ntks,nsf->ntkf", oh, slabs.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            y = jnp.einsum("ntkf,fo->ntko", e, w)
            return jnp.max(y, axis=2)

        t = repeat_timed(lambda c: jnp.sum(conv(x + c * 1e-9)) * 1e-9,
                         jnp.float32(0), reps=16)
        print(f" onehot fwd  W={wdw}: {t:.2f} ms")
        t = repeat_timed(lambda c: jnp.sum(jax.grad(
            lambda xx: jnp.sum(conv(xx)))(x + c * 1e-9)) * 1e-9,
            jnp.float32(0), reps=16)
        print(f" onehot fwd+bwd W={wdw}: {t:.2f} ms")


def bench_select():
    print("== selection pass (ms/op) ==")
    key = jax.random.PRNGKey(0)
    for n, ck, chunk in [(8192, 64, 2048), (8192, 128, 2048),
                         (4096, 64, 2048), (1024, 64, 1024)]:
        xyz = jax.random.uniform(key, (n, 3), jnp.float32, 0, 3.0)
        mask = jnp.ones((n,), bool)
        sq = jnp.sum(xyz * xyz, -1)
        c = min(chunk, n)

        def sel(carry):
            x2 = xyz + carry * 1e-9
            qc = x2.reshape(n // c, c, 3)
            qn = sq.reshape(n // c, -1)
            def one(args):
                q, qn_ = args
                d2 = qn_[:, None] + sq[None, :] - 2 * (q @ x2.T)
                neg = jnp.where(mask[None, :], -d2, -1e30)
                return jax.lax.approx_max_k(neg, ck)[1].astype(jnp.int32)
            ci = jax.lax.map(one, (qc, qn))
            return jnp.sum(ci).astype(jnp.float32) * 1e-9
        t = repeat_timed(sel, jnp.float32(0), reps=16)
        print(f" selection N={n} ck={ck} chunk={c}: {t:.2f} ms")

        def dist(carry):
            x2 = xyz + carry * 1e-9
            qc = x2.reshape(n // c, c, 3)
            qn = sq.reshape(n // c, -1)
            def one(args):
                q, qn_ = args
                d2 = qn_[:, None] + sq[None, :] - 2 * (q @ x2.T)
                return jnp.sum(jnp.where(mask[None, :], -d2, -1e30))
            return jnp.sum(jax.lax.map(one, (qc, qn))) * 1e-12
        t = repeat_timed(dist, jnp.float32(0), reps=16)
        print(f"   distance-only: {t:.2f} ms")


def bench_select2():
    """Selection-pass alternatives: the plain approx_max_k over [chunk, N]
    costs ~50x its own distance matmul (see bench_select) — try two-stage
    hierarchical top-k, lower recall targets, and small-ck variants."""
    print("== selection alternatives (ms/op) ==")
    key = jax.random.PRNGKey(0)
    n, chunk, ck = 8192, 2048, 64
    xyz = jax.random.uniform(key, (n, 3), jnp.float32, 0, 3.0)
    mask = jnp.ones((n,), bool)
    sq = jnp.sum(xyz * xyz, -1)

    def dists(x2, q, qn):
        d2 = qn[:, None] + sq[None, :] - 2 * (q @ x2.T)
        return jnp.where(mask[None, :], -d2, -1e30)

    def run_sel(fn, label, reps=16):
        def sel(carry):
            x2 = xyz + carry * 1e-9
            qc = x2.reshape(n // chunk, chunk, 3)
            qn = sq.reshape(n // chunk, -1)
            def one(args):
                q, qn_ = args
                return fn(dists(x2, q, qn_))
            ci = jax.lax.map(one, (qc, qn))
            return jnp.sum(ci).astype(jnp.float32) * 1e-9
        t = repeat_timed(sel, jnp.float32(0), reps=reps)
        print(f" {label}: {t:.2f} ms")

    run_sel(lambda neg: jax.lax.approx_max_k(neg, ck)[1].astype(jnp.int32),
            "approx_max_k ck=64 (baseline)")
    run_sel(lambda neg: jax.lax.approx_max_k(
        neg, ck, recall_target=0.8)[1].astype(jnp.int32),
        "approx_max_k ck=64 recall .8")
    run_sel(lambda neg: jax.lax.approx_max_k(
        neg, 16)[1].astype(jnp.int32), "approx_max_k ck=16")
    run_sel(lambda neg: jax.lax.top_k(neg, ck)[1].astype(jnp.int32),
            "exact top_k ck=64")

    def two_stage(neg, groups=8, kk=16):
        # per-group exact top-kk, then merge the G*kk survivors
        c = neg.shape[0]
        g = neg.reshape(c, groups, n // groups)
        sv, si = jax.lax.top_k(g, kk)                    # [c, G, kk]
        base = (jnp.arange(groups, dtype=jnp.int32)
                * (n // groups))[None, :, None]
        si = (si.astype(jnp.int32) + base).reshape(c, groups * kk)
        sv = sv.reshape(c, groups * kk)
        _, mi = jax.lax.top_k(sv, ck)
        return jnp.take_along_axis(si, mi.astype(jnp.int32), axis=1)
    run_sel(lambda neg: two_stage(neg), "two-stage 8x top16 -> top64")
    run_sel(lambda neg: two_stage(neg, 16, 16),
            "two-stage 16x top16 -> top64")
    run_sel(lambda neg: two_stage(neg, 8, 32), "two-stage 8x top32 -> top64")


def bench_windowed():
    """Windowed per-tile selection + masked out-of-window overflow
    (the hybrid design): tile T=256, slab S=T+2W."""
    print("== windowed selection + overflow (ms/op) ==")
    key = jax.random.PRNGKey(0)
    n, t_tile = 8192, 256
    xyz = jax.random.uniform(key, (n, 3), jnp.float32, 0, 3.0)
    mask = jnp.ones((n,), bool)
    sq = jnp.sum(xyz * xyz, -1)
    nt = n // t_tile

    for wdw, ck in ((256, 48), (384, 48)):
        s = t_tile + 2 * wdw

        def winsel(carry):
            x2 = xyz + carry * 1e-9
            xp = jnp.pad(x2, ((wdw, wdw), (0, 0)))
            sqp = jnp.pad(sq, (wdw, wdw))
            mp = jnp.pad(mask, (wdw, wdw))
            def one(i):
                slab = jax.lax.dynamic_slice_in_dim(xp, i * t_tile, s, 0)
                sn = jax.lax.dynamic_slice_in_dim(sqp, i * t_tile, s, 0)
                sm = jax.lax.dynamic_slice_in_dim(mp, i * t_tile, s, 0)
                q = jax.lax.dynamic_slice_in_dim(x2, i * t_tile, t_tile, 0)
                qn = jax.lax.dynamic_slice_in_dim(sq, i * t_tile, t_tile, 0)
                d2 = qn[:, None] + sn[None, :] - 2 * (q @ slab.T)
                neg = jnp.where(sm[None, :], -d2, -1e30)
                return jax.lax.top_k(neg, ck)[1].astype(jnp.int32)
            ci = jax.lax.map(one, jnp.arange(nt))
            return jnp.sum(ci).astype(jnp.float32) * 1e-9
        t = repeat_timed(winsel, jnp.float32(0), reps=16)
        print(f" windowed top{ck} W={wdw} (S={s}): {t:.2f} ms")

    # slab selection, batched (no lax.map): one [nt, T, S] distance einsum
    # over shift-stacked slabs, then top-k / approx over the 768-wide axis
    def slab_neg(x2):
        x0 = x2.reshape(nt, t_tile, 3)
        sq0 = sq.reshape(nt, t_tile)
        m0 = mask.reshape(nt, t_tile)
        parts, sparts, mparts = [], [], []
        for sh in (1, 0, -1):
            parts.append(jnp.roll(x0, sh, axis=0))
            sparts.append(jnp.roll(sq0, sh, axis=0))
            edge = jnp.ones((nt,), bool)
            if sh == 1:
                edge = edge.at[0].set(False)
            elif sh == -1:
                edge = edge.at[-1].set(False)
            mparts.append(jnp.roll(m0, sh, axis=0) & edge[:, None])
        slab = jnp.concatenate(parts, axis=1)        # [nt, S, 3]
        sn = jnp.concatenate(sparts, axis=1)         # [nt, S]
        sm = jnp.concatenate(mparts, axis=1)         # [nt, S]
        d2 = sq0[:, :, None] + sn[:, None, :] - 2 * jnp.einsum(
            "ntd,nsd->nts", x0, slab)
        return jnp.where(sm[:, None, :], -d2, -1e30)

    for ck in (48, 64):
        def slab_exact(carry):
            ci = jax.lax.top_k(slab_neg(xyz + carry * 1e-9), ck)[1]
            return jnp.sum(ci).astype(jnp.float32) * 1e-9
        t = repeat_timed(slab_exact, jnp.float32(0), reps=16)
        print(f" slab-batched exact top{ck} W=256: {t:.2f} ms")

        for rt in (0.8, 0.95):
            def slab_approx(carry):
                ci = jax.lax.approx_max_k(slab_neg(xyz + carry * 1e-9), ck,
                                          recall_target=rt)[1]
                return jnp.sum(ci).astype(jnp.float32) * 1e-9
            t = repeat_timed(slab_approx, jnp.float32(0), reps=16)
            print(f" slab-batched approx top{ck} rt={rt} W=256: {t:.2f} ms")

    # overflow: global approx over out-of-window entries only
    chunk = 2048
    for ko in (8, 16):
        def ovsel(carry):
            x2 = xyz + carry * 1e-9
            qc = x2.reshape(n // chunk, chunk, 3)
            qn = sq.reshape(n // chunk, -1)
            qi = jnp.arange(n, dtype=jnp.int32).reshape(n // chunk, chunk)
            def one(args):
                q, qn_, qi_ = args
                d2 = qn_[:, None] + sq[None, :] - 2 * (q @ x2.T)
                inwin = jnp.abs(qi_[:, None]
                                - jnp.arange(n, dtype=jnp.int32)[None, :]
                                ) <= 256
                neg = jnp.where(mask[None, :] & ~inwin, -d2, -1e30)
                return jax.lax.approx_max_k(neg, ko)[1].astype(jnp.int32)
            ci = jax.lax.map(one, (qc, qn, qi))
            return jnp.sum(ci).astype(jnp.float32) * 1e-9
        t = repeat_timed(ovsel, jnp.float32(0), reps=16)
        print(f" overflow approx ck={ko}: {t:.2f} ms")


def bench_scatter_variants():
    print("== scatter variants (ms/op) ==")
    key = jax.random.PRNGKey(0)
    n, f = 8192, 64
    for m, label in [(262144, "K=32"), (65536, "K=8")]:
        x = jax.random.normal(key, (n, f), jnp.float32)
        idx = jax.random.randint(key, (m,), 0, n, jnp.int32)
        g = jax.random.normal(key, (m, f), jnp.float32) * 1e-3
        def scat(c):
            gg = g + c * 1e-9
            out = jax.vjp(lambda xx: jnp.take(xx, idx, axis=0), x)[1](gg)[0]
            return jnp.sum(out) * 1e-9
        t = repeat_timed(scat, jnp.float32(0))
        print(f" scatter f32 {label} M={m}: {t:.2f} ms")

        gb = g.astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        def scat_bf(c):
            gg = gb + c.astype(jnp.bfloat16) * 1e-6
            out = jax.vjp(lambda xx: jnp.take(xx, idx, axis=0), xb)[1](gg)[0]
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        t = repeat_timed(scat_bf, jnp.float32(0))
        print(f" scatter bf16 {label} M={m}: {t:.2f} ms")


def bench_compaction():
    print("== band compaction (ms/op) ==")
    key = jax.random.PRNGKey(0)
    n, ck = 8192, 64
    ed2_0 = jax.random.uniform(key, (n, ck), jnp.float32)

    def compact(c):
        ed2 = ed2_0 + c * 1e-9
        lex_lt = (ed2[:, :, None] > ed2[:, None, :]) | (
            (ed2[:, :, None] == ed2[:, None, :])
            & (jnp.arange(ck)[None, :, None] > jnp.arange(ck)[None, None, :]))
        lex_f = lex_lt.astype(jnp.float32)
        total = jnp.float32(0)
        for mn, mx, k in ((0.0, 0.15, 32), (0.15, 0.2, 24),
                          (0.1, 0.15, 16), (0.0, 0.1, 16)):
            in_band = (ed2 <= mx * mx) & (ed2 >= mn * mn)
            rank = jnp.einsum("ncj,nj->nc", lex_f,
                              in_band.astype(jnp.float32)).astype(jnp.int32)
            slot = jnp.arange(k, dtype=jnp.int32)
            hit = in_band[:, :, None] & (rank[:, :, None]
                                         == slot[None, None, :])
            total += jnp.sum(hit.astype(jnp.float32))
        return total * 1e-9
    t = repeat_timed(compact, jnp.float32(0), reps=16)
    print(f" 4-band compaction N={n} ck={ck}: {t:.2f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all",
                   choices=["all", "gather", "conv", "onehot", "select",
                            "select2", "windowed", "scatvar", "compact"])
    p.add_argument("--reps", type=int, default=32)
    args = p.parse_args()
    global REPS
    REPS = args.reps
    print("backend:", jax.default_backend(), jax.devices())
    measure_baseline()
    if args.which in ("all", "gather"):
        bench_gather_scatter()
    if args.which in ("all", "conv"):
        bench_conv_shapes()
    if args.which in ("all", "onehot"):
        bench_onehot_window()
    if args.which in ("all", "select"):
        bench_select()
    if args.which in ("all", "select2"):
        bench_select2()
    if args.which in ("all", "windowed"):
        bench_windowed()
    if args.which in ("all", "scatvar"):
        bench_scatter_variants()
    if args.which in ("all", "compact"):
        bench_compaction()


if __name__ == "__main__":
    main()
