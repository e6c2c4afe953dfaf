"""Fixed-K radius / annulus / k-NN neighbor search.

Replaces the reference's quadratic CUDA searches
``SearchNeighborhoodBruteForce`` (count pass -> scan -> fill,
SearchNeighborhood.cu:5-205), the annulus/"dilated" variant
``...BruteForceRange`` (SearchNeighborhood.cu:31-123) and the fixed-K variant
(SearchNeighborhoodFixed.cu:6-152).

TPU design: pairwise squared distances are a rank-2 update
``|q|² + |x|² − 2·q·xᵀ`` — a matmul that runs on the MXU — computed over
query tiles (``lax.map``) so the [N, N] matrix never materializes in HBM.
Selection is ``lax.top_k`` of the negated masked distances, which yields the
K *nearest* in-band neighbors (the reference keeps an arbitrary first-K,
SearchNeighborhoodFixed.cu:40-51 — nearest-K strictly dominates).  Returned
indices are self-padded with an explicit mask (see types.Neighborhood).

Self-edges: the zero-distance self pair is included when ``min_radius == 0``
and excluded otherwise, matching ``search_neighborhood`` vs
``search_neighborhood_range`` (tf_ops/graph_pooling_layer.py:20-27).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .types import EdgeOverflow, Neighborhood, WindowedNeighborhood

_INF = jnp.float32(1e30)


def _geom_slab_take(vals: jnp.ndarray, lci: jnp.ndarray, window: int,
                    tile: int) -> jnp.ndarray:
    """Slab-local candidate read for Morton-sorted points: one-hot MXU
    matmul on TPU (narrow-row DMA gathers are descriptor-bound), plain
    row gather elsewhere.  lci must be pre-clipped to [0, tile+2*window)."""
    from .neighbors import _onehot_fwd_impl

    n = vals.shape[0]
    if jax.default_backend() == "tpu":
        return _onehot_fwd_impl(vals, lci, window, tile)
    tile_start = (jnp.arange(n, dtype=jnp.int32) // tile) * tile
    gidx = jnp.clip(lci + (tile_start - window)[:, None], 0, n - 1)
    return jnp.take(vals, gidx, axis=0)


def _lex_lt(ed2: jnp.ndarray) -> jnp.ndarray:
    """[N, ck, ck] strict lexicographic (distance, slot) order matrix.

    bf16: entries are 0/1 (exact) and the rank contraction sums <= ck <= 256
    of them with f32 accumulation — exact — while halving the HBM traffic of
    the largest compaction intermediate."""
    ck = ed2.shape[-1]
    lt = (ed2[:, :, None] > ed2[:, None, :]) | (
        (ed2[:, :, None] == ed2[:, None, :])
        & (jnp.arange(ck)[None, :, None] > jnp.arange(ck)[None, None, :]))
    return lt.astype(jnp.bfloat16)


def _compact_bands(ed2: jnp.ndarray, valid: jnp.ndarray,
                   is_self: jnp.ndarray, src_idx: jnp.ndarray,
                   sxyz_cand, mask: jnp.ndarray, self_pad: jnp.ndarray,
                   bands, ks, lex_lt_f=None):
    """Rank-based band compaction of a per-point candidate pool.

    For each band (mn, mx, k-slots), select the k nearest candidates with
    mn <= dist <= mx via a sort-free rank computation (see
    multi_band_neighbors docstring for why: element gathers are
    row-DMA-bound, so ranks are computed as [ck, ck] @ [ck] contractions).

    ed2:      [N, ck] exact squared candidate distances.
    valid:    [N, ck] candidate validity.
    is_self:  [N, ck] candidate == center.
    src_idx:  [N, ck] the index value to emit per slot (global or slab-local).
    sxyz_cand:[N, ck, 3] candidate offsets (or None).
    mask:     [N] query validity.
    self_pad: [N] index value for invalid slots (self, in src_idx's space).
    ks:       per-band slot counts (parallel to bands).

    Returns list over bands of (idx [N,k], mask [N,k], sxyz [N,k,3] or None).
    """
    if lex_lt_f is None:
        lex_lt_f = _lex_lt(ed2)                     # [N, ck, ck]

    src_f = src_idx.astype(jnp.float32)  # idx < 2^24: exact in f32
    out = []
    for (mn, mx, _), k in zip(bands, ks):
        in_band = (ed2 <= mx * mx) & (ed2 >= mn * mn) & valid
        if mn > 0.0:
            in_band &= ~is_self
        band_f = in_band.astype(jnp.bfloat16)
        rank = jnp.einsum("ncj,nj->nc", lex_lt_f, band_f,
                          preferred_element_type=jnp.float32)
        rank = rank.astype(jnp.int32)
        slot = jnp.arange(k, dtype=jnp.int32)
        hit = in_band[:, :, None] & (rank[:, :, None] == slot[None, None, :])
        hit_f = hit.astype(jnp.float32)
        # exactly one nonzero per (n, slot): the contraction IS the select
        idx = jnp.einsum("nck,nc->nk", hit_f, src_f).astype(jnp.int32)
        count = jnp.sum(in_band.astype(jnp.int32), axis=1, keepdims=True)
        m = (slot[None, :] < count) & mask[:, None]
        idx = jnp.where(m, idx, self_pad[:, None])
        if sxyz_cand is not None:
            sxyz = jnp.einsum("nck,ncd->nkd", hit_f, sxyz_cand)
            sxyz = sxyz * m[..., None].astype(sxyz.dtype)
            out.append((idx, m, sxyz))
        else:
            out.append((idx, m, None))
    return out


def _pad_to_multiple(n: int, c: int) -> int:
    return -(-n // c) * c


def _tile_shared_pool(opool_idx: jnp.ndarray, opool_mask: jnp.ndarray,
                      tile: int, pool_size: int):
    """Dedupe each tile's out-of-slab candidate targets into a shared pool.

    Points within a Morton tile overlap heavily in their out-of-slab
    neighbors (they are spatial near-duplicates), so the union of a tile's
    overflow targets is far smaller than tile * op.  Pooling them lets every
    conv gather [nt, P] rows once and serve per-point overflow reads as
    local one-hot matmuls (see types.WindowedNeighborhood.pool_idx).

    opool_idx:  [N, op] int32 global candidate indices (rank-compacted:
                slot r holds the r-th nearest out-of-slab candidate).
    opool_mask: [N, op] candidate validity.
    Returns (pool_gidx [nt, P] int32 zero-padded,
             ppos [N, op] int32 pool position per candidate; P where the
             candidate is invalid or was dropped — one-hot null).

    Drop policy when a tile's unique targets exceed P: nearest-rank-first
    (every point's rank-0 target enters the pool before any rank-1 target),
    matching EdgeOverflow's fairness rule — no spatial bias.
    """
    n, op = opool_idx.shape
    nt = n // tile
    m = tile * op
    big = jnp.int32(2 ** 30)

    cand = opool_idx.reshape(nt, m)
    cvalid = opool_mask.reshape(nt, m)
    rank = jnp.broadcast_to(jnp.arange(op, dtype=jnp.int32), (tile, op))
    rank = jnp.broadcast_to(rank.reshape(1, m), (nt, m))
    key = jnp.where(cvalid, cand, big)

    # sort by (key, rank) with multi-operand lax.sort — the values ride the
    # sort, so no post-sort take_along_axis (scalar gathers are
    # row-DMA-bound on TPU).  First occurrence of each key carries its
    # minimum per-point rank.
    skey, srank = jax.lax.sort((key, rank), dimension=-1, num_keys=2)
    is_first = jnp.concatenate(
        [jnp.ones((nt, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1)
    is_first &= skey < big

    # pool membership priority: min-rank first; position tiebreak keeps the
    # sort key unique (and deterministic)
    pri = jnp.where(is_first,
                    srank * jnp.int32(m) + jnp.arange(m, dtype=jnp.int32),
                    big)
    spri, pool_g = jax.lax.sort((pri, skey), dimension=-1, num_keys=1)
    pool_g = pool_g[:, :pool_size]
    pool_valid = spri[:, :pool_size] < big

    # candidate -> pool position: pool entries are unique, so each candidate
    # matches at most one — the index-extraction einsum IS the lookup
    # (scalar gathers here would be row-DMA-bound; this runs on the MXU).
    # f32 throughout: positions up to P must be exact (bf16 caps at 256).
    eq = (cand[:, :, None] == pool_g[:, None, :]) & pool_valid[:, None, :]
    eq_f = eq.astype(jnp.float32)
    ppos = jnp.einsum("nmp,p->nm", eq_f,
                      jnp.arange(pool_size, dtype=jnp.float32),
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    in_pool = jnp.any(eq, axis=-1)
    ppos = jnp.where(in_pool & cvalid, ppos, pool_size)
    return jnp.where(pool_valid, pool_g, 0), ppos.reshape(n, op)


def use_onehot_fwd() -> bool:
    """ONE policy for 'express this gather as a one-hot MXU matmul':
    backend default (TPU yes, CPU no — CPU matmuls run reduced precision
    and are slower than row gathers there), PCS_ONEHOT_FWD=0/1 overrides."""
    import os

    flag = os.environ.get("PCS_ONEHOT_FWD", "")
    return (jax.default_backend() == "tpu") if flag == "" else flag == "1"


def _pool_take(pvals: jnp.ndarray, ppos: jnp.ndarray,
               tile: int) -> jnp.ndarray:
    """Read per-point values through a tile-shared pool: [nt, P, F] pool
    table + [N, K] pool positions -> [N, K, F].

    One-hot MXU matmul on TPU (precision=HIGHEST so the f32 hi+lo split
    reconstructs the selected rows BIT-exactly — default-precision TPU
    matmuls round f32 operands to bf16); a two-step row gather elsewhere.
    Positions == P (dropped/invalid) hit the one-hot null row -> zeros.
    """
    nt, p, f = pvals.shape
    n, k = ppos.shape
    if use_onehot_fwd():
        oh = jax.nn.one_hot(ppos.reshape(nt, tile, k), p, dtype=pvals.dtype)
        return jnp.einsum("ntkp,npf->ntkf", oh, pvals,
                          preferred_element_type=pvals.dtype,
                          precision=jax.lax.Precision.HIGHEST
                          ).reshape(n, k, f)
    flat = jnp.concatenate(
        [pvals, jnp.zeros((nt, 1, f), pvals.dtype)], axis=1).reshape(-1, f)
    tbase = (jnp.arange(n, dtype=jnp.int32) // tile) * (p + 1)
    return jnp.take(flat, ppos + tbase[:, None], axis=0)


@partial(jax.jit, static_argnames=("k", "radius", "min_radius", "chunk"))
def radius_neighbors(xyz: jnp.ndarray, mask: jnp.ndarray, radius: float,
                     k: int, min_radius: float = 0.0,
                     chunk: int = 1024) -> Neighborhood:
    """K nearest neighbors of each point within (min_radius, radius].

    xyz:  [N, 3] float32 (padded; invalid rows arbitrary).
    mask: [N] bool point validity.
    Returns Neighborhood(idx [N, K], mask [N, K]).
    """
    n = xyz.shape[0]
    sq_max = jnp.float32(radius * radius)
    sq_min = jnp.float32(min_radius * min_radius)
    sq_norm = jnp.sum(xyz * xyz, axis=-1)  # [N]
    inval = ~mask

    n_pad = _pad_to_multiple(n, chunk)
    xyz_p = jnp.pad(xyz, ((0, n_pad - n), (0, 0)))
    q_chunks = xyz_p.reshape(n_pad // chunk, chunk, 3)
    qn_chunks = jnp.pad(sq_norm, (0, n_pad - n)).reshape(-1, chunk)
    self_idx = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, n_pad - n))
    idx_chunks = self_idx.reshape(-1, chunk)

    # Select slightly beyond the band with the fast MXU form, then re-filter
    # the K candidates with exact (x - q)² distances — the rank-2 form loses
    # ~1e-5 absolute precision to cancellation, enough to flip points sitting
    # on the radius boundary.
    slack = jnp.float32(1e-4) * jnp.maximum(sq_max, 1.0)

    def one_chunk(args):
        q, qn, qi = args  # [C,3],[C],[C]
        # MXU: [C, N] approximate squared distances.
        d2 = qn[:, None] + sq_norm[None, :] - 2.0 * jnp.dot(
            q, xyz.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(d2, 0.0)
        cand = (d2 <= sq_max + slack) & (d2 >= sq_min - slack) & ~inval[None, :]
        if min_radius > 0.0:  # annulus excludes the self pair explicitly
            cand &= qi[:, None] != jnp.arange(n, dtype=jnp.int32)[None, :]
        score = jnp.where(cand, -d2, -_INF)
        top, top_idx = jax.lax.top_k(score, k)  # [C, K]
        valid = top > -_INF * 0.5
        # exact re-filter of the K candidates
        cand_xyz = jnp.take(xyz, top_idx, axis=0)          # [C, K, 3]
        exact = jnp.sum((cand_xyz - q[:, None, :]) ** 2, axis=-1)
        valid &= (exact <= sq_max) & (exact >= sq_min)
        top_idx = jnp.where(valid, top_idx, qi[:, None])
        return top_idx.astype(jnp.int32), valid

    idx, nmask = jax.lax.map(one_chunk, (q_chunks, qn_chunks, idx_chunks))
    idx = idx.reshape(n_pad, k)[:n]
    nmask = nmask.reshape(n_pad, k)[:n]
    nmask &= mask[:, None]
    idx = jnp.where(nmask, idx, jnp.arange(n, dtype=jnp.int32)[:, None])
    return Neighborhood(idx=idx, mask=nmask)


def annulus_neighbors(xyz: jnp.ndarray, mask: jnp.ndarray, min_radius: float,
                      max_radius: float, k: int,
                      chunk: int = 1024) -> Neighborhood:
    """Dilated/annulus search — ``search_neighborhood_range``
    (tf_ops/graph_pooling_layer.py:24-27)."""
    return radius_neighbors(xyz, mask, max_radius, k,
                            min_radius=min_radius, chunk=chunk)


def _tiled_top_k(score: jnp.ndarray, k: int, tile: int = 512):
    """EXACT top-k over a wide axis as two narrow top-ks: each tile's k
    best first (any global top-k element is top-k within its own tile),
    then top-k over the nt*k survivors.  lax.top_k cost grows superlinearly
    with the sorted width on TPU (38.6 ms at [2048, 8192] vs 0.4 ms via
    approx — BASELINE.md), so splitting a 65k-wide sort into 512-wide sorts
    is ~an order of magnitude faster while staying exact.

    Returns (values [.., k], indices [.., k] into the original axis).
    """
    n = score.shape[-1]
    if n <= max(2 * tile, k):
        return jax.lax.top_k(score, k)
    n_pad = _pad_to_multiple(n, tile)
    sp = jnp.pad(score, [(0, 0)] * (score.ndim - 1) + [(0, n_pad - n)],
                 constant_values=-_INF)
    nt = n_pad // tile
    s2 = sp.reshape(*score.shape[:-1], nt, tile)
    v1, i1 = jax.lax.top_k(s2, min(k, tile))          # [.., nt, k]
    base = (jnp.arange(nt, dtype=jnp.int32) * tile)[:, None]
    g1 = (i1.astype(jnp.int32) + base).reshape(*score.shape[:-1], -1)
    v1 = v1.reshape(*score.shape[:-1], -1)            # [.., nt*k]
    v2, i2 = jax.lax.top_k(v1, k)
    idx = jnp.take_along_axis(g1, i2, axis=-1)
    return v2, idx


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_in_support(query: jnp.ndarray, query_mask: jnp.ndarray,
                   support: jnp.ndarray, support_mask: jnp.ndarray,
                   k: int, chunk: int = 1024):
    """K nearest support points per query (``findNeighborInAnotherCPU``
    of the external libPointUtil, used by interpolate.py:136).

    Returns (idx [Nq, K] int32, d2 [Nq, K] float32, mask [Nq, K] bool).
    """
    nq = query.shape[0]
    ns = support.shape[0]
    s_norm = jnp.sum(support * support, axis=-1)
    s_inval = ~support_mask

    nq_pad = _pad_to_multiple(nq, chunk)
    q_p = jnp.pad(query, ((0, nq_pad - nq), (0, 0)))
    q_chunks = q_p.reshape(nq_pad // chunk, chunk, 3)

    def one_chunk(q):
        qn = jnp.sum(q * q, axis=-1)
        d2 = qn[:, None] + s_norm[None, :] - 2.0 * jnp.dot(
            q, support.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(d2, 0.0)
        score = jnp.where(s_inval[None, :], -_INF, -d2)
        top, top_idx = _tiled_top_k(score, k)
        valid = top > -_INF * 0.5
        return top_idx.astype(jnp.int32), -top, valid

    idx, d2, valid = jax.lax.map(one_chunk, q_chunks)
    idx = idx.reshape(nq_pad, k)[:nq]
    d2 = d2.reshape(nq_pad, k)[:nq]
    valid = valid.reshape(nq_pad, k)[:nq] & query_mask[:, None]
    d2 = jnp.where(valid, d2, 0.0)
    idx = jnp.where(valid, idx, 0)
    return idx, d2, valid


@partial(jax.jit, static_argnames=("bands", "cand_k", "use_approx", "chunk",
                                   "return_sxyz"))
def multi_band_neighbors(xyz: jnp.ndarray, mask: jnp.ndarray,
                         bands, cand_k: int = 64,
                         use_approx: bool = True, chunk: int = 1024,
                         return_sxyz: bool = False):
    """Derive several radius/annulus fixed-K neighborhoods from ONE
    candidate-selection pass.

    The reference searches each band independently (4 brute-force O(N²)
    passes per stage in pointnet_13_dilated_embed, model_pointnet.py:935-953).
    On TPU the dominant cost is the row-wise selection over N, not the
    distance matmul — so we select the ``cand_k`` nearest valid points once
    (``lax.approx_max_k``, the TPU-native approximate top-k), recompute the
    candidates' distances exactly in f32, and then each band is a cheap
    [N, cand_k] masked top-k.

    The selection runs over ``chunk``-row query tiles via ``lax.map``: the
    [N, N] distance tensor never materializes, and (crucially) the TPU
    compiler handles the [chunk, N] sort in ~1s where the full [N, N] sort
    takes minutes to compile.

    bands: tuple of (min_radius, max_radius, k).
    Returns a tuple of Neighborhood, one per band; with ``return_sxyz`` a
    tuple of (Neighborhood, sxyz [N, k, 3]) pairs — the raw neighbor offsets
    come for free from the already-gathered candidate coordinates, saving
    the models a separate [N, K]-row gather per neighborhood.
    """
    n = xyz.shape[0]
    chunk = min(chunk, n)
    sq = jnp.sum(xyz * xyz, axis=-1)
    n_pad = _pad_to_multiple(n, chunk)
    q_chunks = jnp.pad(xyz, ((0, n_pad - n), (0, 0))).reshape(
        n_pad // chunk, chunk, 3)
    qn_chunks = jnp.pad(sq, (0, n_pad - n)).reshape(-1, chunk)

    def select(args):
        q, qn = args
        # fast default precision (bf16-ish): errors are absorbed by cand_k
        # slack + exact refiltering below
        d2 = qn[:, None] + sq[None, :] - 2.0 * jnp.dot(
            q, xyz.T, preferred_element_type=jnp.float32)
        neg = jnp.where(mask[None, :], -d2, -_INF)
        if use_approx:
            # NOTE: bf16 scores were tried and are SLOWER (the conversion
            # pass over [chunk, N] costs more than the sort saves)
            _, ci = jax.lax.approx_max_k(neg, cand_k)
        else:
            _, ci = jax.lax.top_k(neg, cand_k)
        return ci.astype(jnp.int32)

    ci = jax.lax.map(select, (q_chunks, qn_chunks))
    ci = ci.reshape(n_pad, cand_k)[:n]

    # exact distances of the candidates; gather validity as FLOAT (bool
    # gathers are ~3x slower on TPU — row DMA of 1-bit rows)
    cand = jnp.take(jnp.concatenate(
        [xyz, mask.astype(jnp.float32)[:, None]], axis=-1), ci, axis=0)
    cxyz, valid_f = cand[..., :3], cand[..., 3]
    ed2 = jnp.sum((cxyz - xyz[:, None, :]) ** 2, axis=-1)
    valid_cand = valid_f > 0.5
    self_idx = jnp.arange(n, dtype=jnp.int32)
    is_self = ci == self_idx[:, None]

    # Rank-based compaction: no sort, no take_along_axis (element gathers
    # are row-DMA-bound and dominated earlier traces); see _compact_bands.
    sxyz_cand = (cxyz - xyz[:, None, :]) if return_sxyz else None

    compacted = _compact_bands(ed2, valid_cand, is_self, ci, sxyz_cand,
                               mask, self_idx, bands,
                               [k for (_, _, k) in bands])
    out = []
    for idx, m, sxyz in compacted:
        nbr_ = Neighborhood(idx=idx, mask=m)
        out.append((nbr_, sxyz) if return_sxyz else nbr_)
    return tuple(out)


def resolve_sel_mode(sel_mode: str) -> str:
    """Apply the PCS_SEL_MODE override and reject unknown values — an
    unvalidated typo ('salb') would otherwise fall through
    windowed_multi_band_neighbors' ``if sel_mode == "slab"`` into the global
    branch and silently benchmark the wrong strategy."""
    import os

    sel_mode = os.environ.get("PCS_SEL_MODE", "") or sel_mode
    if sel_mode not in ("slab", "global"):
        raise ValueError(f"sel_mode must be 'slab' or 'global', got "
                         f"{sel_mode!r} (check PCS_SEL_MODE)")
    return sel_mode


def effective_win_cand_k(win_cand_k, cand_k: int, bands, n: int) -> int:
    """The windowed selection pool size policy, shared by every windowed
    call site: ``win_cand_k`` if set (None/0 -> fall back to the global
    ``cand_k``), raised to the widest band's slot count (each band's top-k
    must fit in the pool), capped at n."""
    ck = cand_k if not win_cand_k else win_cand_k
    ck = max(ck, max(k for (_, _, k) in bands))
    return min(ck, n)


def band_neighbors_auto(xyz: jnp.ndarray, mask: jnp.ndarray, bands,
                        cand_k: int = 64, chunk: int = 1024,
                        return_sxyz: bool = False, windowed: bool = True,
                        tile: int = 256, window: int = 256,
                        ov_slots: int = 8, recall_target: float = 0.9,
                        sorted: bool = False, ov_pool_size: int = 0,
                        sel_mode: str = "slab", win_cand_k=None):
    """Dispatch between the windowed fast path and the global path.

    Use from model code: pass ``sorted=pyramid.level_sorted(i)`` — the
    windowed path REQUIRES Morton-sorted points and is only taken when the
    caller asserts sortedness (shape eligibility alone used to silently
    select it on unsorted inputs, a large recall loss).  SegmentationModel
    sorts level 0; Morton voxel keys sort levels >= 1.  Small or ragged
    levels fall back to the global ``multi_band_neighbors``.
    PCS_DISABLE_WINDOWED=1 is an emergency valve forcing the global path
    everywhere; PCS_SEL_MODE=global|slab overrides the windowed selection
    strategy (default slab: recall dominates global at every measured
    cand_k, BASELINE.md).  ``win_cand_k`` sizes the windowed selection pool
    only (None -> cand_k; clamped to the widest band's slot count) — the
    global fallback keeps ``cand_k``, whose single pool must absorb
    out-of-slab neighbors too.
    """
    import os

    if os.environ.get("PCS_DISABLE_WINDOWED", "") == "1":
        windowed = False
    sel_mode = resolve_sel_mode(sel_mode)
    n = xyz.shape[0]
    if windowed and sorted and n % tile == 0 and n >= 4 * tile:
        return windowed_multi_band_neighbors(
            xyz, mask, bands, tile=tile, window=window,
            cand_k=effective_win_cand_k(win_cand_k, cand_k, bands, n),
            ov_slots=ov_slots,
            chunk=min(chunk, n), recall_target=recall_target,
            return_sxyz=return_sxyz, ov_pool_size=ov_pool_size,
            sel_mode=sel_mode)
    return multi_band_neighbors(xyz, mask, bands, cand_k=min(cand_k, n),
                                chunk=min(chunk, n),
                                return_sxyz=return_sxyz)


@partial(jax.jit, static_argnames=("bands", "tile", "window", "cand_k",
                                   "ov_slots", "chunk", "recall_target",
                                   "use_approx", "return_sxyz", "ov_mode",
                                   "edge_ratio", "ov_window", "ov_pool_size",
                                   "sel_mode"))
def windowed_multi_band_neighbors(xyz: jnp.ndarray, mask: jnp.ndarray,
                                  bands, tile: int = 256, window: int = 256,
                                  cand_k: int = 64, ov_slots: int = 8,
                                  chunk: int = 2048,
                                  recall_target: float = 0.8,
                                  use_approx: bool = True,
                                  return_sxyz: bool = False,
                                  ov_mode: str = "slots",
                                  edge_ratio: int = 2,
                                  ov_window: int = 0,
                                  ov_pool_size: int = 0,
                                  sel_mode: str = "global"):
    """Multi-band fixed-K search for MORTON-SORTED points whose result is
    split into a windowed fast path + a small overflow path
    (types.WindowedNeighborhood), making downstream gathers MXU one-hot
    matmuls (measured ~8x faster fwd+bwd than row-DMA gathers at K=32).

    Requires ``xyz`` sorted by ops.morton.sort_block.  ONE global candidate
    selection (``lax.approx_max_k``; with ``recall_target<=0.9`` the op runs
    ~10x faster than its 0.95 default on [2048, 8192] rows, measured), then
    every band compacts the pool twice: candidates inside the point's slab
    ``[t*tile - window, t*tile + tile + window)`` fill the k windowed slots
    (stored slab-local), out-of-slab candidates fill ``ov_slots`` plain
    global-index slots.  Morton order keeps ~90% of true neighbors in-slab
    (measured on S3DIS-like blocks), so the expensive path carries only the
    locality-breaking tail.

    Replaces the same reference searches as multi_band_neighbors
    (SearchNeighborhood.cu:5-205, SearchNeighborhoodFixed.cu:6-152).
    """
    n = xyz.shape[0]
    assert n % tile == 0, (n, tile)
    assert window % tile == 0, \
        f"window ({window}) must be a multiple of tile ({tile}) — the " \
        "one-hot backward's dense overlap-add relies on it"
    chunk = min(chunk, n)
    sq = jnp.sum(xyz * xyz, axis=-1)
    row = jnp.arange(n, dtype=jnp.int32)
    tile_start = (row // tile) * tile

    n_pad = _pad_to_multiple(n, chunk)
    q_chunks = jnp.pad(xyz, ((0, n_pad - n), (0, 0))).reshape(
        n_pad // chunk, chunk, 3)
    qn_chunks = jnp.pad(sq, (0, n_pad - n)).reshape(-1, chunk)

    lo = tile_start - window
    s = tile + 2 * window
    self_local = (row % tile) + window

    if sel_mode == "slab":
        # Split selection: an exhaustive per-tile pass over the slab (the
        # [nt, T, S] distance einsum is ~S/N of the global matmul and its
        # top-k sorts an S-wide axis instead of N-wide), plus a global pass
        # masked to OUT-of-slab columns that feeds only the overflow pool
        # (k = ov_pool << cand_k).  vs the single global selection this
        # removes the [N, ck] slab-membership split, the clip, and the
        # [N, ck, ck] overflow rank compaction — approx_max_k's aggregated
        # top-k output is already rank-sorted.  Recall improves: in-slab
        # candidates are selected from ALL slab columns, not from whatever
        # survived a global cand_k cut.
        assert ov_window == 0, "slab selection has no wide-tier variant"
        nt = n // tile
        wt = window // tile
        x0 = xyz.reshape(nt, tile, 3)
        sq0 = sq.reshape(nt, tile)
        m0 = mask.reshape(nt, tile)
        slabs, ssqs, smasks = [], [], []
        for o in range(-wt, wt + 1):
            slabs.append(jnp.roll(x0, -o, axis=0))
            ssqs.append(jnp.roll(sq0, -o, axis=0))
            tid = jnp.arange(nt, dtype=jnp.int32) + o
            ok = (tid >= 0) & (tid < nt)
            smasks.append(jnp.roll(m0, -o, axis=0) & ok[:, None])
        slab = jnp.concatenate(slabs, axis=1)               # [nt, S, 3]
        ssq = jnp.concatenate(ssqs, axis=1)                 # [nt, S]
        sm = jnp.concatenate(smasks, axis=1)                # [nt, S]
        d2w = sq0[:, :, None] + ssq[:, None, :] - 2.0 * jnp.einsum(
            "ntd,nsd->nts", x0, slab,
            preferred_element_type=jnp.float32)
        negw = jnp.where(sm[:, None, :], -d2w, -_INF)
        ck_w = min(cand_k, s)
        if use_approx:
            vw, lci = jax.lax.approx_max_k(negw, ck_w,
                                           recall_target=recall_target)
        else:
            vw, lci = jax.lax.top_k(negw, ck_w)
        lci = lci.reshape(n, ck_w).astype(jnp.int32)
        sel_valid = vw.reshape(n, ck_w) > -_INF * 0.5
        in_slab = sel_valid
    else:
        def select(args):
            q, qn = args
            d2 = qn[:, None] + sq[None, :] - 2.0 * jnp.dot(
                q, xyz.T, preferred_element_type=jnp.float32)
            neg = jnp.where(mask[None, :], -d2, -_INF)
            if use_approx:
                v, ci = jax.lax.approx_max_k(neg, cand_k,
                                             recall_target=recall_target)
            else:
                v, ci = jax.lax.top_k(neg, cand_k)
            return ci.astype(jnp.int32), v

        ci, appv = jax.lax.map(select, (q_chunks, qn_chunks))
        ci = ci.reshape(n_pad, cand_k)[:n]
        appv = appv.reshape(n_pad, cand_k)[:n]
        sel_valid = appv > -_INF * 0.5

        # slab membership + slab-local index of each candidate
        in_slab = (ci >= lo[:, None]) & (ci < (lo + s)[:, None])
        lci = jnp.clip(ci - lo[:, None], 0, s - 1)

    # exact in-slab geometry WITHOUT a global row gather: slab-local reads
    # (one-hot MXU matmuls on TPU; device traces showed the [N, ck, 4]
    # candidate row gather alone cost ~5 ms/step/level).  Out-of-slab rows
    # read garbage (clipped lci) and are masked.
    xyzm = jnp.concatenate([xyz, mask.astype(jnp.float32)[:, None]],
                           axis=-1)
    cand_win = _geom_slab_take(xyzm, lci, window, tile)      # [N, ck, 4]
    sxyz_win = cand_win[..., :3] - xyz[:, None, :]
    ed2_win = jnp.sum(sxyz_win * sxyz_win, axis=-1)
    valid_win = (cand_win[..., 3] > 0.5) & in_slab & sel_valid
    is_self_win = lci == self_local[:, None]

    # shared overflow pool: the ov_pool nearest out-of-slab candidates,
    # ranked by the selection scores (selection-grade accuracy suffices for
    # pool membership; band membership below uses exact distances).
    # With ov_window > 0 the pool is restricted to the WIDER window tier
    # [t*tile - ov_window, ...+ov_window): its geometry comes from one-hot
    # slab reads and downstream gathers stay on the MXU; the few neighbors
    # beyond the wide tier are dropped (measured ~1% of overflow edges at
    # ov_window = 4*window on S3DIS-like blocks).
    ov_pool = min(2 * ov_slots, cand_k) if ov_mode == "slots" \
        else min(16, cand_k)
    ov_valid_sel = ~in_slab & sel_valid
    if sel_mode == "slab":
        # dedicated out-of-slab selection: approx_max_k aggregates to an
        # exact top-k over its candidates, so the pool arrives rank-sorted
        # (nearest-first) — no _compact_bands pass needed
        lo_chunks = jnp.pad(lo, (0, n_pad - n)).reshape(-1, chunk)

        def select_ov(args):
            q, qn, qlo = args
            d2g = qn[:, None] + sq[None, :] - 2.0 * jnp.dot(
                q, xyz.T, preferred_element_type=jnp.float32)
            col = jnp.arange(n, dtype=jnp.int32)[None, :]
            inw = (col >= qlo[:, None]) & (col < qlo[:, None] + s)
            neg = jnp.where(mask[None, :] & ~inw, -d2g, -_INF)
            if use_approx:
                vo, cio = jax.lax.approx_max_k(
                    neg, ov_pool, recall_target=recall_target)
            else:
                vo, cio = jax.lax.top_k(neg, ov_pool)
            return cio.astype(jnp.int32), vo

        oci, ovv = jax.lax.map(select_ov, (q_chunks, qn_chunks, lo_chunks))
        opool_idx = oci.reshape(n_pad, ov_pool)[:n]
        opool_mask = ovv.reshape(n_pad, ov_pool)[:n] > -_INF * 0.5
    if ov_window > 0:
        assert ov_window % tile == 0 and ov_window >= window
        lo2 = tile_start - ov_window
        s2 = tile + 2 * ov_window
        in_slab2 = (ci >= lo2[:, None]) & (ci < (lo2 + s2)[:, None])
        lci2 = jnp.clip(ci - lo2[:, None], 0, s2 - 1)
        self_local2 = (row % tile) + ov_window
        ov_valid_sel &= in_slab2
        (opool_idx, opool_mask, _), = _compact_bands(
            -appv, ov_valid_sel, jnp.zeros_like(in_slab), lci2, None,
            mask, self_local2, ((0.0, 1e15, ov_pool),), [ov_pool])
        ocand = _geom_slab_take(xyzm, opool_idx, ov_window, tile)
    else:
        if sel_mode != "slab":
            (opool_idx, opool_mask, _), = _compact_bands(
                -appv, ov_valid_sel, jnp.zeros_like(in_slab), ci, None,
                mask, row, ((0.0, 1e15, ov_pool),), [ov_pool])
        if ov_pool_size > 0 and ov_mode != "edges":
            # pool-FIRST geometry: dedupe the tile's targets before touching
            # xyzm, then read candidate geometry through the pool with
            # one-hot MXU matmuls.  The direct [N, op, 4] row gather this
            # replaces was the single most expensive op in the step trace
            # (~3 ms at N=8192·b4: row-descriptor-bound DMA); the pool
            # gather touches only [nt, P] rows (~10x fewer).  Candidates
            # dropped from a full pool (ppos == P) read the one-hot null
            # row (zeros) and are masked out below.
            pool_gidx, ppos = _tile_shared_pool(opool_idx, opool_mask,
                                                tile, ov_pool_size)
            pg = jnp.take(xyzm, pool_gidx.reshape(-1),
                          axis=0).reshape(n // tile, ov_pool_size, 4)
            ocand = _pool_take(pg, ppos, tile)               # [N, op, 4]
            opool_mask &= ppos < ov_pool_size
        else:
            ocand = jnp.take(xyzm, opool_idx, axis=0)        # [N, op, 4]
    sxyz_ov = ocand[..., :3] - xyz[:, None, :]
    ed2_ov = jnp.sum(sxyz_ov * sxyz_ov, axis=-1)
    valid_ov = (ocand[..., 3] > 0.5) & opool_mask

    ks = [k for (_, _, k) in bands]
    wcomp = _compact_bands(ed2_win, valid_win, is_self_win, lci,
                           sxyz_win if return_sxyz else None,
                           mask, self_local, bands, ks)

    if ov_mode == "edges":
        # ONE shared-capacity edge list for the level (see types.EdgeOverflow).
        # Built RANK-MAJOR (every point's rank-0 pool entry before any
        # rank-1 entry): when demand exceeds the cap, the FARTHEST-rank
        # edges drop globally — no spatial bias toward low Morton indices —
        # then re-sorted by center so segment reductions run sorted.
        max_mx = max(mx for (_, mx, _) in bands)
        min_mn = min(mn for (mn, _, _) in bands)
        keep = valid_ov & (ed2_ov <= max_mx * max_mx) \
            & (ed2_ov >= min_mn * min_mn)                    # [N, op]
        e_cap = edge_ratio * n
        opool_gidx = opool_idx if ov_window == 0 else jnp.clip(
            opool_idx + (tile_start - ov_window)[:, None], 0, n - 1)
        payload = jnp.concatenate([
            jnp.broadcast_to(row[:, None], (n, ov_pool)
                             ).reshape(n, ov_pool, 1).astype(jnp.float32),
            opool_gidx[..., None].astype(jnp.float32),
            ed2_ov[..., None],
            sxyz_ov], axis=-1)                               # [N, op, 6]
        kf = keep.T.reshape(-1)                              # rank-major
        payT = payload.transpose(1, 0, 2).reshape(-1, 6)
        pos = jnp.cumsum(kf.astype(jnp.int32)) - 1
        slot_pos = jnp.where(kf & (pos < e_cap), pos, e_cap)
        # sentinel center = n on unfilled rows -> they sort to the end
        init = jnp.concatenate([jnp.full((e_cap, 1), float(n), jnp.float32),
                                jnp.zeros((e_cap, 5), jnp.float32)], axis=-1)
        buf = init.at[slot_pos].set(payT, mode="drop")
        order = jnp.argsort(buf[:, 0], stable=True)
        buf = jnp.take(buf, order, axis=0)
        e_count = jnp.minimum(jnp.sum(kf.astype(jnp.int32)), e_cap)
        e_mask = jnp.arange(e_cap, dtype=jnp.int32) < e_count
        edges = EdgeOverflow(
            center=jnp.where(e_mask, buf[:, 0].astype(jnp.int32), n - 1),
            nbr=buf[:, 1].astype(jnp.int32),
            d2=buf[:, 2],
            sxyz=buf[:, 3:6],
            mask=e_mask)
        out = []
        ko0 = jnp.zeros((n, 0), jnp.int32)
        km0 = jnp.zeros((n, 0), bool)
        for widx, wm, wsx in wcomp:
            wn = WindowedNeighborhood(lidx=widx, wmask=wm, ov_idx=ko0,
                                      ov_mask=km0, window=window, tile=tile)
            out.append((wn, wsx, edges) if return_sxyz else (wn, edges))
        return tuple(out)

    # tile-shared overflow pool: emit POOL POSITIONS from band compaction
    # instead of global indices (see _tile_shared_pool /
    # types.WindowedNeighborhood.pool_idx); pool_gidx/ppos were built above,
    # before the pool-first geometry read
    if ov_pool_size > 0 and ov_window == 0:
        ov_src = ppos
        ov_pad = jnp.full((n,), ov_pool_size, jnp.int32)
    else:
        pool_gidx = None
        ov_src = opool_idx
        ov_pad = self_local2 if ov_window > 0 else row
    ocomp = _compact_bands(ed2_ov, valid_ov, jnp.zeros_like(valid_ov),
                           ov_src, sxyz_ov if return_sxyz else None,
                           mask, ov_pad, bands,
                           [min(ov_slots, k) for k in ks])

    out = []
    for (widx, wm, wsx), (oidx, om, osx) in zip(wcomp, ocomp):
        wn = WindowedNeighborhood(lidx=widx, wmask=wm, ov_idx=oidx,
                                  ov_mask=om, window=window, tile=tile,
                                  ov_window=ov_window, pool_idx=pool_gidx)
        if return_sxyz:
            out.append((wn, jnp.concatenate([wsx, osx], axis=1)))
        else:
            out.append(wn)
    return tuple(out)
