"""Oracle + invariant tests for voxelization and segment reductions
(reference analog: tf_ops/PoolingIndex/test_permutation.py:46-88,
tf_ops/test/test_compute_permutation_info.py)."""
import jax.numpy as jnp
import numpy as np

from oracles import np_segment_reduce, np_voxel_segments, random_cloud
from pointcloudsegmentation_tpu.ops import segments as seg_ops
from pointcloudsegmentation_tpu.ops import voxelize as vox


def test_segments_match_oracle(rng):
    xyz, mask = random_cloud(rng, 200, n_valid=170)
    info = vox.voxelize(jnp.asarray(xyz), jnp.asarray(mask), 0.3, 3.0, 256)
    seg = np.asarray(info.seg)
    oracle_seg, n_vox = np_voxel_segments(xyz, mask, 0.3, 3.0)
    assert n_vox <= 256
    # same partition: points share a voxel iff the oracle says so, and the
    # slot ordering (spatial key order) matches exactly.
    np.testing.assert_array_equal(seg[mask], oracle_seg[mask])
    assert np.all(seg[~mask] == 256)


def test_centers_and_counts(rng):
    xyz, mask = random_cloud(rng, 150, n_valid=140)
    cap = 160
    info = vox.voxelize(jnp.asarray(xyz), jnp.asarray(mask), 0.4, 3.0, cap)
    seg = np.asarray(info.seg)
    oracle_seg, n_vox = np_voxel_segments(xyz, mask, 0.4, 3.0)
    assert n_vox <= cap
    centers = np.asarray(info.centers)
    counts = np.asarray(info.counts)
    for v in range(n_vox):
        member = mask & (oracle_seg == v)
        np.testing.assert_allclose(centers[v], xyz[member].mean(0),
                                   rtol=1e-5, atol=1e-6)
        assert counts[v] == member.sum()
    assert np.all(counts[n_vox:] == 0)
    assert np.all(np.asarray(info.mask)[:n_vox])


def test_diff_to_center_invariant(rng):
    """check_dxyzs invariant: dxyz + center[seg] == xyz
    (test_permutation.py:79-88)."""
    xyz, mask = random_cloud(rng, 120)
    info = vox.voxelize(jnp.asarray(xyz), jnp.asarray(mask), 0.5, 3.0, 128)
    dxyz = np.asarray(vox.diff_to_center(
        jnp.asarray(xyz), info.centers, info.seg))
    centers = np.asarray(info.centers)
    seg = np.asarray(info.seg)
    recon = dxyz + centers[np.minimum(seg, 127)]
    np.testing.assert_allclose(recon[mask], xyz[mask], rtol=1e-4, atol=1e-5)


def test_segment_reductions_match_oracle(rng):
    n, v, f = 97, 12, 5
    seg = rng.randint(0, v, n).astype(np.int32)
    seg[rng.rand(n) < 0.1] = v  # overflow rows must be dropped
    data = rng.randn(n, f).astype(np.float32)
    valid = seg < v
    dv, sv = data[valid], seg[valid]
    got_sum = np.asarray(seg_ops.segment_sum(jnp.asarray(data),
                                             jnp.asarray(seg), v))
    got_max = np.asarray(seg_ops.segment_max(jnp.asarray(data),
                                             jnp.asarray(seg), v))
    got_mean = np.asarray(seg_ops.segment_mean(jnp.asarray(data),
                                               jnp.asarray(seg), v))
    np.testing.assert_allclose(got_sum, np_segment_reduce(dv, sv, v, np.sum),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_max, np_segment_reduce(dv, sv, v, np.max),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_mean, np_segment_reduce(dv, sv, v, np.mean),
                               rtol=1e-5, atol=1e-6)


def test_unpool_roundtrip(rng):
    v, f, n = 9, 4, 40
    seg = rng.randint(0, v, n).astype(np.int32)
    seg[0] = v  # overflow -> zeros
    vf = rng.randn(v, f).astype(np.float32)
    up = np.asarray(seg_ops.segment_unpool(jnp.asarray(vf), jnp.asarray(seg)))
    np.testing.assert_allclose(up[1:], vf[seg[1:]], rtol=1e-6)
    assert np.all(up[0] == 0)


def test_majority_label(rng):
    n, v, c = 60, 8, 5
    seg = rng.randint(0, v, n).astype(np.int32)
    labels = rng.randint(0, c, n).astype(np.int32)
    mask = np.ones(n, bool)
    got = np.asarray(vox.voxel_majority_label(
        jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(seg), v, c))
    for vi in range(v):
        sel = labels[seg == vi]
        if len(sel):
            counts = np.bincount(sel, minlength=c)
            assert counts[got[vi]] == counts.max()


def test_class_pure_segments_no_int32_overflow(rng):
    """Class-pure voxelization at a FINE grid (morton codes near 2^30):
    the old packed-scalar key (key*(C+1)+label) silently wrapped int32
    under JAX's default x64-disabled config; the lexicographic two-key
    sort must keep the partition exact."""
    n, c = 400, 13
    block = 3.0
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * block
    mask = np.ones(n, bool)
    labels = rng.randint(0, c, n).astype(np.int32)
    # voxel 0.005 -> grid 601 -> morton codes up to ~2^29; *14 wraps int32
    info = vox.voxelize_with_labels(
        jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(labels),
        0.005, block, n + 8, num_classes=c)
    seg = np.asarray(info.seg)
    # exact partition oracle over (voxel coord triple, label)
    coords = np.floor((xyz + 0.5 * block) / 0.005).astype(np.int64)
    keys = [tuple(coords[i]) + (labels[i],) for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            same = keys[i] == keys[j]
            assert (seg[i] == seg[j]) == same, (i, j, keys[i], keys[j])
    # every segment is class-pure
    for s in np.unique(seg):
        assert len(np.unique(labels[seg == s])) == 1


def test_grid_origin_covers_min_based_frames(rng):
    """Regression: S3DIS-style blocks center xy but keep z in [0, bs]; a
    fixed [-bs/2, bs/2] grid clipped everything above bs/2 into one cell,
    merging the upper half of every block vertically."""
    n = 400
    xyz = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(0.0, 3.0, n)], 1).astype(np.float32)
    mask = np.ones(n, bool)
    info = vox.voxelize(jnp.asarray(xyz), jnp.asarray(mask), 0.3, 3.0, 512)
    seg = np.asarray(info.seg)
    top = xyz[:, 2] > 1.6                 # the formerly-clipped region
    # distinct z-layers must exist above the old cutoff: points 0.6 m apart
    # in z with identical xy-cell must NOT share a voxel (lattice origin:
    # cell walls at absolute multiples of voxel_size)
    zc = np.floor(xyz[:, 2] / 0.3).astype(int)
    for v in np.unique(seg[top]):
        assert len(np.unique(zc[seg == v])) == 1
    # and the z-extent within every voxel stays <= voxel_size
    for v in np.unique(seg[mask]):
        zs = xyz[seg == v, 2]
        assert zs.max() - zs.min() <= 0.3 + 1e-6


def test_morton_order_scene_frame(rng):
    """Regression: a [0, extent] scene must Morton-sort into spatially
    compact index ranges over the WHOLE extent (the fixed centered frame
    collapsed the upper half into one cell, interleaving shards)."""
    from pointcloudsegmentation_tpu.ops import morton

    n, length = 4096, 48.0
    xyz = np.stack([rng.uniform(0, length, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(0, 3.0, n)], 1).astype(np.float32)
    mask = np.ones(n, bool)
    xs, ms, order = morton.sort_block(jnp.asarray(xyz), jnp.asarray(mask),
                                      0.2, length)
    xs = np.asarray(xs)
    # each eighth of the sorted order must span only a small x range
    for i in range(8):
        span = xs[i * (n // 8):(i + 1) * (n // 8), 0]
        assert span.max() - span.min() < length / 4, (i, span.min(),
                                                      span.max())
