"""Structural invariant tests for the pyramid builder (reference analog:
model_pooling.py:774-803 test_block / check_dxyzs, exercised on real blocks).
"""
import jax.numpy as jnp
import numpy as np

from oracles import random_cloud
from pointcloudsegmentation_tpu.ops import hierarchy as hier


CAPS = (256, 64)


def build(rng, n=300, n_valid=260):
    xyz, mask = random_cloud(rng, n, n_valid=n_valid)
    return xyz, mask, hier.build_pyramid(
        jnp.asarray(xyz), jnp.asarray(mask),
        voxel_sizes=(0.3, 0.9), caps=CAPS, block_size=3.0)


def test_pyramid_shapes(rng):
    xyz, mask, pyr = build(rng)
    assert pyr.num_levels == 3
    assert pyr.levels[1].xyz.shape == (CAPS[0], 3)
    assert pyr.levels[2].xyz.shape == (CAPS[1], 3)
    assert pyr.seg[0].shape == (300,)
    assert pyr.seg[1].shape == (CAPS[0],)


def test_dxyz_invariant(rng):
    """dxyz + center == xyz for every valid point at every level
    (check_dxyzs, tf_ops/PoolingIndex/test_permutation.py:79-88)."""
    xyz, mask, pyr = build(rng)
    for lvl in range(2):
        pts = np.asarray(pyr.levels[lvl].xyz)
        pmask = np.asarray(pyr.levels[lvl].mask)
        seg = np.asarray(pyr.seg[lvl])
        centers = np.asarray(pyr.levels[lvl + 1].xyz)
        dxyz = np.asarray(pyr.dxyz[lvl])
        cap = centers.shape[0]
        ok = pmask & (seg < cap)
        recon = dxyz[ok] + centers[seg[ok]]
        np.testing.assert_allclose(recon, pts[ok], rtol=1e-4, atol=1e-5)


def test_segment_consistency(rng):
    """Valid points map to valid voxels; voxel masks match usage
    (check_vidxs, test_permutation.py:55-66)."""
    xyz, mask, pyr = build(rng)
    for lvl in range(2):
        pmask = np.asarray(pyr.levels[lvl].mask)
        seg = np.asarray(pyr.seg[lvl])
        vmask = np.asarray(pyr.levels[lvl + 1].mask)
        cap = len(vmask)
        assert np.all(seg[pmask] < cap), "valid point overflowed the cap"
        assert np.all(seg[~pmask] == cap), "invalid point not in overflow"
        used = np.unique(seg[pmask])
        assert np.all(vmask[used])
        assert not np.any(vmask[np.setdiff1d(np.arange(cap), used)])


def test_pool_unpool(rng):
    xyz, mask, pyr = build(rng)
    feats = jnp.asarray(np.random.RandomState(1).randn(300, 8).astype(
        np.float32))
    pooled = hier.pool_max(feats, pyr, 0)
    assert pooled.shape == (CAPS[0], 8)
    up = hier.unpool(pooled, pyr, 0)
    assert up.shape == (300, 8)
    # every valid point receives >= its own feature under max pooling
    up_np, f_np = np.asarray(up), np.asarray(feats)
    m = np.asarray(mask)
    assert np.all(up_np[m] >= f_np[m] - 1e-6)

    avg = np.asarray(hier.pool_avg(feats, pyr, 0))
    seg = np.asarray(pyr.seg[0])
    for v in [0, 5, 20]:
        member = m & (seg == v)
        if member.any():
            np.testing.assert_allclose(avg[v], f_np[member].mean(0),
                                       rtol=1e-5, atol=1e-6)
