"""Pure-numpy reference implementations ("oracles") for the core ops,
mirroring the reference's test style (tf_ops/test/np_ops.py): every TPU op is
checked against a slow, obviously-correct numpy loop."""
import numpy as np


def random_cloud(rng, n, n_valid=None, scale=1.5):
    """Random padded point cloud; returns (xyz [n,3] f32, mask [n] bool)."""
    if n_valid is None:
        n_valid = n
    xyz = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:n_valid] = True
    return xyz, mask


def np_radius_neighbors(xyz, mask, radius, k, min_radius=0.0):
    """K nearest in-band neighbors per point, brute force."""
    n = len(xyz)
    idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
    nmask = np.zeros((n, k), bool)
    for i in range(n):
        if not mask[i]:
            continue
        d2 = ((xyz - xyz[i]) ** 2).sum(1)
        band = (d2 <= radius * radius) & (d2 >= min_radius * min_radius) & mask
        if min_radius > 0:
            band[i] = False
        cand = np.where(band)[0]
        cand = cand[np.argsort(d2[cand], kind="stable")][:k]
        idx[i, :len(cand)] = cand
        nmask[i, :len(cand)] = True
    return idx, nmask


def np_morton3(c):
    """[N, 3] int coords (< 1024) -> Z-order codes (ops.morton mirror)."""
    def spread(x):
        x = x.astype(np.int64) & 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    return spread(c[:, 0]) | (spread(c[:, 1]) << 1) | (spread(c[:, 2]) << 2)


def np_voxel_segments(xyz, mask, voxel_size, block_size):
    """Voxel id per point, in spatial-key order (first-occupied-key = 0).
    Keys are Morton codes, matching ops.voxelize.pack_keys."""
    grid = int(np.ceil(block_size / voxel_size)) + 2
    lo = xyz[mask].min(0) if mask.any() else np.zeros(3)
    lo = voxel_size * np.floor(lo / voxel_size)
    c = np.floor((xyz - lo) / voxel_size).astype(np.int64)
    c = np.clip(c, 0, grid - 1)
    key = np_morton3(c)
    uniq = np.unique(key[mask])
    lookup = {k: i for i, k in enumerate(uniq)}
    seg = np.array([lookup[k] if m else len(uniq)
                    for k, m in zip(key, mask)], np.int32)
    return seg, len(uniq)


def np_segment_reduce(data, seg, num_segments, op):
    out = np.zeros((num_segments,) + data.shape[1:], data.dtype)
    for v in range(num_segments):
        rows = data[seg == v]
        if len(rows):
            out[v] = op(rows, axis=0)
    return out
