import jax
import jax.numpy as jnp
import numpy as np

from dropclip_tpu.geom.voxelize import (
    INVALID_KEY,
    ravel_grid_coords,
    sparse_quantize,
    unravel_key,
    voxel_downsample,
)


def numpy_quantize(xyz, voxel):
    """Straightforward numpy model of ME.utils.sparse_quantize."""
    grid = np.floor(xyz / voxel).astype(np.int64)
    seen = {}
    inverse = np.zeros(len(xyz), np.int64)
    for i, g in enumerate(map(tuple, grid)):
        if g not in seen:
            seen[g] = len(seen)
        inverse[i] = seen[g]
    coords = np.array(sorted(seen.keys()))
    return grid, inverse, {g: j for j, g in enumerate(seen)}, coords


def test_key_roundtrip(rng):
    grid = rng.randint(-512, 512, size=(1000, 3)).astype(np.int32)
    keys = ravel_grid_coords(jnp.asarray(grid))
    back = unravel_key(keys)
    np.testing.assert_array_equal(np.asarray(back), grid)
    assert np.all(np.asarray(keys) != INVALID_KEY)


def test_out_of_range_is_invalid():
    grid = jnp.asarray([[600, 0, 0], [0, 0, 0]], dtype=jnp.int32)
    keys = ravel_grid_coords(grid)
    assert int(keys[0]) == INVALID_KEY
    assert int(keys[1]) != INVALID_KEY


def test_sparse_quantize_uniqueness_and_inverse(rng):
    xyz = rng.rand(500, 3).astype(np.float32) * 2 - 1
    voxel = 0.1
    cap = 512
    out = sparse_quantize(jnp.asarray(xyz), voxel, cap)
    n = int(out.num_voxels)
    coords = np.asarray(out.coords)[:n]
    # unique
    assert len({tuple(c) for c in coords}) == n
    # every valid point maps into range, and its voxel's coords match floor(x/v)
    inv = np.asarray(out.inverse_map)
    grid = np.floor(xyz / voxel).astype(np.int32)
    assert inv.min() >= 0 and inv.max() < n
    np.testing.assert_array_equal(coords[inv], grid)
    # representative index lands in the right voxel and is the minimum index
    uidx = np.asarray(out.unique_idx)[:n]
    np.testing.assert_array_equal(grid[uidx], coords)
    for j in range(n):
        members = np.where(inv == j)[0]
        assert uidx[j] == members.min()
    # ascending key order
    keys = np.asarray(ravel_grid_coords(jnp.asarray(coords)))
    assert np.all(np.diff(keys) > 0)


def test_sparse_quantize_matches_numpy_count(rng):
    xyz = rng.rand(300, 3).astype(np.float32)
    _, inverse, _, coords_np = numpy_quantize(xyz, 0.07)
    out = sparse_quantize(jnp.asarray(xyz), 0.07, 512)
    assert int(out.num_voxels) == len(coords_np)
    n = int(out.num_voxels)
    np.testing.assert_array_equal(np.sort(np.asarray(out.coords)[:n], axis=0),
                                  np.sort(coords_np, axis=0))


def test_label_conflict_becomes_ignore():
    xyz = jnp.asarray([[0.01, 0.01, 0.01],
                       [0.02, 0.02, 0.02],   # same voxel, different label
                       [0.5, 0.5, 0.5]])
    labels = jnp.asarray([1, 2, 3])
    out = sparse_quantize(xyz, 0.1, 8, labels=labels, ignore_label=0)
    n = int(out.num_voxels)
    assert n == 2
    got = sorted(np.asarray(out.labels)[:n].tolist())
    assert got == [0, 3]  # conflict voxel -> ignore(0), lone voxel keeps 3


def test_invalid_points_excluded(rng):
    xyz = rng.rand(100, 3).astype(np.float32)
    valid = np.zeros(100, bool)
    valid[:10] = True
    out = sparse_quantize(jnp.asarray(xyz), 0.002, 128, valid=jnp.asarray(valid))
    assert int(out.num_voxels) == 10  # 2mm voxels -> all 10 valid pts unique
    inv = np.asarray(out.inverse_map)
    assert np.all(inv[10:] == -1)
    assert np.all(inv[:10] >= 0)


def test_capacity_overflow_flag(rng):
    xyz = rng.rand(100, 3).astype(np.float32)
    out = sparse_quantize(jnp.asarray(xyz), 0.002, 16)
    assert bool(out.overflowed)
    assert int(out.num_voxels) == 16


def test_voxel_downsample_majority_vote():
    # 3 points in one voxel: labels [5, 5, 2] -> majority 5; mean position
    xyz = np.array([[0.01, 0.0, 0.0], [0.02, 0.0, 0.0], [0.03, 0.0, 0.0],
                    [1.0, 1.0, 1.0]], np.float32)
    col = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
    lab = np.array([5, 5, 2, 7], np.int32)
    x, c, l, m, dropped = voxel_downsample(jnp.asarray(xyz), jnp.asarray(col),
                                  jnp.asarray(lab), 0.1, 8, num_label_classes=16)
    m = np.asarray(m)
    assert m.sum() == 2
    x, c, l = np.asarray(x)[m], np.asarray(c)[m], np.asarray(l)[m]
    i = int(np.argmin(x[:, 0]))
    np.testing.assert_allclose(x[i], [0.02, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c[i], [1 / 3, 1 / 3, 1 / 3], atol=1e-6)
    assert l[i] == 5
    assert l[1 - i] == 7


def test_sparse_quantize_jit_and_vmap(rng):
    xyz = rng.rand(4, 200, 3).astype(np.float32)
    fn = jax.jit(jax.vmap(lambda x: sparse_quantize(x, 0.1, 256)))
    out = fn(jnp.asarray(xyz))
    assert out.coords.shape == (4, 256, 3)
    assert out.mask.shape == (4, 256)
