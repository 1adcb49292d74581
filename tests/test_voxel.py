"""Sparse voxel engine tests: quantization, unique, stride, kernel maps.

Cross-checked against brute-force numpy implementations, mirroring how
MinkowskiEngine tests its coordinate maps with exact unique counts and
round-trips (reference ``tests/cpp/coordinate_map_cpu_test.py:12-40``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoho_tpu.ops.kernel_map import build_kernel_map, hypercube_offsets
from yoho_tpu.ops.voxel import build_grid, stride_grid, unique_voxels


def _np_unique_voxels(cloud, voxel_size):
    return np.unique(np.floor(cloud / voxel_size).astype(np.int64), axis=0)


def make_grid(cloud, voxel_size=0.05, pad=4096):
    n = cloud.shape[0]
    pts = jnp.zeros((pad, 3), dtype=jnp.float32).at[:n].set(jnp.asarray(cloud))
    grid, first = jax.jit(lambda p: build_grid(p, voxel_size, n))(pts)
    return grid, first


def test_unique_count_matches_numpy(rng):
    cloud = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    grid, _ = make_grid(cloud)
    ref = _np_unique_voxels(cloud, 0.05)
    assert int(grid.count) == len(ref)
    got = np.asarray(grid.coords)[: int(grid.count), 1:]
    # grid is sorted by packed key = lex order of (b, x, y, z) offset ints
    np.testing.assert_array_equal(np.unique(got, axis=0), ref)


def test_unique_sorted_and_padding_sentinel(rng):
    cloud = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
    grid, _ = make_grid(cloud)
    c = int(grid.count)
    hi = np.asarray(grid.key_hi)
    lo = np.asarray(grid.key_lo)
    keys = hi.astype(np.int64) * (1 << 32) + (lo.astype(np.int64) & 0xFFFFFFFF)
    assert np.all(np.diff(keys[:c]) > 0)  # strictly sorted, no dups
    assert np.all(hi[c:] == 2**31 - 1)


def test_first_index_points_to_same_voxel(rng):
    cloud = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    grid, first = make_grid(cloud)
    c = int(grid.count)
    fi = np.asarray(first)[:c]
    vox_of_first = np.floor(cloud[fi] / 0.05).astype(np.int32)
    np.testing.assert_array_equal(vox_of_first, np.asarray(grid.coords)[:c, 1:])


def test_negative_coordinates(rng):
    cloud = rng.uniform(-50, -40, size=(500, 3)).astype(np.float32)
    grid, _ = make_grid(cloud)
    ref = _np_unique_voxels(cloud, 0.05)
    assert int(grid.count) == len(ref)


def test_batched_clouds_do_not_collide(rng):
    # identical xyz in two batches must remain distinct voxels
    cloud = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([cloud, cloud], axis=0))
    from yoho_tpu.ops.voxel import quantize

    coords0, valid0 = quantize(jnp.asarray(cloud), 0.05, 300, batch_index=0)
    coords1, valid1 = quantize(jnp.asarray(cloud), 0.05, 300, batch_index=1)
    coords = jnp.concatenate([coords0, coords1], axis=0)
    valid = jnp.concatenate([valid0, valid1], axis=0)
    grid, _ = unique_voxels(coords, valid)
    ref = _np_unique_voxels(cloud, 0.05)
    # row out_size-1 is reserved as the zero pad row (kernel_map.py
    # zero-row invariant), so a fully-unique input saturates at n-1
    assert int(grid.count) == min(2 * len(ref), coords.shape[0] - 1)
    # with headroom, nothing is dropped
    coords_pad = jnp.concatenate([coords, coords[:8]], axis=0)
    valid_pad = jnp.concatenate([valid, jnp.zeros(8, bool)], axis=0)
    grid2, _ = unique_voxels(coords_pad, valid_pad)
    assert int(grid2.count) == 2 * len(ref)


def test_stride_grid_matches_numpy(rng):
    cloud = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    grid, _ = make_grid(cloud)
    coarse, parent = jax.jit(lambda g: stride_grid(g, 2))(grid)
    vox = _np_unique_voxels(cloud, 0.05)
    ref_coarse = np.unique((vox // 2) * 2, axis=0)
    assert int(coarse.count) == len(ref_coarse)
    # parent mapping: every fine voxel's floored coord == its coarse coord
    c = int(grid.count)
    par = np.asarray(parent)[:c]
    coarse_coords = np.asarray(coarse.coords)
    fine_coords = np.asarray(grid.coords)[:c]
    np.testing.assert_array_equal(
        coarse_coords[par, 1:], (fine_coords[:, 1:] // 2) * 2
    )


def _np_kernel_map(in_coords, out_coords, kernel_size, step):
    """Brute-force gather map."""
    offs = hypercube_offsets(kernel_size)
    lut = {tuple(c): i for i, c in enumerate(in_coords)}
    K, M = len(offs), len(out_coords)
    idx = np.zeros((K, M), dtype=np.int64)
    val = np.zeros((K, M), dtype=bool)
    for k, off in enumerate(offs):
        for m, c in enumerate(out_coords):
            q = (c[0], c[1] + off[0] * step, c[2] + off[1] * step, c[3] + off[2] * step)
            if q in lut:
                idx[k, m] = lut[q]
                val[k, m] = True
    return idx, val


@pytest.mark.parametrize("kernel_size", [3, 5])
def test_kernel_map_matches_bruteforce(rng, kernel_size):
    cloud = rng.uniform(-0.3, 0.3, size=(500, 3)).astype(np.float32)  # dense-ish
    grid, _ = make_grid(cloud, pad=1024)
    kmap = jax.jit(lambda g: build_kernel_map(g, g, kernel_size))(grid)
    c = int(grid.count)
    coords = np.asarray(grid.coords)[:c]
    ref_idx, ref_val = _np_kernel_map(coords, coords, kernel_size, 1)
    got_idx = np.asarray(kmap.in_idx)[:, :c]
    got_val = np.asarray(kmap.valid)[:, :c]
    np.testing.assert_array_equal(got_val, ref_val)
    np.testing.assert_array_equal(got_idx[ref_val], ref_idx[ref_val])
    # padding rows all invalid
    assert not np.asarray(kmap.valid)[:, c:].any()


def test_kernel_map_strided_and_transposed(rng):
    cloud = rng.uniform(-0.3, 0.3, size=(600, 3)).astype(np.float32)
    grid, _ = make_grid(cloud, pad=1024)
    coarse, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    kmap_down = jax.jit(lambda g, c: build_kernel_map(g, c, 3))(grid, coarse)
    cc = int(coarse.count)
    cf = int(grid.count)
    fine_coords = np.asarray(grid.coords)[:cf]
    coarse_coords = np.asarray(coarse.coords)[:cc]
    ref_idx, ref_val = _np_kernel_map(fine_coords, coarse_coords, 3, 1)
    got_val = np.asarray(kmap_down.valid)[:, :cc]
    np.testing.assert_array_equal(got_val, ref_val)
    np.testing.assert_array_equal(
        np.asarray(kmap_down.in_idx)[:, :cc][ref_val], ref_idx[ref_val]
    )

    # transposed: coarse -> fine; query with -offset * out_stride(=1)
    kmap_up = jax.jit(lambda c, g: build_kernel_map(c, g, 3, transposed=True))(
        coarse, grid
    )
    offs = -hypercube_offsets(3)
    lut = {tuple(c): i for i, c in enumerate(coarse_coords)}
    for k in range(27):
        for m in range(cf):
            q = tuple(fine_coords[m] + np.array([0, *offs[k]]) * 1)
            expect = q in lut
            assert bool(np.asarray(kmap_up.valid)[k, m]) == expect
            if expect:
                assert int(np.asarray(kmap_up.in_idx)[k, m]) == lut[q]


def test_transpose_map_is_forward_map_swapped(rng):
    """ME builds transpose conv maps by swapping in/out of the forward
    strided map (coordinate_map_manager.cpp:605-611). Verify the pair
    sets coincide under our sign convention."""
    cloud = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    grid, _ = make_grid(cloud, pad=512)
    coarse, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    fwd = jax.jit(lambda g, c: build_kernel_map(g, c, 3))(grid, coarse)
    bwd = jax.jit(lambda c, g: build_kernel_map(c, g, 3, transposed=True))(coarse, grid)
    cc, cf = int(coarse.count), int(grid.count)
    fwd_pairs = set()
    for k in range(27):
        for m in range(cc):
            if np.asarray(fwd.valid)[k, m]:
                fwd_pairs.add((int(np.asarray(fwd.in_idx)[k, m]), m))
    bwd_pairs = set()
    for k in range(27):
        for m in range(cf):
            if np.asarray(bwd.valid)[k, m]:
                bwd_pairs.add((m, int(np.asarray(bwd.in_idx)[k, m])))
    assert fwd_pairs == bwd_pairs


def test_transpose_derivation_matches_search(rng):
    """transpose_kernel_map (scatter inversion) must equal the searched
    transposed map bit-for-bit."""
    from yoho_tpu.ops.kernel_map import transpose_kernel_map

    cloud = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    grid, _ = make_grid(cloud, pad=512)
    coarse, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    fwd = jax.jit(lambda g, c: build_kernel_map(g, c, 3))(grid, coarse)
    searched = jax.jit(lambda c, g: build_kernel_map(c, g, 3, transposed=True))(
        coarse, grid
    )
    derived = jax.jit(lambda f: transpose_kernel_map(f, 512))(fwd)
    np.testing.assert_array_equal(np.asarray(derived.valid), np.asarray(searched.valid))
    v = np.asarray(searched.valid)
    np.testing.assert_array_equal(
        np.asarray(derived.in_idx)[v], np.asarray(searched.in_idx)[v]
    )


def test_subkernel_slice_matches_direct(rng):
    from yoho_tpu.ops.kernel_map import subkernel_slice

    cloud = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    grid, _ = make_grid(cloud, pad=512)
    big = jax.jit(lambda g: build_kernel_map(g, g, 5))(grid)
    small = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    sliced = subkernel_slice(big, 5, 3)
    np.testing.assert_array_equal(np.asarray(sliced.valid), np.asarray(small.valid))
    v = np.asarray(small.valid)
    np.testing.assert_array_equal(np.asarray(sliced.in_idx)[v], np.asarray(small.in_idx)[v])


def test_shared_input_maps_match_direct(rng):
    from yoho_tpu.ops.kernel_map import build_kernel_maps_shared_input

    cloud = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    grid, _ = make_grid(cloud, pad=512)
    coarse, _ = jax.jit(lambda g: stride_grid(g, 2))(grid)
    a, b = jax.jit(
        lambda g, c: build_kernel_maps_shared_input(g, [(g, 3), (c, 3)])
    )(grid, coarse)
    da = jax.jit(lambda g: build_kernel_map(g, g, 3))(grid)
    db = jax.jit(lambda g, c: build_kernel_map(g, c, 3))(grid, coarse)
    for got, want in [(a, da), (b, db)]:
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
        v = np.asarray(want.valid)
        np.testing.assert_array_equal(np.asarray(got.in_idx)[v], np.asarray(want.in_idx)[v])


def test_unique_out_size_saturation(rng):
    """When unique count exceeds out_size, the highest keys drop and
    count saturates — well-defined truncation."""
    cloud = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    n = cloud.shape[0]
    pts = jnp.zeros((4096, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    from yoho_tpu.ops.voxel import quantize

    coords, valid = quantize(pts, 0.05, n)
    small, _ = jax.jit(lambda c, v: unique_voxels(c, v, out_size=256))(coords, valid)
    full, _ = jax.jit(lambda c, v: unique_voxels(c, v))(coords, valid)
    # row 255 is the reserved zero pad row -> 255 usable voxels
    assert int(small.count) == 255
    np.testing.assert_array_equal(
        np.asarray(small.coords)[:255], np.asarray(full.coords)[:255]
    )


def test_stride_grid_smaller_pad(rng):
    cloud = rng.uniform(-0.5, 0.5, size=(2000, 3)).astype(np.float32)
    grid, _ = make_grid(cloud)
    coarse, parent = jax.jit(lambda g: stride_grid(g, 2, out_size=2048))(grid)
    assert coarse.coords.shape[0] == 2048
    vox = _np_unique_voxels(cloud, 0.05)
    ref_coarse = np.unique((vox // 2) * 2, axis=0)
    assert int(coarse.count) == len(ref_coarse)


def test_saturation_is_counted(rng):
    """Overflowing unique_voxels reports the drop count on the grid
    (SparseGrid.dropped); non-overflowing grids report 0."""
    cloud = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    n = cloud.shape[0]
    pts = jnp.zeros((4096, 3), jnp.float32).at[:n].set(jnp.asarray(cloud))
    from yoho_tpu.ops.voxel import quantize

    coords, valid = quantize(pts, 0.05, n)
    small, _ = jax.jit(lambda c, v: unique_voxels(c, v, out_size=256))(coords, valid)
    full, _ = jax.jit(lambda c, v: unique_voxels(c, v))(coords, valid)
    n_unique = len(_np_unique_voxels(cloud, 0.05))
    assert int(full.dropped) == 0
    assert int(small.dropped) == n_unique - 255


def test_host_prevoxelize_reports_truncation(rng):
    from yoho_tpu.pipeline.runner import host_prevoxelize

    cloud = rng.uniform(-1, 1, size=(3000, 3)).astype(np.float32)
    n_unique = len(_np_unique_voxels(cloud, 0.05))
    reps, dropped = host_prevoxelize(cloud, 0.05, 256, return_dropped=True)
    assert len(reps) == 255 and dropped == n_unique - 255
    reps2, dropped2 = host_prevoxelize(cloud, 0.05, 65536, return_dropped=True)
    assert dropped2 == 0 and len(reps2) == n_unique
