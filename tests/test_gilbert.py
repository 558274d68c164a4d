"""Unit tests for the Gilbert curve stage (SURVEY §4: bijectivity +
neighborhood oracle checks against brute force on small grids)."""

import numpy as np
import pytest

from rectified_spaattn_tpu.curves import (
    gilbert3d_path,
    gilbert_mapping,
    sliced_gilbert_mapping,
    gilbert_block_neighbor_mask,
    sliced_gilbert_block_neighbor_mask,
    block_wise_mapping,
    cached_curve,
)

GRIDS = [(1, 4, 4), (2, 3, 5), (4, 12, 33), (5, 7, 9), (3, 10, 20)]


@pytest.mark.parametrize("t,h,w", GRIDS)
@pytest.mark.parametrize("axis_order", [("w", "h", "t"), ("t", "h", "w"), None])
def test_curve_is_bijective_with_unit_steps(t, h, w, axis_order):
    path = gilbert3d_path(w, h, t, axis_order=axis_order)
    assert path.shape == (t * h * w, 3)
    # Every grid point visited exactly once.
    lin = path[:, 2] * h * w + path[:, 1] * w + path[:, 0]
    assert np.array_equal(np.sort(lin), np.arange(t * h * w))
    # A Hilbert-style curve moves one voxel at a time.  Odd-sized 3-D grids
    # have rare small discontinuities (the algorithm recommends even sizes);
    # locality is what matters: steps stay tiny and jumps are rare.
    steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
    if t % 2 == 0 and h % 2 == 0 and w % 2 == 0:
        assert np.all(steps == 1)
    else:
        assert steps.max() <= 4
        assert (steps > 1).mean() < 0.05


@pytest.mark.parametrize("t,h,w", GRIDS)
def test_mapping_pair_is_inverse(t, h, w):
    l2h, h2l = gilbert_mapping(t, h, w)
    n = t * h * w
    assert np.array_equal(l2h[h2l], np.arange(n))
    assert np.array_equal(h2l[l2h], np.arange(n))


def test_permutation_roundtrip_semantics():
    # tokens[h2l] puts the sequence in curve order; tokens_back[l2h] undoes it
    # (the reference applies hilbert_order then linear_to_hilbert,
    # scripts/main_hunyuan.py:88,183).
    t, h, w = 2, 4, 6
    l2h, h2l = gilbert_mapping(t, h, w)
    x = np.random.default_rng(0).normal(size=(t * h * w, 3))
    assert np.allclose(x[h2l][l2h], x)


@pytest.mark.parametrize("t,h,w", [(3, 4, 6), (2, 7, 5)])
def test_sliced_curve_bijective_and_framewise(t, h, w):
    l2h, h2l = sliced_gilbert_mapping(t, h, w)
    n = t * h * w
    assert np.array_equal(np.sort(l2h), np.arange(n))
    # Slice z occupies curve positions [z*h*w, (z+1)*h*w): time-major chaining.
    for z in range(t):
        sl = l2h[z * h * w:(z + 1) * h * w]
        assert sl.min() == z * h * w and sl.max() == (z + 1) * h * w - 1


def brute_force_neighbors(colors, num_blocks):
    t, h, w = colors.shape
    adj = np.zeros((num_blocks, num_blocks), dtype=bool)
    for z in range(t):
        for y in range(h):
            for x in range(w):
                c = colors[z, y, x]
                adj[c, c] = True
                for dz in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            nz, ny, nx = z + dz, y + dy, x + dx
                            if 0 <= nz < t and 0 <= ny < h and 0 <= nx < w:
                                adj[c, colors[nz, ny, nx]] = True
    return adj


@pytest.mark.parametrize("t,h,w,bs", [(2, 3, 5, 8), (4, 6, 8, 16)])
def test_neighbor_mask_matches_brute_force(t, h, w, bs):
    got = gilbert_block_neighbor_mask(t, h, w, block_size=bs)
    l2h, _ = gilbert_mapping(t, h, w)
    colors = (l2h // bs).reshape(t, h, w)
    nb = (t * h * w + bs - 1) // bs
    want = brute_force_neighbors(colors, nb)
    assert np.array_equal(got, want)
    # Adjacency is symmetric and reflexive.
    assert np.array_equal(got, got.T)
    assert got.diagonal().all()


def test_sliced_neighbor_mask_shape():
    m = sliced_gilbert_block_neighbor_mask(2, 4, 8, block_size=16)
    assert m.shape == (4, 4) and m.dtype == bool and m.diagonal().all()


def test_block_wise_mapping():
    lin2block, block_start = block_wise_mapping(4, 4, 8, block_size=(2, 2, 4))
    assert lin2block.shape == (128,)
    assert block_start.shape == (8,)
    # Each block contains exactly bt*bh*bw voxels.
    assert np.all(np.bincount(lin2block) == 16)


def test_cached_curve_roundtrip(tmp_path):
    a = cached_curve(2, 4, 8, block_size=16, cache_dir=str(tmp_path))
    b = cached_curve(2, 4, 8, block_size=16, cache_dir=str(tmp_path))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    # linear variant: identity permutation, empty neighbors
    l2h, h2l, nb = cached_curve(2, 4, 8, variant="linear", block_size=16)
    assert np.array_equal(l2h, np.arange(64))
    assert not nb.any()
