"""Native (C++) curve walker parity with the pure-Python implementation."""

import numpy as np
import pytest

from rectified_spaattn_tpu.curves import native, gilbert as G


@pytest.mark.skipif(not native.available(),
                    reason="native gilbert library unavailable")
@pytest.mark.parametrize("w,h,t,ao", [
    (6, 4, 2, ("w", "h", "t")),
    (33, 12, 4, ("w", "h", "t")),
    (5, 7, 9, ("t", "h", "w")),
    (8, 16, 16, None),
])
def test_native_path_matches_python(w, h, t, ao, monkeypatch):
    got = native.gilbert3d_path(w, h, t, ao)
    monkeypatch.setattr(native, "available", lambda: False)
    want = G.gilbert3d_path(w, h, t, axis_order=ao)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(),
                    reason="native gilbert library unavailable")
def test_native_neighbors_match_python(monkeypatch):
    t, h, w, bs = 4, 6, 8, 16
    l2h, _ = G.gilbert_mapping(t, h, w)
    colors = (l2h // bs).reshape(t, h, w)
    nb = (t * h * w + bs - 1) // bs
    got = native.block_neighbors(colors, nb)
    monkeypatch.setattr(native, "available", lambda: False)
    want = G._neighbor_mask_from_colors(colors, nb)
    np.testing.assert_array_equal(got, want)
