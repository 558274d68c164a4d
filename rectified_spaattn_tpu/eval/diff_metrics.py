"""Dense-vs-sparse reference-parity metrics
(reference: eval/image/evaluation/eval_image_diff.py:22-69).

The reference's closest thing to a functional test: compare sparse-mode
outputs against dense outputs of the same seed via SSIM / PSNR / cosine /
relative-L1 / RMSE (LPIPS needs a torch VGG — provided behind a
feature gate).  All metrics are pure NumPy; inputs are [..., H, W, C]
float images/frames in [0, 1] or [-1, 1].
"""

from __future__ import annotations

import numpy as np


def _to01(x):
    x = np.asarray(x, np.float64)
    if x.min() < -0.01:
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


def rmse(a, b) -> float:
    a, b = _to01(a), _to01(b)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a, b) -> float:
    m = rmse(a, b) ** 2
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / m))


def relative_l1(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).sum() / (np.abs(b).sum() + 1e-12))


def cosine_similarity(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def ssim(a, b, window: int = 7) -> float:
    """Mean local SSIM with a uniform window (channel-averaged)."""
    a, b = _to01(a), _to01(b)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def box(x):
        # separable uniform filter over the two spatial dims
        from numpy.lib.stride_tricks import sliding_window_view
        w = window
        pad = [(0, 0)] * x.ndim
        pad[-3] = pad[-2] = (w // 2, w // 2)
        xp = np.pad(x, pad, mode="edge")
        win = sliding_window_view(xp, (w, w), axis=(-3, -2))
        return win.mean(axis=(-2, -1))

    mu_a, mu_b = box(a), box(b)
    var_a = box(a * a) - mu_a ** 2
    var_b = box(b * b) - mu_b ** 2
    cov = box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def lpips(a, b) -> float | None:
    """Learned perceptual distance; requires the optional ``lpips``
    package + torch weights.  Returns None when unavailable (the harness
    reports the metric as skipped rather than failing)."""
    try:
        import torch
        import lpips as lpips_pkg
    except Exception:
        return None
    net = lpips_pkg.LPIPS(net="vgg")
    ta = torch.from_numpy(_to01(a)).float().permute(2, 0, 1)[None] * 2 - 1
    tb = torch.from_numpy(_to01(b)).float().permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(net(ta, tb))


def evaluate_pair(sparse_out, dense_out) -> dict:
    """All reference diff metrics for one (sparse, dense) sample pair."""
    out = {
        "ssim": ssim(sparse_out, dense_out),
        "psnr": psnr(sparse_out, dense_out),
        "cosine": cosine_similarity(sparse_out, dense_out),
        "relative_l1": relative_l1(sparse_out, dense_out),
        "rmse": rmse(sparse_out, dense_out),
    }
    lp = lpips(sparse_out, dense_out)
    if lp is not None:
        out["lpips"] = lp
    return out
