"""2D image metrics.

Reference: ``utils/utils.py:235-325`` — PSNR, SSIM with a uniform window
(C1=1e-4, C2=9e-4), LPIPS (vgg), and depth L1 in cm. LPIPS requires the
``lpips`` package + pretrained VGG weights (zero-egress image: unavailable) —
it raises a clear error unless the package is importable.
"""

from __future__ import annotations

import numpy as np


def get_psnr(prediction: np.ndarray, target: np.ndarray) -> float:
    """-10·log10(MSE) over [0,1] images (reference ``utils.py:235-245``)."""
    mse = float(np.mean((np.asarray(prediction, np.float32) -
                         np.asarray(target, np.float32)) ** 2))
    if mse == 0:
        return float("inf")
    return -10.0 * float(np.log10(mse))


def _uniform_filter2d(img: np.ndarray, window: int) -> np.ndarray:
    """Same-padded uniform box filter per channel ((H, W, C) arrays), matching
    torch ``conv2d(padding=window//2)`` with an all-ones normalized kernel."""
    from scipy.ndimage import uniform_filter
    pad = window // 2
    out = np.empty_like(img, dtype=np.float64)
    for c in range(img.shape[2]):
        # conv2d with zero padding == uniform_filter on a zero-padded array
        padded = np.pad(img[..., c], pad, mode="constant")
        filtered = uniform_filter(padded, size=window, mode="constant")
        out[..., c] = filtered[pad:-pad, pad:-pad] if pad else filtered
    return out


def get_ssim(prediction: np.ndarray, target: np.ndarray,
             window_size: int = 11, c1: float = 1e-4,
             c2: float = 9e-4) -> float:
    """SSIM with a uniform window (reference ``utils.py:248-289``)."""
    p = np.asarray(prediction, np.float64)
    t = np.asarray(target, np.float64)
    mu1 = _uniform_filter2d(p, window_size)
    mu2 = _uniform_filter2d(t, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _uniform_filter2d(p * p, window_size) - mu1_sq
    sigma2_sq = _uniform_filter2d(t * t, window_size) - mu2_sq
    sigma12 = _uniform_filter2d(p * t, window_size) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def get_lpips(prediction: np.ndarray, target: np.ndarray,
              net: str = "vgg") -> float:
    """LPIPS (reference ``utils.py:291-310``); needs the ``lpips`` package
    and pretrained weights — unavailable offline."""
    try:
        import lpips  # type: ignore
        import torch
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "LPIPS requires the `lpips` package with pretrained VGG weights, "
            "which are not available in this offline environment.") from exc
    to_t = lambda x: torch.from_numpy(  # noqa: E731
        (np.asarray(x, np.float32).transpose(2, 0, 1) - 0.5) / 0.5)[None]
    return float(lpips.LPIPS(net=net)(to_t(prediction), to_t(target)).item())


def get_l1_cm(prediction: np.ndarray, target: np.ndarray) -> float:
    """Depth L1 in centimeters; inputs in meters (``utils.py:312-325``)."""
    return float(np.mean(np.abs(np.asarray(prediction) -
                                np.asarray(target))) * 100.0)
