"""2D image metrics.

Reference: ``utils/utils.py:235-325`` — PSNR, SSIM with a uniform window
(C1=1e-4, C2=9e-4), LPIPS (vgg), and depth L1 in cm.

LPIPS here is an in-repo VGG16 forward (JAX, CPU) instead of the reference's
``lpips`` package dependency: it loads pretrained weights from a ``.npz``
(``tools/export_lpips_weights.py`` produces one in any online environment) and
``lpips_available()`` gates on that file existing. This makes the metric
runnable offline given only a weights file, where the reference needs a pip
package download at call time.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

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


# --- LPIPS (VGG16) --------------------------------------------------------
#
# Weight file format (npz): conv0_w..conv12_w (OIHW), conv0_b..conv12_b,
# lin0..lin4 (per-channel non-negative calibration weights at the five taps
# relu1_2/relu2_2/relu3_3/relu4_3/relu5_3). See tools/export_lpips_weights.py.

_LPIPS_ENV = "VF_NERF_LPIPS_WEIGHTS"
_LPIPS_DEFAULT = Path.home() / ".cache" / "vf_nerf_tpu" / "lpips_vgg.npz"
# VGG16 conv plan: (out_channels, tap_after?) per conv; maxpool between blocks.
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
               (512, 512, 512), (512, 512, 512))
# LPIPS input scaling layer constants (net input in [-1, 1]).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_weights_path(weights_path: Optional[str] = None) -> Path:
    return Path(weights_path or os.environ.get(_LPIPS_ENV) or _LPIPS_DEFAULT)


def lpips_available(weights_path: Optional[str] = None) -> bool:
    """True iff an LPIPS weights npz is present (arg > $VF_NERF_LPIPS_WEIGHTS
    > ~/.cache/vf_nerf_tpu/lpips_vgg.npz)."""
    return lpips_weights_path(weights_path).is_file()


def _lpips_forward(x: "np.ndarray", weights) -> list:
    """VGG16 feature taps for a (1, 3, H, W) input in [-1, 1]; returns the
    five channel-unit-normalized tap activations."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = (x - _LPIPS_SHIFT[None, :, None, None]) / _LPIPS_SCALE[None, :, None, None]
    h = jnp.asarray(h)
    taps = []
    conv_i = 0
    for b, block in enumerate(_VGG_BLOCKS):
        for _ in block:
            w = jnp.asarray(weights[f"conv{conv_i}_w"])
            bias = jnp.asarray(weights[f"conv{conv_i}_b"])
            h = lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)])
            h = jax.nn.relu(h + bias[None, :, None, None])
            conv_i += 1
        norm = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
        taps.append(h / (norm + 1e-10))
        if b < len(_VGG_BLOCKS) - 1:
            h = lax.reduce_window(h, -jnp.inf, lax.max,
                                  (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return taps


def get_lpips(prediction: np.ndarray, target: np.ndarray,
              net: str = "vgg", weights_path: Optional[str] = None) -> float:
    """LPIPS (reference ``utils.py:291-310``): VGG16 taps → channel-unit
    normalize → squared diff → per-channel linear calibration → spatial mean →
    sum over taps. Inputs are (H, W, 3) images in [0, 1]. Runs the in-repo JAX
    forward from a local weights npz; gate with :func:`lpips_available`."""
    if net != "vgg":
        raise ValueError("only the vgg variant is implemented (reference default)")
    path = lpips_weights_path(weights_path)
    if not path.is_file():
        raise RuntimeError(
            f"LPIPS weights not found at {path}; export them with "
            "tools/export_lpips_weights.py in an online environment and point "
            f"${_LPIPS_ENV} at the npz.")
    import jax.numpy as jnp

    weights = np.load(path)
    to_chw = lambda img: (np.asarray(img, np.float32)  # noqa: E731
                          .transpose(2, 0, 1)[None] - 0.5) / 0.5
    taps_p = _lpips_forward(to_chw(prediction), weights)
    taps_t = _lpips_forward(to_chw(target), weights)
    total = jnp.zeros(())
    for i, (fp, ft) in enumerate(zip(taps_p, taps_t)):
        lin = jnp.asarray(weights[f"lin{i}"])  # (C,)
        diff = (fp - ft) ** 2
        total = total + jnp.mean(
            jnp.sum(diff * lin[None, :, None, None], axis=1))
    return float(total)


def get_l1_cm(prediction: np.ndarray, target: np.ndarray) -> float:
    """Depth L1 in centimeters; inputs in meters (``utils.py:312-325``)."""
    return float(np.mean(np.abs(np.asarray(prediction) -
                                np.asarray(target))) * 100.0)
