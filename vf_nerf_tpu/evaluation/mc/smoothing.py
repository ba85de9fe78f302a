"""3D Gaussian smoothing of vector-field grids.

Reference: ``evaluation/utils/guassian_smoothing.py:9-97`` — a product
Gaussian kernel applied as a depthwise conv3d with replicate padding;
pre-smooth k=3/σ=1, post-smooth k=9/σ=2 (``methods.py:213-221``).

Quirk reproduced: the reference kernel is ``exp(-((x-μ)/(2σ))²)`` — variance
2σ², twice as wide as a standard Gaussian.

The product kernel is exactly separable, so this applies three 1-D passes
(XLA-friendly; no 3-D conv materialization).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> np.ndarray:
    """The reference's per-axis kernel factor, self-normalized (a separable
    factorization of its normalized product kernel)."""
    x = np.arange(kernel_size, dtype=np.float32)
    mean = (kernel_size - 1) / 2.0
    k = np.exp(-(((x - mean) / (2.0 * sigma)) ** 2))
    return (k / k.sum()).astype(np.float32)


def _smooth_axis(grid: jnp.ndarray, kernel: jnp.ndarray,
                 axis: int) -> jnp.ndarray:
    """Replicate-padded 1-D correlation along ``axis`` of a (..., C) grid."""
    k = kernel.shape[0]
    pad = [(0, 0)] * grid.ndim
    pad[axis] = (k // 2, k // 2)
    padded = jnp.pad(grid, pad, mode="edge")
    moved = jnp.moveaxis(padded, axis, -1)
    out = jnp.zeros(moved.shape[:-1] + (moved.shape[-1] - k + 1,),
                    moved.dtype)
    for i in range(k):
        out = out + kernel[i] * moved[..., i:i + out.shape[-1]]
    return jnp.moveaxis(out, -1, axis)


def smooth_vf(vf: jnp.ndarray, k: int = 3, sigma: float = 1.0) -> jnp.ndarray:
    """Smooth a (N, N, N, 3) vector-field grid (reference ``smooth_vf``)."""
    kernel = jnp.asarray(gaussian_kernel_1d(k, sigma))
    out = vf
    for axis in range(3):
        out = _smooth_axis(out, kernel, axis)
    return out


def smooth_vf_np(vf: np.ndarray, k: int = 3, sigma: float = 1.0) -> np.ndarray:
    """Host numpy variant (scipy correlate1d with replicate padding)."""
    from scipy.ndimage import correlate1d
    kernel = gaussian_kernel_1d(k, sigma).astype(np.float64)
    out = vf.astype(np.float64)
    for axis in range(3):
        out = correlate1d(out, kernel, axis=axis, mode="nearest")
    return out.astype(np.float32)
