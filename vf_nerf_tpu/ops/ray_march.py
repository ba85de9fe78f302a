"""Fused Pallas ray-march: window-cosine → Laplace density → compositing.

The post-MLP per-ray pipeline (reference ``VectorFieldNerf.get_density``
``models/nerf/vector_field_nerf.py:442-474`` + ``volsdf_volume_rendering``
``utils/rendering.py:122-148`` + ``get_rgb_and_depth`` ``:151-168``) fused
into ONE ``pallas_call``: the (rays × samples) field tensors are loaded into
VMEM once and every intermediate (windowed cosines, densities, transmittance,
weights) lives on-chip. The XLA path materializes several (R, S) HBM
round-trips between these stages; here HBM traffic is exactly inputs + the
three outputs.

Layout: rays on the sublane axis, samples on the lane axis — the 11-tap
window becomes lane shifts, the transmittance cumsum a log-step lane scan.
Shifts use static concatenation (not circular roll) so the kernel also runs
under the Pallas interpreter on CPU, where the test suite checks it
bit-close against the XLA ops it fuses.

Semantics are the quirk-reproducing ones of ``ops/window.py`` /
``models/renderer.get_density``:

- interior lanes ``[start, L-start)`` windowed, edges keep raw cosine;
- centre tap signed-normalized, neighbour taps ``|w|``;
- back-face suppression where ``cos(n, d) < th`` AND windowed cos < 0;
- σ at the last sample forced to 0; last inter-sample distance 1e10;
- optional per-ray weight normalization (+1e-5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vf_nerf_tpu.ops.density import (DensityParams, get_beta, get_mean,
                                     get_scale, laplace_cdf)

_EPS = 1e-8        # torch F.cosine_similarity eps (ops/window.py)
_LAST_DIST = 1e10  # ops/compositing.py


def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """lane j ← x[j + k] (zero-fill at the tail); k static."""
    if k == 0:
        return x
    pad = jnp.zeros((x.shape[0], k), x.dtype)
    return jnp.concatenate([x[:, k:], pad], axis=1)


def _shift_down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """lane j ← x[j - k] (zero-fill at the head); k static."""
    if k == 0:
        return x
    pad = jnp.zeros((x.shape[0], k), x.dtype)
    return jnp.concatenate([pad, x[:, :-k]], axis=1)


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the lane axis (log-step scan)."""
    n = x.shape[1]
    k = 1
    while k < n:
        x = x + _shift_down(x, k)
        k *= 2
    return x


def _ray_march_kernel(coef_ref, scal_ref, nx, ny, nz, dx, dy, dz,
                      cr, cg, cb, zv, rgb_out, depth_out, w_out,
                      *, n_samples: int, n_taps: int, normalize: bool,
                      white_background: bool):
    """One ray block: (B, S_pad) planes in, (B, ·) composited outputs out.

    coef_ref: (1, n_taps) normalized window tap coefficients
              (centre signed, neighbours |·|, all ÷ Σ|w|).
    scal_ref: (1, 5) [beta, scale, mean, cdf_cutoff, dir_to_normal_th].
    """
    f32 = jnp.float32
    beta, scale, mean = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]
    cdf_cutoff, th = scal_ref[0, 3], scal_ref[0, 4]

    x, y, z, zvals = nx[:], ny[:], nz[:], zv[:]
    b, s_pad = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, s_pad), 1)
    n_cos = n_samples - 1  # length of the consecutive-cosine array

    norm = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), _EPS)

    def cos_at_offset(k: int) -> jnp.ndarray:
        """cos(n[j], n[j+k]) per lane j (invalid near the tail, masked by
        the callers' lane predicates)."""
        sx, sy, sz, sn = (_shift_up(a, k) for a in (x, y, z, norm))
        dot = x * sx + y * sy + z * sz
        return dot / (norm * jnp.maximum(sn, _EPS))

    # Raw consecutive cosine cs[j] = cos(n[j], n[j+1]).
    cs = cos_at_offset(1)

    # Windowed interior [start, hi): acc = Σ taps (ops/window.py:54-74).
    start = (n_taps + 1) // 2 + 1
    middle = (n_taps - 1) // 2
    hi = n_cos - start
    if hi > start:
        acc = cs * coef_ref[0, middle]
        for i in range(1, start - 1):
            # forward tap: cos(n[j], n[j+1+i]); backward tap cos(n[j], n[j-i])
            # = cos(n[j-i], n[j]) by symmetry = cos_at_offset(i) shifted down.
            fwd = cos_at_offset(i + 1)
            bwd = _shift_down(cos_at_offset(i), i)
            acc = acc + fwd * coef_ref[0, middle + i] \
                      + bwd * coef_ref[0, middle - i]
        interior = jnp.logical_and(lane >= start, lane < hi)
        cos = jnp.where(interior, acc, cs)
    else:
        cos = cs

    # cos(normal, ray dir): dirs are per-ray (B, 1) columns.
    dxx, dyy, dzz = dx[:], dy[:], dz[:]
    dnorm = jnp.maximum(jnp.sqrt(dxx * dxx + dyy * dyy + dzz * dzz), _EPS)
    cos_ray = (x * dxx + y * dyy + z * dzz) / (norm * dnorm)

    # Laplace CDF density (ops/density.py laplace_density, cdf at cutoff
    # precomputed on the host side of the call).
    centered = -cos - mean
    cdf = scale * (0.5 + 0.5 * jnp.sign(centered) *
                   (1.0 - jnp.exp(-jnp.abs(centered) / beta)))
    sigma = jnp.maximum(cdf - cdf_cutoff, 0.0)

    suppress = jnp.logical_and(cos_ray < th, cos < 0.0)
    sigma = jnp.where(suppress, f32(0.0), sigma)
    # σ_last = 0, and zero the padding lanes (≥ n_cos).
    sigma = jnp.where(lane >= n_cos, f32(0.0), sigma)

    # VolSDF weights: dists (last 1e10), shifted-free-energy transmittance.
    dists = _shift_up(zvals, 1) - zvals
    dists = jnp.where(lane == n_samples - 1, f32(_LAST_DIST), dists)
    dists = jnp.where(lane >= n_samples, f32(0.0), dists)
    free_energy = dists * sigma
    shifted = _shift_down(free_energy, 1)
    transmittance = jnp.exp(-_cumsum_lanes(shifted))
    alpha = 1.0 - jnp.exp(-free_energy)
    weights = alpha * transmittance
    if normalize:
        weights = weights / (jnp.sum(weights, axis=1, keepdims=True) + 1e-5)

    r = jnp.sum(weights * cr[:], axis=1)
    g = jnp.sum(weights * cg[:], axis=1)
    bl = jnp.sum(weights * cb[:], axis=1)
    if white_background:
        acc_w = jnp.sum(weights, axis=1)
        r, g, bl = r + (1.0 - acc_w), g + (1.0 - acc_w), bl + (1.0 - acc_w)
    rgb_out[:] = jnp.stack([r, g, bl], axis=1)
    depth_out[:] = jnp.sum(weights * zvals, axis=1)[:, None]
    w_out[:] = weights


def fused_ray_march(normals: jnp.ndarray,
                    ray_dirs: jnp.ndarray,
                    z_vals: jnp.ndarray,
                    rgb_samples: jnp.ndarray,
                    density_params: DensityParams,
                    window_weights: jnp.ndarray,
                    *,
                    beta_bounds: Tuple[float, float],
                    scale_min: float,
                    mean_bounds: Tuple[float, float],
                    cutoff: float,
                    dir_to_normal_th: float,
                    normalize: bool,
                    white_background: bool = False,
                    block_rays: int = 256,
                    interpret: bool | None = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused window-cos → density → VolSDF weights → composite.

    :param normals: (R, S, 3) field samples; ``ray_dirs`` (R, 3) unit dirs;
        ``z_vals`` (R, S); ``rgb_samples`` (R, S, 3).
    :param window_weights: (W,) tap weights (annealed or uniform — callers
        pass whatever ``get_density`` would use).
    :return: (rgb (R, 3), depth (R,), weights (R, S)) — identical math to
        ``models/renderer.get_density`` + ``ops/compositing`` volsdf path.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_rays, n_samples = z_vals.shape
    f32 = jnp.float32

    # Host-side (traced, cheap) scalar prep: clamped density params and the
    # CDF truncation point.
    beta = get_beta(density_params, beta_bounds).astype(f32)
    scale = get_scale(density_params, scale_min).astype(f32)
    mean = get_mean(density_params, mean_bounds).astype(f32)
    cdf_cutoff = laplace_cdf(jnp.asarray(cutoff, f32), beta, scale, mean)
    scalars = jnp.stack([beta, scale, mean, cdf_cutoff,
                         jnp.asarray(dir_to_normal_th, f32)]).reshape(1, 5)

    # Normalized tap coefficients (centre signed, neighbours |·|).
    w = window_weights.astype(f32)
    middle = (w.shape[0] - 1) // 2
    normalizer = jnp.sum(jnp.abs(w))
    coefs = jnp.abs(w).at[middle].set(w[middle]) / normalizer
    coefs = coefs.reshape(1, -1)

    # Pad rays to the block size and samples to the lane width.
    s_pad = max(128, int(np.ceil(n_samples / 128)) * 128)
    r_pad = int(np.ceil(n_rays / block_rays)) * block_rays

    def plane(a, fill=0.0):
        out = jnp.full((r_pad, s_pad), fill, f32)
        return out.at[:n_rays, :n_samples].set(a)

    nx, ny, nz = (plane(normals[..., i]) for i in range(3))
    cr, cg, cb = (plane(rgb_samples[..., i]) for i in range(3))
    zv = plane(z_vals)
    dcol = jnp.zeros((r_pad, 1), f32)
    dx, dy, dz = (dcol.at[:n_rays, 0].set(ray_dirs[:, i]) for i in range(3))

    grid = (r_pad // block_rays,)
    row_spec = lambda cols: pl.BlockSpec(  # noqa: E731
        (block_rays, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = lambda cols: pl.BlockSpec(  # noqa: E731
        (1, cols), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _ray_march_kernel, n_samples=n_samples,
        n_taps=int(window_weights.shape[0]), normalize=normalize,
        white_background=white_background)

    rgb, depth, weights = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(coefs.shape[1]), smem(5),
                  row_spec(s_pad), row_spec(s_pad), row_spec(s_pad),
                  row_spec(1), row_spec(1), row_spec(1),
                  row_spec(s_pad), row_spec(s_pad), row_spec(s_pad),
                  row_spec(s_pad)],
        out_specs=(row_spec(3), row_spec(1), row_spec(s_pad)),
        out_shape=(jax.ShapeDtypeStruct((r_pad, 3), f32),
                   jax.ShapeDtypeStruct((r_pad, 1), f32),
                   jax.ShapeDtypeStruct((r_pad, s_pad), f32)),
        interpret=interpret,
    )(coefs, scalars, nx, ny, nz, dx, dy, dz, cr, cg, cb, zv)

    return (rgb[:n_rays], depth[:n_rays, 0],
            weights[:n_rays, :n_samples])


def ray_march_reference(normals, ray_dirs, z_vals, rgb_samples,
                        density_params, window_weights, *, beta_bounds,
                        scale_min, mean_bounds, cutoff, dir_to_normal_th,
                        normalize, white_background=False):
    """The exact XLA op chain the kernel fuses (correctness oracle)."""
    from vf_nerf_tpu.ops import compositing
    from vf_nerf_tpu.ops.density import laplace_density
    from vf_nerf_tpu.ops.window import (cosine_similarity,
                                        window_cosine_similarity)

    n_samples = z_vals.shape[1]
    dirs_rep = jnp.repeat(ray_dirs[:, None, :], n_samples, axis=1)
    cos = window_cosine_similarity(normals[:, :-1], normals[:, 1:],
                                   window_weights)
    cos_ray = cosine_similarity(normals[:, :-1], dirs_rep[:, :-1])
    sigma = laplace_density(-cos, density_params, beta_bounds, scale_min,
                            mean_bounds, cutoff=cutoff)
    suppress = jnp.logical_and(cos_ray < dir_to_normal_th, cos < 0.0)
    sigma = jnp.where(suppress, 0.0, sigma)
    sigma = jnp.concatenate(
        [sigma, jnp.zeros((sigma.shape[0], 1), sigma.dtype)], axis=-1)
    weights = compositing.volsdf_volume_rendering(z_vals, sigma, normalize)
    rgb, depth = compositing.composite_rgb_depth(
        weights, rgb_samples, z_vals, white_background=white_background)
    return rgb, depth, weights
