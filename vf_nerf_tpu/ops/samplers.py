"""Depth (z) samplers along rays.

Reference: ``models/samplers/ray_sampler.py``. Three samplers:

- ``uniform_z_vals`` — stratified near→far linspace (``UniformSampler``,
  ``:95-142``); the coarse pass,
- ``range_fine_z_vals`` — the sampler the trained path actually uses
  (``RangeFineSampler``, ``:240-301``): lays N stratified samples in
  ``±range`` around the argmax of the coarse weights, *plus* N uniform-random
  depths over [near, far]; rays whose argmax is sample 0 get only the random
  extras,
- ``pdf_z_vals`` — classic NeRF inverse-CDF sampling (``FineSampler``,
  ``:145-237``; never instantiated by the reference, kept for parity).

All return sorted z values; callers turn them into points with
``points_from_z``. Randomness is explicit via JAX PRNG keys; pass
``perturb=False`` for the deterministic eval path
(``evaluation/evaluate.py:30``).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


def points_from_z(cam_loc: jnp.ndarray,
                  ray_dirs: jnp.ndarray,
                  z_vals: jnp.ndarray) -> jnp.ndarray:
    """points = cam + z · dir (reference ``ray_sampler.py:76-80``).

    :param cam_loc: (R, 3); :param ray_dirs: (R, 3) **unnormalized**
    directions (the reference marches along unnormalized dirs so z is depth
    along the camera axis); :param z_vals: (R, S).
    :return: (R, S, 3).
    """
    return cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]


def _stratify(key: jax.Array, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Jitter each sample inside its mid-point interval
    (reference ``ray_sampler.py:132-140``)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t


def uniform_z_vals(key: jax.Array,
                   n_rays: int,
                   n_samples: int,
                   near: Scalar,
                   far: Scalar,
                   perturb: bool = True,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Stratified uniform depths (reference ``UniformSampler.get_z_vals``).

    ``near``/``far`` may be scalars or per-ray (R,) / (R, 1) arrays
    (``far_per_ray`` support, ``ray_sampler.py:125-127``).
    """
    near = jnp.broadcast_to(jnp.asarray(near, dtype), (n_rays,))[:, None]
    far = jnp.broadcast_to(jnp.reshape(jnp.asarray(far, dtype), (-1,)),
                           (n_rays,))[:, None]
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)[None, :]
    z_vals = near * (1.0 - t) + far * t
    if perturb:
        z_vals = _stratify(key, z_vals)
    return z_vals


def range_fine_extra_z(key: jax.Array,
                       coarse_z_vals: jnp.ndarray,
                       coarse_weights: jnp.ndarray,
                       n_fine: int,
                       fine_range: float,
                       near: float,
                       far: float,
                       perturb: bool = True) -> jnp.ndarray:
    """The *new* depths the range-fine sampler adds per ray (unsorted):
    n_fine stratified depths in ``±fine_range`` around the coarse-weight
    argmax when the argmax is > 0, else n_fine uniform-random depths over
    [near, far] (reference ``RangeFineSampler.get_z_vals``,
    ``ray_sampler.py:276-300``)."""
    k_strat, k_rand = jax.random.split(key)
    dtype = coarse_z_vals.dtype
    n_rays = coarse_z_vals.shape[0]

    max_idx = jnp.argmax(coarse_weights, axis=-1)
    max_z = jnp.take_along_axis(coarse_z_vals, max_idx[:, None], axis=-1)

    # Evenly spaced window around the argmax depth (ray_sampler.py:284).
    offsets = (2.0 * fine_range / (n_fine - 1)) * jnp.arange(n_fine,
                                                             dtype=dtype)
    z_window = max_z - fine_range + offsets[None, :]
    if perturb:
        z_window = _stratify(k_strat, z_window)

    # Uniform-random extras over the full ray extent (ray_sampler.py:297).
    z_random = jax.random.uniform(k_rand, (n_rays, n_fine), dtype=dtype) \
        * (far - near) + near

    use_window = (max_idx > 0)[:, None]
    return jnp.where(use_window, z_window, z_random)


def range_fine_z_vals(key: jax.Array,
                      coarse_z_vals: jnp.ndarray,
                      coarse_weights: jnp.ndarray,
                      n_fine: int,
                      fine_range: float,
                      near: float,
                      far: float,
                      perturb: bool = True) -> jnp.ndarray:
    """Argmax-window fine sampling (reference ``RangeFineSampler.get_z_vals``,
    ``ray_sampler.py:264-301``).

    Returns (R, S_coarse + n_fine) sorted depths: the coarse depths plus the
    per-ray extras from ``range_fine_extra_z``. The either/or select replaces
    the reference's two sorts + boolean row assignment with one masked
    sort — same result, static shapes.
    """
    z_extra = range_fine_extra_z(key, coarse_z_vals, coarse_weights, n_fine,
                                 fine_range, near, far, perturb)
    return jnp.sort(jnp.concatenate([coarse_z_vals, z_extra], axis=-1),
                    axis=-1)


def sample_pdf(key: jax.Array,
               bins: jnp.ndarray,
               weights: jnp.ndarray,
               n_samples: int,
               deterministic: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling (reference ``FineSampler.sample_pdf``,
    ``ray_sampler.py:163-214``; classic nerf-pytorch helper)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if deterministic:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,),
                               dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1),
                                 axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1),
                                 axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return jax.lax.stop_gradient(bins_b + t * (bins_a - bins_b))


def pdf_z_vals(key: jax.Array,
               coarse_z_vals: jnp.ndarray,
               coarse_weights: jnp.ndarray,
               n_samples: int,
               deterministic: bool = False) -> jnp.ndarray:
    """Classic NeRF fine depths (reference ``FineSampler.get_z_vals``,
    ``ray_sampler.py:216-237``)."""
    mids = 0.5 * (coarse_z_vals[..., 1:] + coarse_z_vals[..., :-1])
    z_new = sample_pdf(key, mids, coarse_weights[..., 1:-1], n_samples,
                       deterministic)
    return jnp.sort(jnp.concatenate([coarse_z_vals, z_new], axis=-1), axis=-1)
