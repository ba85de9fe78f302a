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


def _column_uniform(key: jax.Array, n_rays: int, n_cols: int,
                    dtype) -> jnp.ndarray:
    """(R, C) uniforms whose column streams are keyed by
    ``fold_in(key, col)`` — independent of the static column count, so a
    wider array's first k columns equal a width-k array's columns (the
    static fine-growth equality contract)."""
    keys = jax.vmap(lambda j: jax.random.fold_in(key, j))(
        jnp.arange(n_cols))
    return jax.vmap(lambda k: jax.random.uniform(k, (n_rays,),
                                                 dtype=dtype))(keys).T


def _stratify_fine(key: jax.Array, z_vals: jnp.ndarray,
                   n_active=None) -> jnp.ndarray:
    """Mid-point-interval jitter for the fine window with column-keyed
    draws (same semantics as :func:`_stratify`; same distribution,
    column-stable stream). With ``n_active`` the last LIVE column gets the
    dynamic array's boundary bounds (its own value as the upper bound, as
    if the array ended there), so live columns are bit-equal to a
    width-``n_active`` stratify."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    if n_active is not None:
        col = jnp.arange(z_vals.shape[-1])[None, :]
        upper = jnp.where(col == n_active - 1, z_vals, upper)
    t = _column_uniform(key, z_vals.shape[0], z_vals.shape[-1],
                        z_vals.dtype)
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
                       perturb: bool = True,
                       n_active: Union[jnp.ndarray, None] = None
                       ) -> jnp.ndarray:
    """The *new* depths the range-fine sampler adds per ray (unsorted):
    n_fine stratified depths in ``±fine_range`` around the coarse-weight
    argmax when the argmax is > 0, else n_fine uniform-random depths over
    [near, far] (reference ``RangeFineSampler.get_z_vals``,
    ``ray_sampler.py:276-300``).

    ``n_active`` (optional traced scalar ≤ n_fine) enables the static
    fine-growth mode: the array stays at the static ``n_fine`` width but
    only the first ``n_active`` depths are live — columns ≥ ``n_active``
    are pinned to ``far`` so they sort to the ray tail, where the renderer
    masks them to zero density (one compiled program serves every +5
    growth stage instead of one re-jit per stage). The live columns carry
    the same *values* a dynamic ``n_fine=n_active`` draw would produce for
    the deterministic (perturb=False) path; under perturb the jitter/random
    draws come from a (R, n_fine)-shaped stream instead of (R, n_active) —
    same distribution, different stream (documented in PARITY.md)."""
    k_strat, k_rand = jax.random.split(key)
    dtype = coarse_z_vals.dtype
    n_rays = coarse_z_vals.shape[0]

    max_idx = jnp.argmax(coarse_weights, axis=-1)
    max_z = jnp.take_along_axis(coarse_z_vals, max_idx[:, None], axis=-1)

    # Evenly spaced window around the argmax depth (ray_sampler.py:284).
    # With n_active, the spacing uses the LIVE count so live columns match
    # the dynamic draw exactly.
    denom = (jnp.maximum(n_active - 1, 1).astype(dtype)
             if n_active is not None else jnp.asarray(n_fine - 1, dtype))
    offsets = (2.0 * fine_range / denom) * jnp.arange(n_fine, dtype=dtype)
    z_window = max_z - fine_range + offsets[None, :]
    if perturb:
        z_window = _stratify_fine(k_strat, z_window, n_active)

    # Uniform-random extras over the full ray extent (ray_sampler.py:297).
    # Column-keyed draws (fold_in(key, column)) so the per-column streams do
    # not depend on the static width — a width-n_fine draw's first k columns
    # equal a width-k draw's columns, which makes the static fine-growth
    # mode bit-equal to the per-stage dynamic program on EVERY ray
    # (including the argmax-0 random-extras quirk rays). Same distribution
    # as one (R, n_fine) block draw.
    z_random = _column_uniform(k_rand, n_rays, n_fine, dtype) \
        * (far - near) + near

    use_window = (max_idx > 0)[:, None]
    z_extra = jnp.where(use_window, z_window, z_random)
    if n_active is not None:
        # Pad depth strictly beyond any live sample (the argmax window is
        # unclipped, so live fine depths can reach far + fine_range): pads
        # always sort to the ray tail, where the renderer masks σ to 0.
        pad_z = jnp.asarray(far + 2.0 * fine_range + 1.0, dtype)
        pad = jnp.arange(n_fine)[None, :] >= n_active
        z_extra = jnp.where(pad, pad_z, z_extra)
    return z_extra


def range_fine_z_vals(key: jax.Array,
                      coarse_z_vals: jnp.ndarray,
                      coarse_weights: jnp.ndarray,
                      n_fine: int,
                      fine_range: float,
                      near: float,
                      far: float,
                      perturb: bool = True,
                      n_active: Union[jnp.ndarray, None] = None
                      ) -> jnp.ndarray:
    """Argmax-window fine sampling (reference ``RangeFineSampler.get_z_vals``,
    ``ray_sampler.py:264-301``).

    Returns (R, S_coarse + n_fine) sorted depths: the coarse depths plus the
    per-ray extras from ``range_fine_extra_z``. The either/or select replaces
    the reference's two sorts + boolean row assignment with one masked
    sort — same result, static shapes. With ``n_active`` (static fine-growth
    mode) the trailing ``n_fine - n_active`` sorted positions are
    beyond-``far`` pad depths.
    """
    z_extra = range_fine_extra_z(key, coarse_z_vals, coarse_weights, n_fine,
                                 fine_range, near, far, perturb,
                                 n_active=n_active)
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
