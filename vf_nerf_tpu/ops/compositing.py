"""Volume-rendering weight computation and compositing.

Reference: ``utils/rendering.py:98-168``. Two weight modes:

- ``volsdf``: transmittance from the cumulative sum of *shifted* free energy
  (``volsdf_volume_rendering``, ``rendering.py:122-148``) — the default and
  the trained path (``confs/vf_nerf.conf:66``),
- ``nerf``: cumprod form (``nerf_volume_rendering``, ``rendering.py:98-119``).
  NOTE: the reference declares it ``(sigma, z_vals)`` but calls it
  ``(z_vals, density)`` (``models/nerf/vector_field_nerf.py:271,310-312``), so
  its "nerf" mode is latently broken; here both functions take
  ``(z_vals, density)`` so the mode actually works.

The last inter-sample distance is 1e10, making the final alpha saturate when
its density is non-zero (the VF pipeline forces the last density to 0, see
``models/nerf/vector_field_nerf.py:471-472``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_LAST_DIST = 1e10


def _dists(z_vals: jnp.ndarray) -> jnp.ndarray:
    d = z_vals[:, 1:] - z_vals[:, :-1]
    last = jnp.full((z_vals.shape[0], 1), _LAST_DIST, dtype=z_vals.dtype)
    return jnp.concatenate([d, last], axis=-1)


def volsdf_volume_rendering(z_vals: jnp.ndarray,
                            density: jnp.ndarray,
                            normalize: bool = True) -> jnp.ndarray:
    """Alpha · transmittance weights, VolSDF form (reference ``:122-148``).

    :param z_vals: (R, S) sorted sample depths.
    :param density: (R, S) per-sample densities.
    :param normalize: divide by (sum + 1e-5) per ray.
    :return: (R, S) compositing weights.
    """
    dists = _dists(z_vals)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros((dists.shape[0], 1), dists.dtype), free_energy[:, :-1]],
        axis=-1)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    alpha = 1.0 - jnp.exp(-free_energy)
    weights = alpha * transmittance
    if normalize:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-5)
    return weights


def nerf_volume_rendering(z_vals: jnp.ndarray,
                          density: jnp.ndarray,
                          normalize: bool = False) -> jnp.ndarray:
    """Cumprod-form weights (reference ``:98-119``, argument order fixed)."""
    dists = _dists(z_vals)
    free_energy = dists * density
    alpha = 1.0 - jnp.exp(-free_energy)
    weights = alpha * jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    if normalize:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-5)
    return weights


def composite_rgb_depth(weights: jnp.ndarray,
                        rgb: jnp.ndarray,
                        z_vals: jnp.ndarray,
                        white_background: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted sums → per-ray rgb + depth (reference ``:151-168``).

    :param weights: (R, S).
    :param rgb: (R, S, 3) per-sample colors.
    :param z_vals: (R, S).
    :return: (rgb (R, 3), depth (R,)).
    """
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    if white_background:
        rgb_map = rgb_map + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    return rgb_map, depth_map
