"""Point samplers and border/centre VF supervision targets.

Reference: ``models/samplers/sampler.py`` (sphere/shell/box samplers) and
``models/helpers/functions.py:75-157`` (border/centre GT extraction from ray
samples + shell-sampled supervision points).

TPU-shaped deviation from the reference: the GT-extraction functions return a
*(mask, gt)* pair over the full (R, S) sample grid instead of boolean-gathered
(dynamic-shape) arrays — the loss computes a masked MSE, which equals the
reference's MSE over the gathered subset exactly, with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vf_nerf_tpu.ops.rays import normalize


def sphere_shell_sample(key: jax.Array,
                        n_samples: int,
                        r_max: float,
                        r_min: float = 0.0,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Uniform points in the shell ``r_min <= r <= r_max`` (cube-root radial
    density; reference ``SphereSampler.sample``, ``sampler.py:160-193``)."""
    k_phi, k_cos, k_u = jax.random.split(key, 3)
    phi = jax.random.uniform(k_phi, (n_samples,), dtype, 0.0, 2.0 * jnp.pi)
    cos_theta = jax.random.uniform(k_cos, (n_samples,), dtype, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
    u = jax.random.uniform(k_u, (n_samples,), dtype)
    r = jnp.cbrt(u) * (r_max - r_min) + r_min
    return jnp.stack([r * sin_theta * jnp.cos(phi),
                      r * sin_theta * jnp.sin(phi),
                      r * cos_theta], axis=1)


def unit_sphere_sample(key: jax.Array, n_samples: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Uniform points in the unit ball (reference ``UniformSphereSampler``,
    ``sampler.py:124-157``)."""
    return sphere_shell_sample(key, n_samples, r_max=1.0, r_min=0.0,
                               dtype=dtype)


def box_sample(key: jax.Array,
               n_samples: int,
               min_bounds: jnp.ndarray,
               max_bounds: jnp.ndarray) -> jnp.ndarray:
    """Uniform points in an axis-aligned box (reference ``UniformSampler``,
    ``sampler.py:44-90``)."""
    u = jax.random.uniform(key, (n_samples, 3), dtype=min_bounds.dtype)
    return u * (max_bounds - min_bounds) + min_bounds


def unit_vector_sample(key: jax.Array, n_samples: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Random unit vectors (reference ``UnitVectorSampler``,
    ``sampler.py:93-121``; kept quirk: components sampled from U[0, 1], so the
    vectors cover only the positive octant, as in the reference)."""
    v = jax.random.uniform(key, (n_samples, 3), dtype)
    return normalize(v, axis=1)


def sample_border_points(key: jax.Array,
                         r_min: float,
                         r_max: float,
                         n_samples: int,
                         centroid: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shell points near the scene border; GT field points inward
    (reference ``functions.py:99-116``)."""
    points = sphere_shell_sample(key, n_samples, r_max=r_max,
                                 r_min=r_min) + centroid
    gt = normalize(centroid - points, axis=1)
    return points, gt


def sample_center_points(key: jax.Array,
                         centroid: jnp.ndarray,
                         radius: float,
                         n_samples: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ball points around the centroid; GT field points outward
    (reference ``functions.py:118-133``)."""
    points = sphere_shell_sample(key, n_samples, r_max=radius,
                                 r_min=0.0) + centroid
    gt = normalize(points - centroid, axis=1)
    return points, gt


def border_mask_and_gt(points: jnp.ndarray,
                       far: float,
                       radius: float,
                       centroid: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray samples beyond ``far/2 - radius`` of the centroid supervise the
    field to point inward (reference ``get_border_indices_and_gt``,
    ``functions.py:75-97``; masked form).

    :param points: (R, S, 3) ray sample positions.
    :return: (mask (R, S) bool, gt (R, S, 3) inward unit vectors).
    """
    distances = jnp.linalg.norm(points - centroid, axis=2)
    mask = distances > (far / 2.0 - radius)
    gt = normalize(centroid - points, axis=2)
    return mask, gt


def center_mask_and_gt(points: jnp.ndarray,
                       centroid: jnp.ndarray,
                       radius: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray samples within ``radius`` of the centroid supervise the field to
    point outward (reference ``get_center_indices_and_gt``,
    ``functions.py:136-157``; masked form)."""
    distances = jnp.linalg.norm(points - centroid, axis=2)
    mask = distances < radius
    gt = normalize(points - centroid, axis=2)
    return mask, gt
