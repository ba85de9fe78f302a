"""Cosine-similarity → density via a scaled, truncated Laplace CDF.

Reference: ``models/helpers/density_functions.py:111-204`` (``LaplaceDensity``,
the only density the training path uses). The three scalars (beta, scale,
mean) are *learned* parameters, clamped through the getters below before use;
the clamps match the reference exactly:

- beta  → clip to ``beta_bounds``                       (``:169-177``)
- scale → ``max(|scale|, scale_min)``                   (``:186-195``)
- mean  → clip to ``mean_bounds``                       (``:197-204``)

``laplace_density(x)`` = ``relu(cdf(x) - cdf(cutoff))`` where
``cdf(x) = scale * (0.5 + 0.5*sign(x-mean)*(1-exp(-|x-mean|/beta)))``
(``:129-167``). Inputs are the *negated* windowed cosine similarities, so a
sign flip of the field along a ray (cos ≈ -1 → input ≈ +1) yields maximum
density.

Alternate densities the reference defines but never uses in the training path
(SdfDensity / SimpleDensity / ExponentialDensity / SigmoidDensity) are provided
for capability parity.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp


class DensityParams(NamedTuple):
    """Learned density scalars — a leaf pytree so optax can train them."""

    beta: jnp.ndarray
    scale: jnp.ndarray
    mean: jnp.ndarray


def init_density_params(params_init: Dict[str, float],
                        dtype=jnp.float32) -> DensityParams:
    return DensityParams(beta=jnp.asarray(params_init["beta"], dtype),
                         scale=jnp.asarray(params_init["scale"], dtype),
                         mean=jnp.asarray(params_init["mean"], dtype))


def get_beta(params: DensityParams,
             beta_bounds: Tuple[float, float]) -> jnp.ndarray:
    return jnp.clip(params.beta, beta_bounds[0], beta_bounds[1])


def get_scale(params: DensityParams, scale_min: float) -> jnp.ndarray:
    return jnp.maximum(jnp.abs(params.scale), scale_min)


def get_mean(params: DensityParams,
             mean_bounds: Tuple[float, float]) -> jnp.ndarray:
    return jnp.clip(params.mean, mean_bounds[0], mean_bounds[1])


def laplace_cdf(x: jnp.ndarray,
                beta: jnp.ndarray,
                scale: jnp.ndarray,
                mean: jnp.ndarray) -> jnp.ndarray:
    """``scale * LaplaceCDF((x - mean) / beta)``; reference ``:153-167``."""
    centered = x - mean
    cdf = 0.5 + 0.5 * jnp.sign(centered) * (1.0 - jnp.exp(-jnp.abs(centered) / beta))
    return scale * cdf


def laplace_density(x: jnp.ndarray,
                    params: DensityParams,
                    beta_bounds: Tuple[float, float],
                    scale_min: float,
                    mean_bounds: Tuple[float, float],
                    cutoff: float = -0.5) -> jnp.ndarray:
    """Truncated scaled Laplace-CDF density; reference ``:129-151``."""
    beta = get_beta(params, beta_bounds)
    scale = get_scale(params, scale_min)
    mean = get_mean(params, mean_bounds)
    shifted = laplace_cdf(x, beta, scale, mean) - \
        laplace_cdf(jnp.asarray(cutoff, x.dtype), beta, scale, mean)
    return jnp.maximum(shifted, 0.0)


# --- capability-parity alternates (reference density_functions.py:51-319) ----

def sdf_density(sdf: jnp.ndarray, beta: jnp.ndarray,
                beta_min: float = 1e-4) -> jnp.ndarray:
    """VolSDF-style Laplace density of an SDF; reference ``SdfDensity :51-77``."""
    b = jnp.abs(beta) + beta_min
    return (1.0 / b) * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / b))


# Reference ``LaplaceDensitySdf :301-319`` is byte-identical math to
# ``SdfDensity`` (same ``density_func`` and ``get_beta``; it only drops the
# unused ``cutoff`` kwarg), so one function covers both alternates.
laplace_density_sdf = sdf_density


def simple_density(x: jnp.ndarray) -> jnp.ndarray:
    """NeRF-style relu density (noise injection omitted); reference ``:80-108``."""
    return jnp.maximum(x, 0.0)


def exponential_density(x: jnp.ndarray, beta: jnp.ndarray,
                        beta_min: float = 1e-4) -> jnp.ndarray:
    """Reference ``:207-243``."""
    b = jnp.abs(beta) + beta_min
    return (1.0 / b) * (1.0 - jnp.exp(-b * x))


def sigmoid_density(x: jnp.ndarray, beta: jnp.ndarray, scale: jnp.ndarray,
                    beta_min: float = 1e-4,
                    scale_min: float = 1.0) -> jnp.ndarray:
    """Reference ``:246-298``."""
    b = jnp.maximum(jnp.abs(beta), beta_min)
    s = jnp.maximum(jnp.abs(scale), scale_min)
    return s / (1.0 + jnp.exp(-b * (-x - 0.5)))
