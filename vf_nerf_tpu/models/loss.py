"""VF-NeRF training loss.

Reference: ``models/losses/vf_loss.py:13-87``. Terms (weights from
``confs/vf_nerf.conf:77-91``):

- RGB L1,
- depth L1 clamped elementwise at ``depth_loss_clamp`` before the mean,
- unit-norm regularizer ``mean((||v|| - 1)^2)`` over all rendered normals,
- MSE VF supervision at border/centre points,
- ``relu(||v|| - 1)^2`` hinge, gated by ``norm_smaller_than_one_start``,
- mean directional-derivative norm, gated by
  ``directional_derivatives_start``.

Epoch gates are traced (``jnp.where`` on ``epoch``) so the step function
never retraces across epochs.

TPU-shaped deviation: the supervision term consumes *(mask, pred, gt)*
triples with static shapes instead of boolean-gathered arrays; the masked MSE
equals the reference's MSE over the gathered concatenation exactly (same sum
of squared errors, same element count).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vf_nerf_tpu.config.schema import VFLossConfig, VFLossWeights


def masked_sq_err(pred: jnp.ndarray, gt: jnp.ndarray,
                  mask: Optional[jnp.ndarray]
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of squared errors over masked rows, number of masked elements)."""
    sq = (pred - gt) ** 2
    if mask is None:
        return jnp.sum(sq), jnp.asarray(sq.size, sq.dtype)
    m = mask.astype(sq.dtype)
    count = jnp.sum(m) * sq.shape[-1]
    return jnp.sum(sq * m[..., None]), count


def vf_loss(predictions: Dict[str, jnp.ndarray],
            ground_truth: Dict[str, jnp.ndarray],
            supervision_terms: Sequence[Tuple[jnp.ndarray, jnp.ndarray,
                                              Optional[jnp.ndarray]]],
            weights: VFLossWeights,
            config: VFLossConfig,
            epoch: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the weighted total loss and per-term scalars.

    :param predictions: ``rgb`` (R, 3), ``depth`` (R, 1), ``normals``
        (N, 3) all rendered field samples, optional
        ``dir_derivative_norms`` (M,), optional ``sample_mask`` (N,) —
        1.0 for live ray samples (static fine-growth mode pads the sample
        axis; masked means over the live entries equal the unpadded means).
    :param ground_truth: ``rgb`` (R, 3), ``depth`` (R, 1) (size 0 to skip).
    :param supervision_terms: list of (pred_normals, gt_normals, mask or None)
        triples pooled into one MSE, mirroring the reference's concatenation
        of ray-masked + shell-sampled supervision normals
        (``train/vector_field_nerf_train.py:180-216``).
    :param epoch: traced scalar epoch for the loss gates.
    :return: (total, dict of per-term raw losses).
    """
    rgb_loss = jnp.mean(jnp.abs(predictions["rgb"] - ground_truth["rgb"]))

    gt_depth = ground_truth.get("depth")
    if gt_depth is not None and gt_depth.size > 0:
        per_elem = jnp.abs(predictions["depth"] - gt_depth)
        per_elem = jnp.minimum(per_elem, config.depth_loss_clamp)
        if getattr(config, "mask_invalid_depth", False):
            # Sensor-hole mitigation (r5, off by default for reference
            # parity — see VFLossConfig.mask_invalid_depth): masked mean
            # over valid (depth > 0) pixels; static shapes, no gathers.
            valid = (gt_depth > 0).astype(per_elem.dtype)
            depth_loss = jnp.sum(per_elem * valid) / jnp.maximum(
                jnp.sum(valid), 1.0)
        else:
            depth_loss = jnp.mean(per_elem)
    else:
        depth_loss = jnp.asarray(0.0, rgb_loss.dtype)

    norms = jnp.linalg.norm(predictions["normals"], axis=1)
    sample_mask = predictions.get("sample_mask")

    def _sample_mean(values: jnp.ndarray) -> jnp.ndarray:
        if sample_mask is None:
            return jnp.mean(values)
        return jnp.sum(values * sample_mask) / jnp.maximum(
            jnp.sum(sample_mask), 1.0)

    unit_norm_loss = _sample_mean((norms - 1.0) ** 2)

    sup_sum = jnp.asarray(0.0, rgb_loss.dtype)
    sup_count = jnp.asarray(0.0, rgb_loss.dtype)
    for pred_n, gt_n, mask in supervision_terms:
        s, c = masked_sq_err(pred_n, gt_n, mask)
        sup_sum = sup_sum + s
        sup_count = sup_count + c
    supervision_loss = jnp.where(sup_count > 0, sup_sum / jnp.maximum(
        sup_count, 1.0), 0.0)

    hinge = _sample_mean(jnp.maximum(norms - 1.0, 0.0) ** 2)
    norm_hinge_loss = jnp.where(epoch >= config.norm_smaller_than_one_start,
                                hinge, 0.0)

    dd = predictions.get("dir_derivative_norms")
    if dd is not None:
        dir_deriv_loss = jnp.where(
            epoch >= config.directional_derivatives_start,
            _sample_mean(dd), 0.0)
    else:
        dir_deriv_loss = jnp.asarray(0.0, rgb_loss.dtype)

    total = (weights.rgb * rgb_loss +
             weights.depth * depth_loss +
             weights.unit_norm * unit_norm_loss +
             weights.supervision * supervision_loss +
             weights.norm_smaller_than_one * norm_hinge_loss +
             weights.directional_derivatives * dir_deriv_loss)

    return total, {
        "rgb_loss": rgb_loss,
        "depth_loss": depth_loss,
        "unit_norm_loss": unit_norm_loss,
        "supervision_loss": supervision_loss,
        "norm_smaller_than_one_loss": norm_hinge_loss,
        "directional_derivatives_loss": dir_deriv_loss,
    }


def cosine_losses(cosine_similarity: jnp.ndarray,
                  weights: jnp.ndarray,
                  argmax_cap: int = 70
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Surface-crossing cosine losses (reference ``get_cosine_losses``,
    ``models/helpers/functions.py:159-181``; an auxiliary objective the
    reference defines but never wires in): minimize the cosine at each ray's
    weight argmax, maximize it before the argmax. Rays with zero max weight
    or argmax ≥ ``argmax_cap`` are excluded (the reference's hack at
    ``:170``). Masked static-shape formulation.

    :param cosine_similarity: (R, L).
    :param weights: (R, S) compositing weights.
    :return: (min_cosine_term, max_cosine_term).
    """
    maxs = jnp.max(weights, axis=1)
    argmaxs = jnp.argmax(weights, axis=1)
    real = (maxs > 0.0) & (argmaxs < argmax_cap)
    rows = jnp.arange(cosine_similarity.shape[0])
    at_max = cosine_similarity[rows, jnp.minimum(
        argmaxs, cosine_similarity.shape[1] - 1)]
    min_term = jnp.sum(jnp.where(real, at_max, 0.0)) / jnp.maximum(
        jnp.sum(real), 1)

    col = jnp.arange(cosine_similarity.shape[1])[None, :]
    before = (col < argmaxs[:, None]) & real[:, None]
    max_term = -jnp.sum(jnp.where(before, cosine_similarity, 0.0)) / \
        jnp.maximum(jnp.sum(before), 1)
    return min_term, max_term


def similarity_loss(x1: jnp.ndarray, x2: jnp.ndarray,
                    v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Point-pair field-consistency loss (reference ``get_similarity_loss``,
    ``models/helpers/functions.py:183-225``; unused extra kept for
    capability parity, consumed by the joint-optimization stage): each point
    should reach its partner by walking its field vector for the pair
    distance; penalize failures for opposing pairs, masked static-shape."""
    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                               1e-8)

    distance = jnp.linalg.norm(x2 - x1, axis=1, keepdims=True)
    x1_est = x2 + _norm(v2) * distance
    x2_est = x1 + _norm(v1) * distance
    diff = jnp.linalg.norm(x1 - x1_est, axis=1) + \
        jnp.linalg.norm(x2 - x2_est, axis=1)

    cos = jnp.sum(_norm(v1) * _norm(v2), axis=1)
    cos = jax.lax.stop_gradient(cos)
    gate = (cos < 0.5) & (diff > 0.5 * jax.lax.stop_gradient(jnp.max(diff)))
    count = jnp.sum(gate)
    weighted = jnp.sum(jnp.where(gate, diff * (1.0 - cos), 0.0))
    return jnp.where(count > 0, weighted / jnp.maximum(count, 1), 0.0)
