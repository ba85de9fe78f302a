"""Annealing schedules (window weights + scalar parameters).

Reference: ``utils/weight_annealing.py:32-74`` (``LinearAnnealing`` over the
11 cosine-window taps) and ``utils/parameter_annealing.py:33-57``
(``ParameterLinearAnnealing``, constructed nowhere in the reference but kept
as an optional schedule utility per SURVEY.md C15).

These run on the host once per epoch (epoch-gated in the render path,
``models/nerf/vector_field_nerf.py:232-234``), so they are plain numpy and the
result is fed into the jitted renderer as a (W,) array argument — changing
weights never retraces.
"""

from __future__ import annotations

import numpy as np


def linear_annealing_weights(n_weights: int,
                             n_epochs: int,
                             epoch: int,
                             soft: bool = False) -> np.ndarray:
    """Triangular window weights that sharpen toward the centre tap.

    Reference ``LinearAnnealing.get_weights`` (``weight_annealing.py:51-74``):
    ``relu(mid - mid/n_epochs * epoch * |idx|)`` normalized; the "soft" mode
    floors the 4 nearest neighbours at 0.05 once the centre reaches 0.8.
    Negative epochs return the uniform window.
    """
    if epoch < 0:
        return np.full(n_weights, 1.0 / n_weights, dtype=np.float32)

    mid = (n_weights - 1) / 2.0
    idx = np.abs(np.arange(n_weights, dtype=np.float32) - int(mid))
    linear = -mid / n_epochs * epoch * idx + mid
    relu = np.maximum(linear, 0.0)
    weights = (relu / relu.sum()).astype(np.float32)

    centre = int(mid)
    if soft and weights[centre] >= 0.8:
        weights[centre - 2:centre + 3] = 0.05
        weights[centre] = 0.8
    return weights


def annealed_window_weights(base_weights: np.ndarray,
                            anneal_mode: str,
                            anneal_start: int,
                            anneal_end: int,
                            epoch: int,
                            soft: bool = False) -> np.ndarray:
    """Epoch-gated window weights as the render path applies them.

    Reference ``models/nerf/vector_field_nerf.py:232-234``: annealing only
    kicks in after ``anneal_start`` and advances with ``epoch - anneal_start``
    over ``anneal_end - anneal_start`` epochs; before that (or with mode
    "none") the configured base weights are used unchanged.
    """
    if anneal_mode == "none" or epoch <= anneal_start:
        return np.asarray(base_weights, dtype=np.float32)
    return linear_annealing_weights(len(base_weights),
                                    anneal_end - anneal_start,
                                    epoch - anneal_start,
                                    soft=(anneal_mode == "soft"))


def parameter_linear_annealing(start_value: float,
                               end_value: float,
                               n_epochs: int,
                               epoch: int) -> float:
    """Linear scalar schedule (reference ``parameter_annealing.py:33-57``)."""
    if epoch <= 0:
        return start_value
    if epoch >= n_epochs:
        return end_value
    return start_value + (end_value - start_value) * epoch / n_epochs
