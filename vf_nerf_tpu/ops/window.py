"""Windowed cosine similarity over consecutive ray samples.

Reference: ``models/helpers/functions.py:41-72`` (``window_cosine_similarity``).
This is the op that turns the vector field into a surface-crossing signal: for
each consecutive-sample pair along a ray it blends the cosine similarity of
the field at sample ``j`` with the field at a window of neighbouring samples.

Semantics reproduced exactly, including the reference's quirks:

- ``start = (W + 1) // 2 + 1`` and ``middle = (W - 1) // 2`` (W = window taps);
  only positions ``[start, L - start)`` of the (L = samples-1)-length cosine
  array are windowed, the first/last ``start`` entries keep the *raw*
  consecutive cosine (``functions.py:60-70``),
- the centre tap weight is applied **unsigned-normalized but not abs'd**
  (``weights[middle]``, ``:62``) while neighbour taps use ``|w|`` (``:68-70``),
- the window in sample space is asymmetric: centre pairs ``(n_j, n_{j+1})``,
  forward taps pair ``(n_j, n_{j+1+i})`` and backward taps ``(n_j, n_{j-i})``
  for ``i = 1 .. start-2``,
- normalizer is ``sum(|w|)`` over all taps.

All shapes static → the tap loop unrolls into a fused stencil under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8  # torch F.cosine_similarity eps


def cosine_similarity(x: jnp.ndarray, y: jnp.ndarray,
                      axis: int = -1) -> jnp.ndarray:
    """torch ``F.cosine_similarity`` semantics:
    ``dot / (max(||x||, eps) * max(||y||, eps))``."""
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=axis), _EPS)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=axis), _EPS)
    return dot / (nx * ny)


def window_cosine_similarity(x: jnp.ndarray,
                             y: jnp.ndarray,
                             weights: jnp.ndarray,
                             n_valid=None) -> jnp.ndarray:
    """Symmetric windowed cosine similarity.

    :param x: (R, L, 3) field at samples ``0..L-1`` (callers pass
        ``normals[:, :-1]``).
    :param y: (R, L, 3) field at samples ``1..L`` (callers pass
        ``normals[:, 1:]``).
    :param weights: (W,) window tap weights (may be a traced array — the
        annealing schedule updates them every epoch without retracing).
    :param n_valid: optional traced scalar — the number of valid *samples*
        when the ray tail is padding (static fine-growth mode). The
        reference windows only positions ``[start, L_valid - start)`` of the
        (L_valid = n_valid - 1)-length cosine array, so positions that are
        interior in the padded array but boundary in the live array are
        reset to the raw consecutive cosine — making the live prefix
        bit-equal to the unpadded computation (no live window tap ever
        reads a padded sample: taps reach at most ``start - 2`` ahead of an
        interior position).
    :return: (R, L) windowed cosine similarities.
    """
    n_taps = weights.shape[0]
    start = (n_taps + 1) // 2 + 1
    middle = (n_taps - 1) // 2
    length = x.shape[1]

    normalizer = jnp.sum(jnp.abs(weights))
    cs = cosine_similarity(x, y)

    hi = length - start
    if hi <= start:
        # Too few samples for any windowed interior — raw cosines only.
        return cs

    x_mid = x[:, start:hi]
    acc = cs[:, start:hi] * weights[middle] / normalizer
    for i in range(1, start - 1):
        fwd = cosine_similarity(x_mid, y[:, start + i:hi + i])
        bwd = cosine_similarity(x_mid, y[:, start - i - 1:hi - i - 1])
        acc = acc + fwd * jnp.abs(weights[middle + i]) / normalizer \
                  + bwd * jnp.abs(weights[middle - i]) / normalizer
    out = cs.at[:, start:hi].set(acc)
    if n_valid is not None:
        # Dynamic interior bound of the LIVE array: positions
        # >= (n_valid - 1) - start keep the raw cosine, exactly as they
        # would in an unpadded length-(n_valid - 1) computation.
        hi_live = n_valid - 1 - start
        idx = jnp.arange(length)[None, :]
        out = jnp.where(idx < hi_live, out, cs)
    return out


def forward_window_cosine_similarity(x: jnp.ndarray,
                                     y: jnp.ndarray,
                                     weights: jnp.ndarray,
                                     window: int) -> jnp.ndarray:
    """Forward-only windowed cosine (reference ``functions.py:11-38``).

    The reference derives the window size from ``weights[0]`` (a data-dependent
    size, incompatible with tracing); here it is the explicit static
    ``window`` argument. Unused by the training path; kept for parity.
    """
    length = x.shape[1]
    normalizer = jnp.sum(jnp.abs(weights[:window]))
    cs = cosine_similarity(x, y)

    hi = length - window
    if hi <= window:
        return cs

    x_mid = x[:, window:hi]
    acc = cs[:, window:hi] * jnp.abs(weights[0]) / normalizer
    for i in range(1, window):
        fwd = cosine_similarity(x_mid, y[:, window + i:hi + i])
        acc = acc + fwd * jnp.abs(weights[i]) / normalizer
    return cs.at[:, window:hi].set(acc)
