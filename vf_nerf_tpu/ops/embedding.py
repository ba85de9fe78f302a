"""NeRF positional encoding.

Reference: ``models/helpers/embedder.py:6-52``. Output layout is
``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` — the identity
first, then (sin, cos) pairs per frequency with all input dims kept together
per function (the reference appends whole-vector ``p_fn(x * freq)`` blocks).
Frequencies are ``2**linspace(0, multires-1, multires)`` = exact powers of two.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def embedding_dim(multires: int, input_dims: int = 3) -> int:
    """Output channel count: identity + 2 * multires frequency blocks."""
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


@functools.partial(jnp.vectorize, signature="(d)->(e)", excluded=(1,))
def _embed_vec(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    # (F, d) scaled copies of the input.
    scaled = x[None, :] * freqs[:, None]
    # Interleave sin/cos per frequency: [sin(f0 x), cos(f0 x), sin(f1 x), ...].
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    trig = jnp.stack([sin, cos], axis=1).reshape(-1)
    return jnp.concatenate([x, trig])


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Embed points/directions of shape (..., d) to (..., d*(1+2*multires)).

    ``multires=6`` maps 3 → 39 (VF net input); ``multires=4`` maps 3 → 27
    (view directions), matching the reference dims (SURVEY.md C13).
    """
    if multires <= 0:
        return x
    return _embed_vec(x, multires)
