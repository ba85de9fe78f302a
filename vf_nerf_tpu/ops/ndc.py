"""NDC ray conversion.

Reference: ``utils/rendering.py:63-96`` (``convert_to_ndc``; unused by the
active datasets, kept for capability parity — forward-facing LLFF captures).
Shifts origins to the near plane then applies the standard NeRF NDC
projection.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def convert_to_ndc(origins: jnp.ndarray,
                   directions: jnp.ndarray,
                   intrinsics: jnp.ndarray,
                   near: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays → NDC space.

    :param origins: (N, 3); :param directions: (N, 3);
    :param intrinsics: (N, 4, 4) (focal/principal from row 0 like the
        reference: width = (cx + 0.5)·2, height = (cy + 0.5)·2).
    """
    focal = intrinsics[0, 0, 0]
    w = (intrinsics[0, 0, 2] + 0.5) * 2.0
    h = (intrinsics[0, 1, 2] + 0.5) * 2.0

    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions

    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    dx, dy, dz = directions[..., 0], directions[..., 1], directions[..., 2]

    o0 = -1.0 / (w / (2.0 * focal)) * ox / oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -1.0 / (w / (2.0 * focal)) * (dx / dz - ox / oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return (jnp.stack([o0, o1, o2], axis=-1),
            jnp.stack([d0, d1, d2], axis=-1))
