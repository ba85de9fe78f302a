"""Render output contract: ``NerfOutput``.

Reference: ``models/nerf/output.py:8-70``. The functional renderer returns a
plain dict (jit-friendly); this dataclass is the facade-level API parity
wrapper with the reference's field names. Note the reference never populates
the ``fine_*`` fields (``vector_field_nerf.py:280-283,331-338`` — SURVEY.md
C9), so they default to None here too.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax.numpy as jnp


@dataclass
class NerfOutput:
    points_coarse: Optional[jnp.ndarray] = None
    points_fine: Optional[jnp.ndarray] = None
    coarse_normals: Optional[jnp.ndarray] = None
    coarse_rgb_values: Optional[jnp.ndarray] = None
    coarse_depth_map: Optional[jnp.ndarray] = None
    fine_normals: Optional[jnp.ndarray] = None
    fine_rgb_values: Optional[jnp.ndarray] = None
    fine_depth_map: Optional[jnp.ndarray] = None
    z_vals: Optional[jnp.ndarray] = None
    directional_derivtives: Optional[jnp.ndarray] = None  # reference's typo
    ray_dirs: Optional[jnp.ndarray] = None
    coarse_colors: Optional[jnp.ndarray] = None

    def fine_active(self) -> bool:
        """Reference ``output.py`` — true when the fine branch populated."""
        return self.fine_rgb_values is not None

    def get_normals(self) -> Optional[jnp.ndarray]:
        return self.fine_normals if self.fine_active() else \
            self.coarse_normals

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if v is not None}

    @staticmethod
    def from_render_dict(out: Dict[str, jnp.ndarray]) -> "NerfOutput":
        """Wrap the functional renderer's dict. Mirrors the reference's
        naming: the "coarse" fields carry the final (fine-sampled) pass —
        its quirk, ``vector_field_nerf.py:331-338``."""
        n = out["sample_colors"]
        return NerfOutput(
            points_coarse=out["points"],
            coarse_normals=out["normals"],
            coarse_rgb_values=out["rgb"],
            coarse_depth_map=out["depth"],
            z_vals=out["z_vals"],
            directional_derivtives=out.get("dir_derivative_norms"),
            coarse_colors=n.reshape(-1, 3),
        )
