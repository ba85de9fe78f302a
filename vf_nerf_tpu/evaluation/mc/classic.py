"""Classic scalar-field marching cubes (vectorized).

Used by the TSDF mesher (the reference delegated this to Open3D's extractor,
``methods.py:613-665``; unavailable here) and as the general scalar-field
iso-surface tool. Shares the generated tables and triangle emission with the
contrastive variant.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from vf_nerf_tpu.evaluation.mc.contrastive import dedup_mesh, emit_triangles
from vf_nerf_tpu.evaluation.mc.tables import CORNER_OFFSETS


def marching_cubes(values: np.ndarray,
                   isovalue: float = 0.0,
                   origin: np.ndarray = None,
                   voxel_size: float = 1.0,
                   valid: np.ndarray = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface of a dense scalar grid.

    :param values: (Nx, Ny, Nz) scalar field.
    :param isovalue: surface level.
    :param origin: world position of voxel (0,0,0); default zeros.
    :param voxel_size: world grid spacing.
    :param valid: optional (Nx, Ny, Nz) bool mask — cells are only meshed
        when all 8 corners are valid (TSDF: observed voxels).
    :return: (vertices (V, 3) world coords, faces (F, 3)).
    """
    nx, ny, nz = values.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # Corner values per cell via 8 shifted views: (nx-1, ny-1, nz-1, 8).
    def corner_view(grid, off):
        return grid[off[0]:off[0] + nx - 1,
                    off[1]:off[1] + ny - 1,
                    off[2]:off[2] + nz - 1]

    corner_vals = np.stack([corner_view(values, off)
                            for off in CORNER_OFFSETS], axis=-1)
    inside = corner_vals < isovalue
    any_cross = inside.any(axis=-1) & (~inside.all(axis=-1))
    if valid is not None:
        corner_ok = np.stack([corner_view(valid, off)
                              for off in CORNER_OFFSETS], axis=-1)
        any_cross &= corner_ok.all(axis=-1)

    cells = np.argwhere(any_cross)  # (M, 3)
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    vert_values = corner_vals[any_cross]                 # (M, 8)
    node = (cells[:, None, :] + CORNER_OFFSETS[None]).astype(np.float64)
    grid_verts = node * voxel_size
    if origin is not None:
        grid_verts = grid_verts + np.asarray(origin, np.float64)

    triangles = emit_triangles(grid_verts, vert_values, isovalue)
    return dedup_mesh(triangles)
