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

    # Candidate cells found slab-wise — materializing the full
    # (cells × 8 corners) stack costs 8× the grid (8+ GB at 640³).
    inside_grid = values < isovalue
    planes_per_slab = max(1, (1 << 23) // max(ny * nz, 1))
    cell_blocks, value_blocks = [], []
    for ix0 in range(0, nx - 1, planes_per_slab):
        ix1 = min(ix0 + planes_per_slab, nx - 1)

        def corner_view(grid, off):
            return grid[ix0 + off[0]:ix1 + off[0],
                        off[1]:off[1] + ny - 1,
                        off[2]:off[2] + nz - 1]

        inside = np.stack([corner_view(inside_grid, off)
                           for off in CORNER_OFFSETS], axis=-1)
        any_cross = inside.any(axis=-1) & (~inside.all(axis=-1))
        if valid is not None:
            corner_ok = np.stack([corner_view(valid, off)
                                  for off in CORNER_OFFSETS], axis=-1)
            any_cross &= corner_ok.all(axis=-1)
        local = np.argwhere(any_cross)
        if len(local) == 0:
            continue
        local[:, 0] += ix0
        corner_vals = np.stack(
            [values[local[:, 0] + off[0], local[:, 1] + off[1],
                    local[:, 2] + off[2]] for off in CORNER_OFFSETS],
            axis=-1)
        cell_blocks.append(local)
        value_blocks.append(corner_vals)

    if not cell_blocks:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    cells = np.concatenate(cell_blocks)
    vert_values = np.concatenate(value_blocks)

    node = (cells[:, None, :] + CORNER_OFFSETS[None]).astype(np.float64)
    grid_verts = node * voxel_size
    if origin is not None:
        grid_verts = grid_verts + np.asarray(origin, np.float64)

    triangles = emit_triangles(grid_verts, vert_values, isovalue)
    return dedup_mesh(triangles)
