"""TSDF fusion of rendered depth maps.

Reference: ``evaluation/methods.py:613-665`` used Open3D's
``ScalableTSDFVolume`` (voxel 4/512, truncation 0.04, depth truncation 10);
Open3D is unavailable here, so this is an in-repo dense fusion with the same
integration semantics:

- per view, every voxel centre projects into the camera; voxels in front of
  the camera, within the image, with valid depth ≤ depth_trunc integrate
  ``tsdf = min(1, (depth_px − z_voxel)/trunc)`` when ``sdf ≥ −trunc``,
  running-averaged with unit weights,
- the volume bounds come from the backprojected depth points (the scalable
  volume's effective extent),
- the mesh is the zero level set over observed voxels (weight > 0), via the
  in-repo marching cubes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _backproject_bounds(depths: Sequence[np.ndarray],
                        poses: Sequence[np.ndarray],
                        intrinsics: Sequence[np.ndarray],
                        depth_trunc: float) -> Tuple[np.ndarray, np.ndarray]:
    mins = np.full(3, np.inf)
    maxs = np.full(3, -np.inf)
    for depth, pose, k in zip(depths, poses, intrinsics):
        h, w = depth.shape[:2]
        d = depth.reshape(h, w)
        valid = (d > 0) & (d <= depth_trunc)
        if not valid.any():
            continue
        ys, xs = np.nonzero(valid)
        z = d[ys, xs]
        x_cam = (xs - k[0, 2]) / k[0, 0] * z
        y_cam = (ys - k[1, 2]) / k[1, 1] * z
        pts = np.stack([x_cam, y_cam, z, np.ones_like(z)], axis=1)
        world = (pose @ pts.T).T[:, :3]
        mins = np.minimum(mins, world.min(axis=0))
        maxs = np.maximum(maxs, world.max(axis=0))
    return mins, maxs


def fuse_depth_maps(depths: Sequence[np.ndarray],
                    poses: Sequence[np.ndarray],
                    intrinsics: Sequence[np.ndarray],
                    voxel_size: float = 4.0 / 512.0,
                    sdf_trunc: float = 0.04,
                    depth_trunc: float = 10.0,
                    max_voxels: int = 450_000_000
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fuse depth maps → (vertices, faces) of the TSDF zero level set."""
    mins, maxs = _backproject_bounds(depths, poses, intrinsics, depth_trunc)
    if not np.isfinite(mins).all():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    mins -= 2 * sdf_trunc
    maxs += 2 * sdf_trunc

    dims = np.maximum(((maxs - mins) / voxel_size).astype(np.int64) + 2, 2)
    # Guard against absurd volumes (coarsen rather than OOM).
    while int(np.prod(dims)) > max_voxels:
        voxel_size *= 1.26
        dims = np.maximum(((maxs - mins) / voxel_size).astype(np.int64) + 2,
                          2)

    nx, ny, nz = (int(d) for d in dims)
    tsdf = np.zeros((nx, ny, nz), np.float32)
    weight = np.zeros((nx, ny, nz), np.float32)

    # Voxel centre world coordinates, built per-slab to bound memory.
    ys_idx, zs_idx = np.meshgrid(np.arange(ny), np.arange(nz), indexing="ij")
    for view_i, (depth, pose, k) in enumerate(zip(depths, poses, intrinsics)):
        h, w = depth.shape[:2]
        d_img = depth.reshape(h, w)
        world_to_cam = np.linalg.inv(pose)
        fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
        for ix in range(nx):
            wx = mins[0] + ix * voxel_size
            wy = mins[1] + ys_idx * voxel_size
            wz = mins[2] + zs_idx * voxel_size
            pts = np.stack([np.full_like(wy, wx), wy, wz,
                            np.ones_like(wy)], axis=-1)   # (ny, nz, 4)
            cam = pts @ world_to_cam.T
            z = cam[..., 2]
            in_front = z > 1e-6
            u = np.where(in_front, cam[..., 0] / np.maximum(z, 1e-6) * fx
                         + cx, -1.0)
            v = np.where(in_front, cam[..., 1] / np.maximum(z, 1e-6) * fy
                         + cy, -1.0)
            ui = np.round(u).astype(np.int64)
            vi = np.round(v).astype(np.int64)
            in_img = in_front & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
            ui_s = np.clip(ui, 0, w - 1)
            vi_s = np.clip(vi, 0, h - 1)
            d_px = d_img[vi_s, ui_s]
            valid = in_img & (d_px > 0) & (d_px <= depth_trunc)
            sdf = d_px - z
            integrate = valid & (sdf >= -sdf_trunc)
            new_tsdf = np.minimum(1.0, sdf / sdf_trunc)
            w_old = weight[ix]
            t_old = tsdf[ix]
            w_new = w_old + integrate
            t_new = np.where(integrate,
                             (t_old * w_old + new_tsdf) / np.maximum(w_new,
                                                                     1.0),
                             t_old)
            tsdf[ix] = t_new
            weight[ix] = w_new

    from vf_nerf_tpu.evaluation.mc.classic import marching_cubes
    return marching_cubes(tsdf, isovalue=0.0, origin=mins,
                          voxel_size=voxel_size, valid=weight > 0)
