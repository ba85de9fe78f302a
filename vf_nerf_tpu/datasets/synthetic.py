"""Synthetic box-room dataset.

Not in the reference (it has no tests, SURVEY.md §4) — this is the in-repo
oracle scene the test/bench strategy is built on: a cube room with cameras
inside, analytic ray-box depth, a smooth procedural wall texture, an analytic
vector field (direction to the nearest wall) and the exact GT mesh. It also
exports itself in Replica's on-disk format so the Replica loader is tested
end-to-end without shipping real data.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from vf_nerf_tpu.config.schema import DatasetConfig
from vf_nerf_tpu.datasets.base import BaseDataset


def box_mesh(half_size: float) -> Tuple[np.ndarray, np.ndarray]:
    """Cube [-L, L]^3 as 8 vertices / 12 triangles."""
    L = half_size
    verts = np.array([[x, y, z] for x in (-L, L) for y in (-L, L)
                      for z in (-L, L)], np.float32)
    faces = np.array([
        [0, 1, 3], [0, 3, 2],  # x = -L
        [4, 6, 7], [4, 7, 5],  # x = +L
        [0, 4, 5], [0, 5, 1],  # y = -L
        [2, 3, 7], [2, 7, 6],  # y = +L
        [0, 2, 6], [0, 6, 4],  # z = -L
        [1, 5, 7], [1, 7, 3],  # z = +L
    ], np.int32)
    return verts, faces


def wall_color(points: np.ndarray) -> np.ndarray:
    """Smooth procedural RGB in [0, 1] as a function of 3D position."""
    p = np.asarray(points)
    r = 0.5 + 0.35 * np.sin(1.7 * p[..., 0]) * np.cos(2.3 * p[..., 1])
    g = 0.5 + 0.35 * np.sin(2.1 * p[..., 1] + 1.0) * np.cos(1.3 * p[..., 2])
    b = 0.5 + 0.35 * np.sin(1.1 * p[..., 2] + 2.0) * np.cos(1.9 * p[..., 0])
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def analytic_vf(points: np.ndarray, half_size: float) -> np.ndarray:
    """Unit field pointing toward the nearest wall of the cube — the
    integration-test oracle for the learned field. Inside, it points outward
    along the closest-wall axis; outside, it points back toward the cube, so
    the field flips sign across the surface (the sign flip is what VF-NeRF's
    density detects)."""
    p = np.asarray(points, np.float32)
    flat = p.reshape(-1, 3)
    dist_to_wall = half_size - np.abs(flat)      # per axis; <0 outside
    inside = (dist_to_wall > 0).all(axis=-1)

    # Inside: unit vector toward the nearest wall.
    axis = np.argmin(dist_to_wall, axis=-1)
    sign = np.sign(flat[np.arange(len(flat)), axis])
    sign = np.where(sign == 0, 1.0, sign)
    v_in = np.zeros_like(flat)
    v_in[np.arange(len(flat)), axis] = sign

    # Outside: toward the closest point on the cube surface.
    closest = np.clip(flat, -half_size, half_size)
    delta = closest - flat
    norm = np.linalg.norm(delta, axis=-1, keepdims=True)
    v_out = delta / np.maximum(norm, 1e-8)

    v = np.where(inside[:, None], v_in, v_out)
    return v.reshape(p.shape).astype(np.float32)


def _ray_box_exit_t(origins: np.ndarray, dirs: np.ndarray,
                    half_size: float) -> np.ndarray:
    """Smallest positive t with origin + t*dir on the cube boundary (cameras
    are inside, so this is the exit distance)."""
    L = half_size
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (-L - origins) / dirs
        t2 = (L - origins) / dirs
    t_far = np.where(dirs == 0, np.inf, np.maximum(t1, t2))
    return t_far.min(axis=-1)


class SyntheticBoxDataset(BaseDataset):
    """Cameras inside a textured cube room looking outward."""

    def __init__(self,
                 config: Optional[DatasetConfig] = None,
                 n_images: int = 8,
                 image_size: Tuple[int, int] = (32, 48),
                 half_size: float = 2.0,
                 pixels_per_batch: int = 512,
                 shuffle_views: bool = True,
                 all_pixels: bool = False,
                 seed: int = 0,
                 train: bool = True,
                 pitch_range: float = 0.3) -> None:
        if config is not None:
            # Registry path: dataset_dict[name](config) like the reference.
            pixels_per_batch = config.pixels_per_batch
            shuffle_views = config.shuffle_views
            all_pixels = config.all_pixels
        super().__init__(n_images=n_images, shuffle_views=shuffle_views,
                         pixels_per_batch=pixels_per_batch,
                         all_pixels=all_pixels)
        self.half_size = half_size
        # Camera pitch spread (radians). The 0.3 default leaves floor/
        # ceiling largely unobserved (recall in 3D metrics is bounded by
        # view coverage); widen (e.g. 1.1) for full-coverage studies.
        self.pitch_range = pitch_range
        self.image_size = image_size
        h, w = image_size

        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 0.6 * w
        k[0, 2], k[1, 2] = w / 2.0, h / 2.0
        self.intrinsics = k

        rng = np.random.RandomState(seed)
        self.poses = self._make_poses(rng)
        self.rgb_images, self.depth_images = self._render_gt()
        self.max_depth = float(self.depth_images.max())
        self.scale = half_size * 1.1
        self.config = config

    def _make_poses(self, rng: np.random.RandomState) -> np.ndarray:
        """Cameras near the centre, looking in spread-out directions."""
        poses = []
        for i in range(self.n_images):
            yaw = 2 * np.pi * i / self.n_images + rng.uniform(-0.2, 0.2)
            pitch = rng.uniform(-self.pitch_range, self.pitch_range)
            forward = np.array([np.cos(pitch) * np.cos(yaw),
                                np.cos(pitch) * np.sin(yaw),
                                np.sin(pitch)], np.float32)
            up = np.array([0, 0, 1], np.float32)
            right = np.cross(forward, up)
            right /= np.linalg.norm(right)
            down = np.cross(forward, right)
            # camera x→right, y→down(image), z→forward (pinhole convention)
            rot = np.stack([right, down, forward], axis=1)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = rot
            pose[:3, 3] = rng.uniform(-0.4, 0.4, 3) * self.half_size * 0.4
            poses.append(pose)
        return np.stack(poses)

    def _render_gt(self) -> Tuple[np.ndarray, np.ndarray]:
        from vf_nerf_tpu.datasets.base import pixel_grid
        h, w = self.image_size
        uv = pixel_grid(h, w)
        fx, fy = self.intrinsics[0, 0], self.intrinsics[1, 1]
        cx, cy = self.intrinsics[0, 2], self.intrinsics[1, 2]
        x_cam = (uv[:, 0] - cx) / fx
        y_cam = (uv[:, 1] - cy) / fy
        dirs_cam = np.stack([x_cam, y_cam, np.ones_like(x_cam)], axis=-1)

        rgbs, depths = [], []
        for pose in self.poses:
            dirs = dirs_cam @ pose[:3, :3].T
            origin = pose[:3, 3]
            t = _ray_box_exit_t(origin[None, :], dirs, self.half_size)
            hits = origin[None, :] + t[:, None] * dirs
            rgbs.append(wall_color(hits))
            depths.append(t[:, None].astype(np.float32))
        return np.asarray(rgbs, np.float32), np.asarray(depths, np.float32)

    def get_bounds(self) -> Tuple[float, float]:
        return 0.0, self.max_depth * 1.25

    def get_vf_init_method(self) -> Tuple[str, str]:
        return "exterior_synthetic", ""

    def get_centroid(self) -> np.ndarray:
        return np.zeros(3, np.float32)

    def gt_mesh(self) -> Tuple[np.ndarray, np.ndarray]:
        return box_mesh(self.half_size)

    # ------------------------------------------------- replica-format dump
    def export_replica_format(self, root: str, scene: str = "boxroom",
                              depth_scale: float = 1000.0) -> str:
        """Write this scene in Replica's on-disk layout so the real loader
        can be tested (SURVEY.md §4.5 micro-dataset)."""
        import cv2

        from vf_nerf_tpu.utils.ply import save_ply
        base = os.path.join(root, "Replica")
        results = os.path.join(base, scene, "results")
        os.makedirs(results, exist_ok=True)
        h, w = self.image_size
        cam = {"camera": {"fx": float(self.intrinsics[0, 0]),
                          "fy": float(self.intrinsics[1, 1]),
                          "cx": float(self.intrinsics[0, 2]),
                          "cy": float(self.intrinsics[1, 2]),
                          "scale": depth_scale, "w": w, "h": h}}
        with open(os.path.join(base, "cam_params.json"), "w") as f:
            json.dump(cam, f)
        with open(os.path.join(base, scene, "traj.txt"), "w") as f:
            for pose in self.poses:
                f.write(" ".join(str(float(v))
                                 for v in pose.reshape(-1)) + "\n")
        for i in range(self.n_images):
            img = (self.rgb_images[i].reshape(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(results, f"frame{i:06d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            depth = (self.depth_images[i].reshape(h, w) *
                     depth_scale).astype(np.uint16)
            cv2.imwrite(os.path.join(results, f"depth{i:06d}.png"), depth)
        verts, faces = self.gt_mesh()
        save_ply(os.path.join(base, f"{scene}_mesh.ply"), verts, faces)
        return base

    def export_scannet_format(self, root: str, scene: str = "scene0000_00",
                              crop_edge: int = 0) -> str:
        """Write this scene in ScanNet's on-disk layout
        (``datasets/normal_datasets/scannet_dataset.py`` contract: color/,
        depth/ in mm, pose/*.txt, intrinsic/intrinsic_depth.txt,
        <scene>_vh_clean.ply)."""
        import cv2

        from vf_nerf_tpu.utils.ply import save_ply
        base = os.path.join(root, "ScanNet", scene)
        for sub in ("color", "depth", "pose", "intrinsic"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        h, w = self.image_size
        with open(os.path.join(base, "intrinsic",
                               "intrinsic_depth.txt"), "w") as f:
            for row in self.intrinsics:
                f.write(" ".join(str(float(v)) for v in row) + "\n")
        for i in range(self.n_images):
            img = (self.rgb_images[i].reshape(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(base, "color", f"{i:04d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            depth_mm = (self.depth_images[i].reshape(h, w) *
                        1000.0).astype(np.uint16)
            cv2.imwrite(os.path.join(base, "depth", f"{i:04d}.png"),
                        depth_mm)
            with open(os.path.join(base, "pose", f"{i:04d}.txt"), "w") as f:
                for row in self.poses[i]:
                    f.write(" ".join(str(float(v)) for v in row) + "\n")
        verts, faces = self.gt_mesh()
        save_ply(os.path.join(base, f"{scene}_vh_clean.ply"), verts, faces)
        return base
