"""Camera model and ray generation.

Reference: ``utils/rendering.py:12-60`` (ray gen) and
``utils/pinhole_model.py:9-63`` (quat→rot, pixel→camera with skew). All
functions are pure, batched, and jit-friendly.

Conventions kept from the reference:
- poses are camera-to-world, either (N, 4, 4) matrices or (N, 7)
  ``[qw, qx, qy, qz, tx, ty, tz]`` quaternion+translation vectors,
- the camera-space depth of the pixel plane is ``sign(K[1, 1])``
  (``utils/rendering.py:42``), so flipped-fy datasets ray-cast correctly,
- returns (unnormalized directions, unit directions, camera locations).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-8  # torch F.normalize / F.cosine_similarity epsilon


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize along ``axis`` with torch's ``F.normalize`` semantics
    (divide by ``max(||v||, eps)``)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-quaternion (N, 4) ``[w, x, y, z]`` → rotation matrices (N, 3, 3).

    Reference: ``utils/pinhole_model.py:9-33``.
    """
    q = normalize(q, axis=1)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (y * x - z * w)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (y * x + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (z * x - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)
    return rows


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (N, 3, 3) → unit quaternions (N, 4) ``[w, x, y, z]``
    (inverse of ``quat_to_rot``; needed to initialize optimizable 7-d poses
    for the joint pose-field stage from dataset 4×4 poses).

    Branchless Shepperd-style extraction: build all four candidate
    quaternions and select by the largest diagonal-based magnitude.
    """
    m = rot
    t = m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]

    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) * 2
        return jnp.stack([0.25 * s,
                          (m[:, 2, 1] - m[:, 1, 2]) / s,
                          (m[:, 0, 2] - m[:, 2, 0]) / s,
                          (m[:, 1, 0] - m[:, 0, 1]) / s], axis=1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m[:, 0, 0] - m[:, 1, 1] -
                                 m[:, 2, 2], 1e-12)) * 2
        return jnp.stack([(m[:, 2, 1] - m[:, 1, 2]) / s,
                          0.25 * s,
                          (m[:, 0, 1] + m[:, 1, 0]) / s,
                          (m[:, 0, 2] + m[:, 2, 0]) / s], axis=1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m[:, 0, 0] + m[:, 1, 1] -
                                 m[:, 2, 2], 1e-12)) * 2
        return jnp.stack([(m[:, 0, 2] - m[:, 2, 0]) / s,
                          (m[:, 0, 1] + m[:, 1, 0]) / s,
                          0.25 * s,
                          (m[:, 1, 2] + m[:, 2, 1]) / s], axis=1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m[:, 0, 0] - m[:, 1, 1] +
                                 m[:, 2, 2], 1e-12)) * 2
        return jnp.stack([(m[:, 1, 0] - m[:, 0, 1]) / s,
                          (m[:, 0, 2] + m[:, 2, 0]) / s,
                          (m[:, 1, 2] + m[:, 2, 1]) / s,
                          0.25 * s], axis=1)

    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=1)
    scores = jnp.stack([t,
                        m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2],
                        m[:, 1, 1] - m[:, 0, 0] - m[:, 2, 2],
                        m[:, 2, 2] - m[:, 0, 0] - m[:, 1, 1]], axis=1)
    best = jnp.argmax(scores, axis=1)
    q = cands[jnp.arange(rot.shape[0]), best]
    return normalize(q, axis=1)


def matrix_to_pose7(pose: jnp.ndarray) -> jnp.ndarray:
    """(N, 4, 4) c2w → (N, 7) ``[qw, qx, qy, qz, tx, ty, tz]``."""
    q = rot_to_quat(pose[:, :3, :3])
    return jnp.concatenate([q, pose[:, :3, 3]], axis=1)


def pose7_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) quaternion+translation → (N, 4, 4) camera-to-world matrices.

    Reference: ``utils/rendering.py:27-33``.
    """
    n = pose.shape[0]
    rot = quat_to_rot(pose[:, :4])
    mat = jnp.tile(jnp.eye(4, dtype=pose.dtype), (n, 1, 1))
    mat = mat.at[:, :3, :3].set(rot)
    mat = mat.at[:, :3, 3].set(pose[:, 4:])
    return mat


def pixel_to_camera(u: jnp.ndarray,
                    v: jnp.ndarray,
                    z: jnp.ndarray,
                    intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pixel coordinates → homogeneous camera coordinates, with skew.

    Reference: ``utils/pinhole_model.py:36-63``. ``intrinsics`` is (N, 4, 4)
    per-ray; z carries the depth sign while x/y use ``|z|``.
    """
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    cx = intrinsics[:, 0, 2]
    cy = intrinsics[:, 1, 2]
    skew = intrinsics[:, 0, 1]

    abs_z = jnp.abs(z)
    x = (u - cx + cy * skew / fy - skew * v / fy) / fx * abs_z
    y = (v - cy) / fy * abs_z
    return jnp.stack([x, y, z, jnp.ones_like(z)], axis=-1)


def get_ray_directions_and_cam_location(
        uv: jnp.ndarray,
        pose: jnp.ndarray,
        intrinsics: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel ray directions and camera centers.

    Reference: ``utils/rendering.py:12-60``.

    :param uv: (N, 2) pixel coordinates.
    :param pose: (N, 4, 4) c2w matrices or (N, 7) quat+translation.
    :param intrinsics: (N, 4, 4) intrinsics (skew supported).
    :return: (directions (N, 3) unnormalized, ray_dirs (N, 3) unit,
              cam_loc (N, 3)).
    """
    if pose.ndim == 2 and pose.shape[1] == 7:
        cam_loc = pose[:, 4:]
        mat = pose7_to_matrix(pose)
    else:
        cam_loc = pose[:, :3, 3]
        mat = pose

    # Depth of the pixel plane carries the sign of fy (rendering.py:42).
    z = jnp.sign(intrinsics[0, 1, 1]) * jnp.ones(uv.shape[0], dtype=uv.dtype)
    pix_cam = pixel_to_camera(uv[:, 0], uv[:, 1], z, intrinsics)

    world = jnp.einsum("nij,nj->ni", mat, pix_cam)[:, :3]
    directions = world - cam_loc
    ray_dirs = normalize(directions, axis=-1)
    return directions, ray_dirs, cam_loc
