"""Multi-view reprojection (IBRNet-style ``Projector``).

Reference: ``utils/pinhole_model.py:101-227`` — projects 3D samples into a
set of source views, bilinearly samples their rgb/feature maps, and computes
per-view ray-difference features. Unused by the reference's training path
(SURVEY.md C12) but part of its public surface; reimplemented as pure JAX
(torch ``F.grid_sample`` → an explicit bilinear gather).

Camera rows follow the reference's 34-float layout:
``[height, width, K.flatten()(16), c2w.flatten()(16)]``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def inbound(pixel_locations: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """Pixel-in-image mask (reference ``:109-120``)."""
    return ((pixel_locations[..., 0] <= w - 1.0) &
            (pixel_locations[..., 0] >= 0) &
            (pixel_locations[..., 1] <= h - 1.0) &
            (pixel_locations[..., 1] >= 0))


def normalize_pixels(pixel_locations: jnp.ndarray, h: float,
                     w: float) -> jnp.ndarray:
    """Pixels → [-1, 1] (reference ``:122-132``)."""
    resize = jnp.asarray([w - 1.0, h - 1.0], pixel_locations.dtype)
    return 2.0 * pixel_locations / resize - 1.0


def bilinear_sample(image: jnp.ndarray,
                    pixel_locations: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of (H, W, C) at (..., 2) (x, y) pixel locations
    (align-corners grid_sample semantics on unnormalized coords)."""
    h, w = image.shape[:2]
    x = jnp.clip(pixel_locations[..., 0], 0.0, w - 1.0)
    y = jnp.clip(pixel_locations[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
            v10 * (1 - fx) * fy + v11 * fx * fy)


def compute_projections(xyz: jnp.ndarray,
                        train_cameras: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project points into source views (reference ``:134-154``).

    :param xyz: (..., 3); :param train_cameras: (V, 34).
    :return: (pixel locations (V, ..., 2), in-front mask (V, ...)).
    """
    shape = xyz.shape[:-1]
    flat = xyz.reshape(-1, 3)
    intrinsics = train_cameras[:, 2:18].reshape(-1, 4, 4)
    poses = train_cameras[:, -16:].reshape(-1, 4, 4)
    xyz_h = jnp.concatenate([flat, jnp.ones_like(flat[:, :1])], axis=-1)
    proj = jnp.einsum("vij,vjk,nk->vni", intrinsics,
                      jnp.linalg.inv(poses), xyz_h)
    z = jnp.maximum(proj[..., 2:3], 1e-8)
    pixels = jnp.clip(proj[..., :2] / z, -1e6, 1e6)
    mask = proj[..., 2] > 0
    return (pixels.reshape((len(train_cameras),) + shape + (2,)),
            mask.reshape((len(train_cameras),) + shape))


def compute_angle(xyz: jnp.ndarray, query_camera: jnp.ndarray,
                  train_cameras: jnp.ndarray) -> jnp.ndarray:
    """Per-view ray-difference features (reference ``:156-181``):
    unit difference of the query→point and source→point directions plus
    their dot product → (V, ..., 4)."""
    shape = xyz.shape[:-1]
    flat = xyz.reshape(-1, 3)
    train_pos = train_cameras[:, -16:].reshape(-1, 4, 4)[:, :3, 3]
    query_pos = query_camera[-16:].reshape(4, 4)[:3, 3]

    to_query = query_pos[None, None] - flat[None]
    to_query = to_query / (jnp.linalg.norm(to_query, axis=-1,
                                           keepdims=True) + 1e-6)
    to_train = train_pos[:, None] - flat[None]
    to_train = to_train / (jnp.linalg.norm(to_train, axis=-1,
                                           keepdims=True) + 1e-6)
    diff = to_query - to_train
    diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    dot = jnp.sum(to_query * to_train, axis=-1, keepdims=True)
    direction = diff / jnp.maximum(diff_norm, 1e-6)
    out = jnp.concatenate([direction, dot], axis=-1)
    return out.reshape((len(train_cameras),) + shape + (4,))


def project_and_sample(xyz: jnp.ndarray,
                       query_camera: jnp.ndarray,
                       train_images: jnp.ndarray,
                       train_cameras: jnp.ndarray,
                       feature_maps: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full projector (reference ``Projector.compute``, ``:183-227``).

    :param xyz: (R, S, 3) samples; :param train_images: (V, H, W, 3);
    :param feature_maps: (V, H, W, D).
    :return: (rgb+feat samples (R, S, V, 3+D), ray diffs (R, S, V, 4),
              validity mask (R, S, V, 1)).
    """
    h, w = train_images.shape[1:3]
    pixels, in_front = compute_projections(xyz, train_cameras)
    rgb = jnp.stack([bilinear_sample(train_images[v], pixels[v])
                     for v in range(len(train_cameras))])
    feats = jnp.stack([bilinear_sample(feature_maps[v], pixels[v])
                       for v in range(len(train_cameras))])
    rgb_feat = jnp.concatenate([rgb, feats], axis=-1)

    ray_diff = compute_angle(xyz, query_camera, train_cameras)
    mask = (inbound(pixels, h, w) & in_front).astype(xyz.dtype)

    # (V, R, S, ...) → (R, S, V, ...)
    return (jnp.moveaxis(rgb_feat, 0, 2),
            jnp.moveaxis(ray_diff, 0, 2),
            jnp.moveaxis(mask, 0, 2)[..., None])
