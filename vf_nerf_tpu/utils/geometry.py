"""Geometry utilities.

Reference: ``utils/utils.py`` — sphere intersections (``:31-54``),
plane projection (``:188-214``), dominant-basis extraction from mesh normals
(``:216-233``, the joint-optimization support surface, SURVEY.md C24).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp


def compute_sphere_intersections(cam_loc: jnp.ndarray,
                                 ray_directions: jnp.ndarray,
                                 radius: float = 1.0) -> jnp.ndarray:
    """Near/far ray-sphere intersection depths (reference
    ``utils/utils.py:31-54``). Raises on rays missing the sphere, matching
    the reference's sanity check."""
    ray_cam_dot = jnp.sum(ray_directions * cam_loc, axis=-1, keepdims=True)
    under_sqrt = ray_cam_dot ** 2 - (
        jnp.sum(cam_loc ** 2, axis=-1, keepdims=True) - radius ** 2)
    if bool(jnp.any(under_sqrt <= 0)):
        raise ValueError("BOUNDING SPHERE PROBLEM!")
    roots = jnp.sqrt(under_sqrt) * jnp.asarray([-1.0, 1.0]) - ray_cam_dot
    return jnp.maximum(roots, 0.0)


def project_to_plane(points: jnp.ndarray, vectors: jnp.ndarray,
                     u_plane: jnp.ndarray, v_plane: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project points/vectors onto a (u, v) plane basis (reference
    ``utils/utils.py:188-214``; used by the quiver plots)."""
    u = u_plane / jnp.linalg.norm(u_plane)
    v = v_plane / jnp.linalg.norm(v_plane)
    origin = points[0]
    pu = (points - origin) @ u
    pv = (points - origin) @ v
    vu = vectors @ u
    vv = vectors @ v
    return jnp.stack([pu, pv], axis=1), jnp.stack([vu, vv], axis=1)


def get_dominant_bases(num_bases: int, decimation: float,
                       path_to_mesh: str, seed: int = 0) -> np.ndarray:
    """Cluster mesh normals into the scene's dominant directions (reference
    ``utils/utils.py:216-233``: trimesh quadric decimation + sklearn KMeans;
    here area-weighted face-normal subsampling + scipy kmeans)."""
    from scipy.cluster.vq import kmeans2

    from vf_nerf_tpu.utils.meshes import face_areas_and_centroids
    from vf_nerf_tpu.utils.ply import load_ply

    verts, faces = load_ply(path_to_mesh)
    if len(faces) == 0:
        raise ValueError(f"mesh {path_to_mesh} has no faces")
    tri = verts[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    ok = norms[:, 0] > 1e-12
    normals = normals[ok] / norms[ok]

    # decimation ∈ (0, 1]: fraction of faces kept (the reference decimates
    # the mesh to that fraction before clustering).
    rng = np.random.RandomState(seed)
    keep = max(int(len(normals) * decimation), min(len(normals), num_bases))
    idx = rng.choice(len(normals), size=keep, replace=False)
    centers, _ = kmeans2(normals[idx].astype(np.float64), num_bases,
                         minit="++", seed=seed)
    return centers.astype(np.float32)
