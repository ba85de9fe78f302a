"""Test-only access to the mounted reference implementation as an oracle.

The upstream VF-NeRF repo (read-only at /root/reference) is plain
Python/PyTorch and runs on CPU, so parity tests import its modules and compare
our JAX ops against its outputs bit-close. Production code never touches this;
tests skip cleanly when the mount is absent.
"""

import os
import sys

REFERENCE_PATH = os.environ.get("VFNERF_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "models"))


def add_reference_to_path() -> None:
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def install_reference_stubs() -> None:
    """Make reference modules with unavailable deps importable.

    ``utils/utils.py`` and the dataset loaders import open3d, trimesh, lpips,
    skimage, requests, sklearn, torchvision at module level; none are in this
    image. The stubs installed here are *functional* where the oracle code
    paths actually use them:

    - ``skimage.img_as_float32`` — real conversion semantics (uint8 → /255),
      used by ``utils.load_rgb`` (utils.py:85);
    - ``trimesh.load`` — reads the ply and exposes ``centroid`` (area-weighted
      face-centroid mean, trimesh's documented semantics, computed inline
      here, independently of vf_nerf_tpu.utils.meshes) and ``bounds``, used
      by the dataset loaders (replica_dataset.py:84-86).
    """
    import types

    import numpy as np

    def _img_as_float32(img):
        img = np.asarray(img)
        if np.issubdtype(img.dtype, np.integer):
            return (img / np.iinfo(img.dtype).max).astype(np.float32)
        return img.astype(np.float32)

    class _StubMesh:
        def __init__(self, path):
            from vf_nerf_tpu.utils.ply import load_ply
            verts, faces = load_ply(path)
            verts = verts.astype(np.float64)
            if len(faces):
                tri = verts[faces]                      # (F, 3, 3)
                cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
                areas = 0.5 * np.linalg.norm(cross, axis=1)
                cents = tri.mean(axis=1)
                self.centroid = (cents * areas[:, None]).sum(0) / areas.sum()
            else:
                self.centroid = verts.mean(axis=0)
            self.bounds = np.stack([verts.min(axis=0), verts.max(axis=0)])

    for name in ("open3d", "trimesh", "lpips", "skimage", "requests",
                 "sklearn", "sklearn.cluster", "torchvision",
                 "torchvision.transforms", "numba"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "numba":
                # marching_cubes_vt decorates two DEAD-code functions with
                # @numba.jit (SURVEY.md headline facts); a pass-through
                # decorator keeps the module importable as an oracle.
                mod.jit = lambda *a, **k: (lambda f: f)
            if name == "sklearn.cluster":
                mod.KMeans = object
            if name == "torchvision.transforms":
                mod.ToTensor = mod.Normalize = mod.Compose = object
            if name == "skimage":
                mod.img_as_float32 = _img_as_float32
            if name == "trimesh":
                mod.Trimesh = object
                mod.load = _StubMesh
                # utils.get_chamfer_distance calls
                # trimesh.sample.sample_surface(mesh, n) (utils.py:343);
                # the chamfer oracle test feeds fixed point sets by giving
                # the fake mesh a ``.points`` attribute, so both sides of
                # the parity check consume identical samples.
                sample_mod = types.ModuleType("trimesh.sample")
                sample_mod.sample_surface = \
                    lambda m, n: (np.asarray(m.points)[:n], None)
                mod.sample = sample_mod
                sys.modules["trimesh.sample"] = sample_mod
            sys.modules[name] = mod
