"""vf-nerf-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of VF-NeRF.

VF-NeRF (arXiv:2408.08766) represents an indoor scene as a neural unit vector
field pointing toward the nearest surface; volume-rendering density is derived
from the windowed cosine similarity of consecutive field samples along each ray
pushed through a truncated, scaled Laplace CDF.

This package is a from-scratch re-design of the reference PyTorch codebase
(``albertgassol1/vf-nerf``) for TPU:

- ``ops``       — pure jittable functions (rays, samplers, density, window
                  cosine, compositing, annealing).
- ``models``    — Flax MLPs (vector field + IDR-style color net) and the fused
                  functional renderer ``render_rays``.
- ``parallel``  — device-mesh data-parallel training step (``shard_map`` +
                  ``psum`` over ICI).
- ``datasets``  — host-side numpy data pipeline (Replica / ScanNet / synthetic).
- ``train``     — experiment runner, CLI, VF-init pretraining tool.
- ``evaluation``— chunked image rendering, contrastive marching cubes, TSDF
                  fusion, 2D/3D metrics.
- ``config``    — HOCON config system mirroring the reference's public surface
                  (same ``confs/vf_nerf.conf`` files parse unchanged).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: full-size render/train graphs take
# minutes to compile on the remote-compile TPU tunnel; cache them across
# processes. Opt out with VFNERF_NO_COMPILE_CACHE=1.
if not _os.environ.get("VFNERF_NO_COMPILE_CACHE"):
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                           _os.path.expanduser("~/.cache/vf_nerf_tpu_xla"))
    _os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
