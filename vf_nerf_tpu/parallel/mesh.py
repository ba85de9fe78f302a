"""Device mesh helpers for data-parallel ray sharding.

Reference parallelism is single-process ``nn.DataParallel``
(``models/nerf/vector_field_nerf.py:70-75``). The TPU-native equivalent
(SURVEY.md §5.8): a 1-D ``Mesh(('data',))`` over all chips; ray batches are
sharded on the ray axis, parameters are replicated, and XLA inserts the
gradient all-reduce over ICI when the jitted step consumes sharded rays and
produces replicated parameter updates.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(single-program SPMD; same code path).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def apply_platform(platform: str) -> None:
    """Honor ``DeviceConfig.platform`` (CLI ``--gpu cpu``/``tpu``).

    Must run before the first JAX computation. This image's sitecustomize
    pins ``jax_platforms`` via jax.config, so the ``JAX_PLATFORMS`` env var
    alone cannot select CPU — the config update is the only reliable switch
    (DEVELOPMENT.md).
    """
    if not platform:
        return
    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError as exc:  # backends already initialized
        import warnings
        warnings.warn(f"could not switch JAX platform to {platform!r}: {exc}")


def make_mesh(num_devices: int = 0,
              devices: Optional[list] = None) -> Mesh:
    """1-D data mesh over ``num_devices`` (0 = all local devices)."""
    devs = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with the ray axis split across devices."""
    sharding = ray_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a (K, R, ...) stacked batch with axis 1 (rays) split across
    devices — the scan-dispatch layout (axis 0 is the scan/step axis)."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate the train state on every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), state)


def pad_to_multiple(n: int, devices: int) -> int:
    """Smallest multiple of ``devices`` ≥ n (ray batches must divide evenly)."""
    return ((n + devices - 1) // devices) * devices
