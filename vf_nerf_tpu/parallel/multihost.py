"""Multi-host initialization and host-local data feeding.

The reference has no multi-node story (``torch.distributed`` imported, never
initialized — ``train/vector_field_nerf_train.py:10-11``, SURVEY.md §5.8).
TPU-native multi-host is single-program SPMD: every host runs the same
script, ``jax.distributed.initialize()`` wires the processes, the global
mesh spans all chips, and each host feeds its local shard of the ray batch
(``jax.make_array_from_process_local_data``). Cross-slice DCN is only
involved if a mesh spans slices — out of scope for this model family.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vf_nerf_tpu.parallel.mesh import DATA_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Wire up multi-process JAX. Returns True iff a >1-process cluster is up.

    In managed TPU environments the arguments are auto-detected; pass them
    explicitly for manual clusters. An explicitly-requested cluster that
    fails to initialize RAISES — a real misconfiguration must not silently
    degrade to single-process training. Only the zero-argument auto-detect
    path is allowed to fall back (with a logged warning).
    """
    import logging
    log = logging.getLogger(__name__)

    # NOTE: must not touch the XLA backend before jax.distributed.initialize
    # (jax.process_count()/jax.devices() would initialize it single-process).
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError) as exc:
        log.warning("multi-host auto-detect failed (%s); continuing "
                    "single-process", exc)
        return False
    return jax.process_count() > 1


def global_mesh() -> Mesh:
    """1-D data mesh over every chip of every host."""
    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def local_ray_slice(n_global: int,
                    process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> slice:
    """This host's contiguous slice of a global ray axis of size
    ``n_global`` (must divide by the process count — the runner trims the
    batch to a multiple of the global device count, which the host count
    divides).

    Every host assembles the same global batch from the shared-seed RNG;
    each must feed ONLY its own slice to
    ``jax.make_array_from_process_local_data`` or the 'global' batch holds
    each ray ``process_count`` times (advisor r2 finding)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_global // pc
    return slice(pi * per, (pi + 1) * per)


def feed_global_batch(mesh: Mesh,
                      local_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Assemble a globally-sharded ray batch from each host's local slice.

    Every host passes its own ``local_batch`` (rays it loaded); the returned
    jax.Arrays are global views sharded on the ray axis across all hosts'
    devices.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in local_batch.items()}
