"""Child process for the two-process multi-host test (test_parallel.py).

Each process: force the CPU backend, join the localhost cluster via
``initialize_multihost``, build the global mesh, feed a host-local ray
slice through ``feed_global_batch``, and check a cross-host reduction
(implicit all-reduce under jit + explicit ``psum`` via ``shard_map``)
against the analytically-known global sum.

Usage: python multihost_child.py <port> <process_id> <num_processes>
"""

import os
import sys


def main() -> None:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vf_nerf_tpu.parallel.mesh import DATA_AXIS
    from vf_nerf_tpu.parallel.multihost import (feed_global_batch,
                                                global_mesh,
                                                initialize_multihost,
                                                local_ray_slice)

    ok = initialize_multihost(f"localhost:{port}", nproc, pid)
    assert ok, "cluster did not come up"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    mesh = global_mesh()
    n_local = 4
    local = {"x": np.arange(n_local * 3, dtype=np.float32).reshape(
        n_local, 3) + 100.0 * pid}
    batch = feed_global_batch(mesh, local)
    x = batch["x"]
    assert x.shape == (n_local * nproc, 3), x.shape
    # Every process can compute the expected global sum analytically.
    base = np.arange(n_local * 3, dtype=np.float32).sum()
    expected = sum(base + 100.0 * p * n_local * 3 for p in range(nproc))

    # Implicit cross-host all-reduce (jit over the global sharded array).
    total = float(jax.jit(jnp.sum)(x))
    assert abs(total - expected) < 1e-3, (total, expected)

    # Explicit psum over the data axis.
    f = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(jnp.sum(a), DATA_AXIS),
        mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P()))
    total2 = float(f(x))
    assert abs(total2 - expected) < 1e-3, (total2, expected)

    # Runner feeding contract (advisor r2 fix): every host assembles the
    # SAME global batch (shared-seed RNG) and must feed only its
    # local_ray_slice — the resulting global array holds each ray exactly
    # once, so its sum equals the single-host batch sum (not nproc× it).
    n_global = 8
    full = np.arange(n_global * 3, dtype=np.float32).reshape(n_global, 3)
    local = full[local_ray_slice(n_global, pid, nproc)]
    batch2 = feed_global_batch(mesh, {"x": local})
    assert batch2["x"].shape == (n_global, 3), batch2["x"].shape
    total3 = float(jax.jit(jnp.sum)(batch2["x"]))
    assert abs(total3 - full.sum()) < 1e-3, (total3, full.sum())

    print(f"MULTIHOST_OK pid={pid} total={total}", flush=True)


if __name__ == "__main__":
    main()
