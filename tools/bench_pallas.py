"""Pallas-vs-XLA benchmark on the real TPU chip (VERDICT r1 item 3).

Three measurements at the headline eval workload (1024-ray chunks,
100 coarse + 30 fine samples, full 256-wide nets):

1. full render chunk, XLA fast path (statics.pallas=False) — the default;
2. full render chunk, Pallas path (fused VMEM MLPs + fused ray-march kernel);
3. the isolated post-MLP ray-march stage, XLA chain vs fused kernel.

Sync caveat (DEVELOPMENT.md): ``block_until_ready`` lies through the axon
relay — every timing loop ends with a host fetch of a scalar reduction over
the outputs, which also defeats DCE.
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time(run, keys, n_iters=50):
    float(run(keys[0]))  # compile + sync
    start = time.perf_counter()
    out = None
    for i in range(n_iters):
        out = run(keys[i % len(keys)])
    float(out)  # hard sync
    return (time.perf_counter() - start) / n_iters


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config
    from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                             render_rays)
    from vf_nerf_tpu.ops.density import DensityParams
    from vf_nerf_tpu.ops.ray_march import fused_ray_march, ray_march_reference

    cfg = _full_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))

    n_rays = cfg.ray_sampler_config.rays_per_batch
    rng = np.random.RandomState(0)
    uv = jnp.asarray(rng.uniform(0, 640, (n_rays, 2)).astype(np.float32))
    pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1)))
    intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 600.0
    intr[:, 0, 2], intr[:, 1, 2] = 320.0, 240.0
    intr = jnp.asarray(intr)
    window = jnp.full((11,), 0.09, jnp.float32)
    keys = [jax.random.PRNGKey(i) for i in range(64)]

    results = {}
    for mlp, march in ((False, False), (True, False), (False, True),
                       (True, True)):
        statics = RenderStatics.from_config(cfg, n_fine=30, train=False)
        statics = dataclasses.replace(statics, pallas_mlp=mlp,
                                      pallas_march=march)

        # Same harness as bench.py: state/batch are traced args, not
        # closed-over constants (constant-embedding changes the HLO).
        @jax.jit
        def fn(variables, uv, pose, intr, window, key, statics=statics):
            out = render_rays(modules, variables, uv, pose, intr,
                              jnp.float32(0.0), jnp.float32(4.0), window,
                              key, statics)
            return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

        def reduced(key, fn=fn):
            return fn(variables, uv, pose, intr, window, key)

        dt = _time(reduced, keys)
        name = f"mlp={'P' if mlp else 'X'},march={'P' if march else 'X'}"
        results[f"render_chunk[{name}]_ms"] = round(dt * 1e3, 3)
        results[f"render_chunk[{name}]_rays_per_sec"] = round(n_rays / dt, 1)

    # ---- isolated post-MLP ray-march stage --------------------------------
    n_samples = 130
    normals = jnp.asarray(rng.randn(n_rays, n_samples, 3), jnp.float32)
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=1, keepdims=True))
    z = jnp.asarray(np.sort(rng.uniform(0.1, 4.0, (n_rays, n_samples)),
                            axis=1), jnp.float32)
    rgb = jnp.asarray(rng.rand(n_rays, n_samples, 3), jnp.float32)
    params = DensityParams(beta=jnp.float32(0.5), scale=jnp.float32(100.0),
                           mean=jnp.float32(0.7))
    kw = dict(beta_bounds=(1e-4, 1e9), scale_min=1.0, mean_bounds=(0.6, 1.0),
              cutoff=-0.5, dir_to_normal_th=-0.2, normalize=True)

    for name, f in (("xla", ray_march_reference), ("pallas", fused_ray_march)):
        @jax.jit
        def reduced_march(key, f=f):
            # key folds into normals so each iter is fresh work (no DCE).
            n2 = normals + jax.random.uniform(key, (1,)) * 1e-6
            r, d, w = f(n2, dirs, z, rgb, params, window, **kw)
            return jnp.sum(r) + jnp.sum(d) + jnp.sum(w)

        dt = _time(reduced_march, keys, n_iters=100)
        results[f"ray_march_stage_{name}_us"] = round(dt * 1e6, 1)

    results["device"] = str(jax.devices()[0])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
