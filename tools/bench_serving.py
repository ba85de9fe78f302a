"""Serving-throughput sweep: render rays/sec vs chunk size and compute dtype.

The headline bench (``bench.py``) pins the reference's 1024-ray eval chunks
(``evaluation/evaluate.py`` CLI default). At that size a v5e is nowhere near
compute-bound — this sweep measures the render path at serving-scale chunks
(4-32k rays) in float32 and bfloat16 (``DeviceConfig.compute_dtype``) to find
the chip's actual ceiling. Each (shape, dtype) pair pays one server-side
compile through the relay on first execution; timing starts after warmup.

Usage: python tools/bench_serving.py [--chunks 1024 4096 16384]
       [--dtypes float32 bfloat16] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunks", type=int, nargs="+",
                        default=[1024, 4096, 16384])
    parser.add_argument("--dtypes", type=str, nargs="+",
                        default=["float32", "bfloat16"])
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config
    from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                             render_rays)

    cfg = _full_config()
    statics = RenderStatics.from_config(cfg, n_fine=30, train=False)
    variables = None
    results = []
    for dtype in args.dtypes:
        modules = VFNerfModules(cfg, compute_dtype=dtype)
        if variables is None:  # same params for every dtype (f32 leaves)
            variables = modules.init_variables(jax.random.PRNGKey(0))

        def fn(variables, uv, pose, intrinsics, window, key):
            out = render_rays(modules, variables, uv, pose, intrinsics,
                              jnp.float32(0.0), jnp.float32(4.0), window,
                              key, statics)
            # Host-fetched scalar = the only reliable sync through the axon
            # relay (block_until_ready lies), and it defeats DCE.
            return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

        jitted = jax.jit(fn)
        for n_rays in args.chunks:
            rng = np.random.RandomState(0)
            uv = jnp.asarray(
                rng.uniform(0, 640, (n_rays, 2)).astype(np.float32))
            pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                       (n_rays, 1, 1)))
            intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
            intr[:, 0, 0] = intr[:, 1, 1] = 600.0
            intr[:, 0, 2], intr[:, 1, 2] = 320.0, 240.0
            intr = jnp.asarray(intr)
            window = jnp.full((11,), 0.09, jnp.float32)
            keys = [jax.random.PRNGKey(i) for i in range(args.iters + 1)]

            t0 = time.perf_counter()
            float(jitted(variables, uv, pose, intr, window, keys[0]))
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            for i in range(args.iters):
                out = jitted(variables, uv, pose, intr, window, keys[i + 1])
            float(out)
            elapsed = time.perf_counter() - t0
            row = {"dtype": dtype, "n_rays": n_rays,
                   "rays_per_sec": round(n_rays * args.iters / elapsed, 1),
                   "ms_per_chunk": round(elapsed / args.iters * 1e3, 3),
                   "first_exec_s": round(compile_s, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["rays_per_sec"])
    print(json.dumps({"metric": "best serving render rays/sec/chip",
                      "value": best["rays_per_sec"], "unit": "rays/sec",
                      "config": {k: best[k] for k in ("dtype", "n_rays")}}),
          flush=True)


if __name__ == "__main__":
    main()
