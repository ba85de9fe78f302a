"""Attribute the render chunk's time: MLP chains vs everything else.

The serving sweep (PARITY.md) showed the render path is dtype- and
chunk-size-insensitive — this script locates the ceiling by timing the two
folded MLP chains in isolation at exactly the point counts the full render
evaluates them at (VF: n_coarse + (n_coarse + n_fine) points per ray across
the coarse and merged passes; rendering net: n_coarse + n_fine), and
subtracting from the full `render_rays` time. The residual is sampling +
PE + density + compositing + XLA's (non-)overlap. Approximate — isolated
kernels fuse differently than in situ — but good to ~10%.

Usage: python tools/bench_render_breakdown.py [--rays 1024] [--iters 30]
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
    parser.add_argument("--rays", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _full_config
    from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                             render_rays)

    cfg = _full_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    statics = RenderStatics.from_config(cfg, n_fine=30, train=False)
    R = args.rays
    n_coarse, n_fine = statics.n_coarse, statics.n_fine
    n_vf = R * (n_coarse + n_coarse + n_fine)   # coarse pass + merged pass
    n_rn = R * (n_coarse + n_fine)
    feat = cfg.rendering_net_config.feature_vector_dims

    rng = np.random.RandomState(0)

    def timed(name, fn, *xs):
        jitted = jax.jit(fn)
        float(jitted(*xs))                       # compile + relay sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jitted(*xs)
        float(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)
        return ms

    # Full render (the bench.py workload).
    uv = jnp.asarray(rng.uniform(0, 640, (R, 2)).astype(np.float32))
    pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (R, 1, 1)))
    intr = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 600.0
    intr[:, 0, 2], intr[:, 1, 2] = 320.0, 240.0
    intr = jnp.asarray(intr)
    window = jnp.full((11,), 0.09, jnp.float32)
    key = jax.random.PRNGKey(1)

    def full(variables, uv):
        out = render_rays(modules, variables, uv, pose, intr,
                          jnp.float32(0.0), jnp.float32(4.0), window, key,
                          statics)
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

    full_ms = timed("full_render", full, variables, uv)

    # The two folded MLP chains at in-situ point counts.
    pts_vf = jnp.asarray(rng.randn(n_vf, 3).astype(np.float32))

    def vf_chain(variables, pts):
        vf_w, _ = modules.folded_weights(variables)
        return jnp.sum(modules.vf_apply_folded(vf_w, pts))

    vf_ms = timed("vf_mlp_chain", vf_chain, variables, pts_vf)

    pts_rn = jnp.asarray(rng.randn(n_rn, 3).astype(np.float32))
    normals = jnp.asarray(rng.randn(n_rn, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(n_rn, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(n_rn, feat).astype(np.float32))

    def rn_chain(variables, pts, normals, dirs, feats):
        _, rn_w = modules.folded_weights(variables)
        return jnp.sum(modules.render_apply_folded(rn_w, pts, normals,
                                                   dirs, feats))

    rn_ms = timed("rendering_mlp_chain", rn_chain, variables, pts_rn,
                  normals, dirs, feats)

    mlp = vf_ms + rn_ms
    print(json.dumps({
        "metric": "render chunk attribution",
        "full_ms": round(full_ms, 3),
        "mlp_ms": round(mlp, 3),
        "mlp_frac": round(mlp / full_ms, 3),
        "residual_ms": round(full_ms - mlp, 3),
        "note": "residual = sampling+PE+density+compositing+dispatch, "
                "minus whatever XLA overlaps with the MLPs in situ",
    }), flush=True)


if __name__ == "__main__":
    main()
