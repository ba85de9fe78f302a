"""VF initialization pretraining tool.

The reference initializes the vector field from pretrained checkpoints
(``exps_vf_nerf/point_to_center/embedding.pth`` etc.,
``models/vector_field/vector_field_network.py:109-138``), but those files are
git-LFS pointer stubs in the mount — they must be regenerated (SURVEY.md
§3.5). This tool fits the VF MLP to an analytic target field and saves a
``.pkl`` the runner's ``_load_vf_init`` picks up:

- ``center``:    v(p) = normalize(centroid − p)   (field points at the centre;
  the reference's "point_to_center" init),
- ``exterior``:  v(p) = normalize(p − centroid)   (field points outward;
  "point_exterior"),
- ``exterior_scene``: outward inside the wall radius, inward outside — the
  composite an indoor scene wants (field points toward the nearest wall from
  both sides), with the wall radius = far/2, consistent with the border/
  centre supervision geometry (``train/vector_field_nerf_train.py:186-216``).

Usage:
    python -m vf_nerf_tpu.train.vf_init --mode exterior_scene \
        --out data/Replica/office0/office0.pkl --radius 2.1 [--steps 2000]
"""

from __future__ import annotations

import argparse
import os
import pickle
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vf_nerf_tpu.config.schema import VFNetConfig
from vf_nerf_tpu.models.networks import VectorFieldMLP
from vf_nerf_tpu.ops.rays import normalize


def target_field(points: jnp.ndarray, mode: str, centroid: jnp.ndarray,
                 wall_radius: float) -> jnp.ndarray:
    rel = points - centroid
    outward = normalize(rel, axis=1)
    if mode == "center":
        return -outward
    if mode == "exterior":
        return outward
    if mode == "exterior_scene":
        r = jnp.linalg.norm(rel, axis=1, keepdims=True)
        return jnp.where(r < wall_radius, outward, -outward)
    raise ValueError(f"unknown mode {mode}")


def fit_vf_init(config: VFNetConfig,
                mode: str,
                centroid: np.ndarray,
                sample_extent: float,
                wall_radius: float,
                steps: int = 2000,
                batch: int = 8192,
                lr: float = 1e-3,
                seed: int = 0,
                target_fn=None) -> Tuple[dict, dict]:
    """Train the VF net to regress the analytic target; returns
    (params, batch_stats). ``target_fn`` (points → unit field, jnp)
    overrides ``mode`` — used by tests/tools that fit a scene's exact
    analytic field (e.g. the joint-stage efficacy experiment)."""
    net = VectorFieldMLP(config)
    key = jax.random.PRNGKey(seed)
    variables = net.init(key, jnp.zeros((8, 3)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    centroid_j = jnp.asarray(centroid, jnp.float32)

    @jax.jit
    def step(params, opt_state, key):
        k_pts, key = jax.random.split(key)
        pts = centroid_j + sample_extent * \
            jax.random.uniform(k_pts, (batch, 3), minval=-1.0, maxval=1.0)
        target = (target_fn(pts) if target_fn is not None else
                  target_field(pts, mode, centroid_j, wall_radius))

        def loss_fn(p):
            out = net.apply({"params": p, "batch_stats": batch_stats}, pts,
                            train=False)
            return jnp.mean((out[:, :3] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, key

    for i in range(steps):
        params, opt_state, loss, key = step(params, opt_state, key)
        if i % 200 == 0:
            print(f"vf_init[{mode}] step {i}: loss {float(loss):.5f}")
    print(f"vf_init[{mode}] final loss {float(loss):.5f}")
    return jax.device_get(params), jax.device_get(batch_stats)


def default_vf_config() -> VFNetConfig:
    """The conf's VF architecture (confs/vf_nerf.conf:13-26)."""
    return VFNetConfig(input_dims=3, output_dims=3, dimensions=[256] * 8,
                       feature_vector_dims=256, embedder_multires=6,
                       weight_norm=False, batch_norm=True,
                       skip_connection_in=[4], bias_init=0.0, dropout=False,
                       dropout_probability=0.2, xavier_init=False, init="")


def main() -> None:
    parser = argparse.ArgumentParser(description="Pretrain VF init weights")
    parser.add_argument("--mode", type=str, default="exterior_scene",
                        choices=["center", "exterior", "exterior_scene"])
    parser.add_argument("--out", type=str, required=True,
                        help="output .pkl path")
    parser.add_argument("--centroid", type=float, nargs=3,
                        default=[0.0, 0.0, 0.0])
    parser.add_argument("--radius", type=float, default=2.0,
                        help="wall radius (typically far/2)")
    parser.add_argument("--extent", type=float, default=0.0,
                        help="sampling half-extent (default 1.5 * radius)")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    extent = args.extent if args.extent > 0 else 1.5 * args.radius
    params, batch_stats = fit_vf_init(
        default_vf_config(), args.mode, np.asarray(args.centroid),
        sample_extent=extent, wall_radius=args.radius, steps=args.steps,
        seed=args.seed)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"params": params, "batch_stats": batch_stats,
                     "mode": args.mode, "radius": args.radius}, f)
    print(f"saved VF init to {args.out}")


if __name__ == "__main__":
    main()
