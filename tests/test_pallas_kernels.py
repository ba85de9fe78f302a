"""Pallas kernel parity (interpreter mode on the CPU test mesh).

- ``ops/fused_mlp.fused_mlp(use_pallas=True)`` vs its XLA oracle
  ``mlp_reference`` — the all-layers-fused VMEM MLP.
- ``ops/ray_march.fused_ray_march`` vs ``ray_march_reference`` (the exact
  XLA chain: window cosine → Laplace density → suppression → VolSDF weights
  → composite), including window edge quirks, annealed taps, padding tails,
  and the white-background branch.

On the real chip these kernels compile through Mosaic; here they run under
``interpret=True`` so the math is pinned without TPU hardware. The measured
TPU comparison lives in PARITY.md §perf (tools/bench_pallas.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_nerf_tpu.ops.density import DensityParams
from vf_nerf_tpu.ops.fused_mlp import fused_mlp, mlp_reference
from vf_nerf_tpu.ops.ray_march import fused_ray_march, ray_march_reference

BOUNDS = dict(beta_bounds=(1e-4, 1e9), scale_min=1.0,
              mean_bounds=(0.6, 1.0), cutoff=-0.5, dir_to_normal_th=-0.2)


def _random_inputs(n_rays, n_samples, seed=0):
    rng = np.random.RandomState(seed)
    normals = rng.randn(n_rays, n_samples, 3).astype(np.float32)
    # Mix in smooth structure so sign flips (surface crossings) exist.
    t = np.linspace(0, np.pi, n_samples, dtype=np.float32)
    normals[..., 0] += np.cos(3 * t)[None]
    dirs = rng.randn(n_rays, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    z = np.sort(rng.uniform(0.1, 4.0, (n_rays, n_samples)),
                axis=1).astype(np.float32)
    rgb = rng.rand(n_rays, n_samples, 3).astype(np.float32)
    return (jnp.asarray(normals), jnp.asarray(dirs), jnp.asarray(z),
            jnp.asarray(rgb))


class TestFusedMLP:
    @pytest.mark.parametrize("skip_at,final_act", [(None, "none"),
                                                   (2, "tanh"),
                                                   (None, "sigmoid")])
    def test_matches_reference(self, skip_at, final_act):
        rng = np.random.RandomState(1)
        dims = [39, 64, 64, 64, 32]
        weights = []
        for i in range(len(dims) - 1):
            in_d = dims[i] + (dims[0] if skip_at == i else 0)
            weights.append((jnp.asarray(rng.randn(in_d, dims[i + 1]) * 0.2,
                                        jnp.float32),
                            jnp.asarray(rng.randn(dims[i + 1]) * 0.1,
                                        jnp.float32)))
        x = jnp.asarray(rng.randn(300, 39), jnp.float32)  # non-multiple of
        ours = fused_mlp(weights, x, skip_at=skip_at,      # the block size
                         final_act=final_act, block_points=128,
                         use_pallas=True)
        ref = mlp_reference(weights, x, skip_at, final_act)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFusedRayMarch:
    @pytest.mark.parametrize("n_samples", [26, 130, 200])
    def test_matches_xla_chain(self, n_samples):
        normals, dirs, z, rgb = _random_inputs(70, n_samples)
        params = DensityParams(beta=jnp.float32(0.5),
                               scale=jnp.float32(100.0),
                               mean=jnp.float32(0.7))
        w = jnp.full((11,), 0.09, jnp.float32)
        ours = fused_ray_march(normals, dirs, z, rgb, params, w,
                               normalize=True, block_rays=64, **BOUNDS)
        ref = ray_march_reference(normals, dirs, z, rgb, params, w,
                                  normalize=True, **BOUNDS)
        for a, b, name in zip(ours, ref, ("rgb", "depth", "weights")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)

    def test_annealed_weights_and_white_bg(self):
        normals, dirs, z, rgb = _random_inputs(40, 64, seed=3)
        params = DensityParams(beta=jnp.float32(0.3),
                               scale=jnp.float32(50.0),
                               mean=jnp.float32(0.8))
        # Asymmetric annealed taps incl. a negative neighbour (|·| path).
        w = jnp.asarray([0.01, -0.02, 0.05, 0.1, 0.15, 0.4, 0.12, 0.08,
                         0.04, 0.02, 0.01], jnp.float32)
        ours = fused_ray_march(normals, dirs, z, rgb, params, w,
                               normalize=False, white_background=True,
                               block_rays=32, **BOUNDS)
        ref = ray_march_reference(normals, dirs, z, rgb, params, w,
                                  normalize=False, white_background=True,
                                  **BOUNDS)
        for a, b, name in zip(ours, ref, ("rgb", "depth", "weights")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=name)

    def test_render_rays_pallas_flag_parity(self):
        """Full render_rays with statics.pallas=True (fused MLP + fused ray
        march) equals the default XLA fast path."""
        import dataclasses

        from test_renderer import tiny_config
        from vf_nerf_tpu.models.renderer import (RenderStatics,
                                                 VFNerfModules, render_rays)

        cfg = tiny_config(n_samples=20, n_importance=6, perturb=False)
        modules = VFNerfModules(cfg)
        variables = modules.init_variables(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        n_rays = 40
        uv = rng.uniform(0, 40, (n_rays, 2)).astype(np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr[:, 0, 0] = intr[:, 1, 1] = 30.0
        intr[:, 0, 2], intr[:, 1, 2] = 20.0, 16.0

        statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
        args = (modules, variables, jnp.asarray(uv), jnp.asarray(pose),
                jnp.asarray(intr), jnp.float32(0.0), jnp.float32(4.0),
                jnp.asarray(cfg.cos_sim_weights), jax.random.PRNGKey(1))
        base = render_rays(*args, statics)
        fused = render_rays(*args, dataclasses.replace(
            statics, pallas_mlp=True, pallas_march=True))
        for key in ("rgb", "depth", "weights", "z_vals"):
            np.testing.assert_allclose(np.asarray(fused[key]),
                                       np.asarray(base[key]),
                                       rtol=1e-4, atol=1e-5, err_msg=key)

    def test_reference_chain_equals_renderer_ops(self):
        """ray_march_reference must BE the renderer's get_density+compositing
        (guards the oracle itself against drift)."""
        import dataclasses

        from test_renderer import tiny_config
        from vf_nerf_tpu.models.renderer import (RenderStatics, get_density,
                                                 _weights_from_density)
        from vf_nerf_tpu.ops import compositing

        cfg = tiny_config(n_samples=20, n_importance=6, perturb=False)
        statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
        statics = dataclasses.replace(statics, dir_to_normal_th=-0.2)
        normals, dirs, z, rgb = _random_inputs(30, 26, seed=5)
        params = DensityParams(beta=jnp.float32(0.5),
                               scale=jnp.float32(100.0),
                               mean=jnp.float32(0.7))
        w = jnp.full((11,), 1.0 / 11, jnp.float32)

        dirs_rep = jnp.repeat(dirs[:, None, :], 26, axis=1)
        sigma = get_density(normals, dirs_rep, params, w, statics, fine=True)
        weights = _weights_from_density(z, sigma, statics)
        rgb_o, depth_o = compositing.composite_rgb_depth(weights, rgb, z)

        r2, d2, w2 = ray_march_reference(
            normals, dirs, z, rgb, params, w,
            beta_bounds=statics.beta_bounds, scale_min=statics.scale_min,
            mean_bounds=statics.mean_bounds, cutoff=statics.cutoff,
            dir_to_normal_th=statics.dir_to_normal_th,
            normalize=statics.normalize_rendering)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(rgb_o),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(depth_o),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(weights),
                                   rtol=1e-6)
