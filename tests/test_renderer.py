"""Renderer tests: shapes, determinism, coarse-only path, density glue parity."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_nerf_tpu.config.schema import (DensityConfig, DeviceConfig,
                                       RaySamplerConfig, RenderingNetConfig,
                                       SchedulerConfig, VFNerfConfig,
                                       VFNetConfig)
from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                         get_density, render_rays)
from vf_nerf_tpu.ops.density import init_density_params


def tiny_config(n_samples=20, n_importance=6, perturb=True,
                batch_norm=True) -> VFNerfConfig:
    return VFNerfConfig(
        vf_net_config=VFNetConfig(
            input_dims=3, output_dims=3, dimensions=[32, 32, 32],
            feature_vector_dims=16, embedder_multires=4, weight_norm=False,
            batch_norm=batch_norm, skip_connection_in=[2], bias_init=0.0,
            dropout=False, dropout_probability=0.0, xavier_init=False,
            init=""),
        rendering_net_config=RenderingNetConfig(
            output_dims=3, dimensions=[32, 32], feature_vector_dims=16,
            weight_norm=False, batch_norm=batch_norm, mode="idr",
            embedder_multires=2, detach_normals=True),
        ray_sampler_config=RaySamplerConfig(
            n_samples=n_samples, n_importance=n_importance,
            rays_per_batch=64, perturb=perturb, near=0.0, far=4.0,
            fine_range=0.3, increase_every=50, max_samples=40),
        device_config=DeviceConfig(),
        scheduler_config=SchedulerConfig(lr=5e-4, lr_decay_factor=0.1,
                                         lr_decay_steps=1000, clip_norm=0.5),
        density_config=DensityConfig(
            beta_bounds=[1e-4, 1e9], mean_bounds=[0.6, 1.0], scale_min=1.0,
            params_init={"beta": 0.5, "mean": 0.7, "scale": 100.0},
            cutoff=-2.0),
        cos_sim_weights=tuple([0.09] * 11),
        cos_sim_weights_anneal="hard",
        anneal_start=700, anneal_end=1400,
        rendering="volsdf", normalize_rendering=True,
        dir_to_normal_th=-2.0)


def make_batch(n_rays=32):
    ds = SyntheticBoxDataset(n_images=2, image_size=(8, 12),
                             pixels_per_batch=n_rays)
    batch = next(ds.epoch_batches(np.random.RandomState(0)))
    return ds, {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    ds, batch = make_batch()
    return cfg, modules, variables, ds, batch


def _render(cfg, modules, variables, batch, ds, n_fine, perturb=True,
            key=0, **kw):
    statics = RenderStatics.from_config(
        dataclasses.replace(
            cfg, ray_sampler_config=dataclasses.replace(
                cfg.ray_sampler_config, perturb=perturb)),
        n_fine=n_fine, train=False, **kw)
    near, far = ds.get_bounds()
    weights = jnp.asarray(cfg.cos_sim_weights)
    return render_rays(modules, variables, batch["uv"], batch["pose"],
                       batch["intrinsics"], jnp.float32(near),
                       jnp.float32(far), weights, jax.random.PRNGKey(key),
                       statics)


class TestRenderRays:
    def test_shapes_with_fine(self, setup):
        cfg, modules, variables, ds, batch = setup
        out = _render(cfg, modules, variables, batch, ds, n_fine=6)
        n_rays = batch["uv"].shape[0]
        s = 20 + 6
        assert out["rgb"].shape == (n_rays, 3)
        assert out["depth"].shape == (n_rays, 1)
        assert out["normals"].shape == (n_rays, s, 3)
        assert out["points"].shape == (n_rays, s, 3)
        assert out["z_vals"].shape == (n_rays, s)
        assert out["weights"].shape == (n_rays, s)
        assert out["sample_colors"].shape == (n_rays, s, 3)
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))
        rgb = np.asarray(out["rgb"])
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0

    def test_coarse_only_path(self, setup):
        """The reference raises NameError with n_importance == 0
        (SURVEY.md §3.2); ours must work."""
        cfg, modules, variables, ds, batch = setup
        out = _render(cfg, modules, variables, batch, ds, n_fine=0)
        assert out["rgb"].shape == (batch["uv"].shape[0], 3)
        assert out["z_vals"].shape == (batch["uv"].shape[0], 20)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))

    def test_deterministic_given_key(self, setup):
        cfg, modules, variables, ds, batch = setup
        a = _render(cfg, modules, variables, batch, ds, n_fine=6, key=1)
        b = _render(cfg, modules, variables, batch, ds, n_fine=6, key=1)
        np.testing.assert_array_equal(np.asarray(a["rgb"]),
                                      np.asarray(b["rgb"]))

    def test_no_perturb_key_independent(self, setup):
        cfg, modules, variables, ds, batch = setup
        a = _render(cfg, modules, variables, batch, ds, n_fine=0,
                    perturb=False, key=1)
        b = _render(cfg, modules, variables, batch, ds, n_fine=0,
                    perturb=False, key=2)
        np.testing.assert_array_equal(np.asarray(a["rgb"]),
                                      np.asarray(b["rgb"]))

    def test_z_vals_sorted_in_bounds(self, setup):
        cfg, modules, variables, ds, batch = setup
        out = _render(cfg, modules, variables, batch, ds, n_fine=6)
        z = np.asarray(out["z_vals"])
        assert np.all(np.diff(z, axis=1) >= 0)
        near, far = ds.get_bounds()
        # fine window can exceed [near, far] by fine_range (argmax at edges)
        assert z.min() >= near - cfg.ray_sampler_config.fine_range - 1e-5
        assert z.max() <= far + cfg.ray_sampler_config.fine_range + 1e-5

    def test_dir_derivatives_path(self, setup):
        cfg, modules, variables, ds, batch = setup
        out = _render(cfg, modules, variables, batch, ds, n_fine=4,
                      compute_dir_derivatives=True)
        n = batch["uv"].shape[0] * 24 * 2
        assert out["dir_derivative_norms"].shape == (n,)
        assert np.all(np.isfinite(np.asarray(out["dir_derivative_norms"])))

    def test_nerf_rendering_mode(self, setup):
        cfg, modules, variables, ds, batch = setup
        cfg2 = dataclasses.replace(cfg, rendering="nerf")
        out = _render(cfg2, modules, variables, batch, ds, n_fine=6)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))

    def test_fast_eval_paths_match_reference_path(self, setup):
        """BN-folded fast path (and the coarse-reuse variant) must equal the
        reference-shaped path numerically."""
        from vf_nerf_tpu.models.renderer import RenderStatics
        cfg, modules, variables, ds, batch = setup
        near, far = ds.get_bounds()
        weights = jnp.asarray(cfg.cos_sim_weights)
        key = jax.random.PRNGKey(3)

        def run(**kw):
            statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
            statics = dataclasses.replace(statics, **kw)
            from vf_nerf_tpu.models.renderer import render_rays
            return render_rays(modules, variables, batch["uv"],
                               batch["pose"], batch["intrinsics"],
                               jnp.float32(near), jnp.float32(far), weights,
                               key, statics)

        slow = run(fast_eval=False)
        folded = run(fast_eval=True, reuse_coarse=False)
        reused = run(fast_eval=True, reuse_coarse=True)
        for fast_out in (folded, reused):
            np.testing.assert_allclose(np.asarray(fast_out["rgb"]),
                                       np.asarray(slow["rgb"]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(fast_out["depth"]),
                                       np.asarray(slow["depth"]),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(fast_out["z_vals"]),
                                       np.asarray(slow["z_vals"]),
                                       rtol=1e-5, atol=1e-6)


class TestGetDensity:
    """Oracle for the VF→σ glue (reference vector_field_nerf.py:442-474)."""

    def _numpy_oracle(self, normals, ray_dirs, weights, th, cutoff,
                      params, bounds):
        import models.helpers.functions as ref_functions
        import torch
        from models.helpers.density_functions import LaplaceDensity
        n_taps = len(weights)
        uniform = torch.full((n_taps,), 1.0 / n_taps)
        cos = ref_functions.window_cosine_similarity(
            torch.from_numpy(normals[:, :-1].copy()),
            torch.from_numpy(normals[:, 1:].copy()), uniform).numpy()
        import torch.nn.functional as F
        cos_ray = F.cosine_similarity(
            torch.from_numpy(normals[:, :-1]),
            torch.from_numpy(ray_dirs[:, :-1]), dim=2).numpy()
        ref_density = LaplaceDensity(
            params_init=params, beta_bounds=tuple(bounds["beta"]),
            scale_min=bounds["scale_min"], mean_bounds=tuple(bounds["mean"]))
        with torch.no_grad():
            sigma = ref_density.density_func(
                torch.from_numpy(-cos.reshape(-1, 1)),
                cutoff=cutoff).numpy().reshape(cos.shape)
        sigma[(cos_ray < th) & (cos < 0)] = 0.0
        return np.concatenate(
            [sigma, np.zeros((sigma.shape[0], 1), np.float32)], axis=1)

    def test_parity_with_reference_math(self, setup):
        from reference_oracle import (add_reference_to_path,
                                      reference_available)
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()

        cfg, _, _, _, _ = setup
        rng = np.random.RandomState(0)
        normals = rng.randn(4, 26, 3).astype(np.float32)
        ray_dirs = rng.randn(4, 26, 3).astype(np.float32)
        params = {"beta": 0.5, "mean": 0.7, "scale": 100.0}

        statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
        # use a tighter threshold so the suppression branch activates
        statics = dataclasses.replace(statics, dir_to_normal_th=-0.2)
        # the reference's effective cutoff is the Density.forward default
        # −0.5, never the config value (quirk; density_functions.py:20-34)
        assert statics.cutoff == -0.5
        ours = get_density(jnp.asarray(normals), jnp.asarray(ray_dirs),
                           init_density_params(params),
                           jnp.asarray(cfg.cos_sim_weights), statics,
                           fine=True)
        oracle = self._numpy_oracle(
            normals, ray_dirs, cfg.cos_sim_weights, -0.2, -0.5,
            params, {"beta": cfg.density_config.beta_bounds,
                     "scale_min": cfg.density_config.scale_min,
                     "mean": cfg.density_config.mean_bounds})
        np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4,
                                   atol=1e-3)


class TestAnnealFine:
    def test_anneal_fine_uses_annealed_weights_on_fine_pass(self):
        """In anneal_fine mode the fine-pass density uses the annealed window
        while the coarse pass stays uniform (reference
        vector_field_nerf.py:453-455; the mode the reference's own config
        validation rejects — reachable here)."""
        import dataclasses as dc

        from vf_nerf_tpu.models.renderer import get_density
        from vf_nerf_tpu.ops.annealing import linear_annealing_weights
        from vf_nerf_tpu.ops.density import init_density_params

        cfg = tiny_config()
        statics = RenderStatics.from_config(
            dc.replace(cfg, cos_sim_weights_anneal="anneal_fine"),
            n_fine=6, train=False)
        rng = np.random.RandomState(0)
        normals = rng.randn(4, 26, 3).astype(np.float32)
        ray_dirs = rng.randn(4, 26, 3).astype(np.float32)
        params = init_density_params({"beta": 0.5, "mean": 0.7,
                                      "scale": 100.0})
        annealed = jnp.asarray(linear_annealing_weights(11, 700, 600))
        uniform = jnp.full((11,), 1.0 / 11.0)

        fine_annealed = get_density(jnp.asarray(normals),
                                    jnp.asarray(ray_dirs), params, annealed,
                                    statics, fine=True)
        coarse = get_density(jnp.asarray(normals), jnp.asarray(ray_dirs),
                             params, annealed, statics, fine=False)
        fine_uniform = get_density(jnp.asarray(normals),
                                   jnp.asarray(ray_dirs), params, uniform,
                                   statics, fine=True)
        # fine pass differs under annealed weights; coarse pass equals the
        # uniform-window fine pass (both use uniform).
        assert not np.allclose(np.asarray(fine_annealed),
                               np.asarray(coarse))
        np.testing.assert_allclose(np.asarray(fine_uniform),
                                   np.asarray(coarse), rtol=1e-6)


class TestComputeDtype:
    """bfloat16 compute path (DeviceConfig.compute_dtype): same params, same
    pipeline, MLP matmuls in bf16 — outputs must stay float32 and track the
    f32 render within bf16 tolerance (no reference counterpart; TPU serving
    mode)."""

    def test_bf16_render_close_to_f32(self, setup):
        cfg, modules, variables, ds, batch = setup
        bf16_modules = VFNerfModules(cfg, compute_dtype="bfloat16")
        out32 = _render(cfg, modules, variables, batch, ds, n_fine=6,
                        perturb=False)
        out16 = _render(cfg, bf16_modules, variables, batch, ds, n_fine=6,
                        perturb=False)
        assert out16["rgb"].dtype == jnp.float32
        assert out16["depth"].dtype == jnp.float32
        # bf16 has ~3 decimal digits; through 3+2 layers the error grows but
        # rgb lives in [0,1] — a few 1e-2 absolute is the expected envelope.
        np.testing.assert_allclose(np.asarray(out16["rgb"]),
                                   np.asarray(out32["rgb"]), atol=4e-2)
        np.testing.assert_allclose(np.asarray(out16["depth"]),
                                   np.asarray(out32["depth"]), atol=0.1)

    def test_facade_plumbs_compute_dtype(self):
        import dataclasses as dc

        from vf_nerf_tpu.models.nerf import VectorFieldNerf

        cfg = tiny_config()
        cfg = dc.replace(cfg, device_config=dc.replace(
            cfg.device_config, compute_dtype="bfloat16"))
        model = VectorFieldNerf(cfg, seed=0)
        assert model.modules.compute_dtype == jnp.bfloat16
        # params stay float32 (mixed precision, not a cast model).
        leaves = jax.tree_util.tree_leaves(model.state.params)
        assert all(x.dtype == jnp.float32 for x in leaves)


class TestConfigMatrix:
    """End-to-end render across the reference's config corners: rendering-
    net modes (``rendering_network.py:40-60``: idr / no_view_dir /
    no_normals), weight-normalized nets (``nn.utils.weight_norm``
    parameterization), and both compositing modes. Each cell must produce
    finite, in-range outputs — these paths exist upstream but only ``idr``
    + plain BN nets are exercised by the parity suite."""

    @pytest.mark.parametrize("mode", ["idr", "no_view_dir", "no_normals"])
    @pytest.mark.parametrize("weight_norm", [False, True])
    def test_modes_render_finite(self, mode, weight_norm):
        import dataclasses as dc

        cfg = tiny_config(batch_norm=not weight_norm)
        cfg = dc.replace(
            cfg,
            vf_net_config=dc.replace(cfg.vf_net_config,
                                     weight_norm=weight_norm),
            rendering_net_config=dc.replace(cfg.rendering_net_config,
                                            mode=mode,
                                            weight_norm=weight_norm))
        modules = VFNerfModules(cfg)
        variables = modules.init_variables(jax.random.PRNGKey(0))
        ds, batch = make_batch(n_rays=16)
        out = _render(cfg, modules, variables, batch, ds, n_fine=6,
                      perturb=False)
        rgb = np.asarray(out["rgb"])
        assert rgb.shape == (16, 3)
        assert np.all(np.isfinite(rgb))
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        assert np.all(np.isfinite(np.asarray(out["depth"])))

    def test_nerf_rendering_mode_finite(self):
        import dataclasses as dc

        cfg = dc.replace(tiny_config(), rendering="nerf")
        modules = VFNerfModules(cfg)
        variables = modules.init_variables(jax.random.PRNGKey(0))
        ds, batch = make_batch(n_rays=16)
        out = _render(cfg, modules, variables, batch, ds, n_fine=6,
                      perturb=False)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))


class TestRenderImage:
    def test_scan_image_render_equals_per_chunk_facade(self):
        """``render_image`` (whole image as one on-device lax.scan) must
        reproduce the per-chunk facade path exactly — eval semantics
        (perturb off) make the PRNG key inert, so only layout differs."""
        import dataclasses as dc

        from vf_nerf_tpu.models.nerf import VectorFieldNerf

        cfg = tiny_config(perturb=False)
        ds = SyntheticBoxDataset(n_images=1, image_size=(8, 12),
                                 pixels_per_batch=32, all_pixels=True)
        batch = ds[0]
        n = batch["uv"].shape[0]          # 96 pixels
        split = 40                        # forces a padded tail chunk

        # Two identically-seeded models: both paths must consume the SAME
        # per-chunk key chain (keys are not inert — the range-fine
        # sampler draws random depths for argmax-0 rays even in eval).
        scan_model = VectorFieldNerf(cfg, seed=0)
        scan_model.eval()
        scan_model.near, scan_model.far = ds.get_bounds()
        rgb_scan, depth_scan = scan_model.render_image(
            batch["uv"], batch["pose"][0], batch["intrinsics"][0],
            epoch=0, split_size=split)

        model = VectorFieldNerf(cfg, seed=0)
        model.eval()
        model.near, model.far = ds.get_bounds()
        rgbs, depths = [], []
        for start in range(0, n, split):
            end = min(start + split, n)
            uv = batch["uv"][start:end]
            pose = batch["pose"][start:end]
            intr = batch["intrinsics"][start:end]
            pad = split - (end - start)
            if pad:
                uv = np.concatenate([uv, np.repeat(uv[-1:], pad, 0)])
                pose = np.concatenate([pose, np.repeat(pose[-1:], pad, 0)])
                intr = np.concatenate([intr, np.repeat(intr[-1:], pad, 0)])
            out = model.render(pose, uv, intr, 0)
            rgbs.append(np.asarray(out["rgb"])[:end - start])
            depths.append(np.asarray(out["depth"])[:end - start])
        rgb_chunk = np.concatenate(rgbs)
        depth_chunk = np.concatenate(depths)

        np.testing.assert_allclose(rgb_scan, rgb_chunk, atol=1e-6)
        np.testing.assert_allclose(depth_scan, depth_chunk, atol=1e-6)


class TestRenderImagesPipelined:
    def test_pipelined_equals_serial(self, tmp_path, monkeypatch):
        """``render_images`` double-buffers (image i+1 dispatches before
        image i's fetch). The RNG chain follows DISPATCH order, which is
        unchanged, so outputs must stay bit-equal to serially fetched
        per-image ``render_image`` calls on an identically seeded model."""
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.evaluation import methods
        from vf_nerf_tpu.models.nerf import VectorFieldNerf

        cfg = tiny_config(perturb=False)

        def factory(c):
            return SyntheticBoxDataset(config=c, n_images=3,
                                       image_size=(8, 12))

        monkeypatch.setitem(methods.dataset_dict, "synthetic", factory)
        dcfg = DatasetConfig(dataset_name="synthetic", data_dir="",
                             shuffle_views=False, pixels_per_batch=32,
                             scene="box", data_root_dir="", factor=1,
                             all_pixels=True)

        model = VectorFieldNerf(cfg, seed=0)
        model.eval()
        methods.render_images(model, str(tmp_path), dcfg, epoch=0,
                              split_size=40)

        ds = factory(dcfg)
        ds.all_pixels = True
        model2 = VectorFieldNerf(cfg, seed=0)
        model2.eval()
        model2.near, model2.far = ds.get_bounds()
        h, w = ds.image_size
        img_dir = os.path.join(str(tmp_path), "rendered_images")
        for i in range(3):
            batch = ds[i]
            rgb, depth = model2.render_image(
                batch["uv"], batch["pose"][0], batch["intrinsics"][0],
                0, split_size=40)
            depth_img = np.zeros((h, w), np.float32)
            rgb_img = np.zeros((h, w, 3), np.float32)
            xs = batch["uv"][:, 0].astype(np.int64)
            ys = batch["uv"][:, 1].astype(np.int64)
            rgb_img[ys, xs] = rgb
            depth_img[ys, xs] = depth[:, 0]
            saved_depth = np.load(os.path.join(img_dir, f"depth-{i}.npy"))
            np.testing.assert_array_equal(saved_depth, depth_img)
            from vf_nerf_tpu.utils import io as io_utils
            saved_rgb = io_utils.load_rgb(
                os.path.join(img_dir, f"image-{i}.png"), transpose=False)
            np.testing.assert_allclose(saved_rgb, rgb_img, atol=1.01 / 255)
