"""Golden-value parity tests: our JAX ops vs the reference PyTorch math.

The reference repo is imported directly (CPU torch) as the oracle — see
``reference_oracle.py``. Tolerances are fp32-level (~1e-5), per SURVEY.md §4.
"""

import numpy as np
import pytest

from reference_oracle import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vf_nerf_tpu.ops import annealing, compositing, density, embedding  # noqa: E402
from vf_nerf_tpu.ops import rays as rays_ops  # noqa: E402
from vf_nerf_tpu.ops import samplers, window  # noqa: E402

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return np.asarray(x)


class TestEmbedding:
    @pytest.mark.parametrize("multires", [1, 4, 6])
    def test_matches_reference(self, multires):
        from models.helpers.embedder import get_embedder
        embed_fn, out_dim = get_embedder(multires, input_dims=3)

        x = np.random.RandomState(0).randn(17, 3).astype(np.float32)
        ours = embedding.positional_encoding(jnp.asarray(x), multires)
        theirs = embed_fn(torch.from_numpy(x)).numpy()

        assert embedding.embedding_dim(multires, 3) == out_dim
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=ATOL)

    def test_dims(self):
        assert embedding.embedding_dim(6, 3) == 39
        assert embedding.embedding_dim(4, 3) == 27
        assert embedding.embedding_dim(0, 3) == 3


class TestRays:
    def test_ray_gen_matrix_pose(self):
        import utils.rendering as ref_rendering

        rng = np.random.RandomState(1)
        n = 32
        uv = rng.uniform(0, 600, size=(n, 2)).astype(np.float32)
        # Random c2w with orthonormal rotation.
        from scipy.spatial.transform import Rotation
        pose = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        pose[:, :3, :3] = Rotation.random(n, random_state=2).as_matrix()
        pose[:, :3, 3] = rng.randn(n, 3)
        intr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        intr[:, 0, 0] = 500.0
        intr[:, 1, 1] = 480.0
        intr[:, 0, 2] = 320.0
        intr[:, 1, 2] = 240.0
        intr[:, 0, 1] = 0.3  # skew

        ours = rays_ops.get_ray_directions_and_cam_location(
            jnp.asarray(uv), jnp.asarray(pose), jnp.asarray(intr))
        theirs = ref_rendering.get_ray_directions_and_cam_location(
            torch.from_numpy(uv), torch.from_numpy(pose),
            torch.from_numpy(intr), device=torch.device("cpu"))

        for o, t in zip(ours, theirs):
            np.testing.assert_allclose(_np(o), t.reshape(_np(o).shape).numpy(),
                                       rtol=1e-4, atol=1e-4)

    def test_negative_fy_depth_sign(self):
        import utils.rendering as ref_rendering
        n = 8
        uv = np.random.RandomState(3).uniform(0, 100, (n, 2)).astype(np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        intr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        intr[:, 0, 0] = 100.0
        intr[:, 1, 1] = -100.0  # flipped fy → depth sign flips

        ours = rays_ops.get_ray_directions_and_cam_location(
            jnp.asarray(uv), jnp.asarray(pose), jnp.asarray(intr))
        theirs = ref_rendering.get_ray_directions_and_cam_location(
            torch.from_numpy(uv), torch.from_numpy(pose),
            torch.from_numpy(intr), device=torch.device("cpu"))
        np.testing.assert_allclose(_np(ours[1]),
                                   theirs[1].reshape(n, 3).numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_quat_to_rot_vs_scipy(self):
        from scipy.spatial.transform import Rotation
        rng = np.random.RandomState(4)
        q_wxyz = rng.randn(16, 4).astype(np.float32)
        ours = _np(rays_ops.quat_to_rot(jnp.asarray(q_wxyz)))
        # scipy uses xyzw ordering.
        q_xyzw = np.concatenate([q_wxyz[:, 1:], q_wxyz[:, :1]], axis=1)
        theirs = Rotation.from_quat(
            q_xyzw / np.linalg.norm(q_xyzw, axis=1, keepdims=True)).as_matrix()
        np.testing.assert_allclose(ours, theirs.astype(np.float32),
                                   rtol=1e-4, atol=1e-4)


class TestDensity:
    def test_laplace_density_matches_reference(self):
        from models.helpers.density_functions import LaplaceDensity

        params_init = {"beta": 0.5, "scale": 100.0, "mean": 0.7}
        beta_bounds = (1e-4, 1e9)
        mean_bounds = (0.6, 1.0)
        scale_min = 1.0
        cutoff = -2.0

        ref = LaplaceDensity(params_init=params_init,
                             beta_bounds=beta_bounds, scale_min=scale_min,
                             mean_bounds=mean_bounds)
        x = np.linspace(-2.5, 2.5, 101).astype(np.float32)
        with torch.no_grad():
            theirs = ref.density_func(torch.from_numpy(x),
                                      cutoff=cutoff).numpy()

        p = density.init_density_params(params_init)
        ours = density.laplace_density(jnp.asarray(x), p, beta_bounds,
                                       scale_min, mean_bounds, cutoff=cutoff)
        np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=1e-4)

    def test_laplace_density_sdf_matches_reference(self):
        """Covers both SdfDensity (:51) and LaplaceDensitySdf (:301) — they
        are byte-identical math in the reference."""
        from models.helpers.density_functions import LaplaceDensitySdf

        ref = LaplaceDensitySdf(params_init={"beta": 0.3}, beta_min=1e-4)
        x = np.linspace(-1.5, 1.5, 77).astype(np.float32)
        with torch.no_grad():
            theirs = ref.density_func(torch.from_numpy(x)).numpy()
        ours = density.laplace_density_sdf(jnp.asarray(x),
                                           jnp.asarray(0.3), beta_min=1e-4)
        np.testing.assert_allclose(_np(ours), theirs, rtol=RTOL, atol=1e-4)

    def test_param_clamps(self):
        from models.helpers.density_functions import LaplaceDensity
        params_init = {"beta": -3.0, "scale": -0.2, "mean": 7.0}
        ref = LaplaceDensity(params_init=params_init,
                             beta_bounds=(1e-4, 1.0), scale_min=1.0,
                             mean_bounds=(0.6, 1.0))
        p = density.init_density_params(params_init)
        assert float(density.get_beta(p, (1e-4, 1.0))) == pytest.approx(
            float(ref.get_beta()))
        assert float(density.get_scale(p, 1.0)) == pytest.approx(
            float(ref.get_scale()))
        assert float(density.get_mean(p, (0.6, 1.0))) == pytest.approx(
            float(ref.get_mean()))


class TestWindowCosine:
    @pytest.mark.parametrize("n_samples", [30, 101, 130])
    def test_matches_reference(self, n_samples):
        import models.helpers.functions as ref_functions

        rng = np.random.RandomState(5)
        normals = rng.randn(6, n_samples, 3).astype(np.float32)
        weights = rng.uniform(0.01, 0.2, size=11).astype(np.float32)

        x, y = normals[:, :-1], normals[:, 1:]
        theirs = ref_functions.window_cosine_similarity(
            torch.from_numpy(x.copy()), torch.from_numpy(y.copy()),
            torch.from_numpy(weights)).numpy()
        ours = window.window_cosine_similarity(jnp.asarray(x), jnp.asarray(y),
                                               jnp.asarray(weights))
        np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-5)

    def test_negative_weights_and_annealed(self):
        import models.helpers.functions as ref_functions
        rng = np.random.RandomState(6)
        normals = rng.randn(3, 60, 3).astype(np.float32)
        weights = annealing.linear_annealing_weights(11, 700, 300)
        x, y = normals[:, :-1], normals[:, 1:]
        theirs = ref_functions.window_cosine_similarity(
            torch.from_numpy(x.copy()), torch.from_numpy(y.copy()),
            torch.from_numpy(weights)).numpy()
        ours = window.window_cosine_similarity(jnp.asarray(x), jnp.asarray(y),
                                               jnp.asarray(weights))
        np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-5)

    def test_edges_keep_raw_cosine(self):
        rng = np.random.RandomState(7)
        normals = rng.randn(2, 40, 3).astype(np.float32)
        w = np.full(11, 0.09, dtype=np.float32)
        x, y = jnp.asarray(normals[:, :-1]), jnp.asarray(normals[:, 1:])
        out = window.window_cosine_similarity(x, y, jnp.asarray(w))
        raw = window.cosine_similarity(x, y)
        np.testing.assert_allclose(_np(out[:, :7]), _np(raw[:, :7]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(_np(out[:, -7:]), _np(raw[:, -7:]),
                                   rtol=1e-6, atol=1e-6)


class TestCompositing:
    def test_volsdf_matches_reference(self):
        import utils.rendering as ref_rendering
        rng = np.random.RandomState(8)
        z = np.sort(rng.uniform(0, 5, size=(16, 40)).astype(np.float32), axis=1)
        sigma = rng.uniform(0, 50, size=(16, 40)).astype(np.float32)
        for normalize in (True, False):
            theirs = ref_rendering.volsdf_volume_rendering(
                torch.from_numpy(z), torch.from_numpy(sigma),
                normalize).numpy()
            ours = compositing.volsdf_volume_rendering(
                jnp.asarray(z), jnp.asarray(sigma), normalize)
            np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-6)

    def test_nerf_weights_vs_hand_cumprod(self):
        rng = np.random.RandomState(9)
        z = np.sort(rng.uniform(0, 5, size=(4, 20)).astype(np.float32), axis=1)
        sigma = rng.uniform(0, 10, size=(4, 20)).astype(np.float32)
        dists = np.concatenate([z[:, 1:] - z[:, :-1],
                                np.full((4, 1), 1e10, np.float32)], axis=1)
        alpha = 1 - np.exp(-dists * sigma)
        expected = alpha * np.cumprod(1 - alpha + 1e-10, axis=1)
        ours = compositing.nerf_volume_rendering(jnp.asarray(z),
                                                 jnp.asarray(sigma))
        np.testing.assert_allclose(_np(ours), expected, rtol=1e-4, atol=1e-6)

    def test_composite_rgb_depth_matches_reference(self):
        import utils.rendering as ref_rendering
        rng = np.random.RandomState(10)
        w = rng.uniform(0, 1, size=(8, 12)).astype(np.float32)
        rgb = rng.uniform(0, 1, size=(8, 12, 3)).astype(np.float32)
        z = np.sort(rng.uniform(0, 3, size=(8, 12)).astype(np.float32), axis=1)
        for white in (False, True):
            t_rgb, t_depth = ref_rendering.get_rgb_and_depth(
                torch.from_numpy(w), torch.from_numpy(rgb),
                torch.from_numpy(z), white)
            o_rgb, o_depth = compositing.composite_rgb_depth(
                jnp.asarray(w), jnp.asarray(rgb), jnp.asarray(z), white)
            np.testing.assert_allclose(_np(o_rgb), t_rgb.numpy(),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(_np(o_depth), t_depth.numpy(),
                                       rtol=1e-5, atol=1e-6)


class TestSamplers:
    def test_uniform_deterministic_matches_reference(self):
        from models.samplers.ray_sampler import UniformSampler
        ref = UniformSampler(100, 0.0, 4.0, deterministic=True)
        dirs = torch.randn(13, 3)
        theirs = ref.get_z_vals(dirs, torch.zeros(13, 3),
                                device=torch.device("cpu")).numpy()
        ours = samplers.uniform_z_vals(jax.random.PRNGKey(0), 13, 100,
                                       0.0, 4.0, perturb=False)
        np.testing.assert_allclose(_np(ours), theirs, rtol=1e-6, atol=1e-6)

    def test_uniform_perturbed_within_strata(self):
        z = samplers.uniform_z_vals(jax.random.PRNGKey(1), 64, 100, 0.0, 4.0,
                                    perturb=True)
        z = _np(z)
        assert np.all(np.diff(z, axis=1) >= -1e-6)  # sorted within each ray
        assert z.min() >= 0.0 and z.max() <= 4.0

    def test_range_fine_deterministic_window_matches_reference(self):
        from models.samplers.ray_sampler import RangeFineSampler
        rng = np.random.RandomState(11)
        n_rays, n_coarse, n_fine = 10, 50, 16
        coarse_z = np.sort(rng.uniform(0, 4, (n_rays, n_coarse)), axis=1) \
            .astype(np.float32)
        weights = rng.uniform(0, 1, (n_rays, n_coarse)).astype(np.float32)
        weights[:, 0] = 0.0  # force argmax > 0 → deterministic branch

        ref = RangeFineSampler(n_fine, 0.0, 4.0, deterministic=True,
                               range=0.3, max_samples=100)
        theirs = ref.get_z_vals(torch.zeros(n_rays, 3), torch.zeros(n_rays, 3),
                                device=torch.device("cpu"),
                                coarse_z_vals=torch.from_numpy(coarse_z),
                                coarse_weights=torch.from_numpy(weights))
        ours = samplers.range_fine_z_vals(jax.random.PRNGKey(2),
                                          jnp.asarray(coarse_z),
                                          jnp.asarray(weights), n_fine,
                                          fine_range=0.3, near=0.0, far=4.0,
                                          perturb=False)
        np.testing.assert_allclose(_np(ours), theirs.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_range_fine_argmax_zero_uses_random_extras(self):
        rng = np.random.RandomState(12)
        coarse_z = np.sort(rng.uniform(0, 4, (4, 30)), axis=1).astype(np.float32)
        weights = np.zeros((4, 30), dtype=np.float32)
        weights[:, 0] = 1.0  # argmax == 0 on every ray
        out = samplers.range_fine_z_vals(jax.random.PRNGKey(3),
                                         jnp.asarray(coarse_z),
                                         jnp.asarray(weights), 8,
                                         fine_range=0.3, near=0.0, far=4.0,
                                         perturb=False)
        out = _np(out)
        assert out.shape == (4, 38)
        assert np.all(np.diff(out, axis=1) >= 0)
        assert out.min() >= 0.0 and out.max() <= 4.0

    def test_sample_pdf_deterministic_matches_reference(self):
        from models.samplers.ray_sampler import FineSampler
        rng = np.random.RandomState(13)
        # cdf has len(weights)+1 entries and must match len(bins).
        bins = np.sort(rng.uniform(0, 4, (6, 31)), axis=1).astype(np.float32)
        weights = rng.uniform(0, 1, (6, 30)).astype(np.float32)
        ref = FineSampler(24, deterministic=True)
        theirs = ref.sample_pdf(torch.from_numpy(bins),
                                torch.from_numpy(weights)).numpy()
        ours = samplers.sample_pdf(jax.random.PRNGKey(4), jnp.asarray(bins),
                                   jnp.asarray(weights), 24,
                                   deterministic=True)
        np.testing.assert_allclose(_np(ours), theirs, rtol=1e-4, atol=1e-5)

    def test_points_from_z(self):
        cam = jnp.asarray([[1.0, 2.0, 3.0]])
        dirs = jnp.asarray([[0.0, 0.0, 2.0]])
        z = jnp.asarray([[0.5, 1.0]])
        pts = _np(samplers.points_from_z(cam, dirs, z))
        np.testing.assert_allclose(pts, [[[1, 2, 4], [1, 2, 5]]])


class TestAnnealing:
    @pytest.mark.parametrize("soft", [False, True])
    @pytest.mark.parametrize("epoch", [-5, 0, 100, 350, 650, 699, 700])
    def test_matches_reference(self, soft, epoch):
        from utils.weight_annealing import LinearAnnealing
        ref = LinearAnnealing(11, 700, soft)
        theirs = ref.get_weights(epoch, torch.device("cpu")).numpy()
        ours = annealing.linear_annealing_weights(11, 700, epoch, soft)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_epoch_gate(self):
        base = np.full(11, 0.09, dtype=np.float32)
        w = annealing.annealed_window_weights(base, "hard", 700, 1400, 700)
        np.testing.assert_allclose(w, base)
        w = annealing.annealed_window_weights(base, "none", 700, 1400, 5000)
        np.testing.assert_allclose(w, base)
        w = annealing.annealed_window_weights(base, "hard", 700, 1400, 1000)
        ref = annealing.linear_annealing_weights(11, 700, 300)
        np.testing.assert_allclose(w, ref)


class TestPoints:
    def test_border_mask_matches_reference_gather(self):
        import models.helpers.functions as ref_functions
        from vf_nerf_tpu.ops import points as points_ops

        rng = np.random.RandomState(14)
        pts = rng.uniform(-3, 3, size=(5, 20, 3)).astype(np.float32)
        normals = rng.randn(5, 20, 3).astype(np.float32)
        centroid = np.array([0.2, -0.1, 0.3], dtype=np.float32)
        far, radius = 4.0, 0.15

        t_normals, t_gt = ref_functions.get_border_indices_and_gt(
            torch.from_numpy(pts), torch.from_numpy(normals), far, radius,
            torch.from_numpy(centroid))
        mask, gt = points_ops.border_mask_and_gt(jnp.asarray(pts), far, radius,
                                                 jnp.asarray(centroid))
        mask = _np(mask)
        np.testing.assert_allclose(normals[mask], t_normals.numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(_np(gt)[mask], t_gt.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_center_mask_matches_reference_gather(self):
        import models.helpers.functions as ref_functions
        from vf_nerf_tpu.ops import points as points_ops

        rng = np.random.RandomState(15)
        pts = rng.uniform(-1, 1, size=(5, 20, 3)).astype(np.float32)
        normals = rng.randn(5, 20, 3).astype(np.float32)
        centroid = np.zeros(3, dtype=np.float32)
        radius = 0.5

        t_normals, t_gt = ref_functions.get_center_indices_and_gt(
            torch.from_numpy(pts), torch.from_numpy(normals),
            torch.from_numpy(centroid), radius)
        mask, gt = points_ops.center_mask_and_gt(jnp.asarray(pts),
                                                 jnp.asarray(centroid), radius)
        mask = _np(mask)
        np.testing.assert_allclose(normals[mask], t_normals.numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(_np(gt)[mask], t_gt.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_shell_sampler_radii(self):
        from vf_nerf_tpu.ops import points as points_ops
        pts = _np(points_ops.sphere_shell_sample(jax.random.PRNGKey(5), 4096,
                                                 r_max=2.0, r_min=1.0))
        r = np.linalg.norm(pts, axis=1)
        assert r.min() >= 1.0 - 1e-5 and r.max() <= 2.0 + 1e-5
        # cube-root density → more mass near r_max
        assert np.median(r) > 1.5
