"""Tests for the capability-parity extras: NerfOutput, NDC, Projector,
MC alternative path, multihost helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import add_reference_to_path, reference_available


class TestNerfOutput:
    def test_contract(self):
        from vf_nerf_tpu.models.output import NerfOutput
        out = NerfOutput(coarse_rgb_values=jnp.zeros((4, 3)),
                         coarse_normals=jnp.ones((4, 6, 3)))
        assert not out.fine_active()
        assert out.get_normals().shape == (4, 6, 3)
        d = out.to_dict()
        assert "coarse_rgb_values" in d and "fine_normals" not in d

    def test_from_render_dict(self):
        from vf_nerf_tpu.models.output import NerfOutput
        render = {"rgb": jnp.zeros((4, 3)), "depth": jnp.zeros((4, 1)),
                  "normals": jnp.ones((4, 6, 3)),
                  "points": jnp.zeros((4, 6, 3)),
                  "z_vals": jnp.zeros((4, 6)), "weights": jnp.zeros((4, 6)),
                  "sample_colors": jnp.zeros((4, 6, 3))}
        out = NerfOutput.from_render_dict(render)
        assert out.coarse_rgb_values.shape == (4, 3)
        assert out.coarse_colors.shape == (24, 3)


class TestNDC:
    def test_matches_reference(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import torch
        import utils.rendering as ref_rendering

        from vf_nerf_tpu.ops.ndc import convert_to_ndc
        rng = np.random.RandomState(0)
        n = 16
        origins = rng.randn(n, 3).astype(np.float32)
        origins[:, 2] = -np.abs(origins[:, 2]) - 1.5  # in front, z<0 (LLFF)
        dirs = rng.randn(n, 3).astype(np.float32)
        dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
        intr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        intr[:, 0, 0] = 400.0
        intr[:, 0, 2], intr[:, 1, 2] = 319.5, 239.5

        t_o, t_d = ref_rendering.convert_to_ndc(torch.from_numpy(origins),
                                                torch.from_numpy(dirs),
                                                torch.from_numpy(intr))
        o_o, o_d = convert_to_ndc(jnp.asarray(origins), jnp.asarray(dirs),
                                  jnp.asarray(intr))
        np.testing.assert_allclose(np.asarray(o_o), t_o.numpy(), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_d), t_d.numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestProjector:
    def _cameras(self, n_views, h, w, rng):
        from scipy.spatial.transform import Rotation
        cams = np.zeros((n_views, 34), np.float32)
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 0.8 * w
        k[0, 2], k[1, 2] = w / 2, h / 2
        for v in range(n_views):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = Rotation.random(random_state=v).as_matrix()
            pose[:3, 3] = rng.randn(3) * 0.1
            cams[v] = np.concatenate([[h, w], k.reshape(-1),
                                      pose.reshape(-1)])
        return cams

    def test_matches_reference_projector(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import torch
        from utils.pinhole_model import Projector as RefProjector

        from vf_nerf_tpu.ops import projector

        rng = np.random.RandomState(1)
        h, w, n_views = 12, 16, 3
        cams = self._cameras(n_views, h, w, rng)
        xyz = rng.randn(5, 4, 3).astype(np.float32) * 0.5 + \
            np.array([0, 0, 2], np.float32)

        ref = RefProjector(torch.device("cpu"))
        t_pix, t_mask = ref.compute_projections(torch.from_numpy(xyz),
                                                torch.from_numpy(cams))
        o_pix, o_mask = projector.compute_projections(jnp.asarray(xyz),
                                                      jnp.asarray(cams))
        np.testing.assert_allclose(np.asarray(o_pix), t_pix.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(o_mask), t_mask.numpy())

        query = cams[0]
        t_diff = ref.compute_angle(torch.from_numpy(xyz),
                                   torch.from_numpy(query),
                                   torch.from_numpy(cams))
        o_diff = projector.compute_angle(jnp.asarray(xyz),
                                         jnp.asarray(query),
                                         jnp.asarray(cams))
        np.testing.assert_allclose(np.asarray(o_diff), t_diff.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_bilinear_sample(self):
        from vf_nerf_tpu.ops.projector import bilinear_sample
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
        # centre of pixel (1,1) exactly
        v = bilinear_sample(img, jnp.asarray([[1.0, 1.0]]))
        assert float(v[0, 0]) == 5.0
        # halfway between (0,0) and (1,0): x=0.5
        v = bilinear_sample(img, jnp.asarray([[0.5, 0.0]]))
        assert float(v[0, 0]) == 0.5

    def test_full_projector_shapes(self):
        from vf_nerf_tpu.ops import projector
        rng = np.random.RandomState(2)
        h, w, n_views = 8, 10, 2
        cams = self._cameras(n_views, h, w, rng)
        imgs = jnp.asarray(rng.rand(n_views, h, w, 3).astype(np.float32))
        feats = jnp.asarray(rng.rand(n_views, h, w, 5).astype(np.float32))
        xyz = jnp.asarray(rng.randn(6, 4, 3).astype(np.float32))
        rgb_feat, ray_diff, mask = projector.project_and_sample(
            xyz, jnp.asarray(cams[0]), imgs, jnp.asarray(cams), feats)
        assert rgb_feat.shape == (6, 4, n_views, 8)
        assert ray_diff.shape == (6, 4, n_views, 4)
        assert mask.shape == (6, 4, n_views, 1)


class TestAlternativeMC:
    def test_convergence_points_matches_reference(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import torch
        from evaluation.utils import mc_utils

        from vf_nerf_tpu.evaluation.mc.field_ops import \
            easy_convergence_points

        rng = np.random.RandomState(3)
        m, n, size = 50, 64, 2.0
        vts = rng.randn(m, 28, 6).astype(np.float32)
        pts = rng.randn(m, 28, 6).astype(np.float32)
        theirs = mc_utils.get_easy_convergence_points(
            torch.from_numpy(pts.copy()), torch.from_numpy(vts.copy()),
            N=n, size=size).numpy()
        ours = easy_convergence_points(
            vts.reshape(m, 28, 2, 3), pts.reshape(m, 28, 2, 3),
            step=size / n)
        np.testing.assert_array_equal(ours, theirs)

    def test_alternative_extraction_runs(self):
        from test_mesh_stack import analytic_box_vf_fn

        from vf_nerf_tpu.evaluation.mc.pipeline import extract_vf_mesh
        fn = analytic_box_vf_fn(1.0)
        verts, faces = extract_vf_mesh(
            fn, resolution=20, scale=1.4, centroid=np.zeros(3),
            translation=np.zeros(3, np.float32), max_batch=8192,
            alternative=True)
        assert len(verts) > 0 and len(faces) > 0


class TestMultihost:
    def test_single_process_noop_and_feed(self):
        from vf_nerf_tpu.parallel.multihost import (feed_global_batch,
                                                    global_mesh,
                                                    initialize_multihost)
        initialize_multihost()
        mesh = global_mesh()
        batch = {"uv": np.random.rand(16, 2).astype(np.float32)}
        fed = feed_global_batch(mesh, batch)
        np.testing.assert_allclose(np.asarray(fed["uv"]), batch["uv"])
