"""Mesh stack tests: MC tables, smoothing/field-op parity vs the reference,
full contrastive-MC extraction on the analytic box field, classic MC, TSDF
fusion, rasterizer, refuse."""

import numpy as np
import pytest

from reference_oracle import add_reference_to_path, reference_available
from vf_nerf_tpu.datasets.synthetic import (SyntheticBoxDataset, analytic_vf,
                                            box_mesh)
from vf_nerf_tpu.evaluation.mc import field_ops
from vf_nerf_tpu.evaluation.mc.classic import marching_cubes
from vf_nerf_tpu.evaluation.mc.pipeline import (extract_vf_mesh,
                                                quadrant_translations)
from vf_nerf_tpu.evaluation.mc.smoothing import smooth_vf_np
from vf_nerf_tpu.evaluation.mc.tables import EDGE_TABLE, TRI_TABLE
from vf_nerf_tpu.utils.meshes import chamfer_distance, sample_surface


def analytic_box_vf_fn(half_size=1.0):
    """The oracle field: unit vectors toward the nearest wall of a cube,
    scaled by distance (so the norm is a UDF-like magnitude)."""
    def fn(points):
        p = np.asarray(points, np.float32)
        v = analytic_vf(p, half_size)
        inside_dist = (half_size - np.abs(p)).min(axis=-1)
        closest = np.clip(p, -half_size, half_size)
        outside_dist = np.linalg.norm(p - closest, axis=-1)
        udf = np.where(inside_dist > 0, inside_dist, outside_dist)
        return v * np.maximum(udf, 1e-4)[..., None]
    return fn


class TestTables:
    def test_edge_table_matches_reference(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import evaluation.utils.marching_cubes_lookup as ref
        np.testing.assert_array_equal(EDGE_TABLE, np.array(ref.EDGE_TABLE))

    def test_tri_counts_match_reference(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import evaluation.utils.marching_cubes_lookup as ref
        for c in range(256):
            ours = int((TRI_TABLE[c] >= 0).sum()) // 3
            theirs = int((np.array(ref.TRI_TABLE[c]) >= 0).sum()) // 3
            assert ours == theirs, f"config {c}: {ours} vs {theirs}"

    def test_tri_edges_are_cut_edges(self):
        for c in range(256):
            tris = TRI_TABLE[c][TRI_TABLE[c] >= 0]
            for e in tris:
                assert (EDGE_TABLE[c] >> e) & 1


@pytest.mark.skipif(not reference_available(),
                    reason="reference not mounted")
class TestFieldOpParity:
    def test_smoothing_matches_reference(self):
        add_reference_to_path()
        import torch
        from evaluation.utils.guassian_smoothing import smooth_vf as ref_smooth
        rng = np.random.RandomState(0)
        vf = rng.randn(10, 10, 10, 3).astype(np.float32)
        for k, sigma in ((3, 1.0), (9, 2.0)):
            theirs = ref_smooth(torch.from_numpy(vf), k=k,
                                sigma=sigma).numpy()
            ours = smooth_vf_np(vf, k=k, sigma=sigma)
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_divergence_matches_reference(self):
        add_reference_to_path()
        import torch
        from evaluation.utils import mc_utils
        rng = np.random.RandomState(1)
        n = 12
        vf = rng.randn(n ** 3, 3).astype(np.float32)
        theirs = mc_utils.extract_divergence(torch.from_numpy(vf.copy()),
                                             n).numpy()
        ours = field_ops.extract_divergence(vf.reshape(n, n, n, 3))
        np.testing.assert_array_equal(ours, theirs)

    def test_unify_and_combs_match_reference(self):
        add_reference_to_path()
        import torch
        import torch.nn.functional as F
        from evaluation.utils import mc_utils

        rng = np.random.RandomState(2)
        n = 10
        vf = rng.randn(n ** 3, 3).astype(np.float32)
        div_t = mc_utils.extract_divergence(torch.from_numpy(vf.copy()), n)
        vt_t = F.normalize(torch.from_numpy(vf.copy()), dim=1) \
            .reshape(n, n, n, 3)
        norms_t = torch.norm(torch.from_numpy(vf.copy()), dim=1)

        choice_t = mc_utils.unify_direction(div_t, vt_t.permute(3, 0, 1, 2),
                                            N=n)
        comb_t, norms_pairs_t = mc_utils.make_comb_format(choice_t, norms_t,
                                                          n)

        surface = div_t.numpy()
        cells = np.argwhere(surface > 0.5)
        vt = vt_t.numpy()
        norms_grid = norms_t.numpy().reshape(n, n, n)

        choice = field_ops.unify_direction(surface, vt, cells)
        comb, pair_norms = field_ops.make_comb_format(choice, norms_grid,
                                                      cells)

        flat_idx = cells[:, 0] * n * n + cells[:, 1] * n + cells[:, 2]
        np.testing.assert_array_equal(
            choice, choice_t.numpy()[flat_idx])
        np.testing.assert_array_equal(comb, comb_t.numpy()[flat_idx])
        np.testing.assert_allclose(pair_norms,
                                   norms_pairs_t.numpy()[flat_idx],
                                   rtol=1e-5, atol=1e-6)

    def test_combs_to_verts_scalar_oracle(self):
        """Vectorized corner classification vs a direct per-cell scalar
        re-derivation of ``combs_to_verts`` (reference
        ``marching_cubes_vt.py:62-102``). (The reference module itself
        imports numba, which this image lacks.)"""
        from vf_nerf_tpu.evaluation.mc.contrastive import \
            combs_to_vert_values
        from vf_nerf_tpu.evaluation.mc.tables import (COMB_I, COMB_J,
                                                      CORNER_COMB,
                                                      CORNER_LANE,
                                                      PAIR_TO_COMB)

        def scalar_oracle(comb_values, pair_norms):
            if comb_values.max() <= 0.5:
                return np.zeros(8)
            anchor = int(np.argmax(comb_values))
            a0, a1 = int(COMB_I[anchor]), int(COMB_J[anchor])
            class1 = {a1}
            for v in range(8):
                if v in (a0, a1):
                    continue
                c0 = comb_values[PAIR_TO_COMB[v, a0]]
                c1 = comb_values[PAIR_TO_COMB[v, a1]]
                if c0 > c1:
                    class1.add(v)
            out = np.full(8, -1.0)
            for v in class1:
                out[v] = 1.0
            return out * pair_norms[CORNER_COMB, CORNER_LANE]

        rng = np.random.RandomState(0)
        m = 200
        comb = (rng.rand(m, 28) > 0.5).astype(np.float32)
        comb[:20] = 0.0  # exercise the no-surface branch
        norms = rng.uniform(0.01, 1.0, (m, 28, 2)).astype(np.float32)
        ours = combs_to_vert_values(comb, norms)
        for i in range(m):
            np.testing.assert_allclose(ours[i],
                                       scalar_oracle(comb[i], norms[i]),
                                       rtol=1e-6, atol=1e-7)

    def test_mesh_vertices_on_box_surface(self):
        """Extracted vertices must hug the analytic box walls (accounting
        for the reference's (res−1)/res mesh-scale quirk, reproduced)."""
        res = 24
        fn = analytic_box_vf_fn(half_size=1.0)
        verts, faces = extract_vf_mesh(
            fn, resolution=res, scale=1.5, centroid=np.zeros(3),
            translation=np.zeros(3, np.float32), max_batch=10000)
        assert len(verts) > 100
        # Undo the quirk scale for the analytic comparison.
        quirk = res / (res - 1.0)
        v = np.abs(verts * quirk)
        # The analytic field also converges along exterior edge-Voronoi
        # sheets (real VF fields have similar artifacts — that is what the
        # reference's TSDF-refuse culling is for); assert on face-region
        # vertices only: exactly one coordinate near the wall.
        sorted_coords = np.sort(v, axis=1)
        face_region = sorted_coords[:, 1] < 0.9  # two minor coords inside
        assert face_region.sum() > 50
        dist = np.abs(v[face_region].max(axis=1) - 1.0)
        voxel = 2 * 1.5 / (res - 1)
        assert np.median(dist) < voxel


class TestClassicMC:
    def test_sphere_chamfer(self):
        n = 48
        coords = np.linspace(-1.2, 1.2, n)
        x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
        sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - 1.0
        voxel = coords[1] - coords[0]
        verts, faces = marching_cubes(sdf.astype(np.float32), 0.0,
                                      origin=np.full(3, -1.2),
                                      voxel_size=voxel)
        assert len(verts) > 100
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - 1.0).max() < voxel

    def test_box_field_mesh_chamfer(self):
        fn = analytic_box_vf_fn(half_size=1.0)
        verts, faces = extract_vf_mesh(fn, resolution=32, scale=1.5,
                                       centroid=np.zeros(3),
                                       translation=np.zeros(3, np.float32),
                                       max_batch=8192)
        assert len(verts) > 0
        gt_v, gt_f = box_mesh(1.0)
        pred_pts = sample_surface(verts, faces, 20000, seed=0)
        gt_pts = sample_surface(gt_v, gt_f, 20000, seed=1)
        chf = chamfer_distance(pred_pts, gt_pts)
        # chamfer_distance follows the reference definition: sum of the two
        # directional means of SQUARED distances. voxel ≈ 0.097 at
        # res 32/scale 1.5, the reproduced reference (res−1)/res mesh-scale
        # quirk (~3%), and the analytic field's exterior edge-Voronoi sheets
        # (squared stats amplify those outliers) put the sum near 0.05.
        assert chf["mean"] < 0.08
        assert chf["min"] <= chf["median"] <= chf["max"]

    def test_quadrant_translations(self):
        for n, expected in ((8, 8), (64, 64), (35, 35)):
            items = list(quadrant_translations(n, 2.0))
            assert len(items) == expected

    @pytest.mark.parametrize("n,parts", [(8, 2), (64, 4)])
    def test_quadrant_tiling_covers_cube(self, n, parts):
        """The 8/64 sub-cubes tile [-scale, scale]³ exactly (reference
        methods.py:101-124 grid layout)."""
        scale = 2.0
        items = list(quadrant_translations(n, scale))
        sub = scale / parts
        per_axis = np.array(sorted({round(float(t[0]), 6)
                                    for t, _ in items}))
        expected = -scale + sub * (2 * np.arange(parts) + 1)
        np.testing.assert_allclose(per_axis, expected, atol=1e-6)
        assert all(s == sub for _, s in items)

    def test_quadrant_35_is_27_plus_8(self):
        items = list(quadrant_translations(35, 2.0))
        scales = [s for _, s in items]
        assert scales[:27] == [2.0 / 3.0] * 27      # 3×3×3 at scale/3
        assert scales[27:] == [1.0] * 8             # octants at scale/2


class TestTSDF:
    def test_fuse_box_depths(self):
        ds = SyntheticBoxDataset(n_images=6, image_size=(24, 32),
                                 pixels_per_batch=96, half_size=1.0)
        h, w = ds.image_size
        depths = [ds.depth_images[i].reshape(h, w) for i in range(6)]
        poses = [ds.poses[i] for i in range(6)]
        intr = [ds.intrinsics for _ in range(6)]
        verts, faces = fuse_depth_maps_wrap(depths, poses, intr)
        assert len(verts) > 50
        # All fused geometry lies near the cube walls.
        dist_to_wall = np.abs(np.abs(verts).max(axis=1) - 1.0)
        assert np.median(dist_to_wall) < 0.05


def fuse_depth_maps_wrap(depths, poses, intr):
    from vf_nerf_tpu.evaluation.mc.tsdf import fuse_depth_maps
    return fuse_depth_maps(depths, poses, intr, voxel_size=0.04,
                           sdf_trunc=0.1, depth_trunc=10.0)


class TestRasterizer:
    def test_depth_matches_analytic(self):
        from vf_nerf_tpu.evaluation.renderer import render_depth
        ds = SyntheticBoxDataset(n_images=2, image_size=(24, 32),
                                 pixels_per_batch=96, half_size=1.0)
        verts, faces = ds.gt_mesh()
        h, w = ds.image_size
        depth = render_depth(verts.astype(np.float32), faces, ds.poses[0],
                             ds.intrinsics, h, w)
        gt = ds.depth_images[0].reshape(h, w)
        hit = depth > 0
        assert hit.mean() > 0.9
        err = np.abs(depth[hit] - gt[hit])
        assert np.median(err) < 0.05

    def test_numpy_fallback_agrees_with_native(self):
        from vf_nerf_tpu.evaluation import renderer as rmod
        ds = SyntheticBoxDataset(n_images=1, image_size=(16, 20),
                                 pixels_per_batch=64, half_size=1.0)
        verts, faces = ds.gt_mesh()
        h, w = ds.image_size
        native = rmod.render_depth(verts.astype(np.float32), faces,
                                   ds.poses[0], ds.intrinsics, h, w)
        if rmod._lib is None:
            pytest.skip("native rasterizer not built")
        world_to_cam = np.linalg.inv(ds.poses[0])
        v_h = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
        cam = (v_h @ world_to_cam.T)[:, :3].astype(np.float32)
        k = ds.intrinsics
        fallback = rmod._render_depth_numpy(
            cam, faces, k[0, 0], k[1, 1], k[0, 2], k[1, 2], h, w, 1e-4)
        np.testing.assert_allclose(native, fallback, rtol=1e-4, atol=1e-4)


class TestRefuse:
    def test_refuse_keeps_observed_geometry(self):
        from vf_nerf_tpu.evaluation.renderer import refuse_mesh
        ds = SyntheticBoxDataset(n_images=6, image_size=(24, 32),
                                 pixels_per_batch=96, half_size=1.0)
        verts, faces = ds.gt_mesh()
        rv, rf = refuse_mesh(verts.astype(np.float32), faces, ds,
                             voxel_size=0.05, sdf_trunc=0.12,
                             depth_trunc=10.0)
        assert len(rv) > 50
        dist_to_wall = np.abs(np.abs(rv).max(axis=1) - 1.0)
        assert np.median(dist_to_wall) < 0.06


class TestClassicTriTableFlag:
    """Flag-gated exact classic triangle table (VERDICT r3 #7): default
    extraction keeps the generated table; VFNERF_CLASSIC_MC_TABLE=1 swaps in
    the classic constant for triangle-identical diffs against
    reference-produced meshes."""

    @staticmethod
    def _sphere_cells(res=10, r=0.8):
        """All cells of a res³ grid over [-1.2, 1.2]³ with a sphere SDF."""
        from vf_nerf_tpu.evaluation.mc.tables import CORNER_OFFSETS
        idx = np.stack(np.meshgrid(*[np.arange(res)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
        corners = idx[:, None, :] + CORNER_OFFSETS[None]
        gv = corners / res * 2.4 - 1.2
        vv = np.linalg.norm(gv, axis=-1) - r
        return gv.astype(np.float64), vv.astype(np.float64)

    def test_classic_table_bitexact_vs_reference(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import evaluation.utils.marching_cubes_lookup as ref

        from vf_nerf_tpu.evaluation.mc.classic_tables import \
            CLASSIC_TRI_TABLE
        np.testing.assert_array_equal(CLASSIC_TRI_TABLE,
                                      np.asarray(ref.TRI_TABLE))

    def test_classic_table_topology_equals_generated(self):
        from vf_nerf_tpu.evaluation.mc.classic_tables import \
            CLASSIC_TRI_TABLE
        for c in range(256):
            ours = int((TRI_TABLE[c] >= 0).sum())
            classic = int((CLASSIC_TRI_TABLE[c] >= 0).sum())
            assert ours == classic, f"config {c}: {ours} vs {classic}"
            # classic tris also only reference cut edges
            for e in CLASSIC_TRI_TABLE[c][CLASSIC_TRI_TABLE[c] >= 0]:
                assert (EDGE_TABLE[c] >> e) & 1

    def test_flagged_soup_is_classic_bitexact(self, monkeypatch):
        """Under the flag, both emission paths produce the EXACT triangle
        soup a direct classic-table gather gives on a shared fixture grid."""
        from vf_nerf_tpu.evaluation.mc import contrastive
        from vf_nerf_tpu.evaluation.mc.classic_tables import (
            CLASSIC_TRI_TABLE, FLAG)

        gv, vv = self._sphere_cells()
        monkeypatch.setenv(FLAG, "1")
        soup_native = contrastive.emit_triangles(gv, vv, 0.0)
        soup_numpy = contrastive.emit_triangles_numpy(gv, vv, 0.0)
        np.testing.assert_array_equal(soup_native, soup_numpy)

        # Manual classic emission: same interpolation, classic gather.
        inside = (vv < 0.0).astype(np.int64)
        config = (inside * (1 << np.arange(8))[None, :]).sum(axis=1)
        active = EDGE_TABLE[config] != 0
        gva, vva, cfg = gv[active], vv[active], config[active]
        from vf_nerf_tpu.evaluation.mc.contrastive import _EDGE_SWAP
        from vf_nerf_tpu.evaluation.mc.tables import EDGE_VERTEX
        ev0, ev1 = EDGE_VERTEX[:, 0], EDGE_VERTEX[:, 1]
        p1, p2 = gva[:, ev0], gva[:, ev1]
        v1, v2 = vva[:, ev0], vva[:, ev1]
        swap = _EDGE_SWAP[None, :]
        pa = np.where(swap[..., None], p2, p1)
        pb = np.where(swap[..., None], p1, p2)
        va = np.where(swap, v2, v1)
        vb = np.where(swap, v1, v2)
        denom = vb - va
        deg = np.abs(denom) <= 1e-5
        t = np.where(deg, 0.0, (0.0 - va) / np.where(deg, 1.0, denom))
        cut = pa + t[..., None] * (pb - pa)
        tri_edges = CLASSIC_TRI_TABLE[cfg][:, :15].reshape(-1, 5, 3)
        valid = tri_edges[:, :, 0] >= 0
        rows = np.arange(cut.shape[0])[:, None, None]
        manual = cut[rows, np.maximum(tri_edges, 0)][valid]
        np.testing.assert_array_equal(soup_numpy, manual)

    def test_flag_off_same_geometry_different_fans(self, monkeypatch):
        """Default (generated) table: identical vertex set after dedup,
        same triangle count, but not the identical soup."""
        from vf_nerf_tpu.evaluation.mc import contrastive
        from vf_nerf_tpu.evaluation.mc.classic_tables import FLAG

        gv, vv = self._sphere_cells()
        monkeypatch.delenv(FLAG, raising=False)
        soup_gen = contrastive.emit_triangles_numpy(gv, vv, 0.0)
        monkeypatch.setenv(FLAG, "1")
        soup_classic = contrastive.emit_triangles_numpy(gv, vv, 0.0)
        assert soup_gen.shape == soup_classic.shape
        assert not np.array_equal(soup_gen, soup_classic)
        v_gen, _ = contrastive.dedup_mesh(soup_gen)
        v_cls, _ = contrastive.dedup_mesh(soup_classic)
        np.testing.assert_array_equal(
            np.unique(v_gen.round(9), axis=0),
            np.unique(v_cls.round(9), axis=0))
