"""SyntheticOfficeDataset — the hard-regime oracle scene (VERDICT r3 #2).

The office is authored as its exact free-space boundary ∂F (surface
rectangles). These tests cross-check that single representation three ways:
ray depths against an independent solid-primitive tracer, the analytic VF
against hand-derived directions (including the covered-wall trap inside the
corner block where a naive per-primitive closest point is wrong), and the
exported mesh against the rect areas/orientations.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vf_nerf_tpu.datasets.synthetic import (  # noqa: E402
    G_FLOOR, G_THINWALL, Rect, SyntheticOfficeDataset, _ray_box_exit_t,
    _subtract_holes, analytic_vf, office_layout, office_vf,
    point_in_free_space, rect_closest_points, rects_to_mesh, trace_rects)


def _room_only_rects(L):
    """The plain cube room as ∂F rects (degenerate office, no solids)."""
    return [Rect(0, -L, +1.0, (-L, -L), (L, L), 0),
            Rect(0, +L, -1.0, (-L, -L), (L, L), 0),
            Rect(1, -L, +1.0, (-L, -L), (L, L), 0),
            Rect(1, +L, -1.0, (-L, -L), (L, L), 0),
            Rect(2, -L, +1.0, (-L, -L), (L, L), 0),
            Rect(2, +L, -1.0, (-L, -L), (L, L), 0)]


def _solid_entry_t(origins, dirs, lo, hi):
    """Slab-method entry distance into an AABB (inf if missed)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (lo - origins) / dirs
        t2 = (hi - origins) / dirs
    t_near = np.where(dirs == 0,
                      np.where((origins > lo) & (origins < hi),
                               -np.inf, np.inf), np.minimum(t1, t2))
    t_far = np.where(dirs == 0,
                     np.where((origins > lo) & (origins < hi),
                              np.inf, -np.inf), np.maximum(t1, t2))
    tn = t_near.max(axis=-1)
    tf = t_far.min(axis=-1)
    hit = (tn <= tf) & (tn > 1e-6)
    return np.where(hit, tn, np.inf)


class TestSubtractHoles:
    def test_area_conserved_and_disjoint(self):
        lo, hi = (0.0, 0.0), (4.0, 3.0)
        holes = [((0.5, 0.5), (1.5, 1.0)), ((2.0, 1.5), (3.5, 2.5)),
                 ((0.0, 2.0), (0.5, 3.0))]  # touches the border
        pieces = _subtract_holes(lo, hi, holes)
        area = sum((h - l).prod() for l, h in pieces)
        hole_area = sum((np.subtract(h, l)).prod() for l, h in holes)
        assert area == pytest.approx(12.0 - hole_area, rel=1e-12)
        for i, (l1, h1) in enumerate(pieces):
            for l2, h2 in pieces[i + 1:]:
                inter = np.minimum(h1, h2) - np.maximum(l1, l2)
                assert (inter <= 1e-12).any(), "pieces overlap"
        # No piece intersects a hole.
        for l1, h1 in pieces:
            for hl, hh in holes:
                inter = np.minimum(h1, hh) - np.maximum(l1, hl)
                assert (inter <= 1e-12).any()


class TestOfficeGeometry:
    def test_trace_matches_independent_solid_tracer(self):
        """Depth by first ∂F-rect hit == min(room exit, solid entries):
        a full consistency check of the hand-authored rect decomposition."""
        L = 2.0
        rects, solids = office_layout(L)
        rng = np.random.RandomState(0)
        # Free-space origins with a little clearance, random directions.
        pts = rng.uniform(-1.9, 1.9, (4000, 3))
        free = point_in_free_space(pts, L, solids)
        _, d, _ = rect_closest_points(pts, rects)
        origins = pts[free & (d > 1e-3)][:1500]
        dirs = rng.normal(size=origins.shape)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        t_rect, group = trace_rects(origins, dirs, rects)
        assert np.isfinite(t_rect).all()
        assert (group >= 0).all()

        t_room = _ray_box_exit_t(origins, dirs, L)
        t_ref = t_room
        for lo, hi in solids:
            t_ref = np.minimum(t_ref, _solid_entry_t(origins, dirs, lo, hi))
        np.testing.assert_allclose(t_rect, t_ref, rtol=1e-9, atol=1e-9)

    def test_closed_surface_from_free_space(self):
        L = 2.0
        rects, solids = office_layout(L)
        rng = np.random.RandomState(1)
        pts = rng.uniform(-1.95, 1.95, (2000, 3))
        origins = pts[point_in_free_space(pts, L, solids)]
        dirs = rng.normal(size=origins.shape)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        t, _ = trace_rects(origins, dirs, rects)
        assert np.isfinite(t).all(), "∂F has a hole"

    def test_mesh_area_and_orientation(self):
        rects, _ = office_layout(2.0)
        verts, faces = rects_to_mesh(rects)
        tri = verts[faces]
        cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        tri_area = 0.5 * np.linalg.norm(cross, axis=-1).sum()
        rect_area = sum((r.hi[0] - r.lo[0]) * (r.hi[1] - r.lo[1])
                        for r in rects)
        assert tri_area == pytest.approx(rect_area, rel=1e-6)
        # Triangle normals match their rect's outward normal (2 tris/rect).
        unit = cross / np.linalg.norm(cross, axis=-1, keepdims=True)
        for i, r in enumerate(rects):
            expected = np.zeros(3)
            expected[r.axis] = r.normal
            np.testing.assert_allclose(unit[2 * i], expected, atol=1e-6)
            np.testing.assert_allclose(unit[2 * i + 1], expected, atol=1e-6)


class TestOfficeVF:
    def test_degenerate_room_matches_box_oracle(self):
        """With no solids, office_vf reduces to the box analytic_vf."""
        L = 2.0
        rng = np.random.RandomState(2)
        pts = rng.uniform(-2.5, 2.5, (500, 3))
        # Drop points near wall planes/diagonals where both fields tie-break.
        d_axis = np.abs(L - np.abs(pts))
        keep = ((np.sort(d_axis, axis=-1)[:, 1] -
                 np.sort(d_axis, axis=-1)[:, 0]) > 1e-3)
        pts = pts[keep]
        v_office = office_vf(pts, _room_only_rects(L))
        v_box = analytic_vf(pts, L)
        np.testing.assert_allclose(v_office, v_box, atol=1e-5)

    def test_unit_norm(self):
        rects, _ = office_layout(2.0)
        rng = np.random.RandomState(3)
        pts = rng.uniform(-2.2, 2.2, (1000, 3))
        v = office_vf(pts, rects)
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                                   atol=1e-5)

    def test_covered_wall_trap_inside_corner_block(self):
        """Deep inside the corner block, the nearest *room wall* plane
        (x=+2) is occupied on both sides — not part of ∂F. The correct VF
        points to the block's exposed inward faces (−x/−y), which is what
        the rect field gives; a naive per-primitive closest point would
        return +x here."""
        rects, _ = office_layout(2.0)
        p = np.array([[1.9, 1.9, 0.0]])
        v = office_vf(p, rects)[0]
        _, d, _ = rect_closest_points(p, rects)
        assert d[0] == pytest.approx(1.5, abs=1e-6)
        assert v[0] < -0.99 or v[1] < -0.99

    def test_sign_flip_across_thin_wall(self):
        """The field flips across the free-standing thin wall's face —
        the density trigger for the thin structure."""
        rects, _ = office_layout(2.0)
        face_x = -0.3  # left face of the thin wall
        before = np.array([[face_x - 0.01, -1.0, -1.0]])  # free side
        after = np.array([[face_x + 0.01, -1.0, -1.0]])   # inside the wall
        v1, v2 = office_vf(before, rects)[0], office_vf(after, rects)[0]
        assert v1[0] > 0.99 and v2[0] < -0.99

    def test_sign_flip_along_rays(self):
        """ε before the hit, the field points with the ray; ε past it,
        against — along every ray, surfaces are crossings."""
        L = 2.0
        rects, solids = office_layout(L)
        rng = np.random.RandomState(4)
        pts = rng.uniform(-1.8, 1.8, (600, 3))
        free = point_in_free_space(pts, L, solids)
        _, dclear, _ = rect_closest_points(pts, rects)
        origins = pts[free & (dclear > 0.05)][:200]
        dirs = rng.normal(size=origins.shape)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        t, _ = trace_rects(origins, dirs, rects)
        eps = 1e-3
        v_before = office_vf(origins + (t - eps)[:, None] * dirs, rects)
        v_after = office_vf(origins + (t + eps)[:, None] * dirs, rects)
        dot_b = (v_before * dirs).sum(-1)
        dot_a = (v_after * dirs).sum(-1)
        assert (dot_b > 0).mean() > 0.99
        assert (dot_a < 0).mean() > 0.99


class TestOfficeDataset:
    def test_build_and_invariants(self):
        ds = SyntheticOfficeDataset(n_images=6, image_size=(16, 24),
                                    pixels_per_batch=96, seed=0)
        assert ds.rgb_images.shape == (6, 16 * 24, 3)
        assert np.isfinite(ds.rgb_images).all()
        assert (ds.rgb_images >= 0).all() and (ds.rgb_images <= 1).all()
        assert (ds.depth_images > 0).all()
        assert ds.depth_images.max() <= np.sqrt(3) * 2 * ds.half_size
        # Cameras sit in free space with clearance.
        centers = ds.poses[:, :3, 3]
        assert point_in_free_space(centers, ds.half_size, ds.solids).all()
        _, d, _ = rect_closest_points(centers, ds.rects)
        assert (d >= 0.3).all()

    def test_pitch_stratified_floor_and_ceiling_observed(self):
        """Round-5 rig fix (VERDICT r4): iid pitch draws left seed 0 with
        no camera pitching below -26.5 deg, so the floor was 1% of rendered
        pixels and the headline recall inherited a rig blind spot. With
        stratified pitch every seed must cover both pitch extremes and the
        floor must receive a pixel share comparable to the ceiling's."""
        from vf_nerf_tpu.datasets.base import pixel_grid
        from vf_nerf_tpu.datasets.synthetic import G_CEIL

        for seed in (0, 3):
            ds = SyntheticOfficeDataset(n_images=16, image_size=(30, 40),
                                        pixels_per_batch=96, seed=seed)
            pitch = np.arcsin(ds.poses[:, 2, 2])
            assert pitch.min() < -0.5 * ds.pitch_range
            assert pitch.max() > 0.5 * ds.pitch_range
            h, w = ds.image_size
            uv = pixel_grid(h, w)
            fx, fy = ds.intrinsics[0, 0], ds.intrinsics[1, 1]
            cx, cy = ds.intrinsics[0, 2], ds.intrinsics[1, 2]
            dirs_cam = np.stack([(uv[:, 0] - cx) / fx,
                                 (uv[:, 1] - cy) / fy,
                                 np.ones(h * w)], axis=-1)
            cnt = np.zeros(8, np.int64)
            for pose in ds.poses:
                dirs = dirs_cam @ pose[:3, :3].T
                _, g = trace_rects(pose[:3, 3][None], dirs, ds.rects)
                cnt += np.bincount(g, minlength=8)
            frac = cnt / cnt.sum()
            assert frac[G_FLOOR] > 0.03, f"floor starved: {frac[G_FLOOR]}"
            assert frac[G_FLOOR] > 0.3 * frac[G_CEIL]

    def test_scene_is_nonconvex_with_occlusion(self):
        """At least one GT ray hits an occluder (group > ceiling) and depth
        maps show the thin wall: its group appears in the trace."""
        ds = SyntheticOfficeDataset(n_images=12, image_size=(24, 32),
                                    pixels_per_batch=96, seed=0)
        groups = []
        from vf_nerf_tpu.datasets.base import pixel_grid
        h, w = ds.image_size
        uv = pixel_grid(h, w)
        fx, fy = ds.intrinsics[0, 0], ds.intrinsics[1, 1]
        cx, cy = ds.intrinsics[0, 2], ds.intrinsics[1, 2]
        dirs_cam = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                             np.ones(h * w)], axis=-1)
        for pose in ds.poses:
            dirs = dirs_cam @ pose[:3, :3].T
            _, g = trace_rects(pose[:3, 3][None], dirs, ds.rects)
            groups.append(g)
        seen = np.unique(np.concatenate(groups))
        assert G_THINWALL in seen, "no view sees the thin wall"
        assert len(seen) >= 6, f"poor coverage: groups {seen}"

    def test_replica_roundtrip(self, tmp_path):
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.replica import ReplicaDataset

        ds = SyntheticOfficeDataset(n_images=3, image_size=(16, 24),
                                    pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_replica_format(root, scene="office")
        cfg = DatasetConfig(dataset_name="replica", data_dir="Replica",
                            shuffle_views=True, pixels_per_batch=96,
                            scene="office", data_root_dir=root, factor=1)
        loaded = ReplicaDataset(cfg)
        assert loaded.n_images == 3
        np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-6)
        np.testing.assert_allclose(loaded.depth_images, ds.depth_images,
                                   atol=2e-3)
        assert np.abs(loaded.rgb_images - ds.rgb_images).mean() < 0.03

    def test_gt_mesh_exported(self, tmp_path):
        from vf_nerf_tpu.utils.ply import load_ply
        ds = SyntheticOfficeDataset(n_images=2, image_size=(8, 12),
                                    pixels_per_batch=48)
        base = ds.export_replica_format(str(tmp_path), scene="office")
        verts, faces = load_ply(os.path.join(base, "office_mesh.ply"))
        v0, f0 = ds.gt_mesh()
        np.testing.assert_allclose(verts, v0, atol=1e-6)
        np.testing.assert_array_equal(faces, f0)

    def test_floor_has_footprint_holes(self):
        """Floor rects exclude standing-object footprints: total floor area
        = L-shape area − 3 footprints."""
        rects, solids = office_layout(2.0)
        floor_area = sum((r.hi[0] - r.lo[0]) * (r.hi[1] - r.lo[1])
                         for r in rects if r.group == G_FLOOR)
        l_area = 16.0 - (2.0 - 0.4) * (2.0 - 0.4)
        foot = sum((hi[0] - lo[0]) * (hi[1] - lo[1])
                   for lo, hi in solids[1:])  # column, thin wall, desk
        assert floor_area == pytest.approx(l_area - foot, rel=1e-9)


class TestDeskTaskViews:
    """extra_down_views (round-5 desk study): task cameras aimed at the
    desk top. tools/desk_decompose.py measured the desk TOP failing with
    only 2/24 ring views grazing it; this knob adds the downward views the
    decomposition prescribes."""

    def test_task_views_look_at_desk_top(self):
        from vf_nerf_tpu.datasets.synthetic import G_DESK

        ds = SyntheticOfficeDataset(n_images=8, image_size=(16, 24),
                                    pixels_per_batch=96, seed=0,
                                    extra_down_views=3)
        assert ds.poses.shape[0] == 11
        assert ds.rgb_images.shape[0] == 11
        desk_lo, desk_hi = ds.solids[-1]
        for pose in ds.poses[-3:]:
            fwd = pose[:3, 2]
            assert fwd[2] < -0.3          # pitched downward
            # The central ray hits the desk's top face.
            t, group = trace_rects(pose[:3, 3][None], fwd[None], ds.rects)
            assert group[0] == G_DESK
            hit = pose[:3, 3] + t[0] * fwd
            assert hit[2] == pytest.approx(desk_hi[2], abs=1e-6)
        # Cameras (ring + task) all sit in free space with clearance.
        centers = ds.poses[:, :3, 3]
        assert point_in_free_space(centers, ds.half_size, ds.solids).all()
        _, d, _ = rect_closest_points(centers, ds.rects)
        assert (d >= 0.3).all()

    def test_zero_task_views_is_bit_identical(self):
        """extra_down_views=0 must not perturb the shipped rig (the r5
        cohort artifacts were produced by it): same RNG stream, same
        poses bit-for-bit."""
        a = SyntheticOfficeDataset(n_images=6, image_size=(8, 12),
                                   pixels_per_batch=96, seed=0)
        b = SyntheticOfficeDataset(n_images=6, image_size=(8, 12),
                                   pixels_per_batch=96, seed=0,
                                   extra_down_views=0)
        np.testing.assert_array_equal(a.poses, b.poses)
