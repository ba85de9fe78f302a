"""Dataset layer tests: synthetic oracle scene + Replica loader round-trip."""

import os

import numpy as np
import pytest

from vf_nerf_tpu.datasets.base import pixel_grid
from vf_nerf_tpu.datasets.synthetic import (SyntheticBoxDataset, analytic_vf,
                                            box_mesh, wall_color)


class TestPixelGrid:
    def test_matches_reference_mgrid_flip(self):
        h, w = 5, 7
        ref = np.flip(np.mgrid[0:h, 0:w].astype(np.int32), axis=0) \
            .reshape(2, -1).T.astype(np.float32)
        np.testing.assert_array_equal(pixel_grid(h, w), ref)


class TestSynthetic:
    def test_shapes_and_depth(self):
        ds = SyntheticBoxDataset(n_images=4, image_size=(16, 24),
                                 pixels_per_batch=128)
        assert ds.rgb_images.shape == (4, 16 * 24, 3)
        assert ds.depth_images.shape == (4, 16 * 24, 1)
        assert ds.depth_images.min() > 0
        near, far = ds.get_bounds()
        assert near == 0.0 and far == pytest.approx(ds.max_depth * 1.25)

    def test_mixed_batch(self):
        ds = SyntheticBoxDataset(n_images=4, image_size=(16, 24),
                                 pixels_per_batch=128)
        rng = np.random.RandomState(0)
        batches = list(ds.epoch_batches(rng))
        assert len(batches) == 4
        b = batches[0]
        n = 4 * (128 // 4)
        assert b["rgb"].shape == (n, 3)
        assert b["uv"].shape == (n, 2)
        assert b["pose"].shape == (n, 4, 4)
        assert b["intrinsics"].shape == (n, 4, 4)
        assert b["depth"].shape == (n, 1)

    def test_whole_image_item(self):
        ds = SyntheticBoxDataset(n_images=2, image_size=(8, 12),
                                 pixels_per_batch=32)
        ds.all_pixels = True
        item = ds[1]
        assert item["rgb"].shape == (96, 3)
        np.testing.assert_array_equal(item["rgb"], ds.rgb_images[1])

    def test_depth_consistency_with_rays(self):
        """GT depth must satisfy: cam + depth * dir lies on the cube."""
        import jax.numpy as jnp

        from vf_nerf_tpu.ops.rays import get_ray_directions_and_cam_location
        ds = SyntheticBoxDataset(n_images=2, image_size=(8, 12),
                                 pixels_per_batch=32)
        ds.all_pixels = True
        item = ds[0]
        dirs, _, cam = get_ray_directions_and_cam_location(
            jnp.asarray(item["uv"]), jnp.asarray(item["pose"]),
            jnp.asarray(item["intrinsics"]))
        pts = np.asarray(cam) + item["depth"] * np.asarray(dirs)
        dist_to_surface = np.abs(np.abs(pts).max(axis=1) - ds.half_size)
        assert dist_to_surface.max() < 1e-3

    def test_analytic_vf_unit_and_outward(self):
        pts = np.array([[0.5, 0.0, 0.0], [-0.1, -1.8, 0.2], [0, 0, 1.9]])
        v = analytic_vf(pts, 2.0)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0)
        np.testing.assert_array_equal(v[0], [1, 0, 0])
        np.testing.assert_array_equal(v[1], [0, -1, 0])
        np.testing.assert_array_equal(v[2], [0, 0, 1])

    def test_wall_color_range(self):
        c = wall_color(np.random.RandomState(0).uniform(-2, 2, (100, 3)))
        assert c.min() >= 0.0 and c.max() <= 1.0


class TestReplicaRoundTrip:
    def test_export_and_load(self, tmp_path):
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.replica import ReplicaDataset

        ds = SyntheticBoxDataset(n_images=3, image_size=(16, 24),
                                 pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_replica_format(root, scene="boxroom")

        cfg = DatasetConfig(dataset_name="replica", data_dir="Replica",
                            shuffle_views=True, pixels_per_batch=96,
                            scene="boxroom", data_root_dir=root, factor=1)
        loaded = ReplicaDataset(cfg)
        assert loaded.n_images == 3
        assert loaded.image_size == (16, 24)
        # Poses survive the text round-trip exactly.
        np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-6)
        # Depth survives the uint16 quantization (scale 1000 → ~0.5mm).
        np.testing.assert_allclose(loaded.depth_images, ds.depth_images,
                                   atol=2e-3)
        # RGB survives JPEG at q=98 loosely.
        assert np.abs(loaded.rgb_images - ds.rgb_images).mean() < 0.02
        # Centroid of the symmetric cube is ~0; scale = bounds·1.1.
        np.testing.assert_allclose(loaded.get_centroid(), 0.0, atol=1e-5)
        assert loaded.scale == pytest.approx(ds.half_size * 1.1, rel=1e-5)
        # Bounds: (0, 1.25 · max depth).
        assert loaded.get_bounds()[1] == pytest.approx(
            ds.max_depth * 1.25, rel=1e-3)
        # VF init contract (replica_dataset.py:221-226).
        method, path = loaded.get_vf_init_method()
        assert method == "exterior_boxroom"
        assert path.endswith("boxroom.pth")

    def test_ply_roundtrip(self, tmp_path):
        from vf_nerf_tpu.utils.ply import load_ply, save_ply
        verts, faces = box_mesh(1.5)
        for binary in (True, False):
            p = os.path.join(str(tmp_path), f"m_{binary}.ply")
            save_ply(p, verts, faces, binary=binary)
            v2, f2 = load_ply(p)
            np.testing.assert_allclose(v2, verts)
            np.testing.assert_array_equal(f2, faces)


class TestScanNetRoundTrip:
    def test_export_and_load(self, tmp_path):
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.scannet import ScanNetDataset

        ds = SyntheticBoxDataset(n_images=3, image_size=(16, 24),
                                 pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_scannet_format(root, scene="scene0000_00")

        cfg = DatasetConfig(dataset_name="scannet", data_dir="ScanNet",
                            shuffle_views=True, pixels_per_batch=96,
                            scene="scene0000_00", data_root_dir=root,
                            factor=1, crop_edge=0)
        loaded = ScanNetDataset(cfg, factor=1)
        assert loaded.n_images == 3
        assert loaded.image_size == (16, 24)
        np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-6)
        # depth mm quantization → 0.5mm
        np.testing.assert_allclose(loaded.depth_images, ds.depth_images,
                                   atol=2e-3)
        assert np.abs(loaded.rgb_images - ds.rgb_images).mean() < 0.02
        np.testing.assert_allclose(loaded.intrinsics, ds.intrinsics,
                                   atol=1e-5)
        np.testing.assert_allclose(loaded.get_centroid(), 0.0, atol=1e-5)
        method, path = loaded.get_vf_init_method()
        assert method == "exterior_scene0000_00"
        assert loaded.get_bounds()[1] == pytest.approx(ds.max_depth * 1.25,
                                                       rel=1e-3)

    def test_crop_edge(self, tmp_path):
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.scannet import ScanNetDataset
        ds = SyntheticBoxDataset(n_images=2, image_size=(20, 28),
                                 pixels_per_batch=64)
        root = str(tmp_path)
        ds.export_scannet_format(root, scene="scene0001_00")
        cfg = DatasetConfig(dataset_name="scannet", data_dir="ScanNet",
                            shuffle_views=True, pixels_per_batch=64,
                            scene="scene0001_00", data_root_dir=root,
                            factor=1, crop_edge=2)
        loaded = ScanNetDataset(cfg, factor=1)
        # 2 pixels trimmed from every side, principal point shifted
        # (reference scannet_dataset.py:54-67).
        assert loaded.image_size == (16, 24)
        assert loaded.intrinsics[0, 2] == pytest.approx(
            ds.intrinsics[0, 2] - 2)
        assert loaded.intrinsics[1, 2] == pytest.approx(
            ds.intrinsics[1, 2] - 2)

    def test_frame_stride_matches_default_subsample(self, tmp_path):
        """``frame_stride=40`` pads the index space so the loader's
        hardcoded every-40th subsample (reference scannet_dataset.py:19 —
        callers never override the default) selects exactly the distinct
        views, in order."""
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.scannet import ScanNetDataset
        ds = SyntheticBoxDataset(n_images=3, image_size=(16, 24),
                                 pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_scannet_format(root, scene="scene0002_00",
                                 frame_stride=40)
        cfg = DatasetConfig(dataset_name="scannet", data_dir="ScanNet",
                            shuffle_views=True, pixels_per_batch=96,
                            scene="scene0002_00", data_root_dir=root,
                            factor=1, crop_edge=0)
        loaded = ScanNetDataset(cfg)  # default factor=40
        assert loaded.n_images == 3
        np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-6)
        np.testing.assert_allclose(loaded.depth_images, ds.depth_images,
                                   atol=2e-3)


class TestReferenceLoaderParity:
    """Our loaders vs the reference loaders run on the SAME fixture folder,
    compared array-for-array (poses, intrinsics, rgb, depth, bounds,
    centroid, scale) — catches self-consistent format misreads that the
    round-trip tests above cannot see (pose row order, depth scale,
    intrinsics conventions)."""

    @staticmethod
    def _ref_imports():
        from reference_oracle import (add_reference_to_path,
                                      install_reference_stubs,
                                      reference_available)
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        install_reference_stubs()

    @staticmethod
    def _ref_config(root, data_dir, scene, factor, crop_edge=10):
        from config_parser.vf_nerf_config import DatasetConfig as RefDC
        return RefDC(dataset_name=data_dir.lower(), data_dir=data_dir,
                     shuffle_views=True, pixels_per_batch=96, scene=scene,
                     data_root_dir=root, factor=factor, crop_edge=crop_edge)

    def _compare(self, ours, ref):
        np.testing.assert_allclose(ours.poses,
                                   ref.poses.numpy(), atol=1e-6,
                                   err_msg="poses")
        np.testing.assert_allclose(np.asarray(ours.intrinsics),
                                   ref.intrinsics.numpy(), atol=1e-5,
                                   err_msg="intrinsics")
        assert len(ours.rgb_images) == len(ref.rgb_images)
        for i in range(len(ref.rgb_images)):
            np.testing.assert_allclose(ours.rgb_images[i],
                                       ref.rgb_images[i].numpy(), atol=1e-6,
                                       err_msg=f"rgb[{i}]")
            np.testing.assert_allclose(ours.depth_images[i],
                                       ref.depth_images[i].numpy(),
                                       atol=1e-6, err_msg=f"depth[{i}]")
        assert tuple(ours.image_size) == tuple(ref.image_size)
        assert ours.get_bounds() == pytest.approx(ref.get_bounds())
        import torch
        np.testing.assert_allclose(
            ours.get_centroid(),
            ref.get_centroid(torch.device("cpu")).numpy(), atol=1e-6,
            err_msg="centroid")
        assert ours.scale == pytest.approx(float(ref.scale), rel=1e-6)
        assert ours.get_vf_init_method()[0] == ref.get_vf_init_method()[0]

    def test_replica_loader_parity(self, tmp_path):
        self._ref_imports()
        from datasets.normal_datasets.replica_dataset import \
            ReplicaDataset as RefReplica

        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.replica import ReplicaDataset

        # Off-center camera targets → nonzero centroid exercise would need an
        # asymmetric mesh; the box is symmetric, but pose/rgb/depth/intrinsics
        # comparisons are exact regardless.
        ds = SyntheticBoxDataset(n_images=4, image_size=(12, 16),
                                 pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_replica_format(root, scene="boxroom")

        ours = ReplicaDataset(DatasetConfig(
            dataset_name="replica", data_dir="Replica", shuffle_views=True,
            pixels_per_batch=96, scene="boxroom", data_root_dir=root,
            factor=2))
        ref = RefReplica(self._ref_config(root, "Replica", "boxroom",
                                          factor=2))
        self._compare(ours, ref)

    def test_scannet_loader_parity(self, tmp_path):
        self._ref_imports()
        from datasets.normal_datasets.scannet_dataset import \
            ScanNetDataset as RefScanNet

        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.scannet import ScanNetDataset

        ds = SyntheticBoxDataset(n_images=4, image_size=(20, 28),
                                 pixels_per_batch=96)
        root = str(tmp_path)
        ds.export_scannet_format(root, scene="scene0000_00")

        ours = ScanNetDataset(DatasetConfig(
            dataset_name="scannet", data_dir="ScanNet", shuffle_views=True,
            pixels_per_batch=96, scene="scene0000_00", data_root_dir=root,
            factor=1, crop_edge=2), factor=2)
        ref = RefScanNet(self._ref_config(root, "ScanNet", "scene0000_00",
                                          factor=1, crop_edge=2), factor=2)
        self._compare(ours, ref)


class TestRandomImgSampling:
    def test_replica_random_sampling(self, tmp_path):
        """random_img_sampling loads all frames and re-subsamples per epoch
        (reference replica_dataset.py:105-119)."""
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.replica import ReplicaDataset

        ds = SyntheticBoxDataset(n_images=4, image_size=(8, 12),
                                 pixels_per_batch=64)
        root = str(tmp_path)
        ds.export_replica_format(root, scene="boxroom")
        cfg = DatasetConfig(dataset_name="replica", data_dir="Replica",
                            shuffle_views=True, pixels_per_batch=64,
                            scene="boxroom", data_root_dir=root, factor=2,
                            random_img_sampling=True)
        loaded = ReplicaDataset(cfg)
        assert loaded.n_images == 4          # all frames indexed
        assert len(loaded) == 2              # but epochs use n//factor
        loaded.sample_new_images()
        assert len(loaded.rgb_images) == 2
        assert loaded.poses.shape == (2, 4, 4)
        batch = next(loaded.epoch_batches(np.random.RandomState(0)))
        assert batch["rgb"].shape[0] == 2 * (64 // 4)
