"""Tests for offline tools: COLMAP reader/converter, LLFF loader, pose
utilities, schedules, plots, profiling hooks."""

import json
import os
import struct

import numpy as np
import pytest


class TestColmap:
    def _write_binary_model(self, model_dir):
        os.makedirs(model_dir, exist_ok=True)
        # cameras.bin: one PINHOLE camera.
        with open(os.path.join(model_dir, "cameras.bin"), "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
            f.write(struct.pack("<4d", 500.0, 480.0, 320.0, 240.0))
        # images.bin: two images.
        with open(os.path.join(model_dir, "images.bin"), "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, name in ((2, b"b.jpg"), (1, b"a.jpg")):
                f.write(struct.pack("<i", i))
                f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
                f.write(struct.pack("<3d", 0.1 * i, 0.2, 0.3))
                f.write(struct.pack("<i", 1))
                f.write(name + b"\x00")
                f.write(struct.pack("<Q", 2))           # 2 points2D
                f.write(struct.pack("<2d q 2d q", 1.0, 2.0, -1, 3.0, 4.0,
                                    -1))
        return model_dir

    def test_binary_roundtrip_and_idr_conversion(self, tmp_path):
        from vf_nerf_tpu.datasets.helpers.colmap import (
            colmap_to_idr_cameras, read_model)
        model_dir = self._write_binary_model(os.path.join(str(tmp_path),
                                                          "sparse"))
        cameras, images = read_model(model_dir)
        assert cameras[1].model == "PINHOLE"
        assert cameras[1].intrinsic_matrix()[0, 0] == 500.0
        assert images[1].name == "a.jpg"

        out = os.path.join(str(tmp_path), "cams.npz")
        payload = colmap_to_idr_cameras(model_dir, out)
        assert set(payload) == {"world_mat_0", "world_mat_1"}
        # Identity rotation, so world_mat = K @ [I | t].
        k = cameras[1].intrinsic_matrix()
        expected = k @ np.concatenate([np.eye(3),
                                       np.array([[0.1], [0.2], [0.3]])],
                                      axis=1)
        np.testing.assert_allclose(payload["world_mat_0"][:3], expected,
                                   atol=1e-8)

    def test_text_model(self, tmp_path):
        from vf_nerf_tpu.datasets.helpers.colmap import read_model
        d = os.path.join(str(tmp_path), "sparse_txt")
        os.makedirs(d)
        with open(os.path.join(d, "cameras.txt"), "w") as f:
            f.write("# comment\n1 SIMPLE_PINHOLE 640 480 500 320 240\n")
        with open(os.path.join(d, "images.txt"), "w") as f:
            f.write("1 1 0 0 0 0.5 0.6 0.7 1 img.jpg\n")
            f.write("1.0 2.0 -1\n")
        cameras, images = read_model(d)
        assert cameras[1].model == "SIMPLE_PINHOLE"
        np.testing.assert_allclose(images[1].tvec, [0.5, 0.6, 0.7])


class TestLLFF:
    def test_load(self, tmp_path):
        from PIL import Image

        from vf_nerf_tpu.datasets.helpers.llff import load_llff_data
        base = str(tmp_path)
        os.makedirs(os.path.join(base, "images"))
        n, h, w = 3, 16, 24
        rng = np.random.RandomState(0)
        for i in range(n):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(base, "images", f"img{i}.png"))
        poses = np.tile(np.eye(4)[:3, :4], (n, 1, 1))
        poses[:, :3, 3] = rng.randn(n, 3) * 0.1
        hwf = np.tile(np.array([h, w, 50.0]), (n, 1))
        rows = np.concatenate([
            np.concatenate([poses, hwf[:, :, None]], axis=2).reshape(n, 15),
            np.tile([1.0, 5.0], (n, 1))], axis=1)
        np.save(os.path.join(base, "poses_bounds.npy"), rows)

        images, poses_hwf, bounds, scale = load_llff_data(base)
        assert images.shape == (n, h, w, 3)
        assert poses_hwf.shape == (n, 3, 5)
        assert bounds.shape == (n, 2)
        assert np.isfinite(scale)


class TestPosesUtils:
    def test_recenter(self):
        from vf_nerf_tpu.datasets.helpers.poses_utils import (average_pose,
                                                              recenter_poses)
        rng = np.random.RandomState(0)
        from scipy.spatial.transform import Rotation
        poses = np.tile(np.eye(4)[:3], (5, 1, 1))
        poses[:, :3, :3] = Rotation.random(5, random_state=1).as_matrix()
        poses[:, :3, 3] = rng.randn(5, 3)
        recentered = recenter_poses(poses)
        avg = average_pose(recentered)
        np.testing.assert_allclose(avg[:, 3], 0.0, atol=1e-6)
        np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-5)

    def test_sphere_poses_look_at_center(self):
        from vf_nerf_tpu.datasets.helpers.poses_utils import sphere_poses
        poses = sphere_poses(8, radius=2.0)
        positions = poses[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(positions, axis=1), 2.0,
                                   rtol=1e-5)
        # z column (back direction) should point away from the center.
        dots = np.sum(poses[:, :3, 2] * positions, axis=1)
        assert (dots > 0).all()

    def test_spherify(self):
        from vf_nerf_tpu.datasets.helpers.poses_utils import (sphere_poses,
                                                              spherify_poses)
        poses = sphere_poses(6, radius=3.0)[:, :3, :4]
        out, scale = spherify_poses(poses)
        d = np.linalg.norm(out[:, :3, 3], axis=1)
        np.testing.assert_allclose(d.mean(), 1.0, rtol=1e-4)


class TestSchedules:
    def test_parity_with_reference_formulas(self):
        from vf_nerf_tpu.utils.schedules import (
            ConstantLearningRateSchedule, ExponentialRateSchedule,
            StepLearningRateSchedule)
        c = ConstantLearningRateSchedule(0.1)
        assert c.get_learning_rate(100) == 0.1
        s = StepLearningRateSchedule(0.1, frequency=10, decay_rate=0.5)
        assert s.get_learning_rate(25) == pytest.approx(0.1 * 0.5 ** 2)
        e = ExponentialRateSchedule(0.1, decay_rate=0.9)
        assert e.get_learning_rate(3) == pytest.approx(0.1 * 0.9 ** 3)
        # optax equivalents agree
        assert float(s.as_optax()(25)) == pytest.approx(
            s.get_learning_rate(25))
        assert float(e.as_optax()(3)) == pytest.approx(
            e.get_learning_rate(3), rel=1e-5)

    def test_parameter_annealing(self):
        from vf_nerf_tpu.ops.annealing import parameter_linear_annealing
        assert parameter_linear_annealing(1.0, 0.0, 10, 0) == 1.0
        assert parameter_linear_annealing(1.0, 0.0, 10, 5) == 0.5
        assert parameter_linear_annealing(1.0, 0.0, 10, 20) == 0.0


class TestExtras:
    def test_cosine_losses(self):
        import jax.numpy as jnp

        from vf_nerf_tpu.models.loss import cosine_losses
        cos = jnp.asarray(np.linspace(-1, 1, 20)[None].repeat(3, 0))
        weights = jnp.zeros((3, 21)).at[:, 10].set(1.0)
        min_t, max_t = cosine_losses(cos, weights)
        assert np.isfinite(float(min_t)) and np.isfinite(float(max_t))

    def test_similarity_loss(self):
        import jax.numpy as jnp

        from vf_nerf_tpu.models.loss import similarity_loss
        # Opposing vectors that do NOT point at each other → penalized.
        x1 = jnp.asarray([[0.0, 0, 0]] * 4)
        x2 = jnp.asarray([[1.0, 0, 0]] * 4)
        v1 = jnp.asarray([[0.0, 1, 0]] * 4)
        v2 = jnp.asarray([[0.0, -1, 0]] * 4)
        loss = float(similarity_loss(x1, x2, v1, v2))
        assert loss > 0
        # Vectors pointing at each other → consistent, loss 0.
        v1b = jnp.asarray([[1.0, 0, 0]] * 4)
        v2b = jnp.asarray([[-1.0, 0, 0]] * 4)
        assert float(similarity_loss(x1, x2, v1b, v2b)) == pytest.approx(
            0.0, abs=1e-5)

    def test_profiling_helpers(self):
        from vf_nerf_tpu.utils.profiling import StepTimer, trace
        t = StepTimer()
        t.tick()
        t.tick()
        assert t.seconds_per_step() >= 0
        assert np.isfinite(t.rays_per_sec(1024))
        with trace(None):
            pass

    def test_plots_smoke(self, tmp_path):
        from test_renderer import tiny_config
        import jax

        from vf_nerf_tpu.evaluation import plots
        from vf_nerf_tpu.models.nerf import VectorFieldNerf
        model = VectorFieldNerf(tiny_config(), decay_steps=10)
        plots.plot_overall_scene(model, str(tmp_path), scale=1.0,
                                 centroid=np.zeros(3), n=10)
        assert os.path.exists(os.path.join(str(tmp_path), "plots-overall",
                                           "overall.png"))


def _import_ref_utils():
    """utils.utils imports several unavailable packages at module level —
    install the shared functional stubs, then import it."""
    from reference_oracle import install_reference_stubs
    install_reference_stubs()
    import utils.utils as ref_utils
    return ref_utils


class TestImageMetricParity:
    def test_ssim_matches_reference(self):
        from reference_oracle import (add_reference_to_path,
                                      reference_available)
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import torch
        ref_utils = _import_ref_utils()

        from vf_nerf_tpu.utils.metrics import get_ssim
        rng = np.random.RandomState(0)
        a = rng.rand(24, 32, 3).astype(np.float32)
        b = np.clip(a + rng.randn(24, 32, 3).astype(np.float32) * 0.05, 0, 1)
        theirs = ref_utils.get_ssim(torch.from_numpy(a), torch.from_numpy(b))
        ours = get_ssim(a, b)
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-5)

    def test_psnr_and_l1cm_match_reference(self):
        from reference_oracle import (add_reference_to_path,
                                      reference_available)
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        import torch
        ref_utils = _import_ref_utils()

        from vf_nerf_tpu.utils.metrics import get_l1_cm, get_psnr
        rng = np.random.RandomState(1)
        a = rng.rand(16, 20, 3).astype(np.float32)
        b = rng.rand(16, 20, 3).astype(np.float32)
        assert get_psnr(a, b) == pytest.approx(
            ref_utils.get_psnr(torch.from_numpy(a), torch.from_numpy(b)),
            rel=1e-5)
        d1 = rng.rand(16, 20).astype(np.float32) * 3
        d2 = rng.rand(16, 20).astype(np.float32) * 3
        assert get_l1_cm(d1, d2) == pytest.approx(
            ref_utils.get_l1_cm(torch.from_numpy(d1), torch.from_numpy(d2)),
            rel=1e-5)


def _write_tiny_lpips_npz(path, widths=(4, 4, 8, 8, 8), seed=0):
    """An LPIPS weights npz with the real 13-conv/5-tap structure but tiny
    channel counts (the forward reads channel counts from the arrays)."""
    rng = np.random.RandomState(seed)
    blocks = ((widths[0],) * 2, (widths[1],) * 2, (widths[2],) * 3,
              (widths[3],) * 3, (widths[4],) * 3)
    arrays, in_c, i = {}, 3, 0
    for block in blocks:
        for out_c in block:
            arrays[f"conv{i}_w"] = rng.randn(out_c, in_c, 3, 3).astype(
                np.float32) * 0.3
            arrays[f"conv{i}_b"] = rng.randn(out_c).astype(np.float32) * 0.1
            in_c = out_c
            i += 1
    for j, w in enumerate(widths):
        arrays[f"lin{j}"] = np.abs(rng.randn(w)).astype(np.float32)
    np.savez(path, **arrays)


class TestLpips:
    def test_gate_and_error_when_unavailable(self, tmp_path, monkeypatch):
        from vf_nerf_tpu.utils.metrics import get_lpips, lpips_available
        missing = str(tmp_path / "nope.npz")
        monkeypatch.setenv("VF_NERF_LPIPS_WEIGHTS", missing)
        assert not lpips_available()
        img = np.zeros((8, 8, 3), np.float32)
        with pytest.raises(RuntimeError, match="export_lpips_weights"):
            get_lpips(img, img)

    def test_forward_structure_with_synthetic_weights(self, tmp_path,
                                                      monkeypatch):
        """d(x,x)=0, d(x,y)>0, symmetric — on a tiny same-structure net."""
        from vf_nerf_tpu.utils.metrics import get_lpips, lpips_available
        path = str(tmp_path / "tiny_lpips.npz")
        _write_tiny_lpips_npz(path)
        monkeypatch.setenv("VF_NERF_LPIPS_WEIGHTS", path)
        assert lpips_available()
        rng = np.random.RandomState(3)
        a = rng.rand(32, 32, 3).astype(np.float32)
        b = rng.rand(32, 32, 3).astype(np.float32)
        assert get_lpips(a, a) == pytest.approx(0.0, abs=1e-6)
        d_ab, d_ba = get_lpips(a, b), get_lpips(b, a)
        assert d_ab > 1e-4
        assert d_ab == pytest.approx(d_ba, rel=1e-5)

    def test_full_size_torch_oracle_parity(self, tmp_path, monkeypatch):
        """Full VGG16-shape random weights through our JAX forward vs a
        torch mirror of the ``lpips`` package semantics (padding-1 convs,
        relu, 2x2 maxpool, 1e-10 channel-unit normalize, per-channel lin,
        spatial mean, tap sum — ``lpips/lpips.py``). Pins the padding/pool
        conventions the real-weight run depends on; the exporter
        (tools/export_lpips_weights.py) supplies the trained values
        online."""
        import torch
        import torch.nn.functional as F

        path = str(tmp_path / "vgg_lpips.npz")
        _write_tiny_lpips_npz(path, widths=(64, 128, 256, 512, 512),
                              seed=7)
        monkeypatch.setenv("VF_NERF_LPIPS_WEIGHTS", path)
        from vf_nerf_tpu.utils.metrics import (_LPIPS_SCALE, _LPIPS_SHIFT,
                                               get_lpips)
        weights = np.load(path)
        blocks = (2, 2, 3, 3, 3)

        def torch_taps(img):
            x = torch.from_numpy(
                img.transpose(2, 0, 1)[None] * 2.0 - 1.0)
            h = (x - torch.from_numpy(_LPIPS_SHIFT).view(1, 3, 1, 1)) / \
                torch.from_numpy(_LPIPS_SCALE).view(1, 3, 1, 1)
            taps, ci = [], 0
            for bi, n_convs in enumerate(blocks):
                for _ in range(n_convs):
                    w = torch.from_numpy(weights[f"conv{ci}_w"])
                    b = torch.from_numpy(weights[f"conv{ci}_b"])
                    h = F.relu(F.conv2d(h, w, b, padding=1))
                    ci += 1
                norm = h.pow(2).sum(1, keepdim=True).sqrt()
                taps.append(h / (norm + 1e-10))
                if bi < len(blocks) - 1:
                    h = F.max_pool2d(h, 2)
            return taps

        rng = np.random.RandomState(11)
        a = rng.rand(32, 32, 3).astype(np.float32)
        b = np.clip(a + 0.15 * rng.randn(32, 32, 3), 0, 1).astype(
            np.float32)
        with torch.no_grad():
            ta, tb = torch_taps(a), torch_taps(b)
            expected = 0.0
            for i, (fa, fb) in enumerate(zip(ta, tb)):
                lin = torch.from_numpy(weights[f"lin{i}"])
                diff = (fa - fb) ** 2
                expected += float(
                    (diff * lin.view(1, -1, 1, 1)).sum(1).mean())
        ours = get_lpips(a, b)
        assert ours == pytest.approx(expected, rel=1e-4)

    def test_real_weights_parity(self):
        """Runs only where a real exported LPIPS npz is present."""
        from vf_nerf_tpu.utils.metrics import get_lpips, lpips_available
        if not lpips_available():
            pytest.skip("no LPIPS weights npz (export with "
                        "tools/export_lpips_weights.py online, then set "
                        "$VF_NERF_LPIPS_WEIGHTS)")
        rng = np.random.RandomState(4)
        a = rng.rand(64, 64, 3).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(64, 64, 3).astype(np.float32), 0, 1)
        d = get_lpips(a, b)
        assert 0.0 < d < 1.0


class TestProtocolConfPatch:
    """The office clamp study patches the written run.conf by string
    replace; a drifted anchor would silently train at the shipped 0.5
    (tools/office_protocol.py::apply_depth_clamp)."""

    def _tools_path(self):
        import sys
        tools = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools")
        if tools not in sys.path:
            sys.path.insert(0, tools)

    def test_patched_conf_parses_with_new_clamp(self, tmp_path):
        self._tools_path()
        from convergence_variance import write_conf
        from office_protocol import apply_depth_clamp

        from vf_nerf_tpu.config.parser import parse_config

        conf_path = write_conf(str(tmp_path), epochs=5)
        apply_depth_clamp(conf_path, 3.0)
        config = parse_config(scene="boxroom", config_path=conf_path,
                              expname="t", timestamp="run",
                              data_root_dir=str(tmp_path), offline=True)
        assert config.vf_loss_config.depth_loss_clamp == 3.0

    def test_missing_anchor_raises(self, tmp_path):
        self._tools_path()
        from office_protocol import apply_depth_clamp

        p = tmp_path / "run.conf"
        p.write_text("loss { config { depth_loss_clamp = 0.7 } }\n")
        with pytest.raises(RuntimeError, match="refusing"):
            apply_depth_clamp(str(p), 3.0)

    def test_mask_invalid_depth_patch_parses(self, tmp_path):
        """r5 corruption study: the mask flag lands inside loss.config
        (stacked with a clamp patch) and parses to the schema field."""
        self._tools_path()
        from convergence_variance import write_conf
        from office_protocol import (apply_depth_clamp,
                                     apply_mask_invalid_depth)

        from vf_nerf_tpu.config.parser import parse_config

        conf_path = write_conf(str(tmp_path), epochs=5)
        apply_depth_clamp(conf_path, 3.0)
        apply_mask_invalid_depth(conf_path)
        config = parse_config(scene="boxroom", config_path=conf_path,
                              expname="t", timestamp="run",
                              data_root_dir=str(tmp_path), offline=True)
        assert config.vf_loss_config.mask_invalid_depth is True
        assert config.vf_loss_config.depth_loss_clamp == 3.0
        # default stays off (reference parity)
        conf2 = write_conf(str(tmp_path), epochs=5)
        config2 = parse_config(scene="boxroom", config_path=conf2,
                               expname="t", timestamp="run2",
                               data_root_dir=str(tmp_path), offline=True)
        assert config2.vf_loss_config.mask_invalid_depth is False

    def test_corrupt_depth_stats(self):
        self._tools_path()
        from office_protocol import corrupt_depth

        depth = np.full((8, 1000, 1), 2.0, np.float32)
        out = corrupt_depth(depth, dropout=0.15, noise_sigma=0.02, seed=7)
        holes = (out == 0.0).mean()
        assert 0.10 < holes < 0.20
        valid = out[out > 0]
        assert abs(valid.mean() - 2.0) < 0.01
        assert 0.01 < valid.std() < 0.04
        assert (out >= 0).all()
        # clean path untouched
        np.testing.assert_array_equal(corrupt_depth(depth, 0.0, 0.0), depth)

    def test_scannet_gate_tracks_depth_clamp(self, tmp_path):
        """The non-convergence gate must follow the operating point: at
        clamp 3.0 the office converges to ~0.0072-0.0083, so the default
        0.021 bar would pass a 2x-bad run (review r5 finding)."""
        self._tools_path()
        from scannet_protocol import write_scannet_conf

        from vf_nerf_tpu.config.parser import parse_config

        def thr_of(**kw):
            wd = os.path.join(str(tmp_path), f"w{len(os.listdir(tmp_path))}")
            os.makedirs(wd)
            conf = write_scannet_conf(wd, epochs=5, crop=10, **kw)
            cfg = parse_config(scene="scene0000_00", config_path=conf,
                               expname="t", timestamp="r",
                               data_root_dir=wd, offline=True)
            return cfg.convergence_loss_threshold

        try:
            assert thr_of(scene_type="office") == pytest.approx(0.021)
            assert thr_of(scene_type="office",
                          depth_clamp=3.0) == pytest.approx(0.010)
            assert thr_of(scene_type="box") == pytest.approx(0.00574)
        except FileNotFoundError:
            # parse only needs the conf, not scene data; if the parser
            # validates the data dir, fall back to raw-conf inspection
            import re
            wd = os.path.join(str(tmp_path), "raw")
            os.makedirs(wd)
            conf = write_scannet_conf(wd, epochs=5, crop=10,
                                      scene_type="office", depth_clamp=3.0)
            txt = open(conf).read()
            m = re.search(r"convergence_loss_threshold = ([\d.]+)", txt)
            assert float(m.group(1)) == pytest.approx(0.010)


class TestOfficeCohort:
    """r5 cohort assembler (tools/office_cohort.py): merges per-seed
    protocol + attribution artifacts into results/office_r5.json with a
    cohort median."""

    def _write_seed(self, d, seed, psnr, fscore):
        office = {
            "views": 24, "image_size": [240, 320], "epochs": 2000,
            "depth_loss_clamp": 3.0, "mc_resolution": 256, "seed": seed,
            "train_wall_s": 100.0, "train_rays_per_sec": 30000.0,
            "mean_psnr": psnr,
            "group_psnr": {"floor": {"psnr": psnr, "pixel_frac": 0.09}},
            "mc": {"metrics_3d_mc": {"merged-mesh": {
                "fscore": fscore, "recall": fscore + 0.02,
                "precision": fscore - 0.02,
                "chamfer distance": {"mean": 0.005}}}},
        }
        with open(os.path.join(d, f"office_s{seed}.json"), "w") as f:
            json.dump(office, f)
        attr = {"observed_gt_fraction": 0.77,
                "mc_mesh": {"recall_observed": 0.99,
                            "recall_unobserved": 0.9},
                "per_group": {"floor": {"observed_frac": 0.7}}}
        with open(os.path.join(d, f"attribution_s{seed}.json"), "w") as f:
            json.dump(attr, f)

    def test_assemble_median(self, tmp_path):
        self._tools_path()
        from office_cohort import assemble, load_cohort
        d = str(tmp_path)
        for seed, psnr, f in [(42, 43.9, 0.917), (1, 42.0, 0.90),
                              (2, 44.5, 0.95), (3, 41.0, 0.88),
                              (7, 43.0, 0.92)]:
            self._write_seed(d, seed, psnr, f)
        runs = load_cohort(d)
        assert sorted(runs) == [1, 2, 3, 7, 42]
        out = assemble(runs, 42)
        assert out["cohort_median"]["mc_fscore"] == 0.917
        assert out["cohort_median"]["mean_psnr"] == 43.0
        assert out["headline"]["seed"] == 42
        assert out["cohort"]["42"]["mc_recall_observed"] == 0.99
        with pytest.raises(SystemExit):
            assemble(runs, 99)

    def test_degenerate_seed_tolerated(self, tmp_path):
        """A seed that ran --mc none (or produced an error-record mesh)
        must not abort cohort assembly (review r5 finding)."""
        self._tools_path()
        from office_cohort import assemble, load_cohort
        d = str(tmp_path)
        self._write_seed(d, 42, 43.9, 0.917)
        self._write_seed(d, 1, 42.0, 0.90)
        # seed 2: --mc none (no "mc" key at all)
        office = {"views": 24, "image_size": [240, 320], "epochs": 2000,
                  "depth_loss_clamp": 3.0, "mc_resolution": 256,
                  "seed": 2, "train_wall_s": 1.0,
                  "train_rays_per_sec": 1.0, "mean_psnr": 40.0,
                  "group_psnr": {"floor": {"psnr": 40.0,
                                           "pixel_frac": 0.09}}}
        with open(os.path.join(d, "office_s2.json"), "w") as f:
            json.dump(office, f)
        # seed 3: error-record mesh (truthy dict without fscore)
        office = dict(office, seed=3,
                      mc={"metrics_3d_mc": {"merged-mesh": {
                          "error": "empty mesh"}}})
        with open(os.path.join(d, "office_s3.json"), "w") as f:
            json.dump(office, f)
        out = assemble(load_cohort(d), 42)
        assert out["cohort"]["2"]["mc_fscore"] is None
        assert out["cohort"]["3"]["mc_fscore"] is None
        assert out["cohort_median"]["mc_fscore"] == pytest.approx(
            (0.917 + 0.90) / 2)

    def _tools_path(self):
        import sys
        tools = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools")
        if tools not in sys.path:
            sys.path.insert(0, tools)


class TestDeskDecompose:
    """r5 desk-failure decomposition (tools/desk_decompose.py): perfect
    renders score ~lossless on every split, and the top/side + edge/
    interior partition covers exactly the desk pixels."""

    def test_perfect_render_decomposition(self, tmp_path):
        import sys
        tools = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools")
        if tools not in sys.path:
            sys.path.insert(0, tools)
        from desk_decompose import decompose

        from vf_nerf_tpu.datasets.synthetic import SyntheticOfficeDataset
        from vf_nerf_tpu.utils import io as io_utils

        ds = SyntheticOfficeDataset(n_images=6, image_size=(30, 40),
                                    pixels_per_batch=16, pitch_range=1.1)
        img_dir = os.path.join(str(tmp_path), "rendered_images")
        os.makedirs(img_dir)
        h, w = ds.image_size
        for i in range(ds.n_images):
            io_utils.save_rgb(os.path.join(img_dir, f"image-{i}.png"),
                              ds.rgb_images[i].reshape(h, w, 3))
            np.save(os.path.join(img_dir, f"depth-{i}.npy"),
                    ds.depth_images[i].reshape(h, w))
        out = decompose(ds, str(tmp_path))
        split_px = sum(v.get("pixels", 0) for v in out["splits"].values())
        assert split_px == out["desk_pixels_total"]
        assert len(out["per_view_desk_pixel_frac"]) == 6
        for key, row in out["splits"].items():
            if row.get("pixels"):
                # PNG quantization bounds the PSNR; depth npy is exact
                assert row["psnr"] > 40, (key, row)
                assert row["mean_abs_depth_err"] < 1e-5, (key, row)
