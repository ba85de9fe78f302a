"""Joint pose-and-field optimization tests + pose/geometry utilities."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vf_nerf_tpu.ops.rays import (matrix_to_pose7, pose7_to_matrix,
                                  quat_to_rot, rot_to_quat)


class TestQuatRoundTrip:
    def test_rot_to_quat_round_trip(self):
        from scipy.spatial.transform import Rotation
        rots = Rotation.random(64, random_state=0).as_matrix() \
            .astype(np.float32)
        q = rot_to_quat(jnp.asarray(rots))
        back = np.asarray(quat_to_rot(q))
        np.testing.assert_allclose(back, rots, rtol=1e-4, atol=1e-5)

    def test_pose7_round_trip(self):
        from scipy.spatial.transform import Rotation
        n = 16
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, :3, :3] = Rotation.random(n, random_state=1).as_matrix()
        poses[:, :3, 3] = np.random.RandomState(2).randn(n, 3)
        p7 = matrix_to_pose7(jnp.asarray(poses))
        back = np.asarray(pose7_to_matrix(p7))
        np.testing.assert_allclose(back, poses, rtol=1e-4, atol=1e-5)


class TestGaugeAlignment:
    """tools/joint_efficacy.py's Umeyama gauge-removal scoring (r5):
    a pure global Sim(3) applied to every pose must score ~0 after
    alignment, and the recovered gauge must match the applied one."""

    def _poses(self, n=12, seed=3):
        from scipy.spatial.transform import Rotation
        poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        poses[:, :3, :3] = Rotation.random(n, random_state=seed).as_matrix()
        poses[:, :3, 3] = np.random.RandomState(seed).randn(n, 3)
        return poses

    def test_global_se3_is_gauge_only(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from joint_efficacy import aligned_pose7_errors, pose7_errors
        from scipy.spatial.transform import Rotation

        gt = self._poses()
        g = np.eye(4)
        g[:3, :3] = Rotation.from_euler("xyz", [5, -3, 8],
                                        degrees=True).as_matrix()
        g[:3, 3] = [0.1, -0.05, 0.2]
        est = np.einsum("ij,njk->nik", g, gt)
        gt7 = np.asarray(matrix_to_pose7(jnp.asarray(
            gt.astype(np.float32))))
        est7 = np.asarray(matrix_to_pose7(jnp.asarray(
            est.astype(np.float32))))
        raw = pose7_errors(est7, gt7)
        assert raw["trans_mean"] > 0.05  # the gauge shows up raw...
        aligned = aligned_pose7_errors(est7, gt7)
        assert aligned["rot_deg_mean"] < 0.05  # ...and vanishes aligned
        assert aligned["trans_mean"] < 1e-3
        assert aligned["gauge_rot_deg"] == pytest.approx(
            np.rad2deg(np.linalg.norm(Rotation.from_matrix(
                g[:3, :3]).as_rotvec())), abs=0.05)

    def test_sim3_recovers_scale(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from joint_efficacy import aligned_pose7_errors

        gt = self._poses()
        est = gt.copy()
        est[:, :3, 3] *= 1.07  # pure scale gauge
        gt7 = np.asarray(matrix_to_pose7(jnp.asarray(
            gt.astype(np.float32))))
        est7 = np.asarray(matrix_to_pose7(jnp.asarray(
            est.astype(np.float32))))
        se3 = aligned_pose7_errors(est7, gt7)
        sim3 = aligned_pose7_errors(est7, gt7, with_scale=True)
        assert sim3["trans_mean"] < 1e-3 < se3["trans_mean"]
        assert sim3["gauge_scale"] == pytest.approx(1 / 1.07, rel=1e-3)

    def test_real_error_survives_alignment(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from joint_efficacy import aligned_pose7_errors, perturb_poses

        gt = self._poses()
        est = perturb_poses(gt, rot_deg=2.0, trans=0.05, seed=0)
        gt7 = np.asarray(matrix_to_pose7(jnp.asarray(
            gt.astype(np.float32))))
        est7 = np.asarray(matrix_to_pose7(jnp.asarray(
            est.astype(np.float32))))
        aligned = aligned_pose7_errors(est7, gt7, with_scale=True)
        # iid per-view noise is NOT a gauge — most of it must survive.
        assert aligned["rot_deg_mean"] > 1.0
        assert aligned["trans_mean"] > 0.02

    def test_clustered_rig_no_spurious_gauge(self):
        """Regression (r5): on an inward-looking rig whose camera centers
        cluster in a ~0.1-unit blob (SyntheticBoxDataset draws centers
        within ±0.16·half_size), a center-only Umeyama gauge fit is
        ill-conditioned — 0.02 iid center noise over 6 views produced a
        spurious 3.5-3.9° "gauge" rotation that INFLATED the aligned
        errors past the raw ones. The orientation-first fit must stay
        near identity on iid (non-gauge) perturbations."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from joint_efficacy import aligned_pose7_errors, perturb_poses
        from scipy.spatial.transform import Rotation

        n = 6
        gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        gt[:, :3, :3] = Rotation.random(n, random_state=5).as_matrix()
        # clustered centers, like the box rig's uniform(-.4,.4)*hs*0.4
        gt[:, :3, 3] = np.random.RandomState(5).uniform(
            -0.16, 0.16, (n, 3))
        est = perturb_poses(gt, rot_deg=1.5, trans=0.02, seed=1)
        gt7 = np.asarray(matrix_to_pose7(jnp.asarray(
            gt.astype(np.float32))))
        est7 = np.asarray(matrix_to_pose7(jnp.asarray(
            est.astype(np.float32))))
        aligned = aligned_pose7_errors(est7, gt7)
        # the fitted gauge must be small (chordal mean of iid 1.5°
        # rotations ≈ 1.5/√6 ≈ 0.6°), not the degrees-scale artifact
        # the center fit produced, and alignment must not inflate the
        # raw error (1.5°) by more than that small gauge.
        assert aligned["gauge_rot_deg"] < 1.0
        assert aligned["rot_deg_mean"] < 1.5 + 1.0
        assert aligned["trans_mean"] < 0.04

    def test_score_from_excludes_pinned_view(self):
        """Anchor mode pins pose 0 at exactly-zero error; score_from=1
        keeps it out of the error means so anchored/unanchored numbers
        stay comparable (review r5 finding)."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from joint_efficacy import aligned_pose7_errors, pose7_errors

        from joint_efficacy import perturb_poses

        n = 12
        gt = self._poses(n=n)
        # the anchor-mode scenario: pose 0 exact, views 1..n-1 perturbed
        est = perturb_poses(gt, rot_deg=2.0, trans=0.05, seed=0,
                            skip=(0,))
        gt7 = np.asarray(matrix_to_pose7(jnp.asarray(
            gt.astype(np.float32))))
        est7 = np.asarray(matrix_to_pose7(jnp.asarray(
            est.astype(np.float32))))
        full = pose7_errors(est7, gt7)
        sliced = pose7_errors(est7[1:], gt7[1:])
        # including the pinned view dilutes the means by (n-1)/n
        assert full["trans_mean"] == pytest.approx(
            sliced["trans_mean"] * (n - 1) / n, rel=1e-4)
        assert sliced["trans_mean"] == pytest.approx(0.05, rel=1e-3)
        al0 = aligned_pose7_errors(est7, gt7)
        al1 = aligned_pose7_errors(est7, gt7, score_from=1)
        assert al1["trans_mean"] > al0["trans_mean"]  # dilution removed


class TestGeometryUtils:
    def test_sphere_intersections(self):
        from vf_nerf_tpu.utils.geometry import compute_sphere_intersections
        cam = jnp.asarray([[0.0, 0.0, -0.5]])
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        roots = np.asarray(compute_sphere_intersections(cam, dirs,
                                                        radius=1.0))
        # enters at z=-1 (t=-0.5→clamped 0), exits at z=1 (t=1.5)
        np.testing.assert_allclose(roots[0], [0.0, 1.5], atol=1e-5)

    def test_project_to_plane(self):
        from vf_nerf_tpu.utils.geometry import project_to_plane
        pts = jnp.asarray([[0.0, 0, 0], [1, 2, 3], [4, 5, 6]])
        vecs = jnp.asarray([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]])
        p2, v2 = project_to_plane(pts, vecs, jnp.asarray([1.0, 0, 0]),
                                  jnp.asarray([0.0, 1, 0]))
        np.testing.assert_allclose(np.asarray(p2),
                                   [[0, 0], [1, 2], [4, 5]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(v2),
                                   [[1, 0], [0, 1], [0, 0]], atol=1e-6)

    def test_dominant_bases(self, tmp_path):
        from vf_nerf_tpu.datasets.synthetic import box_mesh
        from vf_nerf_tpu.utils.geometry import get_dominant_bases
        from vf_nerf_tpu.utils.ply import save_ply
        verts, faces = box_mesh(1.0)
        path = os.path.join(str(tmp_path), "box.ply")
        save_ply(path, verts, faces)
        bases = get_dominant_bases(6, 1.0, path)
        assert bases.shape == (6, 3)
        # A cube's face normals are axis-aligned; every basis should be
        # near an axis direction.
        aligned = np.abs(bases).max(axis=1)
        assert (aligned > 0.9).all()


class TestSnapToBases:
    def test_snapping(self):
        from vf_nerf_tpu.train.joint_runner import snap_to_bases
        bases = jnp.asarray(np.eye(3, dtype=np.float32))
        v = jnp.asarray([[0.9, 0.1, 0.0], [-0.8, 0.2, 0.1],
                         [0.0, 0.0, -1.0]])
        snapped = np.asarray(snap_to_bases(v, bases))
        np.testing.assert_allclose(snapped, [[1, 0, 0], [-1, 0, 0],
                                             [0, 0, -1]])


class TestJointRunner:
    def _build(self, tmp_path):
        from test_e2e import TINY_CONF
        from vf_nerf_tpu.config.joint_parser import parse_config
        from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset

        root = str(tmp_path)
        ds = SyntheticBoxDataset(n_images=3, image_size=(12, 16),
                                 pixels_per_batch=96)
        ds.export_replica_format(root, scene="boxroom")
        conf_path = os.path.join(root, "tiny.conf")
        exps = os.path.join(root, "exps_vf_nerf")
        with open(conf_path, "w") as f:
            f.write(TINY_CONF.replace("EXPS_PLACEHOLDER", exps))
        joint_conf = os.path.join(root, "joint.conf")
        with open(joint_conf, "w") as f:
            f.write("""
train {
    initial_training_epochs = 0
    supervised_vf_epochs = 1
    joint_epochs = 3
    supervise_every = 2
    supervision_epochs = 1
    refinement_init_lr = 1e-3
    reset_scheduler = False
}
joint_optimization {
    save_frequency = 2
    num_bases = 6
    decimation = 1.0
    self_supervise = True
}
""")
        return parse_config(scene="boxroom", vf_config_path=conf_path,
                            joint_config_path=joint_conf, expname="synth",
                            timestamp="joint_test", data_root_dir=root,
                            offline=True)

    def test_parse_config(self, tmp_path):
        cfg = self._build(tmp_path)
        assert cfg.train_config.joint_epochs == 3
        assert cfg.num_bases == 6
        assert cfg.vf_config.supervised_loss_weights.supervision == 10.0
        # num_epochs overridden (reference joint_opt_config_parser.py:63)
        assert cfg.vf_config.num_epochs == \
            cfg.train_config.supervised_vf_epochs

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 virtual devices")
    def test_sharded_joint_step_equals_single_device(self, tmp_path):
        """BASELINE configs[4]: joint optimization with multi-chip ray
        sharding — sharded step must match the single-device step."""
        from vf_nerf_tpu.parallel import mesh as mesh_lib
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        cfg = self._build(tmp_path)
        runner = JointOptimizationRunner(cfg)
        statics = runner.model.render_statics(train=False)
        step = runner._joint_step_fn(statics)

        params = {"model": runner.model.state.params,
                  "poses": jnp.asarray(runner.pose_params)}
        opt_state = runner.joint_tx.init(params)
        batch_stats = runner.model.state.batch_stats
        batch = next(runner.dataset.epoch_batches(np.random.RandomState(0)))
        near, far = runner.dataset.get_bounds()
        args = (jax.random.PRNGKey(3), jnp.float32(near), jnp.float32(far),
                jnp.asarray(runner.model.window_weights))

        def zeros():
            return {k: jnp.zeros((), jnp.float32)
                    for k in runner.JOINT_METRICS}

        copy = jax.tree_util.tree_map(jnp.copy, params)
        runner.mesh, runner.n_devices = None, 1
        p_a, _, s_a = step(copy, runner.joint_tx.init(copy), zeros(),
                           batch_stats, runner._feed_rays(batch), *args)

        mesh = mesh_lib.make_mesh(8)
        runner.mesh, runner.n_devices = mesh, 8
        p_b = mesh_lib.replicate_state(
            mesh, jax.tree_util.tree_map(jnp.copy, params))
        p_b, _, s_b = step(p_b, runner.joint_tx.init(p_b),
                           mesh_lib.replicate_state(mesh, zeros()),
                           mesh_lib.replicate_state(mesh, batch_stats),
                           runner._feed_rays(batch), *args)

        assert float(s_a["loss"]) == pytest.approx(float(s_b["loss"]),
                                                   rel=1e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) -
                                             np.asarray(b)))), p_a, p_b)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
        # Poses received gradients in both runs.
        assert not np.allclose(np.asarray(p_a["poses"]),
                               np.asarray(params["poses"]))

    def test_scan_dispatch_equals_per_step_dispatch(self, tmp_path):
        """VERDICT r2 #4: the joint stage inherits the main trainer's
        scan-dispatch architecture — K steps per dispatch (here: the whole
        epoch) computes the same update as per-step dispatch, including the
        supervised block and the PRNG chain."""
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner

        cfg = self._build(tmp_path)
        results = {}
        for spd in (1, 0):
            cfg.vf_config.vf_nerf_config.device_config.steps_per_dispatch \
                = spd
            runner = JointOptimizationRunner(cfg)
            metrics = runner.train()
            results[spd] = (jax.device_get(runner.model.state.params),
                            runner.pose_params.copy(), metrics["loss"])

        p1, poses1, loss1 = results[1]
        p0, poses0, loss0 = results[0]
        assert loss0 == pytest.approx(loss1, rel=1e-5)
        np.testing.assert_allclose(poses0, poses1, atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            p0, p1)

    def test_depth_clamp_threads_from_conf(self, tmp_path):
        """The joint step must honor ``loss.config.depth_loss_clamp`` from
        the vf conf (the r4 office study's occluder-recovery knob) rather
        than a pinned 0.5: with a near-zero clamp the reported per-epoch
        depth_loss is capped at the clamp; at the default it is not."""
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner

        losses = {}
        for clamp in (0.5, 1e-4):
            cfg = self._build(tmp_path)
            cfg.vf_config.vf_loss_config.depth_loss_clamp = clamp
            cfg.vf_config.timestamp = f"joint_clamp_{clamp}"
            runner = JointOptimizationRunner(cfg)
            losses[clamp] = runner.train()["depth_loss"]
        assert losses[1e-4] <= 1e-4 + 1e-6
        # The un-clamped run must exceed the tight clamp's cap (threading
        # proof); avoid a hard 10x ratio that couples to the untrained
        # field's depth error magnitude (ADVICE r4).
        assert losses[0.5] > losses[1e-4]

    def test_anchor_first_pose_pins_the_gauge(self, tmp_path):
        """With ``train.anchor_first_pose``, pose 0's parameters are
        bit-unchanged by training (its gradient is zeroed before adam)
        while the other poses still receive updates — the fix-one-camera
        gauge normalization (r5)."""
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner

        cfg = self._build(tmp_path)
        cfg.train_config.anchor_first_pose = True
        cfg.vf_config.timestamp = "joint_anchor"
        runner = JointOptimizationRunner(cfg)
        initial = runner.pose_params.copy()
        runner.train()
        np.testing.assert_array_equal(runner.pose_params[0], initial[0])
        assert not np.allclose(runner.pose_params[1:], initial[1:])

    def test_joint_training_runs_and_improves(self, tmp_path):
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        cfg = self._build(tmp_path)
        runner = JointOptimizationRunner(cfg)
        initial_poses = runner.pose_params.copy()
        metrics = runner.train()
        assert np.isfinite(metrics["loss"])
        # Pose parameters received gradients.
        assert not np.allclose(runner.pose_params, initial_poses)
        # Checkpoints with refined poses exist.
        assert os.path.exists(os.path.join(runner.ckpt_dir, "latest.ckpt"))
        refined = runner.refined_poses()
        assert refined.shape == (3, 4, 4)
        # Rotations stay orthonormal after refinement.
        rtr = refined[:, :3, :3] @ refined[:, :3, :3].transpose(0, 2, 1)
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (3, 1, 1)),
                                   atol=1e-4)


class TestJointEfficacy:
    """VERDICT r3 #3 (small scale): perturbed poses RECOVER through the
    joint stage, not just receive gradients. A field is trained on GT
    poses (the 150-epoch tiny protocol — depth error ~0.014, PSNR ~35),
    poses are perturbed by a measurable amount, and the joint stage with
    the pose-refinement schedule (``pose_lr`` + ``pose_only_epochs``
    warmup; rgb+depth alignment weights, field-shaping sim/unit terms off)
    must cut both rotation and translation error substantially. Findings
    that shaped the knobs (measured in this experiment's development):
    a shared single-lr adam lets the field absorb the miscalibration
    (errors *grew* 4°→7.5°); with the field frozen during warmup the same
    50 epochs recover 4°→0.7°, 0.08→0.03."""

    def _build_eff(self, tmp_path, joint_epochs=60, main_epochs=300):
        from test_e2e import TINY_CONF
        from vf_nerf_tpu.config.joint_parser import parse_config
        from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset

        root = str(tmp_path)
        ds = SyntheticBoxDataset(n_images=3, image_size=(12, 16),
                                 pixels_per_batch=96)
        ds.export_replica_format(root, scene="boxroom")
        conf_path = os.path.join(root, "tiny.conf")
        conf = TINY_CONF.replace(
            "EXPS_PLACEHOLDER", os.path.join(root, "exps_vf_nerf"))
        conf = conf.replace("num_epochs = 3", f"num_epochs = {main_epochs}")
        conf = conf.replace("save_frequency = 2", "save_frequency = 100")
        # Alignment-driving supervised weights for the joint stage: rgb +
        # depth pull poses toward GT; the field-shaping similarity /
        # unit-norm terms create pose-irrelevant gradients and are off.
        conf = conf.replace(
            "    rgb = 0.0\n    depth = 0.5\n    unit_norm = 0.1\n"
            "    similarity = 1.0",
            "    rgb = 1.0\n    depth = 0.5\n    unit_norm = 0.0\n"
            "    similarity = 0.0")
        with open(conf_path, "w") as f:
            f.write(conf)
        joint_conf = os.path.join(root, "joint.conf")
        with open(joint_conf, "w") as f:
            f.write(f"""
train {{
    initial_training_epochs = 0
    supervised_vf_epochs = 0
    joint_epochs = {joint_epochs}
    supervise_every = {joint_epochs + 1}
    supervision_epochs = 0
    refinement_init_lr = 1e-3
    reset_scheduler = False
    pose_lr = 1e-2
    pose_only_epochs = {joint_epochs}
}}
joint_optimization {{
    save_frequency = 1000000
    num_bases = 6
    decimation = 1.0
    self_supervise = True
}}
""")
        return conf_path, joint_conf, root

    @pytest.mark.slow
    def test_perturbed_poses_recover(self, tmp_path):
        import pickle
        import shutil

        from joint_efficacy import perturb_poses, pose7_errors
        from vf_nerf_tpu.config.joint_parser import parse_config
        from vf_nerf_tpu.config.parser import parse_config as parse_vf
        from vf_nerf_tpu.ops.rays import matrix_to_pose7
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        from vf_nerf_tpu.train.runner import VectorFieldNerfRunner
        from vf_nerf_tpu.train.vf_init import fit_vf_init

        conf_path, joint_conf, root = self._build_eff(tmp_path)

        # Main stage on GT poses (vf-init from the generic radial field).
        vf_cfg_main = parse_vf(scene="boxroom", config_path=conf_path,
                               expname="eff", timestamp="run",
                               data_root_dir=root, offline=True)
        params, stats = fit_vf_init(
            vf_cfg_main.vf_nerf_config.vf_net_config, "exterior_scene",
            np.zeros(3), sample_extent=2.6, wall_radius=2.0, steps=200,
            batch=2048, seed=0)
        with open(os.path.join(root, "Replica", "boxroom", "boxroom.pkl"),
                  "wb") as f:
            pickle.dump({"params": params, "batch_stats": stats}, f)
        VectorFieldNerfRunner(vf_cfg_main).train()

        cfg = parse_config(scene="boxroom", vf_config_path=conf_path,
                           joint_config_path=joint_conf, expname="eff",
                           timestamp="joint_eff", data_root_dir=root,
                           checkpoint="latest", offline=True)
        src = os.path.join(cfg.vf_config.exps_folder, "eff_boxroom", "run",
                           "checkpoints", "vf_nerf", "latest.ckpt")
        dst = os.path.join(cfg.vf_config.exps_folder, "eff_boxroom",
                           "joint_eff", "checkpoints", "vf_nerf")
        os.makedirs(dst, exist_ok=True)
        shutil.copy(src, os.path.join(dst, "latest.ckpt"))
        runner = JointOptimizationRunner(cfg)

        ds = runner.dataset
        gt7 = runner.pose_params.copy()
        perturbed = perturb_poses(ds.poses, rot_deg=4.0, trans=0.08, seed=1)
        runner.pose_params = np.asarray(
            matrix_to_pose7(jnp.asarray(perturbed)))
        before = pose7_errors(runner.pose_params, gt7)
        assert before["rot_deg_mean"] > 3.0 and before["trans_mean"] > 0.07

        runner.train()
        after = pose7_errors(runner.pose_params, gt7)

        # Efficacy: both error components shrink substantially (the chip
        # run in tools/joint_efficacy.py demonstrates the full ->0 at
        # production scale).
        assert after["rot_deg_mean"] < 0.5 * before["rot_deg_mean"], \
            (before, after)
        assert after["trans_mean"] < 0.5 * before["trans_mean"], \
            (before, after)


class TestPoseOnlyPhaseBoundary:
    """The pose-only → joint unfreeze boundary (mid-run optimizer swap +
    opt-state re-init, replicated over the device mesh): exercised with
    0 < pose_only_epochs < joint_epochs in BOTH dispatch modes."""

    def _build(self, tmp_path, pose_only, joint_epochs=4,
               pose_lr_decay=1.0):
        from test_e2e import TINY_CONF
        from vf_nerf_tpu.config.joint_parser import parse_config
        from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset

        root = str(tmp_path)
        ds = SyntheticBoxDataset(n_images=3, image_size=(12, 16),
                                 pixels_per_batch=96)
        ds.export_replica_format(root, scene="boxroom")
        conf_path = os.path.join(root, "tiny.conf")
        with open(conf_path, "w") as f:
            f.write(TINY_CONF.replace(
                "EXPS_PLACEHOLDER", os.path.join(root, "exps_vf_nerf")))
        joint_conf = os.path.join(root, "joint.conf")
        with open(joint_conf, "w") as f:
            f.write(f"""
train {{
    initial_training_epochs = 0
    supervised_vf_epochs = 0
    joint_epochs = {joint_epochs}
    supervise_every = {joint_epochs + 1}
    supervision_epochs = 0
    refinement_init_lr = 1e-3
    reset_scheduler = False
    pose_lr = 1e-2
    pose_only_epochs = {pose_only}
    pose_lr_decay = {pose_lr_decay}
}}
joint_optimization {{
    save_frequency = 1000000
    num_bases = 6
    decimation = 1.0
    self_supervise = True
}}
""")
        return parse_config(scene="boxroom", vf_config_path=conf_path,
                            joint_config_path=joint_conf, expname="pb",
                            timestamp="joint_pb", data_root_dir=root,
                            offline=True)

    @staticmethod
    def _max_param_delta(a, b):
        diffs = jax.tree_util.tree_map(
            lambda x, y: float(np.max(np.abs(np.asarray(x) -
                                             np.asarray(y)))), a, b)
        return max(jax.tree_util.tree_leaves(diffs), default=0.0)

    def test_fully_frozen_model_is_bit_identical(self, tmp_path):
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        cfg = self._build(tmp_path, pose_only=4, joint_epochs=4)
        runner = JointOptimizationRunner(cfg)
        init_model = jax.device_get(runner.model.state.params)
        init_poses = runner.pose_params.copy()
        runner.train()
        assert self._max_param_delta(runner.model.state.params,
                                     init_model) == 0.0
        assert not np.allclose(runner.pose_params, init_poses)

    def test_unfreeze_boundary_model_moves_after(self, tmp_path):
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        cfg = self._build(tmp_path, pose_only=2, joint_epochs=4)
        runner = JointOptimizationRunner(cfg)
        init_model = jax.device_get(runner.model.state.params)
        runner.train()
        assert self._max_param_delta(runner.model.state.params,
                                     init_model) > 0.0

    def test_boundary_scan_equals_per_step(self, tmp_path):
        """The mid-run re-jit + opt-state re-init computes the same updates
        under K-steps-per-dispatch as per-step dispatch."""
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        results = {}
        for spd in (1, 0):
            cfg = self._build(tmp_path / f"spd{spd}", pose_only=2,
                              joint_epochs=4)
            cfg.vf_config.vf_nerf_config.device_config.steps_per_dispatch \
                = spd
            runner = JointOptimizationRunner(cfg)
            runner.train()
            results[spd] = (jax.device_get(runner.model.state.params),
                            runner.pose_params.copy())
        np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            results[0][0], results[1][0])

    def test_pose_lr_decay_schedule(self, tmp_path):
        """``pose_lr_decay`` anneals the pose step size across the warmup
        (adam's bias-corrected first update ≈ lr for a constant gradient)
        and the post-warmup optimizer continues at the decayed floor —
        the stabilizer for long pose-only warmups (a constant 1e-2 lr
        measured divergent at 300 warmup epochs on the chip)."""
        import jax.numpy as jnp

        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        cfg = self._build(tmp_path, pose_only=2, joint_epochs=4,
                          pose_lr_decay=0.01)
        runner = JointOptimizationRunner(cfg)
        params = {"model": runner.model.state.params,
                  "poses": jnp.ones((3, 7))}
        grads = jax.tree_util.tree_map(jnp.ones_like, params)

        tx = runner._make_joint_tx(freeze_model=True)
        state = tx.init(params)
        steps = 2 * len(runner.dataset)  # the full warmup span
        mags = []
        for _ in range(steps):
            upd, state = tx.update(grads, state, params)
            mags.append(float(jnp.abs(upd["poses"]).max()))
        assert mags[0] == pytest.approx(1e-2, rel=0.05)   # starts at pose_lr
        assert mags[-1] < mags[0] * 0.05                  # decayed hard
        assert all(b <= a * 1.001 for a, b in zip(mags, mags[1:]))

        tx2 = runner._make_joint_tx(freeze_model=False)   # post-warmup
        upd2, _ = tx2.update(grads, tx2.init(params), params)
        assert float(jnp.abs(upd2["poses"]).max()) == \
            pytest.approx(1e-2 * 0.01, rel=0.05)          # the floor

        # decay disabled (default) keeps the constant pose lr
        cfg2 = self._build(tmp_path / "nodecay", pose_only=2,
                           joint_epochs=4)
        runner2 = JointOptimizationRunner(cfg2)
        tx3 = runner2._make_joint_tx(freeze_model=True)
        st3 = tx3.init(params)
        for _ in range(steps):
            upd3, st3 = tx3.update(grads, st3, params)
        assert float(jnp.abs(upd3["poses"]).max()) == \
            pytest.approx(1e-2, rel=0.05)
