"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4.4):
sharded-vs-single-device equality (the psum correctness check) and
checkpoint round-trip across topology change."""

import os
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_renderer import make_batch, tiny_config
from test_train_step import LOSS_CONFIG, LOSS_WEIGHTS
from vf_nerf_tpu.models.nerf import TrainState, make_optimizer
from vf_nerf_tpu.models.renderer import RenderStatics, VFNerfModules
from vf_nerf_tpu.parallel import mesh as mesh_lib
from vf_nerf_tpu.parallel.train_step import (SupervisionStatics,
                                             make_train_step)


def build_step(n_rays):
    cfg = tiny_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(cfg.scheduler_config, decay_steps=1000)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
    sup = SupervisionStatics.from_config(
        cfg, "exterior_synthetic", n_rays=n_rays,
        n_samples=statics.n_coarse + statics.n_fine, border_radius=0.15)
    raw_step = make_train_step(modules, optimizer, statics, sup,
                               LOSS_WEIGHTS, LOSS_CONFIG)

    def step(state, batch, key, epoch, **kw):
        from vf_nerf_tpu.parallel.train_step import zero_metric_sums
        import jax as _jax
        sums = zero_metric_sums()
        # match the state's sharding so donation works on a mesh
        first = _jax.tree_util.tree_leaves(state)[0]
        if hasattr(first, "sharding"):
            sums = _jax.tree_util.tree_map(
                lambda x: _jax.device_put(x, _jax.tree_util.tree_leaves(
                    state)[0].sharding), sums)
        new_state, out = raw_step(state, sums, batch, key, epoch, **kw)
        return new_state, out

    return cfg, state, step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedStep:
    def test_sharded_equals_single_device(self):
        n_rays = 64
        cfg, state, step = build_step(n_rays)
        ds, batch = make_batch(n_rays)
        near, far = ds.get_bounds()
        common = dict(window_weights=jnp.asarray(cfg.cos_sim_weights),
                      near=jnp.float32(near), far=jnp.float32(far),
                      centroid=jnp.zeros(3))
        key = jax.random.PRNGKey(7)
        epoch = jnp.asarray(3, jnp.int32)

        # Single device.
        state_a, metrics_a = step(jax.tree_util.tree_map(jnp.copy, state),
                                  batch, key, epoch, **common)

        # 8-device mesh: state replicated, batch ray-sharded.
        mesh = mesh_lib.make_mesh(8)
        state_b = mesh_lib.replicate_state(
            mesh, jax.tree_util.tree_map(jnp.copy, state))
        batch_b = mesh_lib.shard_batch(mesh, batch)
        state_b, metrics_b = step(state_b, batch_b, key, epoch, **common)

        assert float(metrics_a["loss"]) == pytest.approx(
            float(metrics_b["loss"]), rel=1e-5)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) -
                                             np.asarray(b)))),
            state_a.params, state_b.params)
        max_diff = max(jax.tree_util.tree_leaves(diffs))
        assert max_diff < 1e-5

    def test_multi_step_convergence_sharded(self):
        n_rays = 64
        cfg, state, step = build_step(n_rays)
        ds, batch = make_batch(n_rays)
        near, far = ds.get_bounds()
        common = dict(window_weights=jnp.asarray(cfg.cos_sim_weights),
                      near=jnp.float32(near), far=jnp.float32(far),
                      centroid=jnp.zeros(3))
        mesh = mesh_lib.make_mesh(8)
        state = mesh_lib.replicate_state(mesh, state)
        batch = mesh_lib.shard_batch(mesh, batch)
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(20):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub,
                                  jnp.asarray(i, jnp.int32), **common)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCheckpointTopologyChange:
    def test_roundtrip(self, tmp_path):
        from vf_nerf_tpu.utils import checkpoint as ckpt_io
        cfg, state, step = build_step(32)
        # Save from a replicated (mesh) state, restore onto plain devices.
        mesh = mesh_lib.make_mesh(4)
        state_r = mesh_lib.replicate_state(mesh, state)
        path = ckpt_io.save_checkpoint(str(tmp_path), 5,
                                       {"params": state_r.params,
                                        "step": state_r.step, "epoch": 5})
        template = {"params": state.params, "step": state.step, "epoch": 0}
        restored = ckpt_io.load_checkpoint(path, template)
        assert restored["epoch"] == 5
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) -
                                             np.asarray(b)))),
            restored["params"], state.params)
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


class TestMultiHost:
    """The real two-process path (VERDICT r1 item 7): a localhost cluster of
    two JAX processes, each with 2 virtual CPU devices, exercising
    initialize_multihost → global_mesh → feed_global_batch → psum."""

    def test_two_process_cluster(self):
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

        child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS",)}
        procs = [subprocess.Popen(
            [sys.executable, child, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env) for pid in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multihost child timed out")
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"child {pid} failed:\n{out}"
            assert f"MULTIHOST_OK pid={pid}" in out, out

    def test_local_ray_slice_partitions_exactly(self):
        """Host slices tile the global ray axis disjointly (the dedup that
        makes feed_global_batch hold each ray once; advisor r2)."""
        from vf_nerf_tpu.parallel.multihost import local_ray_slice

        n, nproc = 96, 4
        idx = np.arange(n)
        parts = [idx[local_ray_slice(n, p, nproc)] for p in range(nproc)]
        assert all(len(p) == n // nproc for p in parts)
        np.testing.assert_array_equal(np.concatenate(parts), idx)

    def test_autodetect_fallback_logs_and_returns_false(self):
        """Zero-arg initialize in a clean single process: no silent pass —
        either a logged warning + False, or a 1-process 'cluster' + False."""
        import os
        import subprocess
        import sys

        code = (
            "import logging, sys; logging.basicConfig(level=logging.WARNING)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "sys.path.insert(0, %r)\n"
            "from vf_nerf_tpu.parallel.multihost import initialize_multihost\n"
            "print('RESULT', initialize_multihost())\n"
        ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX_COORD", "SLURM", "OMPI"))}
        out = subprocess.run([sys.executable, "-c", code], text=True,
                             capture_output=True, timeout=300, env=env)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "RESULT False" in out.stdout, out.stdout + out.stderr


class TestMeshEval:
    def test_sharded_render_equals_single_device(self):
        """enable_mesh_eval shards render chunks over the data mesh,
        bit-equal to the single-device render (same seed → same PRNG keys;
        every render op is per-ray)."""
        from vf_nerf_tpu.models.nerf import VectorFieldNerf

        cfg = tiny_config(n_samples=12, n_importance=4, perturb=False)
        n_rays = 64
        rng = np.random.RandomState(0)
        uv = rng.uniform(0, 30, (n_rays, 2)).astype(np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr[:, 0, 0] = intr[:, 1, 1] = 25.0
        intr[:, 0, 2], intr[:, 1, 2] = 15.0, 12.0

        base = VectorFieldNerf(cfg, seed=7, decay_steps=100)
        base.eval()
        out_single = base.render(pose, uv, intr, epoch=0)

        sharded = VectorFieldNerf(cfg, seed=7, decay_steps=100)
        sharded.eval()
        sharded.enable_mesh_eval(mesh_lib.make_mesh(8))
        out_mesh = sharded.render(pose, uv, intr, epoch=0)

        for key in ("rgb", "depth", "z_vals", "weights", "normals"):
            np.testing.assert_array_equal(np.asarray(out_mesh[key]),
                                          np.asarray(out_single[key]),
                                          err_msg=key)

    def test_indivisible_chunk_falls_back(self):
        """Ray counts that don't divide the mesh stay single-device."""
        from vf_nerf_tpu.models.nerf import VectorFieldNerf

        cfg = tiny_config(n_samples=12, n_importance=4, perturb=False)
        model = VectorFieldNerf(cfg, seed=7, decay_steps=100)
        model.eval()
        model.enable_mesh_eval(mesh_lib.make_mesh(8))
        n_rays = 13  # not divisible by 8
        rng = np.random.RandomState(1)
        uv = rng.uniform(0, 30, (n_rays, 2)).astype(np.float32)
        pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
        intr[:, 0, 0] = intr[:, 1, 1] = 25.0
        out = model.render(pose, uv, intr, epoch=0)
        assert out["rgb"].shape == (n_rays, 3)

    def test_render_images_sharded_equals_single_device(self, tmp_path):
        """``methods.render_images`` scans chunks on device; with
        ``eval_mesh`` set the blocks are ray-sharded over the mesh — the
        written images must be identical to the single-device run, on
        EVERY image (multi-image pins the cross-image key-chain
        alignment; keys are not inert for argmax-0 rays)."""
        from vf_nerf_tpu.config.schema import DatasetConfig
        from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
        from vf_nerf_tpu.evaluation.methods import render_images
        from vf_nerf_tpu.models.nerf import VectorFieldNerf
        from vf_nerf_tpu.utils import io as io_utils

        root = str(tmp_path)
        ds = SyntheticBoxDataset(n_images=2, image_size=(8, 16),
                                 pixels_per_batch=32)
        ds.export_replica_format(root, scene="boxroom")
        ds_cfg = DatasetConfig(dataset_name="replica", data_dir="Replica",
                               shuffle_views=True, pixels_per_batch=32,
                               scene="boxroom", data_root_dir=root,
                               factor=1)

        cfg = tiny_config(n_samples=12, n_importance=4, perturb=False)
        outs = {}
        for name in ("single", "mesh"):
            model = VectorFieldNerf(cfg, seed=7, decay_steps=100)
            model.eval()
            if name == "mesh":
                model.enable_mesh_eval(mesh_lib.make_mesh(8))
            out_dir = os.path.join(root, f"evals_{name}")
            render_images(model, out_dir, ds_cfg, epoch=0, split_size=32)
            outs[name] = [io_utils.load_rgb(
                os.path.join(out_dir, "rendered_images", f"image-{i}.png"),
                transpose=False) for i in range(2)]
        for i in range(2):
            np.testing.assert_array_equal(outs["single"][i],
                                          outs["mesh"][i],
                                          err_msg=f"image-{i}")
