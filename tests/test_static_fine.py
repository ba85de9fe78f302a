"""Static fine-growth mode (VERDICT r2 #5): one compiled program serves
every +5 fine-sample growth stage by padding the fine axis to the static
max and masking the tail.

Equality contract: with ``perturb=False`` the padded program's live prefix
is equal to the unpadded program (pads sort beyond ``far``, carry zero
density and are excluded from every loss reduction); under perturb the
jitter streams are shaped by the static width — same distribution,
different draws (documented in PARITY.md). Reference growth schedule:
``train/vector_field_nerf_train.py:146-147``."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_renderer import make_batch, tiny_config
from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                         render_rays)

N_COARSE = 20
N_FINE_MAX = 16


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_samples=N_COARSE, n_importance=6, perturb=False)
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    ds, batch = make_batch()
    return cfg, modules, variables, ds, batch


def _statics(cfg, n_fine, train=False, perturb=False):
    if perturb:
        cfg = dataclasses.replace(
            cfg, ray_sampler_config=dataclasses.replace(
                cfg.ray_sampler_config, perturb=True))
    return RenderStatics.from_config(cfg, n_fine=n_fine, train=train)


def _render(cfg, modules, variables, ds, batch, statics, n_active=None):
    near, far = ds.get_bounds()
    return render_rays(modules, variables, batch["uv"], batch["pose"],
                       batch["intrinsics"], jnp.float32(near),
                       jnp.float32(far),
                       jnp.asarray(cfg.cos_sim_weights),
                       jax.random.PRNGKey(3), statics,
                       n_fine_active=n_active)


class TestMaskedRenderEquality:
    @pytest.mark.parametrize("n_active,perturb", [(6, False), (11, False),
                                                  (16, False), (11, True)])
    def test_live_prefix_matches_unpadded(self, setup, n_active, perturb):
        """Bit-equality on EVERY ray — including the argmax-0 random-extras
        quirk rays and the perturb jitter — because the fine sampler's
        draws are column-keyed (fold_in(key, col)), making the stream
        independent of the static width."""
        cfg, modules, variables, ds, batch = setup
        dyn = _render(cfg, modules, variables, ds, batch,
                      _statics(cfg, n_fine=n_active, perturb=perturb))
        pad = _render(cfg, modules, variables, ds, batch,
                      _statics(cfg, n_fine=N_FINE_MAX, perturb=perturb),
                      n_active=jnp.asarray(n_active, jnp.int32))
        s_live = N_COARSE + n_active

        np.testing.assert_allclose(pad["rgb"], dyn["rgb"], atol=1e-6)
        np.testing.assert_allclose(pad["depth"], dyn["depth"], atol=1e-5)
        np.testing.assert_allclose(pad["z_vals"][:, :s_live],
                                   dyn["z_vals"], atol=1e-6)
        np.testing.assert_allclose(pad["weights"][:, :s_live],
                                   dyn["weights"], atol=1e-6)
        np.testing.assert_allclose(pad["normals"][:, :s_live],
                                   dyn["normals"], atol=1e-6)
        # Pads: beyond far, zero weight, masked out (n_active == max has
        # no pads — the padded program degenerates to the plain one).
        _, far = ds.get_bounds()
        tail_z = np.asarray(pad["z_vals"])[:, s_live:]
        assert tail_z.size == 0 or tail_z.min() > far
        np.testing.assert_array_equal(
            np.asarray(pad["weights"])[:, s_live:], 0.0)
        mask = np.asarray(pad["sample_mask"])
        assert mask.sum() == batch["uv"].shape[0] * s_live
        np.testing.assert_array_equal(mask[:, :s_live], 1.0)
        np.testing.assert_array_equal(mask[:, s_live:], 0.0)


class TestMaskedTrainStepEquality:
    def _step_setup(self, cfg, n_fine):
        from vf_nerf_tpu.config.schema import VFLossConfig, VFLossWeights
        from vf_nerf_tpu.models.nerf import TrainState, make_optimizer
        from vf_nerf_tpu.parallel.train_step import (SupervisionStatics,
                                                     make_train_step,
                                                     zero_metric_sums)

        modules = VFNerfModules(cfg)
        variables = modules.init_variables(jax.random.PRNGKey(0))
        optimizer, _ = make_optimizer(cfg.scheduler_config, decay_steps=100)
        state = TrainState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=optimizer.init(variables["params"]),
                           step=jnp.zeros((), jnp.int32))
        statics = RenderStatics.from_config(cfg, n_fine=n_fine, train=False)
        sup = SupervisionStatics(
            init_method="exterior_synthetic", border_supervision=False,
            center_supervision=False, border_radius=0.15, n_points=1)
        step = make_train_step(
            modules, optimizer, statics, sup,
            VFLossWeights(rgb=2.0, depth=0.5, unit_norm=0.1,
                          supervision=1.0, norm_smaller_than_one=0.1,
                          directional_derivatives=0.0),
            VFLossConfig(norm_smaller_than_one_start=0,
                         depth_loss_clamp=0.5,
                         directional_derivatives_start=100))
        return state, step, zero_metric_sums()

    def test_step_loss_and_update_match(self):
        """Full train step (render + unit-norm/hinge masked means + Adam
        update): padded-with-mask == unpadded, supervision RNG excluded."""
        cfg = dataclasses.replace(
            tiny_config(n_samples=N_COARSE, n_importance=6, perturb=False),
            border_supervision=False, center_supervision=False)
        ds, batch = make_batch()
        near, far = ds.get_bounds()
        kwargs = dict(window_weights=jnp.asarray(cfg.cos_sim_weights),
                      near=jnp.float32(near), far=jnp.float32(far),
                      centroid=jnp.zeros(3))
        key, epoch = jax.random.PRNGKey(1), jnp.asarray(0, jnp.int32)
        n_active = 11

        state_a, step_a, sums_a = self._step_setup(cfg, n_fine=n_active)
        new_a, m_a = step_a(state_a, sums_a, batch, key, epoch, **kwargs)

        state_b, step_b, sums_b = self._step_setup(cfg, n_fine=N_FINE_MAX)
        new_b, m_b = step_b(state_b, sums_b, batch, key, epoch,
                            n_fine_active=jnp.asarray(n_active, jnp.int32),
                            **kwargs)

        for k in m_a:
            np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                       rtol=2e-5, err_msg=k)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b),
                                                    atol=2e-6),
            new_a.params, new_b.params)

    def test_one_compile_serves_all_growth_stages(self):
        """The padded step retraces ZERO times across live fine counts —
        the whole point of the mode (15 growth stages, ~minutes of
        server-side compile each through the axon relay)."""
        cfg = dataclasses.replace(
            tiny_config(n_samples=N_COARSE, n_importance=6, perturb=False),
            border_supervision=False, center_supervision=False)
        ds, batch = make_batch()
        near, far = ds.get_bounds()
        kwargs = dict(window_weights=jnp.asarray(cfg.cos_sim_weights),
                      near=jnp.float32(near), far=jnp.float32(far),
                      centroid=jnp.zeros(3))
        key, epoch = jax.random.PRNGKey(1), jnp.asarray(0, jnp.int32)

        state, step, sums = self._step_setup(cfg, n_fine=N_FINE_MAX)
        for n_active in (6, 11, 16):
            state, sums = step(state, sums, batch, key, epoch,
                               n_fine_active=jnp.asarray(n_active,
                                                         jnp.int32),
                               **kwargs)
        assert step._cache_size() == 1
        assert np.isfinite(float(sums["loss"]))


class TestRunnerStaticFine:
    def test_runner_single_compile_across_growth(self, tmp_path):
        """End-to-end: static_fine_growth in the conf's [device] block →
        one cached step across epochs that cross growth boundaries."""
        from test_e2e import TINY_CONF
        from vf_nerf_tpu.config.parser import parse_config
        from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
        from vf_nerf_tpu.train.runner import VectorFieldNerfRunner

        root = str(tmp_path)
        ds = SyntheticBoxDataset(n_images=3, image_size=(12, 16),
                                 pixels_per_batch=96)
        ds.export_replica_format(root, scene="boxroom")
        conf_path = os.path.join(root, "tiny.conf")
        exps = os.path.join(root, "exps_vf_nerf")
        conf = TINY_CONF.replace("EXPS_PLACEHOLDER", exps)
        conf = conf.replace("increase_every = 50", "increase_every = 1")
        conf += "\ndevice { static_fine_growth = True }\n"
        with open(conf_path, "w") as f:
            f.write(conf)
        cfg = parse_config(scene="boxroom", config_path=conf_path,
                           expname="synth", timestamp="sf_test",
                           data_root_dir=root, offline=True)
        runner = VectorFieldNerfRunner(cfg)
        assert runner._static_fine()
        fine_before = runner.model.fine_n_samples
        runner.train()
        # Growth actually crossed stages (increase_every=1, 3 epochs)...
        assert runner.model.fine_n_samples > fine_before + 5
        # ...through ONE cached span step (one statics config). Dispatch
        # chunks of different K may add traces; growth stages must not.
        assert len(runner._step_cache) == 1
        span_step = next(iter(runner._step_cache.values()))
        assert span_step._cache_size() <= 2  # full chunk + tail chunk
