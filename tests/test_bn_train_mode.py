"""Train-mode BatchNorm: running stats update through the train step
(the reference path when the directional-derivative weight ≠ 0,
``train/vector_field_nerf_train.py:140-141`` inverse case)."""

import numpy as np

import jax
import jax.numpy as jnp

from test_renderer import make_batch, tiny_config
from test_train_step import LOSS_CONFIG, LOSS_WEIGHTS
from vf_nerf_tpu.models.nerf import TrainState, make_optimizer
from vf_nerf_tpu.models.renderer import RenderStatics, VFNerfModules
from vf_nerf_tpu.parallel.train_step import (SupervisionStatics,
                                             make_train_step,
                                             zero_metric_sums)


def test_bn_running_stats_update_in_train_mode():
    cfg = tiny_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(cfg.scheduler_config, decay_steps=100)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    ds, batch = make_batch(32)
    statics = RenderStatics.from_config(cfg, n_fine=6, train=True)
    sup = SupervisionStatics.from_config(
        cfg, "exterior_synthetic", n_rays=32,
        n_samples=statics.n_coarse + statics.n_fine, border_radius=0.15)
    step = make_train_step(modules, optimizer, statics, sup, LOSS_WEIGHTS,
                           LOSS_CONFIG)
    near, far = ds.get_bounds()

    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, sums = step(state, zero_metric_sums(), batch,
                       jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
                       window_weights=jnp.asarray(cfg.cos_sim_weights),
                       near=jnp.float32(near), far=jnp.float32(far),
                       centroid=jnp.zeros(3))
    after = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    # The fine-pass forwards update both nets' running stats.
    moved = []
    for net in ("vf", "render"):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(a - b))),
            before[net], after[net])
        moved.append(max(jax.tree_util.tree_leaves(diffs), default=0.0))
    assert all(m > 0 for m in moved), f"BN stats did not move: {moved}"
    assert np.isfinite(float(sums["loss"]))


def test_eval_mode_keeps_stats_frozen():
    cfg = tiny_config()
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(cfg.scheduler_config, decay_steps=100)
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=optimizer.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    ds, batch = make_batch(32)
    statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
    sup = SupervisionStatics.from_config(
        cfg, "exterior_synthetic", n_rays=32,
        n_samples=statics.n_coarse + statics.n_fine, border_radius=0.15)
    step = make_train_step(modules, optimizer, statics, sup, LOSS_WEIGHTS,
                           LOSS_CONFIG)
    near, far = ds.get_bounds()
    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    state, _ = step(state, zero_metric_sums(), batch, jax.random.PRNGKey(0),
                    jnp.asarray(0, jnp.int32),
                    window_weights=jnp.asarray(cfg.cos_sim_weights),
                    near=jnp.float32(near), far=jnp.float32(far),
                    centroid=jnp.zeros(3))
    after = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), before, after)
    assert max(jax.tree_util.tree_leaves(diffs), default=0.0) == 0.0
