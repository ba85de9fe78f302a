"""Experiment runner: ``VectorFieldNerfRunner``.

Reference: ``train/vector_field_nerf_train.py:23-292``. Same public contract:

- output layout ``<exps_folder>/<expname>/<timestamp>/{checkpoints/vf_nerf,
  vf_nerf.conf}`` with a conf snapshot (``:79-113``),
- resume from ``--timestamp --checkpoint latest`` restoring model + optimizer
  + schedule, re-deriving the fine-sample count from the epoch
  (``:115-134``),
- per-epoch: ``sample_new_images()``, fine count +5 every ``increase_every``
  epochs capped at ``max_samples`` (``:146-147``), loss averaging, logging of
  all loss terms + learned density β/mean/scale + lr + window weights
  (``:263-291``),
- the eval-mode quirk: the whole model runs with frozen BatchNorm when the
  directional-derivative loss weight is 0 — the default (``:140-141``),
- LR decay steps = ``num_epochs * len(dataset)`` (``:39``) so the exponential
  schedule completes exactly at the end of training.

TPU-shaped: one jitted train step per (fine-count) static config; ray batches
stream host→device each step; multi-device runs shard the ray axis over the
data mesh (the batch is trimmed to a device-count multiple).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from vf_nerf_tpu.config.schema import VFRunnerConfig, asdict_config
from vf_nerf_tpu.datasets import dataset_dict
from vf_nerf_tpu.models.nerf import VectorFieldNerf
from vf_nerf_tpu.parallel import mesh as mesh_lib
from vf_nerf_tpu.parallel.train_step import (SupervisionStatics,
                                             make_train_step)
from vf_nerf_tpu.utils import io as io_utils
from vf_nerf_tpu.utils.logging import MetricsLogger
from vf_nerf_tpu.utils.profiling import StepTimer, maybe_enable_nan_debugging

SEED = 42  # reference utils/utils.py:157-167


class VectorFieldNerfRunner:
    def __init__(self, config: VFRunnerConfig) -> None:
        self.config = config
        np.random.seed(SEED)
        mesh_lib.apply_platform(
            config.vf_nerf_config.device_config.platform)

        # Multi-host (single-program SPMD): auto-detect a cluster FIRST —
        # jax.distributed.initialize must run before anything touches the
        # XLA backend. A real cluster makes the mesh span every host's chips
        # and each host feed its local ray slice (parallel/multihost.py); the
        # no-cluster fallback is logged, never silent.
        from vf_nerf_tpu.parallel import multihost
        self.multihost = multihost.initialize_multihost()

        # Dataset (loads everything to host RAM, reference :36).
        self.dataset = dataset_dict[config.dataset_config.dataset_name](
            config.dataset_config)

        decay_steps = config.num_epochs * len(self.dataset)
        config.vf_nerf_config.scheduler_config.lr_decay_steps = decay_steps

        # Model.
        self.model = VectorFieldNerf(config.vf_nerf_config, seed=SEED,
                                     decay_steps=decay_steps)
        near, far = self.dataset.get_bounds()
        self.model.near, self.model.far = near, far

        # VF init (reference :47-48; .pth import or regenerated init).
        self.init_method, init_path = self.dataset.get_vf_init_method()
        self._load_vf_init(init_path)

        # Device mesh for data-parallel ray sharding.
        if self.multihost:
            from vf_nerf_tpu.parallel import multihost
            self.mesh = multihost.global_mesh()
            self.n_devices = len(jax.devices())
        else:
            n_dev = config.vf_nerf_config.device_config.num_devices
            avail = len(jax.devices())
            self.n_devices = min(n_dev, avail) if n_dev > 0 else avail
            self.mesh = mesh_lib.make_mesh(self.n_devices) \
                if self.n_devices > 1 else None

        self.create_output_folders()
        self.load_model()

        # Train-mode quirk (reference :140-141): BN frozen unless the
        # directional-derivative loss is active.
        self.train_dir_derivatives = \
            config.vf_loss_weights.directional_derivatives != 0.0
        if self.train_dir_derivatives:
            self.model.train()
        else:
            self.model.eval()

        self.logger = MetricsLogger(
            run_dir=self.run_dir,
            project=config.wandb_project,
            run_name=config.expname,
            run_id=config.timestamp,
            config=asdict_config(config),
            offline=config.offline)

        self._step_cache: Dict[Any, Any] = {}
        self._epoch_rng = np.random.RandomState(SEED)
        self._timer = StepTimer()
        maybe_enable_nan_debugging()

    # ------------------------------------------------------------- folders
    def create_output_folders(self) -> None:
        """Reference ``create_output_folders`` (``:79-113``)."""
        cfg = self.config
        if cfg.timestamp == "":
            cfg.timestamp = io_utils.get_timestamp()
        self.run_dir = os.path.join(cfg.exps_folder, cfg.expname,
                                    cfg.timestamp)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints", "vf_nerf")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        conf_copy = os.path.join(self.run_dir, "vf_nerf.conf")
        if not os.path.exists(conf_copy) and os.path.exists(cfg.config_path):
            shutil.copy2(cfg.config_path, conf_copy)

    # -------------------------------------------------------------- resume
    def load_model(self) -> None:
        """Reference ``load_model`` (``:115-134``)."""
        cfg = self.config
        if cfg.checkpoint == "":
            return
        path = os.path.join(self.ckpt_dir, f"{cfg.checkpoint}.ckpt")
        if not os.path.exists(path):
            raise FileExistsError(f"Checkpoint path: {path} does not exist.")
        cfg.start_epoch = self.model.load(path) + 1
        rs = cfg.vf_nerf_config.ray_sampler_config
        if rs.fine_sampling():
            self.model.fine_n_samples = min(
                self.model.fine_n_samples +
                5 * (cfg.start_epoch // rs.increase_every),
                rs.max_samples)
        print(f"Loaded model from {cfg.checkpoint}")

    def _load_vf_init(self, init_path: str) -> None:
        """VF-init weights: regenerated ``.pkl`` (``train/vf_init.py``)
        preferred; reference ``.pth`` import supported; random init with a
        warning otherwise (the reference's shipped inits are LFS stubs,
        SURVEY.md §3.5)."""
        pkl_path = os.path.splitext(init_path)[0] + ".pkl" if init_path \
            else ""
        if pkl_path and os.path.exists(pkl_path):
            self.model.load_vf_init(pkl_path)
        elif init_path and os.path.exists(init_path) and \
                os.path.getsize(init_path) > 1024:  # skip LFS pointer stubs
            try:
                from vf_nerf_tpu.utils.torch_import import (
                    load_torch_checkpoint, mlp_state_from_torch)
                blob = load_torch_checkpoint(init_path)
                vf_cfg = self.config.vf_nerf_config.vf_net_config
                params, stats = mlp_state_from_torch(
                    blob if isinstance(blob, dict) and
                    "layers.0.0.weight" in blob else blob,
                    n_layers=len(vf_cfg.dimensions) + 1,
                    batch_norm=vf_cfg.batch_norm,
                    weight_norm=vf_cfg.weight_norm)
                state = self.model.state
                new_params = dict(state.params)
                new_params["vf"] = jax.tree_util.tree_map(jnp.asarray, params)
                new_stats = dict(state.batch_stats)
                new_stats["vf"] = jax.tree_util.tree_map(jnp.asarray, stats)
                self.model.state = state.replace(
                    params=new_params, batch_stats=new_stats,
                    opt_state=self.model.optimizer.init(new_params))
            except Exception as exc:  # noqa: BLE001 — diagnostics only
                print(f"WARNING: could not import VF init {init_path}: "
                      f"{exc}; run train/vf_init.py to regenerate.")
        else:
            print(f"WARNING: VF init weights not found at {init_path!r} "
                  "(the reference ships LFS stubs); starting from random "
                  "init. Run `python -m vf_nerf_tpu.train.vf_init` to "
                  "pretrain them.")

    # ---------------------------------------------------------------- step
    def _get_step(self):
        """Jitted train step cached per static (fine-count, supervision)
        configuration."""
        statics = self.model.render_statics(
            compute_dir_derivatives=self.train_dir_derivatives)
        n_rays = self._batch_rays()
        sup = SupervisionStatics.from_config(
            self.config.vf_nerf_config, self.init_method, n_rays=n_rays,
            n_samples=statics.n_coarse + statics.n_fine,
            border_radius=self.config.dataset_config.border_radius)
        key = (statics, sup)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.model.modules, self.model.optimizer, statics, sup,
                self.config.vf_loss_weights, self.config.vf_loss_config)
        return self._step_cache[key]

    def _get_scan_step(self):
        """Jitted K-steps-per-dispatch scan step (same cache policy)."""
        from vf_nerf_tpu.parallel.train_step import make_scan_train_step
        statics = self.model.render_statics(
            compute_dir_derivatives=self.train_dir_derivatives)
        n_rays = self._batch_rays()
        sup = SupervisionStatics.from_config(
            self.config.vf_nerf_config, self.init_method, n_rays=n_rays,
            n_samples=statics.n_coarse + statics.n_fine,
            border_radius=self.config.dataset_config.border_radius)
        key = (statics, sup, "scan")
        if key not in self._step_cache:
            self._step_cache[key] = make_scan_train_step(
                self.model.modules, self.model.optimizer, statics, sup,
                self.config.vf_loss_weights, self.config.vf_loss_config)
        return self._step_cache[key]

    def _batch_rays(self) -> int:
        n = self.dataset.total_pixels
        if self.mesh is not None:
            n = (n // self.n_devices) * self.n_devices
        return n

    def _feed(self, batch: Dict[str, np.ndarray]):
        """One packed (R, 38) transfer per step (six small transfers each
        paid the remote-TPU round-trip latency)."""
        from vf_nerf_tpu.parallel.train_step import pack_batch
        n = self._batch_rays()
        trimmed = {k: v[:n] for k, v in batch.items() if v.size > 0}
        packed = pack_batch(trimmed)
        if self.multihost:
            # Every host assembled the same global batch (shared-seed RNG);
            # feed only THIS host's slice so the global array holds each ray
            # exactly once (n_rays statics stay sized by the global count).
            from vf_nerf_tpu.parallel import multihost
            packed = packed[multihost.local_ray_slice(n)]
            return multihost.feed_global_batch(
                self.mesh, {"packed": packed})["packed"]
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, packed)
        return jnp.asarray(packed)

    def _feed_stack(self, stacked: np.ndarray):
        """One (K, R, 38) transfer feeding K steps; rays sharded on axis 1."""
        if self.multihost:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vf_nerf_tpu.parallel import multihost
            from vf_nerf_tpu.parallel.mesh import DATA_AXIS
            # Same dedup as _feed: this host's slice of the shared global
            # batch, so the (K, R, 38) global array holds each ray once.
            local = stacked[:, multihost.local_ray_slice(stacked.shape[1])]
            sharding = NamedSharding(self.mesh, P(None, DATA_AXIS))
            return jax.make_array_from_process_local_data(sharding, local)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from vf_nerf_tpu.parallel.mesh import DATA_AXIS
            return jax.device_put(
                stacked, NamedSharding(self.mesh, P(None, DATA_AXIS)))
        return jnp.asarray(stacked)

    # --------------------------------------------------------------- train
    def train(self) -> None:
        """Reference ``train`` (``:136-159``)."""
        cfg = self.config
        rs = cfg.vf_nerf_config.ray_sampler_config
        if self.mesh is not None:
            self.model.state = mesh_lib.replicate_state(self.mesh,
                                                        self.model.state)
        try:
            for epoch in range(cfg.start_epoch, cfg.num_epochs):
                self.dataset.sample_new_images()
                if rs.fine_sampling() and epoch % rs.increase_every == 0:
                    self.model.fine_n_samples = min(
                        self.model.fine_n_samples + 5, rs.max_samples)
                logged = self.train_epoch(epoch)
                if epoch % cfg.save_frequency == 0:
                    self.model.save(epoch, self.ckpt_dir)
                if logged is not None:
                    print(f"Epoch {logged[0]}: Loss {logged[1]}")
        finally:
            # Flush the one-epoch-deferred log even on crash/interrupt so
            # the last completed epoch's metrics survive for post-mortem.
            final = self._resolve_pending_log()
            if final is not None:
                print(f"Epoch {final[0]}: Loss {final[1]}")
        cfg.start_epoch = cfg.num_epochs + 1
        self.model.save(cfg.num_epochs - 1, self.ckpt_dir)

    def train_epoch(self, epoch: int):
        """Reference ``train_epoch`` (``:161-292``) — one mixed-view ray
        batch per dataset item, loss averaging, end-of-epoch logging
        (deferred one epoch; returns the RESOLVED (epoch, loss) or None)."""
        window = self.model.update_annealing(epoch)
        centroid = jnp.asarray(self.dataset.get_centroid())
        near = jnp.float32(self.model.near)
        far = jnp.float32(self.model.far)
        window_j = jnp.asarray(window)
        epoch_j = jnp.asarray(epoch, jnp.int32)

        # Per-step host work is one dispatch + the batch feed: the PRNG key
        # derives on device from (base_key, state.step) and the metric sums
        # accumulate in a donated on-device tree, fetched once per epoch
        # (per-step scalar fetches serialize on the host↔device round-trip
        # and dominate step time on remote-attached TPUs).
        from vf_nerf_tpu.parallel.train_step import zero_metric_sums
        base_key = self.model._next_key()
        sums = zero_metric_sums()
        if self.mesh is not None:
            sums = mesh_lib.replicate_state(self.mesh, sums)
        count = 0
        epoch_t0 = time.perf_counter()
        spd = self.config.vf_nerf_config.device_config.steps_per_dispatch
        if spd != 1:
            # K steps per dispatch: pack the epoch's batches into one
            # (K, R, 38) tensor and lax.scan the step on device — the
            # per-dispatch relay latency amortizes to 1/K (bit-identical
            # to per-step dispatch, tests/test_train_step.py).
            from vf_nerf_tpu.parallel.train_step import pack_batch
            scan_step = self._get_scan_step()
            n = self._batch_rays()
            packs = [pack_batch({k: v[:n] for k, v in b.items()
                                 if v.size > 0})
                     for b in self.dataset.epoch_batches(self._epoch_rng)]
            chunk = len(packs) if spd <= 0 else spd
            self._timer.tick()
            for start in range(0, len(packs), chunk):
                block = packs[start:start + chunk]
                fed = self._feed_stack(np.stack(block))
                state, sums = scan_step(self.model.state, sums, fed,
                                        base_key, epoch_j,
                                        window_weights=window_j, near=near,
                                        far=far, centroid=centroid)
                self.model.state = state
                count += len(block)
                self._timer.tick()
            dispatch_t1 = time.perf_counter()
        else:
            # Per-step dispatch: batch assembly + packing + host→device
            # transfer run one step ahead in a worker thread.
            from vf_nerf_tpu.utils.prefetch import Prefetcher
            step = self._get_step()
            for fed in Prefetcher(self.dataset.epoch_batches(self._epoch_rng),
                                  self._feed, depth=2):
                self._timer.tick()
                state, sums = step(self.model.state, sums, fed, base_key,
                                   epoch_j, window_weights=window_j,
                                   near=near, far=far, centroid=centroid)
                self.model.state = state
                count += 1
            self._timer.tick()

        # Everything the epoch log needs comes back in ONE host fetch (each
        # device_get through the relay costs a full round-trip) — and that
        # fetch is DEFERRED by one epoch: epoch e's device arrays are
        # stashed and resolved after epoch e+1's work has been dispatched,
        # so the transfer overlaps the next epoch's on-device compute
        # instead of serializing with it. Values logged are identical, just
        # emitted one epoch later.
        pending = {
            "epoch": epoch, "count": count, "window": window,
            "t0": epoch_t0,
            # End of THIS epoch's dispatch loop: the throughput denominator
            # stops here instead of at the deferred resolution (which would
            # fold the next epoch's host-side packing into epoch e's rate).
            "t1": dispatch_t1 if spd != 1 else None,
            # state.step is copied: the state buffers get DONATED by the
            # next epoch's first dispatch, which would delete the stashed
            # reference before the deferred fetch. sums and the derived
            # density scalars are fresh buffers — safe to hold.
            "arrays": (sums, self.model.density_scalar_arrays(),
                       jnp.copy(self.model.state.step)),
            "per_step_timer": spd == 1,
        }
        logged = self._resolve_pending_log()
        self._pending_log = pending
        return logged

    def _resolve_pending_log(self):
        """Fetch + log a previously stashed epoch (see ``train_epoch``).
        Returns (epoch, loss) of the resolved epoch, or None."""
        pending = getattr(self, "_pending_log", None)
        if pending is None:
            return None
        self._pending_log = None
        host_sums, dens, step_now = jax.device_get(pending["arrays"])
        count = pending["count"]
        averages = {k: float(v) / count for k, v in host_sums.items()}
        averages.update({k: float(v) for k, v in dens.items()})
        averages["learning_rate"] = float(
            self.model.lr_schedule(int(step_now)))
        averages.update({f"w_{i}": float(w)
                         for i, w in enumerate(pending["window"])})
        if pending["per_step_timer"]:
            averages["rays_per_sec"] = self._timer.rays_per_sec(
                self._batch_rays())
        else:
            # Wall-clock of the epoch's own dispatch loop (t0 → end of its
            # last dispatch). Dispatches are async but each scan step blocks
            # on the previous step's donated state, so t1 trails the device
            # by at most one in-flight dispatch — far closer to the device
            # rate than timing to the deferred resolution, which included
            # the NEXT epoch's eager host-side packing (advisor r2).
            elapsed = pending["t1"] - pending["t0"]
            averages["rays_per_sec"] = count * self._batch_rays() / elapsed
        self.logger.log(averages, step=pending["epoch"])
        return pending["epoch"], averages.get("loss", float("nan"))
