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

import json
import math
import os
import shutil
import time
from typing import Any, Dict, Optional

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

# Reference pins seed 42 (utils/utils.py:157-167). VFNERF_SEED is a
# measurement hook for run-to-run variance studies (tools/
# convergence_variance.py) — production runs never set it.
SEED = int(os.environ.get("VFNERF_SEED", "42"))


class _EpochAssembler:
    """One-epoch-ahead host batch assembly for scan dispatch (closes the
    short-epoch throughput gap): ``sample_new_images`` + batch assembly +
    packing + chunk stacking run in a worker thread, overlapping the
    previous epoch's in-flight device scan instead of serializing with it.

    Determinism: the worker is the ONLY consumer of the dataset and of
    ``_epoch_rng`` in scan mode, and processes epochs strictly in order —
    the RNG draw sequence is identical to the inline path. The queue is
    depth-1, so at most one epoch of packed batches (a few MB) is staged
    ahead."""

    def __init__(self, runner: "VectorFieldNerfRunner", epochs,
                 depth: int = 1, compact: bool = False) -> None:
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._runner = runner
        self._epochs = list(epochs)
        self._compact = compact
        self._exc: BaseException | None = None
        threading.Thread(target=self._work, daemon=True).start()

    def _work(self) -> None:
        from vf_nerf_tpu.parallel.train_step import (pack_batch,
                                                     pack_batch_compact)
        pack = pack_batch_compact if self._compact else pack_batch
        try:
            r = self._runner
            n = r._batch_rays()
            for epoch in self._epochs:
                r.dataset.sample_new_images()
                packs = [pack({k: v[:n] for k, v in b.items()
                               if v.size > 0})
                         for b in r.dataset.epoch_batches(r._epoch_rng)]
                self._q.put((epoch, np.stack(packs)))
        except BaseException as exc:  # noqa: BLE001 — re-raised in get()
            self._exc = exc
            self._q.put((None, None))

    def get(self, epoch: int) -> np.ndarray:
        """The epoch's whole (K_e, R, 38) packed stack (callers chunk it)."""
        got, stacked = self._q.get()
        if got is None:
            raise self._exc
        assert got == epoch, (got, epoch)
        return stacked


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
        self.final_loss: Optional[float] = None
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
    def _static_fine(self) -> bool:
        """Static fine-growth mode: ONE compiled program (fine axis padded
        to max_samples, tail masked) serves every +5 growth stage instead of
        one re-jit per stage (device_config.static_fine_growth)."""
        rs = self.config.vf_nerf_config.ray_sampler_config
        # Needs frozen-BN (eval-mode) steps — the production default; the
        # dir-derivatives config trains BN on batch stats, where pad points
        # would pollute the statistics.
        return (self.config.vf_nerf_config.device_config.static_fine_growth
                and rs.fine_sampling() and not self.train_dir_derivatives)

    def _step_statics(self):
        """(RenderStatics, SupervisionStatics) for the current fine count —
        or for the padded max count in static fine-growth mode."""
        n_fine = self.config.vf_nerf_config.ray_sampler_config.max_samples \
            if self._static_fine() else None
        statics = self.model.render_statics(
            compute_dir_derivatives=self.train_dir_derivatives,
            n_fine=n_fine)
        n_rays = self._batch_rays()
        sup = SupervisionStatics.from_config(
            self.config.vf_nerf_config, self.init_method, n_rays=n_rays,
            n_samples=statics.n_coarse + statics.n_fine,
            border_radius=self.config.dataset_config.border_radius)
        return statics, sup

    def _fine_active_arg(self) -> dict:
        """Extra step kwargs: the traced live fine count in static mode."""
        if not self._static_fine():
            return {}
        return {"n_fine_active": jnp.asarray(self.model.fine_n_samples,
                                             jnp.int32)}

    def _get_step(self):
        """Jitted train step cached per static (fine-count, supervision)
        configuration."""
        statics, sup = self._step_statics()
        key = (statics, sup)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.model.modules, self.model.optimizer, statics, sup,
                self.config.vf_loss_weights, self.config.vf_loss_config,
                remat=self._remat())
        return self._step_cache[key]

    def _get_scan_step(self):
        """Jitted K-steps-per-dispatch scan step (same cache policy)."""
        from vf_nerf_tpu.parallel.train_step import make_scan_train_step
        statics, sup = self._step_statics()
        key = (statics, sup, "scan")
        if key not in self._step_cache:
            self._step_cache[key] = make_scan_train_step(
                self.model.modules, self.model.optimizer, statics, sup,
                self.config.vf_loss_weights, self.config.vf_loss_config,
                remat=self._remat())
        return self._step_cache[key]

    def _remat(self) -> str:
        """train_remat device knob ("none" default; see DeviceConfig)."""
        return getattr(self.config.vf_nerf_config.device_config,
                       "train_remat", "none")

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
        if self.mesh is not None:
            self.model.state = mesh_lib.replicate_state(self.mesh,
                                                        self.model.state)
        spd = cfg.vf_nerf_config.device_config.steps_per_dispatch
        if spd != 1:
            self._train_span(spd)
        else:
            self._train_per_step()
        cfg.start_epoch = cfg.num_epochs + 1
        self.model.save(cfg.num_epochs - 1, self.ckpt_dir)
        self._write_convergence_flag()

    def _write_convergence_flag(self) -> None:
        """Non-convergence gate (VERDICT r3 #6, automating the PARITY.md
        protocol): compare the final train loss against the configured
        threshold (typically 1.2× a cohort median; 0 disables) and record
        the verdict in ``<run_dir>/convergence.json`` — always written, so
        every run artifact carries it. On a flag, also warn in the log and
        recommend re-seeding (the r3 variance study showed a bad seed is
        train-loss-detectable: 0.00615 vs cohort 0.00478)."""
        thr = getattr(self.config, "convergence_loss_threshold", 0.0)
        # NaN-aware: a diverged run (final loss NaN) is the worst
        # non-convergence — `NaN > thr` is False, so test the negation.
        # Serialize NaN as None: the `NaN` token json.dump would emit is
        # invalid strict JSON for non-Python consumers.
        diverged = (self.final_loss is not None
                    and not math.isfinite(self.final_loss))
        flagged = bool(diverged or
                       (thr and self.final_loss is not None
                        and not self.final_loss <= thr))
        payload = {"final_loss": (self.final_loss
                                  if self.final_loss is None or
                                  math.isfinite(self.final_loss)
                                  else None),
                   "diverged": diverged,
                   "threshold": thr if thr else None,
                   "flagged": flagged}
        if flagged:
            payload["recommendation"] = (
                ("final train loss is non-finite — the run diverged"
                 if diverged else
                 "final train loss exceeds the convergence threshold") +
                " — likely a bad seed (PARITY.md variance study); re-run "
                "with a different VFNERF_SEED")
            print(f"WARNING: non-convergence gate: final loss "
                  f"{self.final_loss:.6g}"
                  + (f" > threshold {thr:.6g}" if not diverged else
                     " (non-finite)") +
                  "; recommend re-seeding (VFNERF_SEED)", flush=True)
        with open(os.path.join(self.run_dir, "convergence.json"), "w") as f:
            json.dump(payload, f, indent=1)

    def _train_per_step(self) -> None:
        """One dispatch per step (steps_per_dispatch=1) with the prefetch
        worker — the r1 architecture, kept as the non-scan reference
        path."""
        cfg = self.config
        rs = cfg.vf_nerf_config.ray_sampler_config
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

    # --------------------------------------------------- span dispatching
    def _use_compact(self) -> bool:
        """Compact (R, 7) ray packing + device pose table (5.4× less relay
        traffic): mixed-view batches only (they carry ``view_idx``; pose/
        intrinsics are per-view constants), not ``far_per_ray`` (the
        per-ray far column is not packed), and not ``random_img_sampling``
        (that mode re-assigns ``dataset.poses`` to a fresh subset every
        epoch, so a once-fed device pose table would go stale while
        ``view_idx`` keeps indexing the current epoch's subset — those
        configs take the full (R, 38) packing, which carries poses
        per ray)."""
        return (self.config.dataset_config.shuffle_views and
                not self.config.dataset_config.far_per_ray and
                not self.config.dataset_config.random_img_sampling)

    def _get_span_step(self):
        """Jitted epoch-spanning scan step for the CURRENT statics."""
        from vf_nerf_tpu.parallel.train_step import make_span_scan_step
        statics, sup = self._step_statics()
        key = (statics, sup, "span", self._use_compact())
        if key not in self._step_cache:
            self._step_cache[key] = make_span_scan_step(
                self.model.modules, self.model.optimizer, statics, sup,
                self.config.vf_loss_weights, self.config.vf_loss_config,
                masked_fine=self._static_fine(),
                compact=self._use_compact(),
                remat=self._remat())
        return self._step_cache[key]

    def _train_span(self, spd: int) -> None:
        """Scan-dispatch training with **epoch-spanning** dispatches.

        The single-epoch scan path pays one host↔relay round-trip
        (~60-100 ms) per epoch — ~30% of an 8-step epoch (measured 38.6k
        vs ~55k rays/s pure-compute). Here the per-step
        (epoch, window, fine-count, base-key) metadata ride the scan, so a
        dispatch covers exactly ``spd`` steps regardless of epoch
        boundaries; dispatch boundaries are forced only where semantics
        require the host (a checkpoint save, or — without
        ``static_fine_growth`` — a fine-count re-jit). Per-step metrics
        come back stacked; epochs are logged (identical values) once all
        their rows are fetched, one dispatch deferred, as before.

        Bit-equality with the per-epoch paths is preserved: one
        ``_next_key()`` per epoch in the same order, per-step PRNG folds
        ``state.step``, same optimizer sequence
        (``tests/test_e2e.py::test_span_dispatch_equals_per_step``)."""
        cfg = self.config
        rs = cfg.vf_nerf_config.ray_sampler_config
        steps_per_epoch = max(len(self.dataset), 1)
        chunk = spd if spd > 0 else steps_per_epoch
        compact = self._use_compact()
        assembler = _EpochAssembler(
            self, range(cfg.start_epoch, cfg.num_epochs), depth=2,
            compact=compact)
        near = jnp.float32(self.model.near)
        far = jnp.float32(self.model.far)
        centroid = jnp.asarray(self.dataset.get_centroid())
        # Per-view tables ride to the device ONCE; each dispatch gathers
        # per-ray poses on device from the (R, 7) compact batch.
        pose_table = intr_table = None
        if compact:
            pose_table = jnp.asarray(np.asarray(self.dataset.poses,
                                                np.float32))
            intr_table = jnp.asarray(np.asarray(self.dataset.intrinsics,
                                                np.float32))
            if self.mesh is not None:
                pose_table = mesh_lib.replicate_state(self.mesh, pose_table)
                intr_table = mesh_lib.replicate_state(self.mesh, intr_table)
        n_rays = self._batch_rays()
        host_step = int(jax.device_get(self.model.state.step))

        # Per-epoch base keys, precomputed as HOST arrays: the packed aux
        # transfer needs key bytes on host, and fetching the device-resident
        # _next_key() per epoch would cost a relay round-trip each. The
        # split chain runs on the CPU backend (threefry is backend-
        # deterministic — identical values to _next_key()), and the model's
        # RNG carrier advances past the consumed keys so any later
        # _next_key() continues the same chain.
        cpu = jax.devices("cpu")[0]
        rng = jax.device_put(jax.device_get(self.model._rng), cpu)
        epoch_keys: Dict[int, np.ndarray] = {}
        for e in range(cfg.start_epoch, cfg.num_epochs):
            rng, k = jax.random.split(rng)
            epoch_keys[e] = np.asarray(k)
        self.model._rng = jnp.asarray(np.asarray(rng))

        # Per-epoch accumulation of fetched metric rows (an epoch may span
        # dispatches and a dispatch may span epochs).
        self._span_accum: Dict[int, Dict[str, Any]] = {}
        self._span_pending = []   # dispatched, not yet fetched
        self._span_last_fetch_t = None

        buf: list = []            # step records awaiting dispatch

        profile = os.environ.get("VFNERF_SPAN_PROFILE") == "1"
        prof = {"assembler": 0.0, "prep": 0.0, "enqueue": 0.0,
                "fetch": 0.0} if profile else None

        def record_epoch(epoch: int) -> None:
            """Host-side per-epoch sequencing (same order as the per-epoch
            loop): fine growth, annealing window, one base key."""
            if rs.fine_sampling() and epoch % rs.increase_every == 0:
                self.model.fine_n_samples = min(
                    self.model.fine_n_samples + 5, rs.max_samples)
            window = self.model.update_annealing(epoch)
            if profile:
                ta = time.perf_counter()
            stacked = assembler.get(epoch)
            if profile:
                prof["assembler"] += time.perf_counter() - ta
            base_key = epoch_keys[epoch]
            self._span_accum[epoch] = {
                "window": window, "rows": [], "elapsed": 0.0,
                "expected": stacked.shape[0]}
            for s in range(stacked.shape[0]):
                buf.append((stacked[s], epoch, window,
                            self.model.fine_n_samples, base_key))

        def dispatch(n_steps: int) -> None:
            nonlocal host_step
            take, rest = buf[:n_steps], buf[n_steps:]
            buf[:] = rest
            t0 = time.perf_counter()
            from vf_nerf_tpu.parallel.train_step import pack_span_aux
            blocks = np.stack([t[0] for t in take])
            # ONE packed metadata transfer (each separate small array costs
            # a relay round-trip per dispatch).
            aux = pack_span_aux([t[1] for t in take],
                                [t[3] for t in take],
                                np.stack([np.asarray(t[4]) for t in take]),
                                np.stack([np.asarray(t[2], np.float32)
                                          for t in take]))
            span_step = self._get_span_step()
            fed = self._feed_stack(blocks)
            if profile:
                tp = time.perf_counter()
                prof["prep"] += tp - t0
            if compact:
                state, metrics = span_step(self.model.state, fed, aux,
                                           near, far, centroid,
                                           pose_table, intr_table)
            else:
                state, metrics = span_step(self.model.state, fed, aux,
                                           near, far, centroid)
            self.model.state = state
            t1 = time.perf_counter()
            if profile:
                prof["enqueue"] += t1 - tp
            self._span_pending.append({
                "metrics": metrics,
                "epochs": [t[1] for t in take],
                "t0": t0,
                "step_base": host_step,
            })
            host_step += len(take)
            # Fetch the PREVIOUS dispatch (its device work overlapped this
            # dispatch's host prep) — one-deep pipeline, as before.
            if profile:
                tf = time.perf_counter()
            while len(self._span_pending) > 1:
                self._fetch_span_dispatch(self._span_pending.pop(0),
                                          n_rays)
            if profile:
                prof["fetch"] += time.perf_counter() - tf

        try:
            for epoch in range(cfg.start_epoch, cfg.num_epochs):
                # Without static_fine_growth a fine-count bump changes the
                # compiled statics — flush the buffered steps under the OLD
                # statics before recording the new epoch.
                bump = (rs.fine_sampling()
                        and epoch % rs.increase_every == 0
                        and self.model.fine_n_samples < rs.max_samples)
                if bump and not self._static_fine() and buf:
                    dispatch(len(buf))
                record_epoch(epoch)
                is_save = epoch % cfg.save_frequency == 0
                # Drain full chunks; force a flush at save boundaries so
                # the checkpoint captures the exact epoch-end state.
                while len(buf) >= chunk:
                    dispatch(chunk)
                if is_save:
                    if buf:
                        dispatch(len(buf))
                    self.model.save(epoch, self.ckpt_dir)
            if buf:
                dispatch(len(buf))
        finally:
            # Drain every in-flight dispatch so all epochs get logged even
            # on crash/interrupt (per-step path's try/finally analogue).
            while self._span_pending:
                self._fetch_span_dispatch(self._span_pending.pop(0),
                                          n_rays)
            if profile:
                print("span profile (s): " + "  ".join(
                    f"{k}={v:.2f}" for k, v in prof.items()), flush=True)

    def _fetch_span_dispatch(self, pending: Dict[str, Any],
                             n_rays: int) -> None:
        """Fetch one dispatch's stacked per-step metrics and fold them into
        the per-epoch accumulators; log every epoch that completed."""
        from vf_nerf_tpu.parallel.train_step import (METRIC_KEYS,
                                                     SPAN_METRIC_KEYS)
        rows = np.asarray(jax.device_get(pending["metrics"]))
        # Wall time is attributed HERE, at a point of known completion (the
        # device_get above is the hard sync): deltas between consecutive
        # fetches tile wall-clock exactly, so per-epoch rays_per_sec is the
        # true sustained rate including device execution. The enqueue-side
        # t1 - t0 this replaces excluded device time entirely (jitted calls
        # are async even with donated inputs) and overstated throughput by
        # the compute/host ratio.
        now = time.perf_counter()
        prev = self._span_last_fetch_t
        self._span_last_fetch_t = now
        elapsed = now - (prev if prev is not None else pending["t0"])
        share = elapsed / max(len(pending["epochs"]), 1)
        step_end: Dict[int, int] = {}
        for i, e in enumerate(pending["epochs"]):
            acc = self._span_accum[e]
            acc["rows"].append(rows[i])
            acc["elapsed"] += share
            step_end[e] = pending["step_base"] + i + 1
        for e in sorted(set(pending["epochs"])):
            acc = self._span_accum[e]
            if len(acc["rows"]) < acc["expected"]:
                continue
            block = np.stack(acc["rows"])
            avg = {k: float(block[:, i].mean())
                   for i, k in enumerate(METRIC_KEYS)}
            # Density scalars: the epoch's LAST step (per-epoch-path value).
            for j, k in enumerate(SPAN_METRIC_KEYS[len(METRIC_KEYS):]):
                avg[k] = float(block[-1, len(METRIC_KEYS) + j])
            avg["learning_rate"] = self.model.host_lr(step_end[e])
            avg.update({f"w_{i}": float(w)
                        for i, w in enumerate(acc["window"])})
            avg["rays_per_sec"] = (acc["expected"] * n_rays /
                                   max(acc["elapsed"], 1e-9))
            self.logger.log(avg, step=e)
            self.final_loss = avg.get("loss", self.final_loss)
            print(f"Epoch {e}: Loss {avg.get('loss')}")
            del self._span_accum[e]

    def train_epoch(self, epoch: int, assembler=None):
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
            # to per-step dispatch, tests/test_train_step.py). The blocks
            # were assembled one epoch ahead by the worker thread
            # (overlapped with the previous epoch's in-flight scan); the
            # inline fallback covers direct train_epoch() calls.
            scan_step = self._get_scan_step()
            if assembler is not None:
                stacked = assembler.get(epoch)
            else:
                from vf_nerf_tpu.parallel.train_step import pack_batch
                n = self._batch_rays()
                packs = [pack_batch({k: v[:n] for k, v in b.items()
                                     if v.size > 0})
                         for b in self.dataset.epoch_batches(
                             self._epoch_rng)]
                stacked = np.stack(packs)
            chunk = stacked.shape[0] if spd <= 0 else spd
            blocks = [stacked[s:s + chunk]
                      for s in range(0, stacked.shape[0], chunk)]
            self._timer.tick()
            for block in blocks:
                fed = self._feed_stack(block)
                state, sums = scan_step(self.model.state, sums, fed,
                                        base_key, epoch_j,
                                        window_weights=window_j, near=near,
                                        far=far, centroid=centroid,
                                        **self._fine_active_arg())
                self.model.state = state
                count += block.shape[0]
                self._timer.tick()
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
                                   near=near, far=far, centroid=centroid,
                                   **self._fine_active_arg())
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
        averages["learning_rate"] = self.model.host_lr(int(step_now))
        averages.update({f"w_{i}": float(w)
                         for i, w in enumerate(pending["window"])})
        if pending["per_step_timer"]:
            averages["rays_per_sec"] = self._timer.rays_per_sec(
                self._batch_rays())
        else:
            # Wall time between consecutive deferred resolutions: the
            # device_get above is the hard sync on this epoch's device
            # work, and resolutions happen once per epoch in steady state,
            # so the deltas tile wall-clock exactly — the logged rate is
            # the true sustained rate including device execution. (The
            # dispatch-loop t1 - t0 this replaces excluded device time —
            # jitted scan dispatches are async even with donated inputs —
            # and overstated throughput by the compute/host ratio.)
            now = time.perf_counter()
            prev = getattr(self, "_last_resolve_t", None)
            self._last_resolve_t = now
            elapsed = now - (prev if prev is not None else pending["t0"])
            averages["rays_per_sec"] = count * self._batch_rays() / elapsed
        self.logger.log(averages, step=pending["epoch"])
        self.final_loss = averages.get("loss", self.final_loss)
        return pending["epoch"], averages.get("loss", float("nan"))
