"""Joint pose-and-field optimization.

The reference ships the config contract (``config_parser/joint_opt_config.py``)
and the facade support surface — ``get_colors`` / ``get_weights_and_color``
(``models/nerf/vector_field_nerf.py:341-440``), ``get_dominant_bases``
(``utils/utils.py:216-233``), the 7-d quaternion pose path
(``utils/rendering.py:27-33``) and the ``supervised_loss_weights`` block
(``confs/vf_nerf.conf:103-113``) — but **no trainer** (SURVEY.md C24).
This module designs the stage from that contract:

- **pose refinement**: camera poses become optimizable 7-d
  ``[quat | translation]`` parameters (initialized from the dataset via
  ``matrix_to_pose7``); rays are rendered through the quaternion path so
  gradients flow from the photometric/depth losses into the poses,
- **supervised VF epochs**: every ``supervise_every`` joint epochs, the field
  is sharpened toward the scene's dominant directions — surface points come
  from backprojected sensor depth, targets are the field snapped to the
  nearest dominant basis (``±b`` maximizing |v·b|); bases come from the
  field itself at surface points (``self_supervise``) or from an extracted
  mesh via ``get_dominant_bases``; off-surface samples between camera and
  surface are supervised to point at their surface point (weights
  ``surface`` / ``non_surface`` / ``supervision``),
- the ``similarity`` weight drives the point-pair consistency loss
  (``models/loss.py::similarity_loss``, reference ``functions.py:183-225``),
- both phases run as jitted steps over the data mesh (rays / supervision
  points sharded on the leading axis, ``{model, poses}`` state replicated;
  XLA inserts the gradient all-reduce), like the main trainer
  (``parallel/train_step.py``). Supervision targets are snapped against the
  field as it stood at the start of each supervision block (one host→device
  sync per block, not per step — remote-TPU round-trips cost ~60-100 ms).
  Per-batch metrics accumulate in a donated on-device sum tree and are
  fetched once per epoch, logged as epoch averages (C17 semantics).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vf_nerf_tpu.config.joint_schema import JointOptimizationConfig
from vf_nerf_tpu.config.schema import VFSupervisedLossWeights
from vf_nerf_tpu.datasets import dataset_dict
from vf_nerf_tpu.models.loss import similarity_loss
from vf_nerf_tpu.models.nerf import VectorFieldNerf
from vf_nerf_tpu.models.renderer import render_rays
from vf_nerf_tpu.ops.rays import matrix_to_pose7, normalize
from vf_nerf_tpu.parallel import mesh as mesh_lib
from vf_nerf_tpu.utils import checkpoint as ckpt_io
from vf_nerf_tpu.utils import io as io_utils
from vf_nerf_tpu.utils.logging import MetricsLogger


def snap_to_bases(vectors: jnp.ndarray, bases: jnp.ndarray) -> jnp.ndarray:
    """Nearest signed dominant basis per vector: ``±b`` maximizing |v·b|."""
    dots = vectors @ bases.T                     # (N, B)
    best = jnp.argmax(jnp.abs(dots), axis=1)
    signs = jnp.sign(dots[jnp.arange(len(vectors)), best])
    signs = jnp.where(signs == 0, 1.0, signs)
    return bases[best] * signs[:, None]


class JointOptimizationRunner:
    def __init__(self, config: JointOptimizationConfig) -> None:
        self.config = config
        vf_cfg = config.vf_config
        np.random.seed(42)
        mesh_lib.apply_platform(
            vf_cfg.vf_nerf_config.device_config.platform)

        self.dataset = dataset_dict[vf_cfg.dataset_config.dataset_name](
            vf_cfg.dataset_config)
        self.model = VectorFieldNerf(vf_cfg.vf_nerf_config, seed=42,
                                     decay_steps=max(
                                         config.train_config.joint_epochs *
                                         len(self.dataset), 1))
        near, far = self.dataset.get_bounds()
        self.model.near, self.model.far = near, far
        self.model.eval()

        # Resume from the initial-training checkpoint when given.
        self.run_dir = os.path.join(vf_cfg.exps_folder, vf_cfg.expname,
                                    vf_cfg.timestamp or "joint")
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints", "vf_nerf")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if vf_cfg.checkpoint:
            path = os.path.join(self.ckpt_dir, f"{vf_cfg.checkpoint}.ckpt")
            if os.path.exists(path):
                self.model.load(path)

        # Optimizable 7-d poses, one per training view.
        self.pose_params = np.asarray(
            matrix_to_pose7(jnp.asarray(self.dataset.poses)))
        self.weights: VFSupervisedLossWeights = vf_cfg.supervised_loss_weights

        tc = config.train_config
        self._model_lr = tc.refinement_init_lr
        self._pose_lr = tc.pose_lr if tc.pose_lr > 0 else \
            tc.refinement_init_lr
        self.joint_tx = self._make_joint_tx(
            freeze_model=tc.pose_only_epochs > 0)
        self.joint_opt_state = None  # built on first step (needs params)

        # Device mesh for data-parallel ray sharding (same policy as the
        # main runner: all devices unless the config caps it).
        n_dev = vf_cfg.vf_nerf_config.device_config.num_devices
        avail = len(jax.devices())
        self.n_devices = min(n_dev, avail) if n_dev > 0 else avail
        self.mesh = mesh_lib.make_mesh(self.n_devices) \
            if self.n_devices > 1 else None

        self.logger = MetricsLogger(self.run_dir, vf_cfg.wandb_project,
                                    vf_cfg.expname + "_joint",
                                    vf_cfg.timestamp or "joint",
                                    offline=vf_cfg.offline)
        self._bases: Optional[np.ndarray] = None

    def _make_joint_tx(self, freeze_model: bool):
        """Per-group optimizer: poses at ``pose_lr``, field at
        ``refinement_init_lr`` — and the field frozen outright during the
        ``pose_only_epochs`` warmup (a shared single-lr adam lets the
        many-parameter field absorb the pose miscalibration before the
        7-d poses can move; measured in the efficacy study).

        ``pose_lr_decay`` < 1 anneals the pose lr exponentially across the
        warmup to a floor of ``pose_lr * pose_lr_decay``; the post-warmup
        phase (fresh adam moments at the boundary) continues at that floor.
        Measured necessity: a constant 1e-2 pose lr is stable for ~100
        warmup epochs but diverges when the warmup is stretched to 300
        (rot error 1.5°→16.8° — the step size outlives the shrinking
        basin)."""
        tc = self.config.train_config
        pose_lr: Any = self._pose_lr
        if tc.pose_lr_decay != 1.0 and tc.pose_only_epochs > 0:
            if freeze_model:  # warmup phase: decay across its steps
                steps = max(tc.pose_only_epochs * len(self.dataset), 1)
                pose_lr = optax.exponential_decay(
                    self._pose_lr, transition_steps=steps,
                    decay_rate=tc.pose_lr_decay,
                    end_value=self._pose_lr * tc.pose_lr_decay)
            else:
                pose_lr = self._pose_lr * tc.pose_lr_decay

        def labels(params):
            return {"model": jax.tree_util.tree_map(lambda _: "model",
                                                    params["model"]),
                    "poses": "poses"}
        model_tx = optax.set_to_zero() if freeze_model else \
            optax.adam(self._model_lr)
        pose_tx = optax.adam(pose_lr)
        if tc.anchor_first_pose:
            # Gauge anchor: zero pose 0's gradient BEFORE adam (so its
            # moments never accumulate) — the first camera's frame pins
            # the global similarity the photometric loss cannot observe.
            def _zero_row0(updates, state, params=None):
                return jax.tree_util.tree_map(
                    lambda u: u.at[0].set(0.0), updates), state
            pose_tx = optax.chain(
                optax.GradientTransformation(lambda params: optax.EmptyState(),
                                             _zero_row0),
                pose_tx)
        return optax.multi_transform(
            {"model": model_tx, "poses": pose_tx}, labels)

    # ----------------------------------------------------------- bases
    def dominant_bases(self) -> np.ndarray:
        """Dominant scene directions (reference ``get_dominant_bases``).

        ``self_supervise``: cluster the current field at surface points
        (backprojected depth). Otherwise extract a mesh and cluster its face
        normals via ``utils.geometry.get_dominant_bases``.
        """
        from scipy.cluster.vq import kmeans2
        if not self.config.self_supervise:
            from vf_nerf_tpu.evaluation.methods import marching_cubes_mesh
            from vf_nerf_tpu.utils.geometry import get_dominant_bases
            mesh_dir = os.path.join(self.run_dir, "joint-mesh")
            marching_cubes_mesh(self.model, 128, mesh_dir, "joint",
                                scale=self.dataset.scale, max_batch=100000,
                                centroid=self.dataset.get_centroid())
            return get_dominant_bases(
                self.config.num_bases, self.config.decimation,
                os.path.join(mesh_dir, "mesh-joint.ply"))

        pts = self._surface_points(4096)
        vf = np.asarray(self.model.get_vector_field(pts))
        vf = vf / np.maximum(np.linalg.norm(vf, axis=1, keepdims=True), 1e-8)
        centers, _ = kmeans2(vf.astype(np.float64), self.config.num_bases,
                             minit="++", seed=0)
        norms = np.maximum(np.linalg.norm(centers, axis=1, keepdims=True),
                           1e-8)
        return (centers / norms).astype(np.float32)

    def _surface_points(self, n: int,
                        rng: Optional[np.random.RandomState] = None
                        ) -> np.ndarray:
        """Backproject random sensor-depth pixels to world points."""
        rng = rng or np.random.RandomState(0)
        h, w = self.dataset.image_size
        k = self.dataset.intrinsics
        pts = []
        per_view = max(n // len(self.dataset), 1)
        for i in range(len(self.dataset)):
            pix = rng.randint(0, h * w, per_view)
            d = self.dataset.depth_images[i][pix, 0]
            xs, ys = pix % w, pix // w
            x_cam = (xs - k[0, 2]) / k[0, 0] * d
            y_cam = (ys - k[1, 2]) / k[1, 1] * d
            cam = np.stack([x_cam, y_cam, d, np.ones_like(d)], axis=1)
            pts.append((self.dataset.poses[i] @ cam.T).T[:, :3])
        return np.concatenate(pts).astype(np.float32)

    # ------------------------------------------------------- joint step
    JOINT_METRICS = ("loss", "rgb_loss", "depth_loss", "unit_norm_loss",
                     "similarity_loss")
    SUP_METRICS = ("loss", "surface_loss", "non_surface_loss")

    def _joint_step_core(self, statics):
        """The un-jitted joint step body, shared by the per-step jit and the
        K-steps-per-dispatch ``lax.scan`` wrapper (same scan-dispatch
        architecture as the main trainer,
        ``parallel/train_step.make_scan_train_step``)."""
        modules = self.model.modules
        weights = self.weights
        # Thread the conf's clamp (loss.config.depth_loss_clamp) instead of
        # pinning 0.5: the r4 office study showed raising it past the scene's
        # depth-error scale is THE knob that un-deadlocks occluder recovery
        # (PARITY.md "Recall attribution") — a hardcoded 0.5 here would
        # silently ignore that override during joint refinement.
        depth_clamp = self.config.vf_config.vf_loss_config.depth_loss_clamp
        tx = self.joint_tx

        def step(params, opt_state, sums, batch_stats, batch, key, near,
                 far, window):
            def loss_fn(p):
                pose7 = p["poses"][batch["view_idx"]]
                variables = {"params": p["model"],
                             "batch_stats": batch_stats}
                out = render_rays(modules, variables, batch["uv"], pose7,
                                  batch["intrinsics"], near, far, window,
                                  key, statics)
                rgb_loss = jnp.mean(jnp.abs(out["rgb"] - batch["rgb"]))
                depth_err = jnp.abs(out["depth"] - batch["depth"])
                depth_loss = jnp.mean(jnp.minimum(depth_err, depth_clamp))
                normals = out["normals"].reshape(-1, 3)
                unit_norm = jnp.mean(
                    (jnp.linalg.norm(normals, axis=1) - 1.0) ** 2)
                # Point-pair field consistency on consecutive samples
                # (weights.similarity; reference functions.py:183-225).
                pts = out["points"]
                n_half = pts.shape[1] // 2
                sim = similarity_loss(
                    pts[:, :n_half].reshape(-1, 3),
                    pts[:, n_half:2 * n_half].reshape(-1, 3),
                    out["normals"][:, :n_half].reshape(-1, 3),
                    out["normals"][:, n_half:2 * n_half].reshape(-1, 3))
                total = (weights.rgb * rgb_loss +
                         weights.depth * depth_loss +
                         weights.unit_norm * unit_norm +
                         weights.similarity * sim)
                return total, {"rgb_loss": rgb_loss,
                               "depth_loss": depth_loss,
                               "unit_norm_loss": unit_norm,
                               "similarity_loss": sim}

            (loss, parts), grads = jax.value_and_grad(loss_fn,
                                                      has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            parts["loss"] = loss
            sums = {k: sums[k] + parts[k] for k in self.JOINT_METRICS}
            return params, opt_state, sums

        return step

    def _joint_step_fn(self, statics):
        return jax.jit(self._joint_step_core(statics),
                       donate_argnums=(0, 1, 2))

    def _joint_scan_step_fn(self, statics):
        """K joint steps per dispatch: scan the core over a (K, R, ...)
        stacked batch. The PRNG chain matches the per-step path bit-exactly
        (each body iteration performs the same ``jax.random.split`` the host
        loop does), so scan ≡ sequential (``tests/test_joint_opt.py``)."""
        core = self._joint_step_core(statics)

        def scan_step(params, opt_state, sums, batch_stats, stacked, key,
                      near, far, window):
            def body(carry, batch):
                params, opt_state, sums, key = carry
                key, sub = jax.random.split(key)
                params, opt_state, sums = core(
                    params, opt_state, sums, batch_stats, batch, sub, near,
                    far, window)
                return (params, opt_state, sums, key), None
            (params, opt_state, sums, key), _ = jax.lax.scan(
                body, (params, opt_state, sums, key), stacked)
            return params, opt_state, sums, key

        return jax.jit(scan_step, donate_argnums=(0, 1, 2))

    def _supervised_step_core(self):
        modules = self.model.modules
        weights = self.weights
        tx = self.joint_tx

        def step(params, opt_state, sums, batch_stats, surface_pts,
                 surface_gt, off_pts, off_gt):
            def loss_fn(p):
                variables = {"params": p["model"],
                             "batch_stats": batch_stats}
                v_surf = modules.vf_apply(variables, surface_pts,
                                          train=False)[:, :3]
                v_off = modules.vf_apply(variables, off_pts,
                                         train=False)[:, :3]
                surf = jnp.mean((v_surf - surface_gt) ** 2)
                off = jnp.mean((v_off - off_gt) ** 2)
                total = weights.supervision * (
                    weights.surface * surf + weights.non_surface * off)
                return total, {"surface_loss": surf, "non_surface_loss": off}

            (loss, parts), grads = jax.value_and_grad(loss_fn,
                                                      has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            parts["loss"] = loss
            sums = {k: sums[k] + parts[k] for k in self.SUP_METRICS}
            return params, opt_state, sums

        return step

    def _supervised_step_fn(self):
        return jax.jit(self._supervised_step_core(),
                       donate_argnums=(0, 1, 2))

    def _supervised_scan_step_fn(self):
        """The whole supervision block in one dispatch: scan the supervised
        core over (K, N, 3)-stacked point sets (they are assembled up front
        anyway — the targets snap against the block-start field)."""
        core = self._supervised_step_core()

        def scan_step(params, opt_state, sums, batch_stats, stacked):
            def body(carry, arrays):
                params, opt_state, sums = carry
                params, opt_state, sums = core(params, opt_state, sums,
                                               batch_stats, *arrays)
                return (params, opt_state, sums), None
            (params, opt_state, sums), _ = jax.lax.scan(
                body, (params, opt_state, sums), stacked)
            return params, opt_state, sums

        return jax.jit(scan_step, donate_argnums=(0, 1, 2))

    def _supervision_batch(self, rng: np.random.RandomState, n: int = 4096
                           ) -> Tuple[np.ndarray, ...]:
        """(surface points, snapped targets, off-surface points, targets)."""
        surface = self._surface_points(n, rng)
        vf = np.asarray(self.model.get_vector_field(surface))
        vf_hat = vf / np.maximum(np.linalg.norm(vf, axis=1, keepdims=True),
                                 1e-8)
        snapped = np.asarray(snap_to_bases(jnp.asarray(vf_hat),
                                           jnp.asarray(self._bases)))
        # Off-surface: points pulled toward the camera side of the surface,
        # supervised to point at their surface point.
        t = rng.uniform(0.05, 0.5, (len(surface), 1)).astype(np.float32)
        centroid = self.dataset.get_centroid()
        off = surface + (centroid - surface) * t
        direction = surface - off
        off_gt = direction / np.maximum(
            np.linalg.norm(direction, axis=1, keepdims=True), 1e-8)
        return surface, snapped, off, off_gt.astype(np.float32)

    # --------------------------------------------------------- sharding
    def _trim(self, n: int) -> int:
        """Largest device-count multiple ≤ n (ray axes must divide evenly)."""
        if self.mesh is None:
            return n
        return (n // self.n_devices) * self.n_devices

    def _feed_rays(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Place a host ray batch, sharded on the ray axis over the mesh."""
        keys = ("uv", "rgb", "depth", "intrinsics", "view_idx")
        n = self._trim(len(batch["uv"]))
        trimmed = {k: np.asarray(batch[k])[:n] for k in keys
                   if k in batch and np.asarray(batch[k]).size > 0}
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, trimmed)
        return {k: jnp.asarray(v) for k, v in trimmed.items()}

    def _feed_points(self, *arrays: np.ndarray) -> Tuple[Any, ...]:
        """Place supervision point sets, sharded on the leading axis."""
        n = self._trim(len(arrays[0]))
        out = tuple(a[:n] for a in arrays)
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, out)
        return tuple(jnp.asarray(a) for a in out)

    def _feed_rays_stack(self, batches) -> Dict[str, Any]:
        """Stack K host ray batches into (K, R, ...) arrays, rays sharded on
        axis 1 (scan-dispatch layout, like the main runner's
        ``_feed_stack``)."""
        keys = ("uv", "rgb", "depth", "intrinsics", "view_idx")
        n = self._trim(len(batches[0]["uv"]))
        stacked = {k: np.stack([np.asarray(b[k])[:n] for b in batches])
                   for k in keys
                   if k in batches[0] and np.asarray(batches[0][k]).size > 0}
        if self.mesh is not None:
            return mesh_lib.shard_stacked_batch(self.mesh, stacked)
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    def _feed_points_stack(self, batches) -> Tuple[Any, ...]:
        """Stack K supervision point-set tuples into (K, N, 3) arrays,
        points sharded on axis 1."""
        n = self._trim(len(batches[0][0]))
        stacked = tuple(np.stack([b[i][:n] for b in batches])
                        for i in range(len(batches[0])))
        if self.mesh is not None:
            return mesh_lib.shard_stacked_batch(self.mesh, stacked)
        return tuple(jnp.asarray(a) for a in stacked)

    def _zero_sums(self, keys: Tuple[str, ...]) -> Dict[str, jnp.ndarray]:
        sums = {k: jnp.zeros((), jnp.float32) for k in keys}
        if self.mesh is not None:
            sums = mesh_lib.replicate_state(self.mesh, sums)
        return sums

    # ------------------------------------------------------------ train
    def train(self) -> Dict[str, float]:
        import time

        cfg = self.config
        tc = cfg.train_config
        statics = self.model.render_statics(train=False)
        spd = self.config.vf_config.vf_nerf_config.device_config \
            .steps_per_dispatch
        scan_mode = spd != 1

        def build_steps():
            # The step cores close over self.joint_tx — rebuilt at the
            # pose-only → joint phase boundary.
            if scan_mode:
                return (self._joint_scan_step_fn(statics),
                        self._supervised_scan_step_fn())
            return self._joint_step_fn(statics), self._supervised_step_fn()

        pose_only = min(max(tc.pose_only_epochs, 0), tc.joint_epochs)
        joint_step, sup_step = build_steps()

        params = {"model": self.model.state.params,
                  "poses": jnp.asarray(self.pose_params)}
        opt_state = self.joint_tx.init(params)
        batch_stats = self.model.state.batch_stats
        if self.mesh is not None:
            params = mesh_lib.replicate_state(self.mesh, params)
            opt_state = mesh_lib.replicate_state(self.mesh, opt_state)
            batch_stats = mesh_lib.replicate_state(self.mesh, batch_stats)
        near = jnp.float32(self.model.near)
        far = jnp.float32(self.model.far)
        window = jnp.asarray(self.model.window_weights)
        rng = np.random.RandomState(42)
        key = jax.random.PRNGKey(7)

        last: Dict[str, float] = {}
        for epoch in range(tc.joint_epochs):
            if epoch == pose_only and pose_only > 0:
                # Pose-only warmup over: unfreeze the field (fresh adam
                # moments for both groups at the phase boundary).
                self.joint_tx = self._make_joint_tx(freeze_model=False)
                joint_step, sup_step = build_steps()
                opt_state = self.joint_tx.init(params)
                if self.mesh is not None:
                    opt_state = mesh_lib.replicate_state(self.mesh,
                                                         opt_state)
            epoch_log: Dict[str, float] = {}
            # Supervision sharpens the FIELD; during the pose-only warmup
            # the field group's updates are zeroed, so the block would be
            # a full-cost no-op (dominant-bases extraction + dispatches
            # with exactly-zero updates) — skip it outright.
            if (self.weights.supervision > 0 and tc.supervise_every > 0
                    and epoch >= pose_only
                    and epoch % tc.supervise_every == 0):
                self._bases = self.dominant_bases()
                # Targets snap against the field at block start; batches are
                # assembled up front so the device never waits on a per-step
                # host sync.
                batches = [self._supervision_batch(rng)
                           for _ in range(tc.supervision_epochs)]
                sup_sums = self._zero_sums(self.SUP_METRICS)
                if scan_mode and batches:
                    # Whole supervision block in ONE dispatch.
                    fed = self._feed_points_stack(batches)
                    params, opt_state, sup_sums = sup_step(
                        params, opt_state, sup_sums, batch_stats, fed)
                else:
                    for arrays in batches:
                        fed = self._feed_points(*arrays)
                        params, opt_state, sup_sums = sup_step(
                            params, opt_state, sup_sums, batch_stats, *fed)
                self._sync_model(params)
                n_sup = max(len(batches), 1)
                epoch_log.update(
                    {f"supervised_{k}": float(v) / n_sup
                     for k, v in jax.device_get(sup_sums).items()})

            sums = self._zero_sums(self.JOINT_METRICS)
            count = 0
            n_rays = 0
            t0 = time.perf_counter()
            if scan_mode:
                # K joint steps per dispatch (main-trainer scan-dispatch
                # architecture, VERDICT r2 #4): the per-dispatch relay
                # latency amortizes to 1/K.
                all_batches = list(self.dataset.epoch_batches(rng))
                n_rays = self._trim(len(all_batches[0]["uv"]))
                chunk = len(all_batches) if spd <= 0 else spd
                for start in range(0, len(all_batches), chunk):
                    block = all_batches[start:start + chunk]
                    fed = self._feed_rays_stack(block)
                    params, opt_state, sums, key = joint_step(
                        params, opt_state, sums, batch_stats, fed, key,
                        near, far, window)
                    count += len(block)
            else:
                for batch in self.dataset.epoch_batches(rng):
                    key, sub = jax.random.split(key)
                    fed = self._feed_rays(batch)
                    n_rays = self._trim(len(batch["uv"]))
                    params, opt_state, sums = joint_step(
                        params, opt_state, sums, batch_stats, fed, sub,
                        near, far, window)
                    count += 1
            self._sync_model(params)
            epoch_log.update({k: float(v) / max(count, 1)
                              for k, v in jax.device_get(sums).items()})
            # device_get above synced the epoch's device work.
            elapsed = time.perf_counter() - t0
            epoch_log["rays_per_sec"] = count * n_rays / max(elapsed, 1e-9)
            last = epoch_log
            self.logger.log(last, step=epoch)
            if epoch % cfg.save_frequency == 0:
                self.save(epoch, params)
        self.save(tc.joint_epochs - 1, params)
        return last

    def _sync_model(self, params) -> None:
        self.model.state = self.model.state.replace(params=params["model"])
        self.pose_params = np.asarray(params["poses"])

    def save(self, epoch: int, params) -> str:
        """Checkpoint model + refined poses."""
        return ckpt_io.save_checkpoint(
            self.ckpt_dir, epoch,
            {"params": params["model"],
             "batch_stats": self.model.state.batch_stats,
             "poses": params["poses"],
             "epoch": epoch})

    def refined_poses(self) -> np.ndarray:
        """(V, 4, 4) refined camera-to-world matrices."""
        from vf_nerf_tpu.ops.rays import pose7_to_matrix
        return np.asarray(pose7_to_matrix(jnp.asarray(self.pose_params)))
