"""Model facade: ``VectorFieldNerf``.

Mirrors the reference facade's public surface
(``models/nerf/vector_field_nerf.py:23-526`` — render / get_colors /
get_vector_field / get_weights_and_color / save / load / train / eval /
new_scheduler / reset_scheduler) on top of pure-functional JAX state:

- all learnable state lives in one pytree (``TrainState``): network params,
  BatchNorm stats, the learned density scalars, optax optimizer state and the
  schedule step,
- the optimizer is Adam + per-iteration exponential LR decay with global-norm
  clipping (reference ``:63-67`` + ``train/vector_field_nerf_train.py:255-260``),
- rendering is a cached-jit pure function per ``RenderStatics`` (fine-sample
  growth re-jits a handful of times per run, each cached),
- the reference trainer's eval-mode quirk (whole model in BN-eval mode when
  the directional-derivative weight is 0, ``vector_field_nerf_train.py:140-141``)
  is exposed as the ``train_mode`` flag.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vf_nerf_tpu.config.schema import SchedulerConfig, VFNerfConfig
from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                         render_rays, render_vector_field)
from vf_nerf_tpu.ops.annealing import annealed_window_weights
from vf_nerf_tpu.ops.density import (DensityParams, get_beta, get_mean,
                                     get_scale)
from vf_nerf_tpu.utils import checkpoint as ckpt_io


class TrainState(struct.PyTreeNode):
    """All trainable/optimizer state as one pytree (replicated across the
    data mesh; see ``parallel/``)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def _duplicate_vf_optimizer(schedule: Any, clip_norm: float,
                            weight_decay: float, b1: float = 0.9,
                            b2: float = 0.999, eps: float = 1e-8
                            ) -> optax.GradientTransformation:
    """Clip + Adam reproducing the reference's duplicate-parameter quirk.

    With fine sampling on, the reference facade's ``parameters()``
    (``vector_field_nerf.py:127-137``) returns the VF network's tensors TWICE
    (``fine_vector_field_network`` aliases ``vector_field_network``, ``:36``).
    torch then (verified empirically against torch 2.x):

    - ``clip_grad_norm_`` counts the VF grads twice in the global norm
      (``norm = sqrt(2·‖g_vf‖² + ‖g_rest‖²)``) and multiplies the shared VF
      grad tensor by the clip coefficient twice (→ ``coef²``);
    - ``Adam.step`` runs the full moment/bias-correction update twice per
      iteration for VF params with shared state (step counts 2t−1, 2t).

    Every reference training run uses the default ``n_importance=100``, so
    reference-trained results embed these dynamics; this transformation
    reproduces them exactly for the top-level ``"vf"`` subtree (pinned by
    ``tests/test_grad_parity.py::test_training_trajectory_parity``).

    One knowing simplification: weight decay is added to the shared gradient
    once, where torch would re-derive ``wd·p`` per occurrence against the
    intra-step-updated param. Indistinguishable at the reference's
    ``weight_decay = 0.0`` (every shipped conf).
    """

    def init(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params),
                "nu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        t = state["count"] + 1  # 1-based iteration number
        lr = schedule(state["count"])

        # --- clip (torch clip_grad_norm_: coef = c/(norm+1e-6), clamp ≤1) --
        sq = jax.tree.map(lambda g: jnp.sum(jnp.square(g)), grads)
        vf_sq = jax.tree.reduce(jnp.add, sq["vf"], jnp.zeros(()))
        total_sq = jax.tree.reduce(jnp.add, sq, jnp.zeros(()))
        total_norm = jnp.sqrt(total_sq + vf_sq)  # vf counted twice
        coef = jnp.minimum(clip_norm / (total_norm + 1e-6), 1.0)
        grads = {k: jax.tree.map(
            lambda g, c=(coef ** 2 if k == "vf" else coef): g * c, v)
            for k, v in grads.items()}
        if weight_decay > 0 and params is not None:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)

        def adam_sub(m, v, g, step):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * jnp.square(g)
            mhat = m / (1.0 - b1 ** step)
            vhat = v / (1.0 - b2 ** step)
            return m, v, mhat / (jnp.sqrt(vhat) + eps)

        def leaf_update(m, v, g, double):
            if double:  # two torch Adam passes with shared state per step
                m, v, u1 = adam_sub(m, v, g, 2 * t - 1)
                m, v, u2 = adam_sub(m, v, g, 2 * t)
                return m, v, -lr * (u1 + u2)
            m, v, u = adam_sub(m, v, g, t)
            return m, v, -lr * u

        new_mu, new_nu, updates = {}, {}, {}
        # NamedTuple leaves (DensityParams) are tuple subclasses, so the
        # triplet extraction stops only at *plain* tuples.
        is_triplet = lambda x: type(x) is tuple  # noqa: E731
        for k, g_sub in grads.items():
            triplets = jax.tree.map(
                lambda m, v, g, d=(k == "vf"): leaf_update(m, v, g, d),
                state["mu"][k], state["nu"][k], g_sub)
            new_mu[k] = jax.tree.map(lambda tr: tr[0], triplets,
                                     is_leaf=is_triplet)
            new_nu[k] = jax.tree.map(lambda tr: tr[1], triplets,
                                     is_leaf=is_triplet)
            updates[k] = jax.tree.map(lambda tr: tr[2], triplets,
                                      is_leaf=is_triplet)
        return updates, {"mu": new_mu, "nu": new_nu, "count": t}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: SchedulerConfig,
                   decay_steps: Optional[int] = None,
                   duplicate_vf: bool = False
                   ) -> Tuple[optax.GradientTransformation, Any]:
    """Adam + exponential per-step LR decay + global-norm clip.

    Reference: optimizer+scheduler ownership in the facade
    (``vector_field_nerf.py:63-67``; γ = decay_factor^(1/decay_steps)) and
    grad clipping in the trainer (``vector_field_nerf_train.py:255-256``).
    torch Adam's L2 weight decay (in-gradient) maps to
    ``add_decayed_weights`` *before* the Adam moments.

    ``duplicate_vf=True`` reproduces the reference's duplicate-parameter
    quirk for the ``"vf"`` subtree (see :func:`_duplicate_vf_optimizer`) —
    active in the reference whenever fine sampling is configured.
    """
    steps = decay_steps if decay_steps is not None else cfg.lr_decay_steps
    gamma = cfg.lr_decay_factor ** (1.0 / max(steps, 1))
    schedule = optax.exponential_decay(cfg.lr, transition_steps=1,
                                       decay_rate=gamma)
    if duplicate_vf:
        return _duplicate_vf_optimizer(schedule, cfg.clip_norm,
                                       cfg.weight_decay), schedule
    parts = [optax.clip_by_global_norm(cfg.clip_norm)]
    if cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts += [optax.scale_by_adam(), optax.scale_by_learning_rate(schedule)]
    return optax.chain(*parts), schedule


class VectorFieldNerf:
    """The VF-NeRF model: module defs + mutable host-side handle on the
    functional train state."""

    def __init__(self, config: VFNerfConfig, seed: int = 42,
                 decay_steps: Optional[int] = None) -> None:
        self.config = config
        self.modules = VFNerfModules(
            config, compute_dtype=config.device_config.compute_dtype)

        # The whole init runs pinned to the host CPU backend: flax/optax
        # init is a few hundred EAGER ops, and on a remote-attached TPU
        # every new eager op pays a relay round-trip plus a server-side
        # compile (~1-3 s each — measured ~7 min of model __init__ before
        # this). threefry is backend-deterministic, so the initial values
        # are identical; leaves are handed over as UNCOMMITTED numpy so
        # jit / sharding placement downstream stays free (the first
        # dispatch transfers the state once, then the returned device
        # arrays carry forward).
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            self._rng = jax.device_put(jax.random.PRNGKey(seed), cpu)
            key = self._next_key()
            variables = self.modules.init_variables(key)
            # Fine sampling duplicates the VF params in the reference
            # optimizer (parameters() :127-137) — reproduce those
            # dynamics (quirk).
            self._duplicate_vf = config.ray_sampler_config.n_importance > 0
            self.optimizer, self.lr_schedule = make_optimizer(
                config.scheduler_config, decay_steps,
                duplicate_vf=self._duplicate_vf)
            opt_state = self.optimizer.init(variables["params"])

        def host(tree):
            return jax.tree_util.tree_map(np.asarray, tree)

        self.state = TrainState(
            params=host(variables["params"]),
            batch_stats=host(variables["batch_stats"]),
            opt_state=host(opt_state),
            step=np.zeros((), np.int32))

        # Fine-sample growth state (reference RangeFineSampler.N_samples,
        # grown by the trainer; ray_sampler.py:276).
        self.fine_n_samples = config.ray_sampler_config.n_importance
        # BN mode; reference trainer quirk sets eval when dir-deriv weight==0.
        self.train_mode = False
        # Current (annealed) window weights.
        self.window_weights = np.asarray(config.cos_sim_weights,
                                         dtype=np.float32)
        # near/far come from the dataset (trainer :43-45); defaults from conf.
        self.near = config.ray_sampler_config.near
        self.far = config.ray_sampler_config.far
        # Optional data mesh for sharded eval rendering (enable_mesh_eval).
        self.eval_mesh = None

    # ------------------------------------------------------------------ rng
    def _next_key(self) -> np.ndarray:
        """Advance the model RNG and return a fresh key.

        The split runs pinned to the host CPU backend: it is an EAGER op,
        and on a remote-attached TPU each eager op on the default backend
        costs a full relay round-trip (~33-100 ms) — per render chunk,
        that dwarfed the 4 ms of device compute (same trap as the eager
        LR schedule, DEVELOPMENT.md). threefry is backend-deterministic,
        so the key values are identical; jitted consumers receive the
        key as a (tiny) host array input."""
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            self._rng, key = jax.random.split(jax.device_put(self._rng, cpu))
        # Return an UNCOMMITTED key (numpy): a cpu-committed jax.Array
        # would commit everything computed from it (e.g. the initial
        # params) to cpu:0 and clash with sharded consumers.
        return np.asarray(key)

    # ------------------------------------------------------------- modes
    def train(self) -> None:
        """BN/dropout train mode — unless ``numerical_jacobian`` keeps the VF
        net frozen (reference ``vector_field_nerf.py:139-150``)."""
        self.train_mode = not self.config.numerical_jacobian

    def eval(self) -> None:
        self.train_mode = False

    # ------------------------------------------------------ window weights
    def update_annealing(self, epoch: int) -> np.ndarray:
        """Epoch-gated window-weight annealing (reference ``render``
        ``:232-234``); returns the active weights."""
        self.window_weights = annealed_window_weights(
            np.asarray(self.config.cos_sim_weights, np.float32),
            self.config.cos_sim_weights_anneal,
            self.config.anneal_start, self.config.anneal_end, epoch)
        return self.window_weights

    # ------------------------------------------------------------ statics
    def render_statics(self, train: Optional[bool] = None,
                       white_background: bool = False,
                       compute_dir_derivatives: bool = False,
                       n_fine: Optional[int] = None) -> RenderStatics:
        return RenderStatics.from_config(
            self.config,
            n_fine=self.fine_n_samples if n_fine is None else n_fine,
            train=self.train_mode if train is None else train,
            white_background=white_background,
            compute_dir_derivatives=compute_dir_derivatives)

    @functools.lru_cache(maxsize=32)
    def _jitted_render(self, statics: RenderStatics):
        def fn(variables, uv, pose, intrinsics, near, far, weights, key):
            return render_rays(self.modules, variables, uv, pose, intrinsics,
                               near, far, weights, key, statics)
        return jax.jit(fn)

    # ------------------------------------------------------------- render
    def enable_mesh_eval(self, mesh=None) -> None:
        """Shard eval render chunks over a data mesh (SURVEY §5.8: "eval
        chunking becomes device-sharded chunks"). State is replicated once;
        every subsequent ``render`` call whose ray count divides the device
        count runs SPMD with the rays split across chips. Bit-equal to the
        single-device render (JAX PRNG bits depend only on (key, shape) and
        every render op is per-ray) — pinned by
        ``tests/test_parallel.py::TestMeshEval``."""
        from vf_nerf_tpu.parallel import mesh as mesh_lib
        self.eval_mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.state = mesh_lib.replicate_state(self.eval_mesh, self.state)

    def render(self, pose, pixels, intrinsics, epoch: int,
               white: bool = False) -> Dict[str, jnp.ndarray]:
        """Facade render (reference ``render``, ``:216-338``): anneal, ray
        gen, coarse+fine, compositing. Returns the output dict of
        ``render_rays``."""
        self.update_annealing(epoch)
        statics = self.render_statics(white_background=white)
        fn = self._jitted_render(statics)
        uv = jnp.asarray(pixels)
        pose_j = jnp.asarray(pose)
        intr_j = jnp.asarray(intrinsics)
        mesh = getattr(self, "eval_mesh", None)
        if mesh is not None and uv.shape[0] % mesh.devices.size == 0:
            from vf_nerf_tpu.parallel import mesh as mesh_lib
            sharding = mesh_lib.ray_sharded(mesh)
            uv, pose_j, intr_j = (jax.device_put(x, sharding)
                                  for x in (uv, pose_j, intr_j))
        return fn(self.state.variables(), uv, pose_j, intr_j,
                  jnp.asarray(self.near, jnp.float32),
                  jnp.asarray(self.far, jnp.float32),
                  jnp.asarray(self.window_weights), self._next_key())

    # Chunks per image-render dispatch. Fixed so ONE compiled program
    # serves every image size / chunk count / process: the axon relay
    # compiles server-side at first execution per process regardless of
    # the local persistent cache, and compile time grows with program
    # size — a whole-image (K≈800) scan cost ~60 s/image in re-compiles
    # while a 64-chunk scan compiles once in ~1 min and then runs every
    # super-chunk at the device rate.
    IMAGE_RENDER_SUPER_CHUNKS = 64

    @functools.lru_cache(maxsize=8)
    def _jitted_image_render(self, statics: RenderStatics, split: int):
        """``lax.scan`` over a fixed (SUPER, split, 2) pixel block with ONE
        (4, 4) pose/intrinsics broadcast on device.

        The per-chunk facade loop pays ~3 host→device puts per chunk
        through the axon relay (~33 ms latency each — ~100 ms/chunk
        against 4 ms of device compute; measured 95 s/image at 680×1200).
        Scanning the chunk loop on device makes a super-chunk one put +
        one dispatch."""
        def fn(variables, uv_stack, keys, pose44, intr44, near, far,
               weights):
            def body(_, uv_key):
                uv, key = uv_key
                out = render_rays(
                    self.modules, variables, uv,
                    jnp.broadcast_to(pose44, (split, 4, 4)),
                    jnp.broadcast_to(intr44, (split, 4, 4)),
                    near, far, weights, key, statics)
                return 0, (out["rgb"], out["depth"])

            _, (rgb, depth) = jax.lax.scan(body, 0, (uv_stack, keys))
            return rgb.reshape(-1, 3), depth.reshape(-1, 1)
        return jax.jit(fn)

    def render_image(self, pixels, pose, intrinsics, epoch: int,
                     white: bool = False, split_size: int = 1024
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Render ALL of an image's rays: dispatch + fetch in one call."""
        return self.render_image_fetch(self.render_image_async(
            pixels, pose, intrinsics, epoch, white, split_size))

    def render_image_async(self, pixels, pose, intrinsics, epoch: int,
                           white: bool = False, split_size: int = 1024
                           ) -> Dict[str, Any]:
        """Dispatch ALL of an image's rays; fetch later with
        ``render_image_fetch`` (double-buffering: the caller can dispatch
        the NEXT image before fetching this one, overlapping the ~0.5 s
        host fetch + image encode with device compute — VERDICT r3 #5).

        :param pixels: (N, 2) pixel coords; ``pose``/``intrinsics`` one
            (4, 4) each (constant across an image — per-ray copies would
            make the transfer 17× larger for no information).

        Super-chunks (``IMAGE_RENDER_SUPER_CHUNKS`` × ``split_size`` rays)
        are dispatched back-to-back (they pipeline through the relay).
        Each chunk consumes the SAME per-chunk key the facade loop would
        draw (one ``_next_key()`` per chunk — the range-fine sampler uses
        uniform-random depths for argmax-0 rays even with
        ``perturb=False``, so keys are NOT inert), making the outputs
        bit-equal to per-chunk ``render`` calls
        (``tests/test_renderer.py``); dispatch order (not fetch order)
        defines the RNG chain, so pipelined callers stay aligned.
        """
        self.update_annealing(epoch)
        statics = self.render_statics(white_background=white)
        n = pixels.shape[0]
        super_rays = self.IMAGE_RENDER_SUPER_CHUNKS * split_size
        n_super = -(-n // super_rays)
        pad = n_super * super_rays - n
        uv = np.asarray(pixels, np.float32)
        if pad:
            uv = np.concatenate([uv, np.repeat(uv[-1:], pad, 0)])
        # EXACTLY the facade loop's key count — ceil(n / split) draws, one
        # per REAL chunk — so the model RNG chain stays aligned with the
        # per-chunk path across successive images; pad chunks (discarded)
        # reuse the last real key.
        n_real = -(-n // split_size)
        n_total = n_super * self.IMAGE_RENDER_SUPER_CHUNKS
        keys = [self._next_key() for _ in range(n_real)]
        keys = np.stack(keys + [keys[-1]] * (n_total - n_real))
        fn = self._jitted_image_render(statics, split_size)
        const = (jnp.asarray(pose, jnp.float32).reshape(4, 4),
                 jnp.asarray(intrinsics, jnp.float32).reshape(4, 4),
                 jnp.asarray(self.near, jnp.float32),
                 jnp.asarray(self.far, jnp.float32),
                 jnp.asarray(self.window_weights))
        variables = self.state.variables()
        S = self.IMAGE_RENDER_SUPER_CHUNKS
        # Multi-chip: shard each (S, split, 2) block's ray axis (axis 1)
        # over the eval mesh — every render op is per-ray, so XLA runs the
        # scan SPMD, bit-equal to single-device (tests/test_parallel.py).
        mesh = getattr(self, "eval_mesh", None)
        shard_block = None
        if mesh is not None and split_size % mesh.devices.size == 0:
            from vf_nerf_tpu.parallel import mesh as mesh_lib
            shard_block = lambda b: mesh_lib.shard_stacked_batch(mesh, b)  # noqa: E731
        pending = []
        for s in range(n_super):
            block = uv[s * super_rays:(s + 1) * super_rays].reshape(
                S, split_size, 2)
            if shard_block is not None:
                block = shard_block(block)
            pending.append(fn(variables, block, keys[s * S:(s + 1) * S],
                              *const))
        return {"pending": pending, "n": n}

    @staticmethod
    def render_image_fetch(handle: Dict[str, Any]
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch a ``render_image_async`` dispatch → numpy (N, 3) rgb and
        (N, 1) depth (one hard host sync per image)."""
        fetched = jax.device_get(handle["pending"])
        n = handle["n"]
        rgb = np.concatenate([r for r, _ in fetched])
        depth = np.concatenate([d for _, d in fetched])
        return rgb[:n], depth[:n]

    @functools.lru_cache(maxsize=4)
    def _jitted_vector_field(self, train: bool):
        def fn(variables, points):
            return render_vector_field(self.modules, variables, points,
                                       train=train)
        return jax.jit(fn)

    def get_vector_field(self, points) -> jnp.ndarray:
        """Raw field at points (reference ``get_vector_field``, ``:380-403``);
        jitted + BN-folded — the mesh-extraction hot loop."""
        return self._jitted_vector_field(False)(
            self.state.variables(), jnp.asarray(points))

    def render_output(self, pose, pixels, intrinsics, epoch: int,
                      white: bool = False):
        """``render`` wrapped in the reference's ``NerfOutput`` contract
        (``models/nerf/output.py:8-70``)."""
        from vf_nerf_tpu.models.output import NerfOutput
        return NerfOutput.from_render_dict(
            self.render(pose, pixels, intrinsics, epoch, white))

    def get_colors(self, pose, pixels, intrinsics,
                   epoch: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-sample colors on the *coarse* sample grid (reference
        ``get_colors``, ``:341-378``: uniform sampler → VF → rendering net;
        joint-optimization support surface). Returns (rgb (R·S, 3),
        points (R·S, 3), repeated ray dirs (R·S, 3))."""
        from vf_nerf_tpu.ops import samplers as sampler_ops
        from vf_nerf_tpu.ops.rays import get_ray_directions_and_cam_location

        self.update_annealing(epoch)
        statics = self.render_statics()
        variables = self.state.variables()
        uv = jnp.asarray(pixels)
        pose_j = jnp.asarray(pose)
        intr = jnp.asarray(intrinsics)

        directions, ray_dirs, cam_loc = get_ray_directions_and_cam_location(
            uv, pose_j, intr)
        z = sampler_ops.uniform_z_vals(self._next_key(), uv.shape[0],
                                       statics.n_coarse,
                                       jnp.float32(self.near),
                                       jnp.float32(self.far),
                                       perturb=statics.perturb)
        points = sampler_ops.points_from_z(cam_loc, directions, z)
        flat = points.reshape(-1, 3)
        vf_out = self.modules.vf_apply(variables, flat, train=statics.train)
        feat_dim = self.config.vf_net_config.feature_vector_dims
        dirs_rep = jnp.repeat(ray_dirs[:, None, :], statics.n_coarse,
                              axis=1).reshape(-1, 3)
        rgb = self.modules.render_apply(variables, flat, vf_out[:, :3],
                                        dirs_rep, vf_out[:, 3:3 + feat_dim],
                                        train=statics.train)
        return rgb, flat, dirs_rep

    def get_weights_and_color(self, points, repeated_ray_dirs, z_vals,
                              epoch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Weights + per-sample colors for externally-supplied points
        (reference ``get_weights_and_color``, ``:405-440``; used by the joint
        pose-field optimization stage)."""
        from vf_nerf_tpu.models.renderer import get_density as _get_density
        from vf_nerf_tpu.ops import compositing

        self.update_annealing(epoch)
        statics = self.render_statics()
        variables = self.state.variables()
        points = jnp.asarray(points)
        z_vals = jnp.asarray(z_vals)
        dirs = jnp.asarray(repeated_ray_dirs)

        flat = points.reshape(-1, 3)
        vf_out = self.modules.vf_apply(variables, flat,
                                       train=statics.train)
        feat_dim = self.config.vf_net_config.feature_vector_dims
        normals_flat, feats = vf_out[:, :3], vf_out[:, 3:3 + feat_dim]
        normals = normals_flat.reshape(z_vals.shape[0], z_vals.shape[1], 3)

        sigma = _get_density(normals, dirs.reshape(normals.shape),
                             variables["params"]["density"],
                             jnp.asarray(self.window_weights), statics,
                             fine=True)
        if statics.rendering == "volsdf":
            weights = compositing.volsdf_volume_rendering(
                z_vals, sigma, statics.normalize_rendering)
        else:
            weights = compositing.nerf_volume_rendering(
                z_vals, sigma, statics.normalize_rendering)
        rgb = self.modules.render_apply(variables, flat, normals_flat,
                                        dirs.reshape(-1, 3), feats,
                                        train=statics.train)
        return weights, rgb

    # --------------------------------------------------------- density log
    def density_scalar_arrays(self) -> Dict[str, jax.Array]:
        """Clamped learned density params as on-device scalars — lets the
        caller fold them into a single batched ``device_get`` (reference
        trainer logs these per epoch, ``:286-288``)."""
        d: DensityParams = self.state.params["density"]
        dc = self.config.density_config
        return {"beta": get_beta(d, tuple(dc.beta_bounds)),
                "scale": get_scale(d, dc.scale_min),
                "mean": get_mean(d, tuple(dc.mean_bounds))}

    def density_scalars(self) -> Dict[str, float]:
        """Clamped learned density params for logging (reference trainer
        ``:286-288``); one batched host fetch."""
        return {k: float(v) for k, v in
                jax.device_get(self.density_scalar_arrays()).items()}

    def current_lr(self) -> float:
        return self.host_lr(int(jax.device_get(self.state.step)))

    def host_lr(self, step: int) -> float:
        """Evaluate the LR schedule on the host CPU backend. The eager
        optax schedule otherwise runs on the default device — through the
        axon relay that is one ~33-100 ms round-trip per call, which
        dominated the span path's per-epoch logging (measured 27.4 →
        ~19 ms/step after pinning to CPU)."""
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return float(self.lr_schedule(step))

    # ------------------------------------------------------------ schedule
    def reset_scheduler(self, num_steps: Optional[int] = None) -> None:
        """Fresh Adam + schedule (reference ``reset_scheduler``, ``:115-125``)."""
        self.optimizer, self.lr_schedule = make_optimizer(
            self.config.scheduler_config, num_steps,
            duplicate_vf=self._duplicate_vf)
        self.state = self.state.replace(
            opt_state=self.optimizer.init(self.state.params),
            step=jnp.zeros((), jnp.int32))

    new_scheduler = reset_scheduler  # reference ``new_scheduler`` (:105-113)

    # ---------------------------------------------------------- checkpoint
    def _ckpt_state(self, epoch: int) -> Dict[str, Any]:
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "epoch": epoch,
                "fine_n_samples": self.fine_n_samples}

    def save(self, epoch: int, path_dir: str) -> str:
        """Write ``{epoch}.ckpt`` + ``latest.ckpt``
        (reference ``save``, ``:196-214``)."""
        return ckpt_io.save_checkpoint(path_dir, epoch,
                                       self._ckpt_state(epoch))

    def load(self, path: str) -> int:
        """Restore state; returns saved epoch + 1
        (reference ``load``, ``:162-194``)."""
        restored = ckpt_io.load_checkpoint(path, self._ckpt_state(0))
        self.state = TrainState(params=restored["params"],
                                batch_stats=restored["batch_stats"],
                                opt_state=restored["opt_state"],
                                step=jnp.asarray(restored["step"]))
        self.fine_n_samples = int(restored["fine_n_samples"])
        return int(restored["epoch"]) + 1

    def load_reference_pth(self, path: str) -> int:
        """Import a reference torch checkpoint's network/density weights for
        parity runs (optimizer state is reinitialized)."""
        from vf_nerf_tpu.ops.density import init_density_params
        from vf_nerf_tpu.utils.torch_import import (
            density_params_from_torch, load_torch_checkpoint,
            mlp_state_from_torch)

        blob = load_torch_checkpoint(path)
        vf_cfg = self.config.vf_net_config
        rn_cfg = self.config.rendering_net_config
        vf_params, vf_stats = mlp_state_from_torch(
            blob["vf_net"], n_layers=len(vf_cfg.dimensions) + 1,
            batch_norm=vf_cfg.batch_norm, weight_norm=vf_cfg.weight_norm)
        rn_params, rn_stats = mlp_state_from_torch(
            blob["rendering_net"], n_layers=len(rn_cfg.dimensions) + 1,
            batch_norm=rn_cfg.batch_norm, weight_norm=rn_cfg.weight_norm)
        density = init_density_params(
            density_params_from_torch(blob["density"]))

        params = {"vf": vf_params, "render": rn_params, "density": density}
        self.state = TrainState(params=params,
                                batch_stats={"vf": vf_stats,
                                             "render": rn_stats},
                                opt_state=self.optimizer.init(params),
                                step=jnp.zeros((), jnp.int32))
        return int(blob.get("epoch", 0)) + 1

    def load_vf_init(self, path: str) -> None:
        """Load pretrained VF-init weights into the vf net only (reference
        ``VectorFieldNetwork.load_init``, ``vector_field_network.py:109-138``;
        regenerated by ``train/vf_init.py`` since the reference ships LFS
        stubs — SURVEY.md §3.5)."""
        import pickle
        with open(path, "rb") as f:
            blob = pickle.load(f)
        params = dict(self.state.params)
        params["vf"] = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        batch_stats = dict(self.state.batch_stats)
        batch_stats["vf"] = jax.tree_util.tree_map(jnp.asarray,
                                                   blob.get("batch_stats", {}))
        self.state = self.state.replace(params=params,
                                        batch_stats=batch_stats,
                                        opt_state=self.optimizer.init(params))
