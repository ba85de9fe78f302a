"""The fused functional renderer: one jitted function per train/eval step.

Reference call stack: ``VectorFieldNerf.render``
(``models/nerf/vector_field_nerf.py:216-338``) — ray gen → coarse stratified
sampling → VF forward (no grad) → windowed-cosine density → VolSDF weights →
argmax-range fine sampling → VF forward (grads) → density → weights → color
MLP → compositing. Here the whole pipeline is a single pure function that XLA
fuses; ``stop_gradient`` replaces the reference's ``torch.no_grad`` coarse
pass (the coarse weights only steer the non-differentiable argmax sampler).

Reference quirks reproduced on purpose:

- ``get_density`` uses a **uniform** ``1/W`` window for every annealing mode
  except ``anneal_fine`` (``vector_field_nerf.py:453-455``); since the
  reference's config validation rejects ``anneal_fine``
  (``config_parser/vf_nerf_config.py:120-122``), annealed weights never shape
  the density in any valid reference run. We apply the same selection.
- Back-facing suppression zeroes density where the normal-to-ray cosine is
  below ``dir_to_normal_th`` AND the windowed cosine is negative
  (``:464-470``); the last sample's density is forced to 0 (``:471-472``).

Deviations (documented, quirk-compat not needed for parity):

- the coarse-only path (n_importance == 0) works (the reference raises
  ``NameError``, SURVEY.md §3.2),
- directional derivatives are computed on the fine (grad) pass so their loss
  actually receives gradients (the reference's analytic branch computes them
  under ``no_grad`` and then discards the fine ones at ``:305``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vf_nerf_tpu.config.schema import VFNerfConfig
from vf_nerf_tpu.models.networks import (RenderingMLP, VectorFieldMLP,
                                         directional_derivatives,
                                         numerical_vf_jacobian, vf_jacobian)
from vf_nerf_tpu.ops import compositing, samplers
from vf_nerf_tpu.ops.density import DensityParams, laplace_density
from vf_nerf_tpu.ops.rays import get_ray_directions_and_cam_location
from vf_nerf_tpu.ops.window import cosine_similarity, window_cosine_similarity


@dataclasses.dataclass(frozen=True)
class RenderStatics:
    """Hashable static configuration for the jitted render functions.

    Changing ``n_fine`` (the fine-sample count grows +5 every
    ``increase_every`` epochs, ``train/vector_field_nerf_train.py:146-147``)
    triggers a re-jit — a handful of compiles over a full run, each cached.
    """

    n_coarse: int
    n_fine: int
    n_window: int
    perturb: bool
    rendering: str                 # "volsdf" | "nerf"
    normalize_rendering: bool
    dir_to_normal_th: float
    cutoff: float
    beta_bounds: Tuple[float, float]
    scale_min: float
    mean_bounds: Tuple[float, float]
    anneal_mode: str
    compute_dir_derivatives: bool
    numerical_jacobian: bool
    white_background: bool
    train: bool                    # BatchNorm mode for both nets
    # Eval-only fast path: fold BatchNorm into the dense weights. Ignored
    # when ``train``.
    fast_eval: bool = True
    # With fast_eval, additionally reuse the coarse-pass VF outputs inside
    # the fine pass instead of the reference's recompute
    # (``vector_field_nerf.py:287-297``). Saves ~43% of the VF FLOPs but
    # pays a large per-ray gather to re-sort samples — measured slower on
    # v5e (gathers are expensive); off by default.
    reuse_coarse: bool = False
    # Pallas kernel paths for the fast-eval pipeline (independently
    # toggleable; parity pinned by tests/test_pallas_kernels.py, measured
    # TPU comparison in PARITY.md):
    # - pallas_mlp: the all-layers-fused VMEM MLP (``ops/fused_mlp``) —
    #   measured SLOWER than XLA's fused chain at the production shapes,
    #   kept off by default;
    # - pallas_march: the fused ray-march kernel (``ops/ray_march``:
    #   window-cos → Laplace density → VolSDF weights → composite in one
    #   pallas_call; volsdf rendering only).
    pallas_mlp: bool = False
    pallas_march: bool = False

    @staticmethod
    def from_config(cfg: VFNerfConfig, n_fine: int, train: bool,
                    white_background: bool = False,
                    compute_dir_derivatives: bool = False,
                    use_config_cutoff: bool = False) -> "RenderStatics":
        rs = cfg.ray_sampler_config
        d = cfg.density_config
        # QUIRK (reproduced): the reference facade passes the config cutoff
        # to ``Density.__call__`` but ``Density.forward`` never forwards it
        # to ``density_func`` (``density_functions.py:20-34``) — the
        # effective truncation is always the default −0.5, regardless of the
        # conf's ``cutoff = -2.0``. Set ``use_config_cutoff=True`` for the
        # non-quirk behavior.
        effective_cutoff = d.cutoff if use_config_cutoff else -0.5
        return RenderStatics(
            n_coarse=rs.n_samples,
            n_fine=min(n_fine, rs.max_samples) if n_fine > 0 else 0,
            n_window=len(cfg.cos_sim_weights),
            perturb=rs.perturb,
            rendering=cfg.rendering,
            normalize_rendering=cfg.normalize_rendering,
            dir_to_normal_th=cfg.dir_to_normal_th,
            cutoff=effective_cutoff,
            beta_bounds=tuple(d.beta_bounds),
            scale_min=d.scale_min,
            mean_bounds=tuple(d.mean_bounds),
            anneal_mode=cfg.cos_sim_weights_anneal,
            compute_dir_derivatives=compute_dir_derivatives,
            numerical_jacobian=cfg.numerical_jacobian,
            white_background=white_background,
            train=train,
        )


class VFNerfModules:
    """The two Flax module definitions, built once from config.

    ``compute_dtype="bfloat16"`` runs the MLP matmuls/activations in bf16
    (params stay f32). Measured throughput-neutral on v5e at production
    shapes (PARITY.md serving sweep) — XLA's default TPU matmul precision
    already takes the MXU bf16 path for f32 inputs. Default float32 keeps
    bit-level parity with the reference.
    """

    def __init__(self, cfg: VFNerfConfig,
                 compute_dtype: Optional[str] = None) -> None:
        self.cfg = cfg
        dtype = None
        if compute_dtype not in (None, "", "float32"):
            dtype = jnp.dtype(compute_dtype)
        self.compute_dtype = dtype
        self.vf = VectorFieldMLP(cfg.vf_net_config, compute_dtype=dtype)
        self.render = RenderingMLP(cfg.rendering_net_config,
                                   compute_dtype=dtype)

    def init_variables(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize all network variables + density params as one pytree."""
        k_vf, k_render = jax.random.split(key)
        vf_vars = self.vf.init(k_vf, jnp.zeros((8, 3)), train=False)
        render_vars = self.render.init(
            k_render, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            jnp.zeros((8, 3)),
            jnp.zeros((8, self.cfg.rendering_net_config.feature_vector_dims)),
            train=False)
        from vf_nerf_tpu.ops.density import init_density_params
        return {
            "params": {"vf": vf_vars["params"],
                       "render": render_vars["params"],
                       "density": init_density_params(
                           self.cfg.density_config.params_init)},
            "batch_stats": {"vf": vf_vars.get("batch_stats", {}),
                            "render": render_vars.get("batch_stats", {})},
        }

    def vf_apply(self, variables: Dict[str, Any], points: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        vars_ = {"params": variables["params"]["vf"]}
        has_stats = bool(variables["batch_stats"].get("vf"))
        if has_stats:
            vars_["batch_stats"] = variables["batch_stats"]["vf"]
        if train and has_stats:
            # Train-mode BN normalizes with batch statistics; the running
            # stats update is collected by vf_apply_mutable (the train step
            # threads it) — here it is discarded.
            out, _ = self.vf.apply(vars_, points, train=True,
                                   mutable=["batch_stats"])
            return out
        return self.vf.apply(vars_, points, train=train)

    def vf_apply_mutable(self, variables: Dict[str, Any],
                         points: jnp.ndarray):
        """Train-mode forward returning (out, new_batch_stats) — the running
        -stat update path (reference BN momentum 0.1 per forward)."""
        vars_ = {"params": variables["params"]["vf"]}
        if variables["batch_stats"].get("vf"):
            vars_["batch_stats"] = variables["batch_stats"]["vf"]
            out, updates = self.vf.apply(vars_, points, train=True,
                                         mutable=["batch_stats"])
            return out, updates["batch_stats"]
        return self.vf.apply(vars_, points, train=True), {}

    def render_apply(self, variables: Dict[str, Any], points, normals,
                     view_dirs, feats, train: bool) -> jnp.ndarray:
        vars_ = {"params": variables["params"]["render"]}
        has_stats = bool(variables["batch_stats"].get("render"))
        if has_stats:
            vars_["batch_stats"] = variables["batch_stats"]["render"]
        if train and has_stats:
            out, _ = self.render.apply(vars_, points, normals, view_dirs,
                                       feats, train=True,
                                       mutable=["batch_stats"])
            return out
        return self.render.apply(vars_, points, normals, view_dirs, feats,
                                 train=train)

    def render_apply_mutable(self, variables: Dict[str, Any], points,
                             normals, view_dirs, feats):
        vars_ = {"params": variables["params"]["render"]}
        if variables["batch_stats"].get("render"):
            vars_["batch_stats"] = variables["batch_stats"]["render"]
            out, updates = self.render.apply(vars_, points, normals,
                                             view_dirs, feats, train=True,
                                             mutable=["batch_stats"])
            return out, updates["batch_stats"]
        return self.render.apply(vars_, points, normals, view_dirs, feats,
                                 train=True), {}

    # ---------------------------------------------- folded fast-eval path
    def supports_folding(self) -> bool:
        return not (self.cfg.vf_net_config.weight_norm or
                    self.cfg.rendering_net_config.weight_norm)

    def folded_weights(self, variables: Dict[str, Any]):
        """Eval-mode BN folded into dense weights for both nets (see
        ``ops/fused_mlp.fold_dense_bn``). Cheap elementwise work — safe to
        run inside jit every call."""
        from vf_nerf_tpu.ops.fused_mlp import fold_dense_bn
        vf_w = fold_dense_bn(variables["params"]["vf"],
                             variables["batch_stats"].get("vf"),
                             n_layers=len(self.cfg.vf_net_config.dimensions)
                             + 1)
        rn_w = fold_dense_bn(variables["params"]["render"],
                             variables["batch_stats"].get("render"),
                             n_layers=len(
                                 self.cfg.rendering_net_config.dimensions)
                             + 1)
        return vf_w, rn_w

    def vf_apply_folded(self, vf_weights, points: jnp.ndarray,
                        use_pallas: bool = False) -> jnp.ndarray:
        from vf_nerf_tpu.ops.embedding import positional_encoding
        from vf_nerf_tpu.ops.fused_mlp import fused_mlp
        cfg = self.cfg.vf_net_config
        emb = positional_encoding(points, cfg.embedder_multires)
        skip = (cfg.skip_connection_in or [None])[0]
        return fused_mlp(vf_weights, emb, skip_at=skip, final_act="tanh",
                         block_points=512, use_pallas=use_pallas)

    def render_apply_folded(self, rn_weights, points, normals, view_dirs,
                            feats, use_pallas: bool = False) -> jnp.ndarray:
        from vf_nerf_tpu.ops.embedding import positional_encoding
        from vf_nerf_tpu.ops.fused_mlp import fused_mlp
        cfg = self.cfg.rendering_net_config
        if cfg.embedder_multires > 0:
            view_dirs = positional_encoding(view_dirs, cfg.embedder_multires)
        parts = [points]
        if cfg.mode in ("idr", "no_normals"):
            parts.append(view_dirs)
        if cfg.mode in ("idr", "no_view_dir"):
            parts.append(normals)
        if feats is not None and feats.size > 0 and \
                cfg.feature_vector_dims > 0:
            parts.append(feats)
        x = jnp.concatenate(parts, axis=-1)
        return fused_mlp(rn_weights, x, skip_at=None, final_act="sigmoid",
                         block_points=512, use_pallas=use_pallas)


def get_density(normals: jnp.ndarray,
                ray_dirs: jnp.ndarray,
                density_params: DensityParams,
                window_weights: jnp.ndarray,
                statics: RenderStatics,
                fine: bool,
                n_valid=None) -> jnp.ndarray:
    """VF → σ glue (reference ``VectorFieldNerf.get_density``,
    ``models/nerf/vector_field_nerf.py:442-474``).

    :param normals: (R, S, 3) field samples along rays.
    :param ray_dirs: (R, S, 3) unit ray dirs repeated over samples.
    :param window_weights: (W,) the *annealed* weights — only consulted in
        ``anneal_fine`` mode on the fine pass, per the reference quirk.
    :param n_valid: optional traced live-sample count (static fine-growth
        mode): σ is zeroed from position ``n_valid - 1`` on — the live last
        sample gets the reference's forced σ = 0 and every pad sample
        contributes nothing to the volume rendering.
    :return: (R, S) densities with back-facing suppression and σ_last = 0.
    """
    n_taps = statics.n_window
    if statics.anneal_mode == "anneal_fine" and fine:
        weights = window_weights
    else:
        weights = jnp.full((n_taps,), 1.0 / n_taps, dtype=normals.dtype)

    cos = window_cosine_similarity(normals[:, :-1], normals[:, 1:], weights,
                                   n_valid=n_valid)
    cos_ray = cosine_similarity(normals[:, :-1], ray_dirs[:, :-1])

    sigma = laplace_density(-cos, density_params, statics.beta_bounds,
                            statics.scale_min, statics.mean_bounds,
                            cutoff=statics.cutoff)
    suppress = jnp.logical_and(cos_ray < statics.dir_to_normal_th, cos < 0.0)
    sigma = jnp.where(suppress, 0.0, sigma)
    if n_valid is not None:
        idx = jnp.arange(sigma.shape[1])[None, :]
        sigma = jnp.where(idx >= n_valid - 1, 0.0, sigma)
    # Last sample: cosine treated as 1 → σ = 0 (reference :471-472).
    return jnp.concatenate(
        [sigma, jnp.zeros((sigma.shape[0], 1), sigma.dtype)], axis=-1)


def _weights_from_density(z_vals: jnp.ndarray, sigma: jnp.ndarray,
                          statics: RenderStatics) -> jnp.ndarray:
    if statics.rendering == "volsdf":
        return compositing.volsdf_volume_rendering(
            z_vals, sigma, statics.normalize_rendering)
    return compositing.nerf_volume_rendering(z_vals, sigma,
                                             statics.normalize_rendering)


def render_rays(modules: VFNerfModules,
                variables: Dict[str, Any],
                uv: jnp.ndarray,
                pose: jnp.ndarray,
                intrinsics: jnp.ndarray,
                near: jnp.ndarray,
                far: jnp.ndarray,
                window_weights: jnp.ndarray,
                key: jax.Array,
                statics: RenderStatics,
                n_fine_active=None) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays end to end (reference ``render``, §3.2).

    :param uv: (R, 2) pixels; ``pose`` (R, 4, 4) or (R, 7); ``intrinsics``
        (R, 4, 4); ``near``/``far`` scalars; ``window_weights`` (W,).
    :param n_fine_active: optional traced live fine-sample count ≤
        ``statics.n_fine`` — the static fine-growth mode: one compiled
        program serves every +5 growth stage
        (``train/vector_field_nerf_train.py:146-147``) by padding the fine
        axis to ``max_samples`` and masking the tail (pad depths sort
        beyond ``far``; their σ is zeroed so they carry no rendering
        weight). The returned ``sample_mask`` marks live samples for the
        per-sample loss reductions. Live values are bit-equal to the
        unpadded program when ``perturb=False``; under perturb the jitter
        stream is shaped (R, n_fine) instead of (R, n_active) — same
        distribution, different draws (PARITY.md).
    :return: dict with rgb (R, 3), depth (R,), normals (R, S, 3),
        points (R, S, 3), z_vals (R, S), weights (R, S), sample colors
        (R, S, 3), optional sample_mask (R, S), and optional
        dir_derivative_norms.
    """
    k_coarse, k_fine = jax.random.split(key)
    n_rays = uv.shape[0]
    density_params: DensityParams = variables["params"]["density"]

    directions, ray_dirs, cam_loc = get_ray_directions_and_cam_location(
        uv, pose, intrinsics)

    if n_fine_active is not None:
        n_fine_active = jnp.asarray(n_fine_active, jnp.int32)
        n_valid = statics.n_coarse + n_fine_active

    fast = (statics.fast_eval and not statics.train and
            not statics.compute_dir_derivatives and
            modules.supports_folding())
    if fast:
        vf_w, rn_w = modules.folded_weights(variables)
    # Pallas fast paths (volsdf only — the trained/production rendering mode).
    pallas = fast and statics.pallas_mlp
    pallas_march = (fast and statics.pallas_march and
                    statics.rendering == "volsdf")

    def _march(normals_rs, z_rs, rgb_rs, dparams, fine: bool):
        """Fused window-cos→density→weights→composite (ops/ray_march)."""
        from vf_nerf_tpu.ops.ray_march import fused_ray_march
        n_taps = statics.n_window
        if statics.anneal_mode == "anneal_fine" and fine:
            w = window_weights
        else:
            w = jnp.full((n_taps,), 1.0 / n_taps, dtype=normals_rs.dtype)
        return fused_ray_march(
            normals_rs, ray_dirs, z_rs, rgb_rs, dparams, w,
            beta_bounds=statics.beta_bounds, scale_min=statics.scale_min,
            mean_bounds=statics.mean_bounds, cutoff=statics.cutoff,
            dir_to_normal_th=statics.dir_to_normal_th,
            normalize=statics.normalize_rendering,
            white_background=statics.white_background)

    # ---- coarse pass (gradient-stopped; steers the fine sampler only) ------
    z_coarse = samplers.uniform_z_vals(k_coarse, n_rays, statics.n_coarse,
                                       near, far, perturb=statics.perturb)
    pts_coarse = samplers.points_from_z(cam_loc, directions, z_coarse)
    feat_dim = modules.cfg.vf_net_config.feature_vector_dims
    n_samples = statics.n_coarse + statics.n_fine

    reuse = fast and statics.reuse_coarse
    if fast:
        if reuse:
            # Full VF outputs at the coarse depths — reused in the fine pass.
            vf_out_coarse = modules.vf_apply_folded(
                vf_w, pts_coarse.reshape(-1, 3), use_pallas=pallas)
            normals_coarse = vf_out_coarse[:, :3].reshape(
                n_rays, statics.n_coarse, 3)
        else:
            normals_coarse = modules.vf_apply_folded(
                vf_w, pts_coarse.reshape(-1, 3),
                use_pallas=pallas)[:, :3].reshape(
                    n_rays, statics.n_coarse, 3)
    else:
        def _coarse(variables, pts_flat):
            out = modules.vf_apply(variables, pts_flat, train=statics.train)
            return out[:, :3]

        normals_coarse = jax.lax.stop_gradient(
            _coarse(variables, pts_coarse.reshape(-1, 3))
        ).reshape(n_rays, statics.n_coarse, 3)

    sg_density = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                        density_params)
    if pallas_march:
        _, _, weights_coarse = _march(
            normals_coarse, z_coarse,
            jnp.zeros(normals_coarse.shape, normals_coarse.dtype),
            sg_density, fine=False)
    else:
        dirs_coarse = jnp.repeat(ray_dirs[:, None, :], statics.n_coarse,
                                 axis=1)
        sigma_coarse = get_density(normals_coarse, dirs_coarse, sg_density,
                                   window_weights, statics, fine=False)
        weights_coarse = jax.lax.stop_gradient(
            _weights_from_density(z_coarse, sigma_coarse, statics))

    # ---- fine pass (the trained path) --------------------------------------
    fine_range = modules.cfg.ray_sampler_config.fine_range
    if n_fine_active is not None:
        # Static fine-growth mode needs per-point BN semantics (frozen/eval
        # BN — the production default via the reference's BN quirk): train
        # -mode BN would fold the pad points into the batch statistics. The
        # eval-side reuse/pallas variants render with a fixed fine count.
        assert not statics.train and not reuse and not pallas_march, \
            "n_fine_active requires the standard frozen-BN render path"
    if reuse:
        if statics.n_fine > 0:
            z_extra = samplers.range_fine_extra_z(
                k_fine, z_coarse, weights_coarse, statics.n_fine,
                fine_range=fine_range, near=near, far=far,
                perturb=statics.perturb)
            pts_extra = samplers.points_from_z(cam_loc, directions, z_extra)
            vf_out_extra = modules.vf_apply_folded(
                vf_w, pts_extra.reshape(-1, 3), use_pallas=pallas)
            z_cat = jnp.concatenate([z_coarse, z_extra], axis=-1)
            order = jnp.argsort(z_cat, axis=-1)
            z_vals = jnp.take_along_axis(z_cat, order, axis=-1)
            vf_cat = jnp.concatenate(
                [vf_out_coarse.reshape(n_rays, statics.n_coarse, -1),
                 vf_out_extra.reshape(n_rays, statics.n_fine, -1)], axis=1)
            vf_out = jnp.take_along_axis(vf_cat, order[..., None],
                                         axis=1).reshape(
                                             n_rays * n_samples, -1)
        else:
            z_vals = z_coarse
            vf_out = vf_out_coarse
        points = samplers.points_from_z(cam_loc, directions, z_vals)
        points_flat = points.reshape(-1, 3)
    else:
        if statics.n_fine > 0:
            z_vals = samplers.range_fine_z_vals(
                k_fine, z_coarse, weights_coarse, statics.n_fine,
                fine_range=fine_range, near=near, far=far,
                perturb=statics.perturb, n_active=n_fine_active)
        else:
            z_vals = z_coarse
        points = samplers.points_from_z(cam_loc, directions, z_vals)
        points_flat = points.reshape(-1, 3)
        bn_updates: Dict[str, Any] = {}
        if fast:
            vf_out = modules.vf_apply_folded(vf_w, points_flat,
                                             use_pallas=pallas)
        elif statics.train:
            # Train-mode BN: the fine (primary) pass updates running stats.
            vf_out, vf_stats = modules.vf_apply_mutable(variables,
                                                        points_flat)
            if vf_stats:
                bn_updates["vf"] = vf_stats
        else:
            vf_out = modules.vf_apply(variables, points_flat,
                                      train=statics.train)

    dirs_rep = jnp.repeat(ray_dirs[:, None, :], n_samples, axis=1)
    dirs_flat = dirs_rep.reshape(-1, 3)
    normals_flat = vf_out[:, :3]
    feats_flat = vf_out[:, 3:3 + feat_dim]
    normals = normals_flat.reshape(n_rays, n_samples, 3)

    if fast:
        rgb_samples = modules.render_apply_folded(rn_w, points_flat,
                                                  normals_flat, dirs_flat,
                                                  feats_flat,
                                                  use_pallas=pallas)
    elif statics.train:
        rgb_samples, rn_stats = modules.render_apply_mutable(
            variables, points_flat, normals_flat, dirs_flat, feats_flat)
        if rn_stats:
            bn_updates["render"] = rn_stats
    else:
        rgb_samples = modules.render_apply(variables, points_flat,
                                           normals_flat, dirs_flat,
                                           feats_flat, train=statics.train)
    rgb_samples = rgb_samples.reshape(n_rays, n_samples, 3)

    if pallas_march:
        rgb, depth, weights = _march(normals, z_vals, rgb_samples,
                                     density_params, fine=True)
    else:
        sigma = get_density(normals, dirs_rep, density_params,
                            window_weights, statics, fine=True,
                            n_valid=n_valid if n_fine_active is not None
                            else None)
        weights = _weights_from_density(z_vals, sigma, statics)
        rgb, depth = compositing.composite_rgb_depth(
            weights, rgb_samples, z_vals,
            white_background=statics.white_background)

    out: Dict[str, jnp.ndarray] = {
        "rgb": rgb,
        "depth": depth[:, None],
        "normals": normals,
        "points": points,
        "z_vals": z_vals,
        "weights": weights,
        "sample_colors": rgb_samples,
    }
    if n_fine_active is not None:
        out["sample_mask"] = (jnp.arange(n_samples)[None, :]
                              < n_valid).astype(jnp.float32) \
            * jnp.ones((n_rays, 1), jnp.float32)
    if not fast and statics.train and bn_updates:
        out["batch_stats_updates"] = bn_updates

    if statics.compute_dir_derivatives:
        def apply_fn(p):
            return modules.vf_apply(variables, p, train=statics.train)

        if statics.numerical_jacobian:
            jac = numerical_vf_jacobian(apply_fn, points_flat)
        else:
            jac = vf_jacobian(apply_fn, points_flat)
        dd = directional_derivatives(normals_flat, jac)
        out["dir_derivative_norms"] = jnp.linalg.norm(
            dd.reshape(-1, 3), axis=-1)
    return out


def render_vector_field(modules: VFNerfModules,
                        variables: Dict[str, Any],
                        points: jnp.ndarray,
                        train: bool = False) -> jnp.ndarray:
    """Evaluate the raw vector field at arbitrary points — the mesh-extraction
    entry (reference ``get_vector_field``/``mc_utils.get_set_predictions``).
    Uses the BN-folded fast path at eval."""
    if not train and modules.supports_folding():
        vf_w, _ = modules.folded_weights(variables)
        return modules.vf_apply_folded(vf_w, points)[:, :3]
    return modules.vf_apply(variables, points, train=train)[:, :3]
