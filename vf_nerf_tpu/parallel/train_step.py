"""The jitted training step (single-chip and data-parallel).

Mirrors one iteration of the reference trainer
(``train/vector_field_nerf_train.py:161-260``): render a mixed-view ray batch
→ assemble border/centre VF supervision → VFLoss → grads → global-norm clip →
Adam step → per-iteration LR decay. Everything is one pure jitted function of
(TrainState, batch, key, epoch, window_weights) so XLA fuses the whole
pipeline.

Data parallelism (SURVEY.md §5.8): the same jitted function runs SPMD over a
1-D device mesh — the batch is sharded on the ray axis, the state is
replicated, and XLA inserts the gradient ``psum`` over ICI. Because JAX PRNG
bits depend only on (key, shape), the sharded step computes bit-identical
results to the single-device step (verified by
``tests/test_parallel.py``).

TPU-shaped supervision: the reference boolean-gathers border/centre ray
samples (dynamic shapes); here masked (pred, gt, mask) triples keep shapes
static — same loss value (see ``models/loss.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vf_nerf_tpu.config.schema import (VFLossConfig, VFLossWeights,
                                       VFNerfConfig)
from vf_nerf_tpu.models.loss import vf_loss
from vf_nerf_tpu.models.nerf import TrainState
from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,
                                         render_rays)
from vf_nerf_tpu.ops import points as points_ops


@dataclasses.dataclass(frozen=True)
class SupervisionStatics:
    """Static supervision config (trainer ``:180-216``).

    ``n_points`` is the shell-sample count — the reference uses
    ``(rays * samples) // 10``; it is static here because shapes are.
    """

    init_method: str          # "center" or "exterior*" (dataset-provided)
    border_supervision: bool
    center_supervision: bool
    border_radius: float
    n_points: int

    @staticmethod
    def from_config(cfg: VFNerfConfig, init_method: str, n_rays: int,
                    n_samples: int, border_radius: float
                    ) -> "SupervisionStatics":
        return SupervisionStatics(
            init_method=init_method,
            border_supervision=cfg.border_supervision,
            center_supervision=cfg.center_supervision,
            border_radius=border_radius,
            n_points=max((n_rays * n_samples) // 10, 1))


def _supervision_terms(modules: VFNerfModules,
                       variables: Dict[str, Any],
                       out: Dict[str, jnp.ndarray],
                       key: jax.Array,
                       far: jnp.ndarray,
                       centroid: jnp.ndarray,
                       sup: SupervisionStatics,
                       train: bool,
                       n_points_active=None):
    """Border/centre supervision targets (trainer ``:180-216``).

    Static fine-growth mode: ray-sample masks are ANDed with the live
    ``sample_mask`` (pads must not enter the supervision MSE) and the shell
    -sample count — the reference's dynamic ``(rays * samples) // 10`` — is
    enforced by masking the static-size draw down to ``n_points_active``
    rows."""
    terms = []
    radius = sup.border_radius
    k_border, k_center = jax.random.split(key)
    sample_mask = out.get("sample_mask")

    def ray_mask(mask):
        return mask * sample_mask if sample_mask is not None else mask

    def shell_mask(n_rows):
        if n_points_active is None:
            return None
        return (jnp.arange(n_rows) < n_points_active).astype(jnp.float32)

    def vf_normals(pts):
        return modules.vf_apply(variables, pts, train=train)[:, :3]

    if sup.init_method == "center":
        # Ray samples near the border point inward (trainer :181-185)...
        mask, gt = points_ops.border_mask_and_gt(out["points"], far, radius,
                                                 centroid)
        terms.append((out["normals"], gt, ray_mask(mask)))
        # ...plus shell samples in [far/2 - r, far/2] (trainer :186-193).
        pts, gt_s = points_ops.sample_border_points(
            k_border, far / 2.0 - radius, far / 2.0, sup.n_points, centroid)
        terms.append((vf_normals(pts), gt_s, shell_mask(sup.n_points)))
    else:
        if sup.border_supervision:
            # Shell samples in [far - 5r, far] point inward (trainer :197-204).
            pts, gt_s = points_ops.sample_border_points(
                k_border, far - 5.0 * radius, far, sup.n_points, centroid)
            terms.append((vf_normals(pts), gt_s, shell_mask(sup.n_points)))
        if sup.center_supervision:
            # Ray samples near the centroid point outward (trainer :205-209)...
            mask, gt = points_ops.center_mask_and_gt(out["points"], centroid,
                                                     radius)
            terms.append((out["normals"], gt, ray_mask(mask)))
            # ...plus ball samples around the centroid (trainer :210-216).
            pts, gt_s = points_ops.sample_center_points(
                k_center, centroid, radius, sup.n_points)
            terms.append((vf_normals(pts), gt_s, shell_mask(sup.n_points)))
    return terms


METRIC_KEYS = ("loss", "rgb_loss", "depth_loss", "unit_norm_loss",
               "supervision_loss", "norm_smaller_than_one_loss",
               "directional_derivatives_loss")

# Packed ray-batch layout: one (R, 38) f32 host→device transfer per step
# instead of six (each transfer pays the remote-TPU round-trip latency).
_PACK_SLICES = {
    "uv": (0, 2),
    "rgb": (2, 5),
    "depth": (5, 6),
    "intrinsics": (6, 22),
    "pose": (22, 38),
}
PACKED_WIDTH = 38


def pack_batch(batch: Dict[str, Any]) -> "jnp.ndarray":
    """Pack a host ray batch into a single (R, 38) float32 array."""
    import numpy as np
    n = len(batch["uv"])
    out = np.empty((n, PACKED_WIDTH), np.float32)
    for key, (lo, hi) in _PACK_SLICES.items():
        out[:, lo:hi] = np.asarray(batch[key]).reshape(n, hi - lo)
    return out


def unpack_batch(packed: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    n = packed.shape[0]
    out: Dict[str, jnp.ndarray] = {}
    for key, (lo, hi) in _PACK_SLICES.items():
        arr = packed[:, lo:hi]
        if key in ("intrinsics", "pose"):
            arr = arr.reshape(n, 4, 4)
        out[key] = arr
    return out


def zero_metric_sums() -> Dict[str, jnp.ndarray]:
    """Initial on-device metric accumulator for one epoch."""
    return {k: jnp.zeros((), jnp.float32) for k in METRIC_KEYS}


# Compact packed layout for mixed-view batches: per-ray pose/intrinsics are
# per-VIEW constants, so the span path ships a (R, 7) array + a one-time
# device-resident pose table instead of (R, 38) — 5.4× less host→device
# traffic on the relay (the ray-batch transfer is the dominant per-dispatch
# cost once metadata is packed).
COMPACT_WIDTH = 7  # uv(2) rgb(3) depth(1) view_idx(1)


def pack_batch_compact(batch: Dict[str, Any]) -> "jnp.ndarray":
    """Pack a mixed-view host ray batch into a single (R, 7) float32 array
    (requires the ``view_idx`` key; poses/intrinsics travel separately as
    per-view tables)."""
    import numpy as np
    n = len(batch["uv"])
    out = np.empty((n, COMPACT_WIDTH), np.float32)
    out[:, 0:2] = np.asarray(batch["uv"]).reshape(n, 2)
    out[:, 2:5] = np.asarray(batch["rgb"]).reshape(n, 3)
    out[:, 5:6] = np.asarray(batch["depth"]).reshape(n, 1)
    out[:, 6] = np.asarray(batch["view_idx"], np.float32)
    return out


def unpack_batch_compact(packed: jnp.ndarray, pose_table: jnp.ndarray,
                         intrinsics: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Rebuild the per-ray batch dict on device: per-ray pose is a gather
    from the (V, 4, 4) pose table (bit-identical values to the host-side
    broadcast the legacy (R, 38) layout shipped)."""
    n = packed.shape[0]
    view_idx = packed[:, 6].astype(jnp.int32)
    return {"uv": packed[:, 0:2],
            "rgb": packed[:, 2:5],
            "depth": packed[:, 5:6],
            "pose": pose_table[view_idx],
            "intrinsics": jnp.broadcast_to(intrinsics, (n, 4, 4))}


def make_loss_fn(modules: VFNerfModules,
                 statics: RenderStatics,
                 sup: SupervisionStatics,
                 loss_weights: VFLossWeights,
                 loss_config: VFLossConfig):
    """The exact per-step loss closure the train step differentiates,
    exported standalone for FLOP attribution
    (``tools/train_throughput.py --attribution``): lowering this (and its
    ``value_and_grad``) yields forward / forward+backward budgets with the
    same semantics as the compiled step — supervision terms, BN mode
    quirk, static fine masking and all."""

    def loss_fn(params, batch_stats, batch, k_render, k_sup, epoch,
                window_weights, near, far, centroid,
                n_fine_active=None, n_points_active=None):
        variables = {"params": params, "batch_stats": batch_stats}
        out = render_rays(modules, variables, batch["uv"], batch["pose"],
                          batch["intrinsics"], near, far, window_weights,
                          k_render, statics, n_fine_active=n_fine_active)
        terms = _supervision_terms(modules, variables, out, k_sup, far,
                                   centroid, sup, statics.train,
                                   n_points_active=n_points_active)
        predictions = {
            "rgb": out["rgb"],
            "depth": out["depth"],
            "normals": out["normals"].reshape(-1, 3),
        }
        if "sample_mask" in out:
            predictions["sample_mask"] = out["sample_mask"].reshape(-1)
        if "dir_derivative_norms" in out:
            predictions["dir_derivative_norms"] = \
                out["dir_derivative_norms"]
        ground_truth = {"rgb": batch["rgb"], "depth": batch.get("depth")}
        total, parts = vf_loss(predictions, ground_truth, terms,
                               loss_weights, loss_config, epoch)
        return total, (parts, out.get("batch_stats_updates"))

    return loss_fn


def _remat_wrap(loss_fn, remat: str):
    """Optionally rematerialize the loss closure's backward pass.

    The compiled step is HBM-roofline-bound, not MXU-bound
    (``results/train_flop_attribution_r5.json``): the residual
    activations of fwd+bwd over (rays × samples × width) dominate the
    26.5 GB/step byte budget while the MXU sits at ~22% utilization.
    ``jax.checkpoint`` trades recompute FLOPs (cheap here) for those
    bytes. Gradients are mathematically identical (same program,
    recomputed); "dots" keeps matmul outputs resident and recomputes
    only the cheap elementwise chains between them."""
    if remat == "none":
        return loss_fn
    if remat == "full":
        return jax.checkpoint(loss_fn)
    if remat == "dots":
        return jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f"unknown train_remat mode: {remat!r} "
                     "(expected 'none' | 'full' | 'dots')")


def _train_step_body(modules: VFNerfModules,
                     optimizer: optax.GradientTransformation,
                     statics: RenderStatics,
                     sup: SupervisionStatics,
                     loss_weights: VFLossWeights,
                     loss_config: VFLossConfig,
                     remat: str = "none"):
    """The un-jitted single-step body shared by :func:`make_train_step`
    (one dispatch per step) and :func:`make_scan_train_step` (one dispatch
    per K steps via ``lax.scan``)."""

    def step(state: TrainState,
             metric_sums: Dict[str, jnp.ndarray],
             batch,
             base_key: jax.Array,
             epoch: jnp.ndarray,
             window_weights: jnp.ndarray,
             near: jnp.ndarray,
             far: jnp.ndarray,
             centroid: jnp.ndarray,
             n_fine_active=None
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if not isinstance(batch, dict):
            batch = unpack_batch(batch)  # packed (R, 38) single-transfer form
        key = jax.random.fold_in(base_key, state.step)
        k_render, k_sup = jax.random.split(key)
        if n_fine_active is None:
            n_points_active = None
        else:
            # The reference sizes the shell draw from the LIVE sample count
            # ((rays * samples) // 10, trainer :186); with the static draw
            # the excess rows are masked out of the MSE.
            n_rays = batch["uv"].shape[0]
            n_points_active = jnp.maximum(
                (n_rays * (statics.n_coarse + n_fine_active)) // 10, 1)

        shared_loss = make_loss_fn(modules, statics, sup, loss_weights,
                                   loss_config)

        def loss_fn(params):
            return shared_loss(params, state.batch_stats, batch, k_render,
                               k_sup, epoch, window_weights, near, far,
                               centroid, n_fine_active=n_fine_active,
                               n_points_active=n_points_active)

        (loss, (parts, bn_updates)), grads = jax.value_and_grad(
            _remat_wrap(loss_fn, remat), has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        # Train-mode BN running-stat updates from the fine pass (reference
        # BN momentum semantics; only present when statics.train).
        new_batch_stats = state.batch_stats
        if bn_updates:
            new_batch_stats = {**state.batch_stats, **bn_updates}
        new_state = state.replace(params=new_params,
                                  opt_state=new_opt_state,
                                  batch_stats=new_batch_stats,
                                  step=state.step + 1)
        metrics = dict(parts)
        metrics["loss"] = loss
        new_sums = {k: metric_sums[k] + metrics[k] for k in METRIC_KEYS}
        return new_state, new_sums

    return step


def make_train_step(modules: VFNerfModules,
                    optimizer: optax.GradientTransformation,
                    statics: RenderStatics,
                    sup: SupervisionStatics,
                    loss_weights: VFLossWeights,
                    loss_config: VFLossConfig,
                    remat: str = "none"
                    ) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. Donates the state + metric-sum buffers
    (in-place update on device; no HBM copy per step).

    Remote-TPU-shaped: everything per-step happens inside the one compiled
    call — the PRNG key is derived on device (``fold_in(base_key, step)``)
    and the per-term metrics accumulate into a donated on-device sum tree —
    so the host's per-step work is one dispatch plus the batch feed; scalars
    are fetched once per epoch (host↔device round-trips through a
    remote-attached TPU cost ~50-100 ms each)."""
    step = _train_step_body(modules, optimizer, statics, sup, loss_weights,
                            loss_config, remat=remat)
    return jax.jit(step, donate_argnums=(0, 1))


def make_scan_train_step(modules: VFNerfModules,
                         optimizer: optax.GradientTransformation,
                         statics: RenderStatics,
                         sup: SupervisionStatics,
                         loss_weights: VFLossWeights,
                         loss_config: VFLossConfig,
                         remat: str = "none"
                         ) -> Callable[..., Tuple[TrainState,
                                                  Dict[str, jnp.ndarray]]]:
    """K train steps per dispatch: ``lax.scan`` of the step body over a
    stacked (K, R, 38) batch tensor.

    On a remote-attached TPU each dispatch costs milliseconds of host↔relay
    latency; scanning a whole epoch on device amortizes that to one dispatch
    (measured: sustained runner throughput ≈ the pure-step rate, see
    PARITY.md). Semantics are bit-identical to K sequential step calls —
    the per-step PRNG key still folds in ``state.step``, metric sums still
    accumulate, the per-iteration LR decay still advances with the
    optimizer count (pinned by ``tests/test_train_step.py``)."""
    step = _train_step_body(modules, optimizer, statics, sup, loss_weights,
                            loss_config, remat=remat)

    def scan_step(state: TrainState,
                  metric_sums: Dict[str, jnp.ndarray],
                  batches: jnp.ndarray,
                  base_key: jax.Array,
                  epoch: jnp.ndarray,
                  window_weights: jnp.ndarray,
                  near: jnp.ndarray,
                  far: jnp.ndarray,
                  centroid: jnp.ndarray,
                  n_fine_active=None
                  ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(carry, batch):
            s, m = carry
            s, m = step(s, m, batch, base_key, epoch, window_weights, near,
                        far, centroid, n_fine_active)
            return (s, m), None

        (state, metric_sums), _ = jax.lax.scan(body, (state, metric_sums),
                                               batches)
        return state, metric_sums

    return jax.jit(scan_step, donate_argnums=(0, 1))


# Density scalars appended to the span step's per-step metric rows (the
# reference logs β/scale/mean per epoch, trainer :286-288; the span fetch
# takes each epoch's last row).
SPAN_METRIC_KEYS = METRIC_KEYS + ("beta", "scale", "mean")


def make_span_scan_step(modules: VFNerfModules,
                        optimizer: optax.GradientTransformation,
                        statics: RenderStatics,
                        sup: SupervisionStatics,
                        loss_weights: VFLossWeights,
                        loss_config: VFLossConfig,
                        masked_fine: bool,
                        compact: bool = False,
                        remat: str = "none"
                        ) -> Callable[..., Tuple[TrainState, jnp.ndarray]]:
    """K train steps per dispatch **spanning epoch boundaries**.

    The single-epoch scan step still pays one host↔device round-trip per
    epoch — at reference-like 8-step epochs that latency is ~30% of the
    epoch (measured 38.6k vs 55k rays/s pure). Here the per-step
    ``(epoch, window_weights[, n_fine_active])`` ride the scan as xs, so
    one dispatch can cover many epochs: the epoch-gated losses, the
    annealing window and the static-fine live count all switch mid-scan
    exactly where the host loop would have switched them. Per-step metrics
    come back as one stacked (K, len(SPAN_METRIC_KEYS)) array — the host
    averages per epoch, so the logged values are identical to the
    per-epoch path.

    Semantics: bit-identical to K sequential ``make_train_step`` calls
    with the same per-step arguments — ``base_keys`` carries the per-epoch
    base key each step would have received from the per-epoch loop (the
    runner draws one ``_next_key()`` per epoch in the same order), the
    PRNG key still folds in ``state.step``, and the per-iteration LR decay
    advances with the optimizer count."""
    from vf_nerf_tpu.ops.density import get_beta, get_mean, get_scale

    step = _train_step_body(modules, optimizer, statics, sup, loss_weights,
                            loss_config, remat=remat)

    def span_step(state: TrainState,
                  batches: jnp.ndarray,
                  aux: jnp.ndarray,         # (K, 4 + W) packed metadata
                  near: jnp.ndarray,
                  far: jnp.ndarray,
                  centroid: jnp.ndarray,
                  pose_table: jnp.ndarray = None,
                  intrinsics: jnp.ndarray = None
                  ) -> Tuple[TrainState, jnp.ndarray]:
        # One small f32 transfer carries ALL per-step metadata (each extra
        # host→device transfer costs a relay round-trip — measured
        # ~8 ms/step of pure transfer overhead with separate arrays):
        # col 0 epoch, col 1 live fine count, cols 2:4 PRNG key bits
        # (bitcast), cols 4: window weights. See pack_span_aux.
        epochs = aux[:, 0].astype(jnp.int32)
        n_fines = aux[:, 1].astype(jnp.int32)
        base_keys = jax.lax.bitcast_convert_type(aux[:, 2:4], jnp.uint32)
        windows = aux[:, 4:]

        def body(carry, xs):
            batch, base_key, epoch, window, n_fine = xs
            if compact:
                batch = unpack_batch_compact(batch, pose_table, intrinsics)
            s, m = step(carry, zero_metric_sums(), batch, base_key, epoch,
                        window, near, far, centroid,
                        n_fine if masked_fine else None)
            d = s.params["density"]
            dens = (get_beta(d, statics.beta_bounds),
                    get_scale(d, statics.scale_min),
                    get_mean(d, statics.mean_bounds))
            return s, jnp.stack([m[k] for k in METRIC_KEYS] + list(dens))

        state, metrics = jax.lax.scan(
            body, state, (batches, base_keys, epochs, windows, n_fines))
        return state, metrics

    return jax.jit(span_step, donate_argnums=(0,))


def pack_span_aux(epochs, fines, keys, windows) -> "jnp.ndarray":
    """Pack per-step (epoch, fine, key, window) into one (K, 4 + W) f32
    host array for a single transfer; epochs/fines are exact as f32
    (< 2^24), key bits ride as bitcast f32."""
    import numpy as np
    k = len(epochs)
    windows = np.asarray(windows, np.float32)
    aux = np.empty((k, 4 + windows.shape[1]), np.float32)
    aux[:, 0] = np.asarray(epochs, np.float32)
    aux[:, 1] = np.asarray(fines, np.float32)
    aux[:, 2:4] = np.asarray(keys, np.uint32).view(np.float32)
    aux[:, 4:] = windows
    return aux
