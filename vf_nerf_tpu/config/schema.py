"""Config dataclasses.

Mirrors the reference config contract (``config_parser/vf_nerf_config.py:10-209``)
so that the same ``confs/vf_nerf.conf`` HOCON files drive both codebases. The
torch-specific ``CudaConfig`` is replaced by a JAX ``DeviceConfig`` (platform +
data-parallel mesh size); everything else keeps the reference field names so
HOCON sections map 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DensityConfig:
    """Laplace density params (reference ``vf_nerf_config.py:10-24``)."""

    beta_bounds: List[float] = field(default_factory=lambda: [1e-4, 1e9])
    mean_bounds: List[float] = field(default_factory=lambda: [0.6, 1.0])
    scale_min: float = 0.1
    params_init: Dict[str, float] = field(
        default_factory=lambda: {"beta": 0.5, "mean": 0.7, "scale": 100.0})
    cutoff: float = -0.5

    def todict(self) -> Dict[str, Any]:
        return {
            "beta_bounds": self.beta_bounds,
            "mean_bounds": self.mean_bounds,
            "scale_min": self.scale_min,
            "params_init": self.params_init,
        }


@dataclass
class VFNetConfig:
    """Vector-field MLP config (reference ``vf_nerf_config.py:27-44``)."""

    input_dims: int
    output_dims: int
    dimensions: List[int]
    feature_vector_dims: int = 0
    embedder_multires: int = 0
    weight_norm: bool = True
    batch_norm: bool = True
    skip_connection_in: Optional[List[int]] = None
    bias_init: float = 0.0
    dropout: bool = True
    dropout_probability: float = 0.0
    xavier_init: bool = True
    init: str = "center"

    def __post_init__(self) -> None:
        valid = self.init in ("center", "exterior", "") or "exterior" in self.init
        if not valid:
            raise ValueError("init must be one of [center, exterior, ''] "
                             "or contain 'exterior'")


@dataclass
class RenderingNetConfig:
    """Color MLP config (reference ``vf_nerf_config.py:47-59``)."""

    output_dims: int
    dimensions: List[int]
    feature_vector_dims: int = 0
    weight_norm: bool = False
    batch_norm: bool = True
    mode: str = "idr"
    embedder_multires: int = 0
    detach_normals: bool = False

    def __post_init__(self) -> None:
        if self.mode not in ("idr", "no_view_dir", "no_normals"):
            raise ValueError(f"Invalid rendering mode: {self.mode}")


@dataclass
class RaySamplerConfig:
    """Ray sampler config (reference ``vf_nerf_config.py:62-78``)."""

    n_samples: int = 64
    n_importance: int = 64
    rays_per_batch: int = 1024
    perturb: bool = True
    near: float = 0.0
    far: float = 1.0
    fine_range: float = 0.5
    increase_every: int = 100
    max_samples: int = 100

    def fine_sampling(self) -> bool:
        return self.n_importance > 0


@dataclass
class DeviceConfig:
    """JAX device/mesh config (replaces the reference's ``CudaConfig``,
    ``vf_nerf_config.py:81-87``). ``num_devices`` is the size of the data
    mesh axis used for ray sharding; 0 means "all local devices"."""

    platform: str = ""        # "" = default JAX platform
    num_devices: int = 0
    # Train steps fused into one device dispatch via lax.scan (0 = whole
    # epoch). Amortizes the per-dispatch host↔device latency of
    # remote-attached TPUs; semantics are bit-identical to per-step
    # dispatch (parallel/train_step.make_scan_train_step).
    steps_per_dispatch: int = 64
    # Static fine-growth: pad the fine-sample axis to max_samples and mask
    # the tail so ONE compiled program serves every +5 growth stage
    # (instead of one re-jit — minutes of server-side compile through the
    # axon relay — per stage, ×15 over a full run). Bit-equal to the
    # growing-shape program when perturb=False; under perturb the RNG
    # streams are shaped by the static width — same distribution,
    # different draws (PARITY.md).
    static_fine_growth: bool = False
    # MLP matmul/activation compute precision ("float32" | "bfloat16").
    # Params stay float32 either way (flax mixed precision). Measured on
    # v5e (PARITY.md serving sweep): bf16 is throughput-NEUTRAL at these
    # shapes — XLA's default TPU matmul precision already runs f32 matmuls
    # through the MXU's bf16 path, and the residual ceiling is dtype-
    # independent per-sample work — so float32 (bit-level reference
    # parity) is the right default everywhere.
    compute_dtype: str = "float32"
    # Gradient rematerialization for the train step's loss closure
    # ("none" | "full" | "dots"). The step is HBM-roofline-bound
    # (results/train_flop_attribution_r5.json: 26.5 GB/step vs 1.22
    # TFLOP at 22% MXU utilization), so trading recompute FLOPs for
    # stored-activation bytes is the only remaining headroom direction.
    # "full" = jax.checkpoint(loss) saving nothing; "dots" = save matmul
    # outputs only (jax.checkpoint_policies.dots_with_no_batch_dims_
    # saveable). Gradients are exact either way (same math, recomputed);
    # default "none" keeps the bit-level reference-parity path.
    train_remat: str = "none"


@dataclass
class SchedulerConfig:
    """Optimizer/schedule config (reference ``vf_nerf_config.py:90-96``)."""

    lr: float = 1e-3
    lr_decay_factor: float = 0.5
    lr_decay_steps: int = 50000
    clip_norm: float = 0.5
    weight_decay: float = 0.0


@dataclass
class VFNerfConfig:
    """Model facade config (reference ``vf_nerf_config.py:99-132``)."""

    vf_net_config: VFNetConfig
    rendering_net_config: RenderingNetConfig
    ray_sampler_config: RaySamplerConfig
    device_config: DeviceConfig
    scheduler_config: SchedulerConfig
    density_config: DensityConfig

    cos_sim_weights: Tuple[float, ...]
    cos_sim_weights_anneal: str
    anneal_start: int
    anneal_end: int

    rendering: str
    normalize_rendering: bool
    dir_to_normal_th: float = -2.0
    numerical_jacobian: bool = False
    border_supervision: bool = True
    center_supervision: bool = True

    def __post_init__(self) -> None:
        if self.cos_sim_weights_anneal not in ("none", "hard", "soft",
                                               "anneal_fine"):
            raise ValueError(
                f"Invalid cos_sim_weights_anneal: {self.cos_sim_weights_anneal}")
        if self.rendering not in ("nerf", "volsdf"):
            raise ValueError(f"Invalid rendering: {self.rendering}")
        self.cos_sim_weights = tuple(float(w) for w in self.cos_sim_weights)

    def cos_sim_weights_dict(self) -> Dict[str, float]:
        """Per-tap window weights for logging (reference
        ``vf_nerf_config.py:127-132``)."""
        return {f"w_{i}": float(w) for i, w in enumerate(self.cos_sim_weights)}


@dataclass
class VFLossWeights:
    """Loss term weights (reference ``vf_nerf_config.py:135-142``)."""

    rgb: float
    depth: float
    unit_norm: float
    supervision: float
    norm_smaller_than_one: float
    directional_derivatives: float


@dataclass
class VFLossConfig:
    """Loss gates/clamps (reference ``vf_nerf_config.py:145-149``)."""

    norm_smaller_than_one_start: int
    depth_loss_clamp: float
    directional_derivatives_start: int = 100
    # Invalid-depth semantics (r5): the reference's depth L1 has NO
    # validity mask (``models/losses/vf_loss.py:28-29,48``) — a sensor
    # hole (depth 0) contributes |pred - 0| clamped at depth_loss_clamp,
    # i.e. a constant-magnitude pull toward the camera; raising the clamp
    # (the occluder-recovery knob) amplifies it. Default False reproduces
    # that; True excludes gt_depth <= 0 pixels from the depth-loss mean
    # (the corruption study's mitigation knob).
    mask_invalid_depth: bool = False


@dataclass
class VFSupervisedLossWeights:
    """Joint-optimization supervised loss weights (reference
    ``vf_nerf_config.py:152-162``)."""

    surface: float
    non_surface: float
    supervision: float
    rgb: float
    depth: float
    unit_norm: float
    similarity: float
    colors: float = 0.0
    directional_derivatives: float = 0.0


@dataclass
class DatasetConfig:
    """Dataset config (reference ``vf_nerf_config.py:165-182``)."""

    dataset_name: str
    data_dir: str
    shuffle_views: bool
    pixels_per_batch: int
    scene: str
    data_root_dir: str
    all_pixels: bool = False
    factor: int = 20
    white_bkgd: bool = False
    split: str = "train"
    precrop_epochs: int = -10
    precrop_frac: float = 0.5
    far_per_ray: bool = False
    random_img_sampling: bool = False
    border_radius: float = 0.3
    crop_edge: int = 10


@dataclass
class VFRunnerConfig:
    """Top-level runner config (reference ``vf_nerf_config.py:185-209``)."""

    dataset_config: DatasetConfig
    vf_nerf_config: VFNerfConfig
    vf_loss_weights: VFLossWeights
    vf_loss_config: VFLossConfig
    num_epochs: int
    save_frequency: int
    wandb_frequency: int
    timestamp: str = ""
    checkpoint: str = ""

    supervised_loss_weights: Optional[VFSupervisedLossWeights] = None

    exps_folder: str = "exps_vf_nerf"
    config_path: str = "confs/vf_nerf.conf"

    wandb_project: str = "vf_nerf"

    start_epoch: int = 0
    expname: str = ""

    offline: bool = False

    # Non-convergence gate (PARITY.md protocol, automated): if > 0 and the
    # final train loss exceeds it, the runner flags the run in its log and
    # in <run_dir>/convergence.json and recommends re-seeding. Typically set
    # to 1.2× a cohort median (tools/convergence_variance.py computes the
    # cohort form automatically).
    convergence_loss_threshold: float = 0.0


def asdict_config(cfg: Any) -> Any:
    """Recursively convert a config dataclass tree to plain dicts for logging."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: asdict_config(getattr(cfg, f.name))
                for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [asdict_config(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: asdict_config(v) for k, v in cfg.items()}
    return cfg
