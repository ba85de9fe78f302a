"""Joint pose-and-field optimization config.

Reference: ``config_parser/joint_opt_config.py:9-29`` +
``joint_opt_config_parser.py:13-65``. The reference ships the config contract
and the facade support surface (``get_colors`` / ``get_weights_and_color`` /
``get_dominant_bases``) but **no trainer** and no
``confs/joint_optimization.conf`` (SURVEY.md C24); the stage itself is
designed in ``train/joint_runner.py`` from this contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from vf_nerf_tpu.config.schema import VFRunnerConfig


@dataclass
class TrainConfig:
    """Stage schedule (reference ``joint_opt_config.py:9-18``)."""

    initial_training_epochs: int
    supervised_vf_epochs: int
    joint_epochs: int
    supervise_every: int
    supervision_epochs: int
    refinement_init_lr: float = 1e-4
    reset_scheduler: bool = False

    # Trainer-design extensions beyond the reference contract (the reference
    # ships no trainer — SURVEY.md C24). Standard pose-refinement schedule:
    # poses move faster than the field, and optionally align against a
    # frozen field first (the field otherwise absorbs the miscalibration
    # before the poses can recover — measured in the efficacy study,
    # results/joint_efficacy_r4.json).
    pose_lr: float = 0.0          # 0 → refinement_init_lr
    pose_only_epochs: int = 0     # first K joint epochs: field frozen
    # Pose-LR decay over the pose-only warmup: final/initial ratio (1.0 =
    # constant). A constant 1e-2 adam on the 7-d poses is stable for ~100
    # warmup epochs but DIVERGES when the warmup is stretched (measured:
    # 300 pose-only epochs → rot error 1.5°→16.8°, the poses orbit the
    # optimum at a step size the sharpening loss landscape no longer
    # tolerates). The decay anneals the step size toward the floor
    # ``pose_lr * pose_lr_decay``, which the post-warmup phase then uses.
    pose_lr_decay: float = 1.0
    # Gauge anchor (r5): a photometric joint stage observes poses only up
    # to a global similarity — the unfrozen field absorbs any common
    # drift, so per-pose translation error vs GT can GROW while the
    # relative configuration converges (the r4 efficacy run: raw trans
    # 0.020→0.043 alongside rot 1.5°→0.157°). Anchoring zeroes pose 0's
    # gradient, pinning the gauge to that camera's frame — the standard
    # fix-one-camera normalization.
    anchor_first_pose: bool = False


@dataclass
class JointOptimizationConfig:
    """Reference ``joint_opt_config.py:21-29``."""

    vf_config: VFRunnerConfig
    train_config: TrainConfig

    save_frequency: int
    num_bases: int
    decimation: float
    self_supervise: bool
