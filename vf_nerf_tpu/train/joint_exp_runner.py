"""Joint pose-and-field optimization entry point.

Usage:
    python -m vf_nerf_tpu.train.joint_exp_runner --scene office0 \
        --expname replica --vf_config_path confs/vf_nerf.conf \
        --joint_config_path confs/joint_optimization.conf \
        [--timestamp T --checkpoint latest]
"""

from __future__ import annotations

from vf_nerf_tpu.config.joint_parser import argparser, parse_config
from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner


def main() -> None:
    args = argparser().parse_args()
    config = parse_config(scene=args.scene,
                          vf_config_path=args.vf_config_path,
                          joint_config_path=args.joint_config_path,
                          gpu=args.gpu, expname=args.expname,
                          timestamp=args.timestamp,
                          checkpoint=args.checkpoint,
                          data_root_dir=args.data_root_dir,
                          offline=args.offline)
    runner = JointOptimizationRunner(config)
    runner.train()


if __name__ == "__main__":
    main()
