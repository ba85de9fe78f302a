"""Training entry point.

Reference: ``train/vf_nerf_exp_runner.py:10-21`` — parse args →
``parse_config`` → runner → ``train()``. Usage:

    python -m vf_nerf_tpu.train.exp_runner --scene office0 --expname replica \
        --config_path confs/vf_nerf.conf [--timestamp T --checkpoint latest]
"""

from __future__ import annotations

from vf_nerf_tpu.config.parser import argparser, parse_config
from vf_nerf_tpu.train.runner import VectorFieldNerfRunner


def main() -> None:
    args = argparser().parse_args()
    config = parse_config(scene=args.scene, config_path=args.config_path,
                          gpu=args.gpu, expname=args.expname,
                          timestamp=args.timestamp,
                          checkpoint=args.checkpoint,
                          data_root_dir=args.data_root_dir,
                          offline=args.offline)
    runner = VectorFieldNerfRunner(config)
    runner.train()


if __name__ == "__main__":
    main()
