"""Config subsystem: HOCON parser + dataclasses + CLI (reference: config_parser/)."""

from vf_nerf_tpu.config.parser import argparser, eval_argparser, parse_config
from vf_nerf_tpu.config.schema import (DatasetConfig, DensityConfig,
                                       DeviceConfig, RaySamplerConfig,
                                       RenderingNetConfig, SchedulerConfig,
                                       VFLossConfig, VFLossWeights,
                                       VFNerfConfig, VFNetConfig,
                                       VFRunnerConfig,
                                       VFSupervisedLossWeights)
