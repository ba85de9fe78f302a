"""Measure the reference implementation's render throughput on this host.

BASELINE.md: the reference publishes no numbers, so the bar is *measured* —
run the reference render workload (1024-ray chunks, 100 coarse + 30 fine
samples, full nets, eval mode; ``confs/vf_nerf.conf:39-49``) and record
rays/sec. The reference is torch; this image has CPU torch only, so the
recorded baseline is reference-on-host-CPU (noted in the output). Writes
``BASELINE_MEASURED.json`` at the repo root for ``bench.py``'s
``vs_baseline``.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("VFNERF_REFERENCE_PATH", "/root/reference")
sys.path.insert(0, REFERENCE)

import numpy as np
import torch


def main() -> None:
    torch.set_num_threads(os.cpu_count() or 1)
    from config_parser.vf_nerf_config import (CudaConfig, DensityConfig,
                                              RaySamplerConfig,
                                              RenderingNetConfig,
                                              SchedulerConfig, VFNerfConfig,
                                              VFNetConfig)
    from models.nerf.vector_field_nerf import VectorFieldNerf

    cfg = VFNerfConfig(
        vf_net_config=VFNetConfig(
            input_dims=3, output_dims=3, dimensions=[256] * 8,
            feature_vector_dims=256, embedder_multires=6, weight_norm=False,
            batch_norm=True, skip_connection_in=[4], bias_init=0.0,
            dropout=False, dropout_probability=0.2, xavier_init=False,
            init=""),
        rendering_net_config=RenderingNetConfig(
            output_dims=3, dimensions=[256] * 4, feature_vector_dims=256,
            weight_norm=False, batch_norm=True, mode="idr",
            embedder_multires=4, detach_normals=True),
        ray_sampler_config=RaySamplerConfig(
            n_samples=100, n_importance=30, rays_per_batch=1024,
            perturb=False, near=0.0, far=4.0, fine_range=0.3,
            increase_every=50, max_samples=100),
        cuda_config=CudaConfig(device=torch.device("cpu"), num_gpus=0),
        scheduler_config=SchedulerConfig(lr=5e-4, lr_decay_factor=0.1,
                                         lr_decay_steps=1000, clip_norm=0.5),
        density_config=DensityConfig(
            beta_bounds=[1e-4, 1e9], mean_bounds=[0.6, 1.0], scale_min=1.0,
            params_init={"beta": 0.5, "mean": 0.7, "scale": 100.0},
            cutoff=-2.0),
        cos_sim_weights=[0.09] * 11,
        cos_sim_weights_anneal="hard", anneal_start=700, anneal_end=1400,
        rendering="volsdf", normalize_rendering=True, dir_to_normal_th=-2.0,
        numerical_jacobian=False)

    model = VectorFieldNerf(cfg)
    model.eval()

    n_rays = 1024
    rng = np.random.RandomState(0)
    pixels = torch.from_numpy(
        rng.uniform(0, 640, (n_rays, 2)).astype(np.float32))
    pose = torch.eye(4).repeat(n_rays, 1, 1)
    intr = torch.eye(4).repeat(n_rays, 1, 1)
    intr[:, 0, 0] = intr[:, 1, 1] = 600.0
    intr[:, 0, 2], intr[:, 1, 2] = 320.0, 240.0

    with torch.no_grad():
        model.render(pose, pixels, intr, epoch=0)  # warmup
        n_iters = 5
        start = time.perf_counter()
        for _ in range(n_iters):
            model.render(pose, pixels, intr, epoch=0)
        elapsed = time.perf_counter() - start

    rays_per_sec = n_rays * n_iters / elapsed
    payload = {
        "metric": "rays/sec (render, 1024-ray chunks, 100+30 samples)",
        "reference_rays_per_sec": rays_per_sec,
        "hardware": f"host CPU ({os.cpu_count()} threads, torch "
                     f"{torch.__version__})",
        "note": "reference is CUDA/torch; this image has CPU torch only — "
                "the baseline is reference-on-host-CPU",
        "n_rays": n_rays, "iters": n_iters, "elapsed_s": elapsed,
    }
    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
