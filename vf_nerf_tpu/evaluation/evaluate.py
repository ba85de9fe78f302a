"""Evaluation entry point.

Reference: ``evaluation/evaluate.py:14-159``. Same dispatch surface:
``marching-cubes-mesh`` (plain/smoothed/smoothed-after),
``quadrant-marching-cubes-mesh`` (same trio), ``plot-2d-slices``,
``plot-overall-scene``, ``plot-3d-slices``, ``render-images``, ``metrics``,
``tsdf-mesh``, ``3d-metrics``, ``all``. Eval forces ``perturb=False`` and
``dir_to_normal_th=-0.2`` (reference ``:30-32``) and re-grows the fine sample
count from the checkpoint epoch (``:37-41``). Output tree:
``<eval_folder>/<expname>/<timestamp>_<checkpoint>/``.
"""

from __future__ import annotations

import os

import jax

from vf_nerf_tpu.config.parser import eval_argparser, parse_config
from vf_nerf_tpu.config.schema import VFRunnerConfig
from vf_nerf_tpu.datasets import dataset_dict
from vf_nerf_tpu.evaluation import methods
from vf_nerf_tpu.models.nerf import VectorFieldNerf
from vf_nerf_tpu.utils import io as io_utils


def evaluate(config: VFRunnerConfig, method: str, resolution: int,
             eval_root_folder: str, chunk_size: int,
             distance_thresh: float, num_quadrants: int) -> None:
    path_to_model = os.path.join(config.exps_folder, config.expname,
                                 config.timestamp, "checkpoints", "vf_nerf",
                                 f"{config.checkpoint}.ckpt")
    # Deterministic sampling + eval-time suppression threshold (:30-32).
    config.vf_nerf_config.ray_sampler_config.perturb = False
    config.vf_nerf_config.dir_to_normal_th = -0.2

    model = VectorFieldNerf(config.vf_nerf_config)
    epoch = model.load(path_to_model)
    rs = config.vf_nerf_config.ray_sampler_config
    if rs.fine_sampling():
        model.fine_n_samples = min(
            model.fine_n_samples + 5 * (epoch // rs.increase_every),
            rs.max_samples)
        print(f"Fine sampler N_samples: {model.fine_n_samples}")

    io_utils.mkdir_ifnotexists(eval_root_folder)
    eval_folder = os.path.join(eval_root_folder, config.expname)
    io_utils.mkdir_ifnotexists(eval_folder)
    eval_folder = os.path.join(eval_folder,
                               f"{config.timestamp}_{config.checkpoint}")
    io_utils.mkdir_ifnotexists(eval_folder)

    model.eval()
    if len(jax.devices()) > 1:
        # Shard render chunks over all chips (SURVEY §5.8); bit-equal to
        # single-device rendering, so it is always safe to enable.
        model.enable_mesh_eval()
    print("Evaluating the model.")

    if method in ("marching-cubes-mesh", "all"):
        dataset = dataset_dict[config.dataset_config.dataset_name](
            config.dataset_config)
        for subdir, smooth_all, smooth_after in (
                ("mesh", False, False),
                ("mesh-smoothed", True, False),
                ("mesh-smoothed-after", False, True)):
            methods.marching_cubes_mesh(
                model, resolution, os.path.join(eval_folder, subdir),
                config.checkpoint, scale=dataset.scale, max_batch=100000,
                centroid=dataset.get_centroid(), smooth_after=smooth_after,
                smooth_all=smooth_all)
    if method in ("quadrant-marching-cubes-mesh", "all"):
        dataset = dataset_dict[config.dataset_config.dataset_name](
            config.dataset_config)
        for subdir, smooth_all, smooth_after in (
                ("merged-mesh", False, False),
                ("merged-mesh-smoothed", True, False),
                ("merged-mesh-smoothed-after", False, True)):
            methods.quadrant_marching_cubes(
                model, resolution, os.path.join(eval_folder, subdir),
                config.checkpoint, scale=dataset.scale, max_batch=100000,
                centroid=dataset.get_centroid(),
                num_quadrants=num_quadrants, smooth_after=smooth_after,
                smooth_all=smooth_all)
    if method in ("plot-2d-slices", "all"):
        from vf_nerf_tpu.evaluation import plots
        dataset = dataset_dict[config.dataset_config.dataset_name](
            config.dataset_config)
        for smooth in (False, True):
            plots.plot_2d_slices(model, eval_folder,
                                 scale=dataset.scale / 1.1 * 1.02,
                                 centroid=dataset.get_centroid(),
                                 smooth=smooth)
    if method in ("plot-overall-scene", "all"):
        from vf_nerf_tpu.evaluation import plots
        dataset = dataset_dict[config.dataset_config.dataset_name](
            config.dataset_config)
        for smooth in (False, True):
            plots.plot_overall_scene(model, eval_folder,
                                     scale=dataset.scale / 1.1,
                                     centroid=dataset.get_centroid(),
                                     smooth=smooth)
    if method in ("plot-3d-slices", "all"):
        from vf_nerf_tpu.evaluation import plots
        for smooth in (False, True):
            plots.plot_3d_slices(model, eval_folder, smooth=smooth)
    if method in ("render-images", "all"):
        methods.render_images(model, eval_folder, config.dataset_config,
                              epoch, chunk_size)
    if method in ("metrics", "all"):
        methods.metrics(model, eval_folder, config.dataset_config, epoch,
                        chunk_size)
    if method in ("tsdf-mesh", "all"):
        methods.tsdf_mesh(eval_folder, config.dataset_config)
    if method in ("3d-metrics", "all"):
        if config.timestamp in ("monosdf", "neuralangelo", "neuris",
                                "manhattan_sdf", "mono_sdf"):
            methods.metrics_3d_no_vf(eval_folder, config.checkpoint,
                                     config.dataset_config,
                                     distance_thresh=distance_thresh)
        else:
            methods.metrics_3d(eval_folder, config.dataset_config,
                               distance_thresh=distance_thresh)


def main() -> None:
    args = eval_argparser().parse_args()
    config = parse_config(scene=args.scene, config_path=args.config_path,
                          gpu=args.gpu, expname=args.expname,
                          timestamp=args.timestamp,
                          checkpoint=args.checkpoint,
                          data_root_dir=args.data_root_dir)
    evaluate(config, args.method, args.resolution, args.eval_folder,
             args.chunk_size, args.distance_thresh, args.num_quadrants)


if __name__ == "__main__":
    main()
