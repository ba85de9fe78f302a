"""Full protocol through the ScanNet loader path on the real chip.

The ScanNet family (C20, ``datasets/normal_datasets/scannet_dataset.py``) is
oracle-checked on fixtures and smoke-trained at 12×16 on the CPU mesh, but no
full-size chip run had exercised its distinguishing behaviors end to end:
the hardcoded every-40th frame subsample (``:19``), ``crop_edge`` trimming
with the principal-point shift (``:54-67``), mm-scaled depth PNGs, per-frame
``pose/*.txt`` and the ``<scene>_vh_clean.ply`` GT mesh contract.

This tool exports an oracle scene (default: the hard non-convex office,
VERDICT r4 #5; ``--scene-type box`` for the r4 convex box) in ScanNet's
on-disk layout with ``frame_stride=40`` (so the loader's subsample selects
every distinct view), trains the shipped full-size config, and runs
render-images + PSNR + 3d-metrics — proving the crop-shifted intrinsics
render geometry consistent with the cropped GT (PSNR would collapse on any
principal-point bug).

Writes <workdir>/scannet.json; copy to results/scannet_office_r5.json.

Usage: python tools/scannet_protocol.py [--views 24] [--size 240 320]
       [--epochs 1500] [--crop 10] [--scene-type office]
       [--depth-clamp 3.0] [--workdir /tmp/vf_scannet]
"""

import argparse
import json
import os
import pickle
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def write_scannet_conf(workdir: str, epochs: int, crop: int,
                       scene_type: str = "box",
                       depth_clamp: float = None) -> str:
    conf_path = os.path.join(workdir, "run.conf")
    with open(os.path.join(REPO, "confs", "vf_nerf.conf")) as f:
        conf = f.read()
    conf = conf.replace("num_epochs = 3001", f"num_epochs = {epochs}")
    conf = conf.replace("save_frequency = 100", "save_frequency = 500")
    conf = conf.replace('exps_folder = "./exps_vf_nerf"',
                        f'exps_folder = "{os.path.join(workdir, "exps")}"')
    conf = conf.replace('dataset_name = "replica"',
                        'dataset_name = "scannet"')
    conf = conf.replace('data_dir = "Replica"',
                        f'data_dir = "ScanNet"\n    crop_edge = {crop}')
    conf += "\ndevice { static_fine_growth = True }\n"
    # Non-convergence gate armed per scene AND clamp: 1.2x the matching
    # cohort median final loss (box: results/variance_r3.json median
    # 0.00478; office at the default clamp 0.5: r4 3-seed cohort median
    # 0.0174; office at clamp 3.0: the un-clamped depth term converges
    # LOWER — 0.0072-0.0083 across the r4 clamp run and the r5 cohort —
    # so keeping the 0.021 bar would sit ~2.5x above the operating point
    # and let a 2x-bad run pass).
    if scene_type == "box":
        thr = 0.00574
    elif depth_clamp is not None and depth_clamp >= 3.0:
        thr = 0.010
    else:
        thr = 0.021
    conf += f"\ntrain {{ convergence_loss_threshold = {thr} }}\n"
    with open(conf_path, "w") as f:
        f.write(conf)
    if depth_clamp is not None:
        from office_protocol import apply_depth_clamp
        apply_depth_clamp(conf_path, depth_clamp)
    return conf_path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--size", type=int, nargs=2, default=[240, 320])
    parser.add_argument("--pitch", type=float, default=1.1)
    parser.add_argument("--epochs", type=int, default=1500)
    parser.add_argument("--crop", type=int, default=10,
                        help="crop_edge (reference default 10)")
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--workdir", type=str, default="/tmp/vf_scannet")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--scene-type", type=str, default="office",
                        choices=("box", "office"),
                        help="which oracle scene to push through the "
                             "ScanNet loader machinery (r4 ran the convex "
                             "box; r5 default = the hard office, VERDICT "
                             "r4 #5)")
    parser.add_argument("--depth-clamp", type=float, default=None,
                        help="override loss.config.depth_loss_clamp (see "
                             "office_protocol.py --depth-clamp)")
    args = parser.parse_args()

    import numpy as np

    from vf_nerf_tpu.datasets.synthetic import (SyntheticBoxDataset,
                                                SyntheticOfficeDataset)
    from vf_nerf_tpu.train.vf_init import default_vf_config, fit_vf_init

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    scene = "scene0000_00"
    print(f"== exporting {args.scene_type} scene as ScanNet/{scene} "
          f"({args.views} views @ {args.size}, frame_stride=40) ==",
          flush=True)
    ds_cls = (SyntheticOfficeDataset if args.scene_type == "office"
              else SyntheticBoxDataset)
    ds = ds_cls(n_images=args.views, image_size=tuple(args.size),
                pixels_per_batch=1024, pitch_range=args.pitch)
    base = ds.export_scannet_format(args.workdir, scene=scene,
                                    frame_stride=40)
    wall_radius = ds.max_depth * 1.25 / 2.0
    params, stats = fit_vf_init(default_vf_config(), "exterior_scene",
                                np.zeros(3),
                                sample_extent=1.5 * wall_radius,
                                wall_radius=wall_radius, steps=800,
                                batch=8192, seed=0)
    with open(os.path.join(base, f"{scene}.pkl"), "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)

    conf_path = write_scannet_conf(args.workdir, args.epochs, args.crop,
                                   args.scene_type, args.depth_clamp)

    print(f"== training seed {args.seed} ({args.epochs} epochs x "
          f"{args.views} steps, crop_edge={args.crop}) ==", flush=True)
    os.environ["VFNERF_SEED"] = str(args.seed)
    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.train.runner import VectorFieldNerfRunner

    t0 = time.perf_counter()
    config = parse_config(scene=scene, config_path=conf_path,
                          expname="scannet", timestamp="run",
                          data_root_dir=args.workdir, offline=True)
    runner = VectorFieldNerfRunner(config)
    assert runner.dataset.n_images == args.views, (
        f"frame_stride export broken: loader saw {runner.dataset.n_images} "
        f"of {args.views} views")
    h_eff, w_eff = runner.dataset.image_size
    assert (h_eff, w_eff) == (args.size[0] - 2 * args.crop,
                              args.size[1] - 2 * args.crop)
    runner.train()
    train_s = time.perf_counter() - t0
    print(f"train wall: {train_s:.0f}s  final loss: {runner.final_loss}",
          flush=True)

    from vf_nerf_tpu.evaluation.evaluate import evaluate
    config2 = parse_config(scene=scene, config_path=conf_path,
                           expname="scannet", timestamp="run",
                           checkpoint="latest", data_root_dir=args.workdir,
                           offline=True)
    eval_root = os.path.join(args.workdir, "evals")
    timings = {}
    for method in ("metrics", "3d-metrics"):
        t0 = time.perf_counter()
        evaluate(config2, method=method, resolution=args.resolution,
                 eval_root_folder=eval_root, chunk_size=1024,
                 distance_thresh=0.05, num_quadrants=8)
        timings[method] = round(time.perf_counter() - t0, 1)
        print(f"{method}: {timings[method]}s", flush=True)

    out_dir = os.path.join(eval_root, f"scannet_{scene}", "run_latest")
    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    with open(os.path.join(out_dir, "3d-metrics.json")) as f:
        m3d = json.load(f)

    summary = {
        "note": ("full protocol through the ScanNet loader on the chip "
                 "(tools/scannet_protocol.py): frame_stride-40 export, "
                 "crop_edge trim + principal-point shift, mm depth PNGs, "
                 "vh_clean GT mesh"),
        "scene_type": args.scene_type,
        "depth_loss_clamp": (0.5 if args.depth_clamp is None
                             else args.depth_clamp),
        "views": args.views, "image_size": args.size,
        "crop_edge": args.crop,
        "effective_image_size": [h_eff, w_eff],
        "epochs": args.epochs, "seed": args.seed,
        "mc_resolution": args.resolution,
        "train_wall_s": round(train_s, 1),
        "train_rays_per_sec": round(
            args.epochs * args.views * 1024 / train_s, 1),
        "final_epoch_loss": runner.final_loss,
        "mean_psnr": metrics["mean_psnr"],
        "metrics_3d": m3d,
        "eval_wall_s": timings,
    }
    with open(os.path.join(args.workdir, "scannet.json"), "w") as f:
        json.dump(summary, f, indent=1)
    brief = {"mean_psnr": summary["mean_psnr"],
             "train_wall_s": summary["train_wall_s"],
             "fscore_tsdf": m3d.get("tsdf", {}).get("fscore")}
    print("SCANNET_SUMMARY " + json.dumps(brief), flush=True)
    print(f"full summary: {os.path.join(args.workdir, 'scannet.json')}")


if __name__ == "__main__":
    main()
