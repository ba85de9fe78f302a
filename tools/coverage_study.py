"""View-coverage study: how TSDF 3D metrics scale with camera coverage.

Trains the 1500-epoch seed-42 convergence protocol on the synthetic box
scene with a configurable camera rig, then runs PSNR + render-images +
full `3d-metrics` (all four TSDF variants). Measured results (PARITY.md,
`results/coverage_r3.json`): 8 views → recall 0.50 / F 0.67; 24 views →
0.64 / 0.78; 30 views at pitch ±63° (full room observed) → recall 0.980 /
F 0.99, Chamfer mean 0.0016 — the partial-coverage recall ceilings are
view-coverage artifacts, not method error.

Usage: python tools/coverage_study.py [--views 24] [--pitch 0.3]
       [--workdir /tmp/vf_coverage] [--epochs 1500]
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from convergence_variance import (export_scene, run_child,  # noqa: E402
                                  write_conf)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--pitch", type=float, default=0.3,
                        help="camera pitch spread (radians); 1.1 observes "
                             "the full room incl. floor/ceiling")
    parser.add_argument("--epochs", type=int, default=1500)
    parser.add_argument("--workdir", type=str, default="/tmp/vf_coverage")
    args = parser.parse_args()

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    print(f"== exporting {args.views}-view scene (pitch {args.pitch}) "
          "+ vf-init ==", flush=True)
    export_scene(args.workdir, n_images=args.views, pitch_range=args.pitch)
    conf_path = write_conf(args.workdir, args.epochs)

    print(f"== training seed 42 ({args.epochs} epochs x {args.views} "
          "steps) ==", flush=True)
    t0 = time.perf_counter()
    child = run_child(args.workdir, conf_path, seed=42)
    print(f"train+metrics wall: {time.perf_counter() - t0:.0f}s", flush=True)
    if child is None:
        sys.exit(1)
    print(json.dumps({k: v for k, v in child.items() if k != "per_image"}),
          flush=True)

    print("== render-images + 3d-metrics ==", flush=True)
    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.evaluation.evaluate import evaluate

    config = parse_config(scene="boxroom", config_path=conf_path,
                          expname="var42", timestamp="run",
                          checkpoint="latest", data_root_dir=args.workdir,
                          offline=True)
    for method in ("render-images", "3d-metrics"):
        t0 = time.perf_counter()
        evaluate(config, method=method, resolution=64,
                 eval_root_folder=os.path.join(args.workdir, "evals"),
                 chunk_size=1024, distance_thresh=0.05, num_quadrants=8)
        print(f"{method}: {time.perf_counter() - t0:.0f}s", flush=True)

    with open(os.path.join(args.workdir, "evals", "var42_boxroom",
                           "run_latest", "3d-metrics.json")) as f:
        m3d = json.load(f)
    summary = {"views": args.views, "pitch": args.pitch,
               "mean_psnr": child["mean_psnr"],
               "train_s": child["train_s"]}
    for variant, vals in m3d.items():
        summary[variant] = {
            "precision": round(vals.get("precision", -1), 3),
            "recall": round(vals.get("recall", -1), 3),
            "fscore": round(vals.get("fscore", -1), 3),
            "chamfer_mean": round(vals["chamfer distance"]["mean"], 5)
            if "chamfer distance" in vals else None}
    print("COVERAGE_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
