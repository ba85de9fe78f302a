"""Convergence-variance study (VERDICT r2 #3): N seeded 1500-epoch runs of
the synthetic-scene convergence protocol on the real chip, with per-image
and edge/interior PSNR breakdowns to localize any spread.

Protocol (r2's convergence setup, tools/tpu_smoke.py, plus the r3 static
fine-growth mode so each run compiles ONCE):

- synthetic box scene, 6 views at 96x128, 1024-ray batches,
- full 256-wide nets, 100 coarse + 30→100 fine samples, 1500 epochs,
- seeds vary via the VFNERF_SEED hook (reference pins 42,
  ``utils/utils.py:157-167``); each seed runs in a fresh subprocess so the
  module-level seed re-reads the env,
- eval: render-images + metrics (per-image PSNR), plus an edge-pixel mask
  from the GT depth gradient — r2 attributed the 7 dB spread to the MSE
  tail at cube edges; this measures that directly.

Usage: python tools/convergence_variance.py --seeds 42 1 2 3 7
       [--epochs 1500] [--workdir /tmp/vf_variance]
Writes <workdir>/variance.json and prints the aggregate table.
"""

import argparse
import json
import os
import pickle
import shutil
import subprocess
import sys
import time
from typing import Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def export_scene(workdir: str, n_images: int = 6,
                 image_size: Tuple[int, int] = (96, 128),
                 pitch_range: float = 0.3):
    import numpy as np

    from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
    from vf_nerf_tpu.train.vf_init import default_vf_config, fit_vf_init

    ds = SyntheticBoxDataset(n_images=n_images, image_size=image_size,
                             pixels_per_batch=1024,
                             pitch_range=pitch_range)
    ds.export_replica_format(workdir, scene="boxroom")
    wall_radius = ds.max_depth * 1.25 / 2.0
    params, stats = fit_vf_init(default_vf_config(), "exterior_scene",
                                np.zeros(3),
                                sample_extent=1.5 * wall_radius,
                                wall_radius=wall_radius, steps=800,
                                batch=8192, seed=0)
    with open(os.path.join(workdir, "Replica", "boxroom", "boxroom.pkl"),
              "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
    return ds


def write_conf(workdir: str, epochs: int) -> str:
    conf_path = os.path.join(workdir, "run.conf")
    with open(os.path.join(REPO, "confs", "vf_nerf.conf")) as f:
        conf = f.read()
    conf = conf.replace("num_epochs = 3001", f"num_epochs = {epochs}")
    conf = conf.replace("save_frequency = 100", "save_frequency = 500")
    conf = conf.replace('exps_folder = "./exps_vf_nerf"',
                        f'exps_folder = "{os.path.join(workdir, "exps")}"')
    conf = conf.replace('data_dir = "Replica"',
                        'data_dir = "Replica"\n    factor = 1')
    conf += "\ndevice { static_fine_growth = True }\n"
    with open(conf_path, "w") as f:
        f.write(conf)
    return conf_path


CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from vf_nerf_tpu.config.parser import parse_config
from vf_nerf_tpu.train.runner import VectorFieldNerfRunner
from vf_nerf_tpu.evaluation.evaluate import evaluate

workdir, conf_path, seed = {workdir!r}, {conf_path!r}, {seed}
t0 = time.perf_counter()
config = parse_config(scene="boxroom", config_path=conf_path,
                      expname=f"var{{seed}}", timestamp="run",
                      data_root_dir=workdir, offline=True)
runner = VectorFieldNerfRunner(config)
runner.train()
train_s = time.perf_counter() - t0
n_compiles = len(runner._step_cache)

config2 = parse_config(scene="boxroom", config_path=conf_path,
                       expname=f"var{{seed}}", timestamp="run",
                       checkpoint="latest", data_root_dir=workdir,
                       offline=True)
t0 = time.perf_counter()
evaluate(config2, method="metrics", resolution=64,
         eval_root_folder=os.path.join(workdir, "evals"),
         chunk_size=1024, distance_thresh=0.05, num_quadrants=8)
eval_s = time.perf_counter() - t0
with open(os.path.join(workdir, "evals", f"var{{seed}}_boxroom",
                       "run_latest", "metrics.json")) as f:
    metrics = json.load(f)
out = {{"seed": seed, "train_s": round(train_s, 1),
        "eval_s": round(eval_s, 1), "n_compiled_steps": n_compiles,
        "final_loss": runner.final_loss,
        "mean_psnr": metrics["mean_psnr"],
        "per_image": {{k: v["psnr"] for k, v in metrics.items()
                       if k.startswith("image-")}}}}
print("CHILD_RESULT " + json.dumps(out))
"""


def run_child(workdir: str, conf_path: str, seed: int):
    """Run one seeded train+metrics pass in a fresh subprocess (the
    VFNERF_SEED hook is read at runner import) and return its parsed
    CHILD_RESULT dict, or None on failure (stdout/stderr printed)."""
    env = dict(os.environ, VFNERF_SEED=str(seed))
    code = CHILD.format(repo=REPO, workdir=workdir, conf_path=conf_path,
                        seed=seed)
    proc = subprocess.run([sys.executable, "-c", code], text=True,
                          capture_output=True, env=env)
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")]
    if proc.returncode != 0 or not line:
        print(f"seed {seed} FAILED:\n{proc.stdout[-3000:]}\n"
              f"{proc.stderr[-3000:]}", flush=True)
        return None
    return json.loads(line[0][len("CHILD_RESULT "):])


def edge_breakdown(workdir: str, seed: int, n_images: int = 6,
                   image_size: Tuple[int, int] = (96, 128)):
    """Edge vs interior PSNR from the GT depth-gradient mask."""
    from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset

    ds = SyntheticBoxDataset(n_images=n_images, image_size=image_size,
                             pixels_per_batch=1024)
    img_dir = os.path.join(workdir, "evals", f"var{seed}_boxroom",
                           "run_latest", "rendered_images")
    return edge_breakdown_ds(ds, img_dir)


def edge_breakdown_ds(ds, img_dir: str):
    """Edge vs interior PSNR for any synthetic dataset with GT depth
    (edge mask = GT depth-gradient magnitude, dilated 1 px)."""
    import numpy as np

    from vf_nerf_tpu.utils import io as io_utils

    n_images = ds.n_images
    h, w = ds.image_size
    # Pixel-weighted sums across all views: a view with no depth edges
    # contributes nothing to the edge bucket instead of a NaN per-image mean.
    edge_sum = interior_sum = 0.0
    edge_cnt = interior_cnt = 0
    for i in range(n_images):
        gt = ds.rgb_images[i].reshape(h, w, 3)
        depth = ds.depth_images[i].reshape(h, w)
        gy, gx = np.gradient(depth)
        edge = np.sqrt(gx ** 2 + gy ** 2) > 0.05
        # Dilate by 1 px: rendered edges bleed one sample.
        edge = (np.pad(edge, 1)[:-2, 1:-1] | np.pad(edge, 1)[2:, 1:-1] |
                np.pad(edge, 1)[1:-1, :-2] | np.pad(edge, 1)[1:-1, 2:] |
                edge)
        pred = io_utils.load_rgb(os.path.join(img_dir, f"image-{i}.png"),
                                 transpose=False)
        sq = ((pred - gt) ** 2).mean(axis=-1)
        edge_sum += float(sq[edge].sum())
        edge_cnt += int(edge.sum())
        interior_sum += float(sq[~edge].sum())
        interior_cnt += int((~edge).sum())

    def psnr(total, count):
        if count == 0:
            return None
        return float(-10.0 * np.log10(max(total / count, 1e-12)))

    return {"edge_psnr": psnr(edge_sum, edge_cnt),
            "interior_psnr": psnr(interior_sum, interior_cnt),
            "edge_frac": edge_cnt / max(edge_cnt + interior_cnt, 1)}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, nargs="+",
                        default=[42, 1, 2, 3, 7])
    parser.add_argument("--epochs", type=int, default=1500)
    parser.add_argument("--workdir", type=str, default="/tmp/vf_variance")
    args = parser.parse_args()

    import numpy as np

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    print("== exporting scene + vf-init ==", flush=True)
    export_scene(args.workdir)
    conf_path = write_conf(args.workdir, args.epochs)

    results = []
    for seed in args.seeds:
        print(f"== seed {seed} ==", flush=True)
        t0 = time.perf_counter()
        out = run_child(args.workdir, conf_path, seed)
        wall = time.perf_counter() - t0
        if out is None:
            results.append({"seed": seed, "error": True})
            continue
        out["wall_s"] = round(wall, 1)
        out.update(edge_breakdown(args.workdir, seed))
        results.append(out)
        print(json.dumps(out), flush=True)
        with open(os.path.join(args.workdir, "variance.json"), "w") as f:
            json.dump(results, f, indent=2)

    psnrs = [r["mean_psnr"] for r in results if "mean_psnr" in r]
    if psnrs:
        agg = {"n": len(psnrs),
               "mean": float(np.mean(psnrs)),
               "median": float(np.median(psnrs)),
               "min": float(np.min(psnrs)), "max": float(np.max(psnrs)),
               "std": float(np.std(psnrs))}
        agg.update(apply_cohort_gate(results))
        print("AGGREGATE " + json.dumps(agg), flush=True)
        with open(os.path.join(args.workdir, "variance.json"), "w") as f:
            json.dump({"runs": results, "aggregate": agg}, f, indent=2)


def apply_cohort_gate(results, margin: float = 1.2):
    """Automated non-convergence gate (VERDICT r3 #6, cohort form): flag
    every run whose final train loss sits > ``margin``× the cohort median
    and recommend re-seeding. Mutates each run dict with a ``flagged`` key;
    returns the aggregate fields."""
    import numpy as np

    import math

    losses = [r.get("final_loss") for r in results]
    # A NaN loss (diverged run) must be flagged itself and excluded from
    # the median — one NaN would poison np.median to NaN and silently
    # disable the gate for the whole cohort.
    valid = [l for l in losses if l is not None and math.isfinite(l)]
    if not valid:
        # All-diverged cohort: there is no median, but divergence is
        # self-evident — flag every loss-bearing run instead of silently
        # disabling the gate (callers read r["flagged"]).
        flagged = []
        for r in results:
            loss = r.get("final_loss")
            r["flagged"] = loss is not None
            if r["flagged"]:
                flagged.append(r.get("seed"))
                print(f"NON-CONVERGENCE GATE: seed {r.get('seed')} final "
                      f"loss {loss} is non-finite — the run diverged; "
                      "recommend re-seeding (VFNERF_SEED)", flush=True)
        return {"cohort_median_loss": None, "gate_margin": margin,
                "flagged_seeds": flagged}
    median = float(np.median(valid))
    flagged = []
    for r in results:
        loss = r.get("final_loss")
        r["flagged"] = bool(loss is not None and
                            not loss <= margin * median)
        if r["flagged"]:
            flagged.append(r.get("seed"))
            print(f"NON-CONVERGENCE GATE: seed {r.get('seed')} final loss "
                  f"{loss:.6g} vs {margin}x cohort median {median:.6g} — "
                  "recommend re-seeding (VFNERF_SEED)", flush=True)
    return {"cohort_median_loss": median, "gate_margin": margin,
            "flagged_seeds": flagged}


if __name__ == "__main__":
    main()
