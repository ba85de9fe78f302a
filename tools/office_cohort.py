"""Assemble the round-5 office headline artifact from a cohort log dir.

The office queue (``tools/office_protocol.py`` + ``office_attribution.py``
per seed) leaves ``office_s<seed>.json`` / ``attribution_s<seed>.json``
files in one directory. This tool merges them into the single artifact the
record keeps (``results/office_r5.json``): the full-trio headline seed,
the cohort table with median F-score / PSNR (the repo's protocol scores
hard scenes as a median-of-5 cohort, see ``PARITY.md`` "Measured
performance"), and the per-seed attribution summaries that separate
view-coverage recall from method recall (VERDICT r4 #1/#4).

Usage: python tools/office_cohort.py --logdir /tmp/office_r5 \
           --headline-seed 42 --out results/office_r5.json
"""

import argparse
import glob
import json
import os
import re
import statistics


def load_cohort(logdir):
    """Returns {seed: {"office": ..., "attribution": ...-or-None}}."""
    runs = {}
    for path in sorted(glob.glob(os.path.join(logdir, "office_s*.json"))):
        m = re.match(r"office_s(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        seed = int(m.group(1))
        with open(path) as f:
            office = json.load(f)
        attr = None
        apath = os.path.join(logdir, f"attribution_s{seed}.json")
        if os.path.exists(apath):
            with open(apath) as f:
                attr = json.load(f)
        runs[seed] = {"office": office, "attribution": attr}
    return runs


def mc_mesh_metrics(office):
    """The protocol's merged quadrant-MC mesh metrics (plain variant), or
    None for a seed that ran ``--mc none`` / produced an error record."""
    mc = office.get("mc", {}).get("metrics_3d_mc", {})
    mesh = mc.get("merged-mesh")
    if not isinstance(mesh, dict) or "fscore" not in mesh:
        return None
    return mesh


def assemble(runs, headline_seed):
    if headline_seed not in runs:
        raise SystemExit(f"headline seed {headline_seed} not in cohort "
                         f"{sorted(runs)}")
    cohort = {}
    for seed, r in sorted(runs.items()):
        office, attr = r["office"], r["attribution"]
        mesh = mc_mesh_metrics(office)
        row = {
            "mean_psnr": office["mean_psnr"],
            "mc_fscore": mesh["fscore"] if mesh else None,
            "mc_recall": mesh["recall"] if mesh else None,
            "mc_precision": mesh["precision"] if mesh else None,
            "chamfer_mean": (mesh["chamfer distance"]["mean"]
                             if mesh else None),
            "train_wall_s": office["train_wall_s"],
            "train_rays_per_sec": office["train_rays_per_sec"],
            "floor_pixel_frac": office["group_psnr"]["floor"]
                                ["pixel_frac"],
        }
        if attr is not None:
            row["observed_gt_fraction"] = attr["observed_gt_fraction"]
            row["mc_recall_observed"] = attr["mc_mesh"]["recall_observed"]
            row["mc_recall_unobserved"] = \
                attr["mc_mesh"]["recall_unobserved"]
            row["floor_observed_frac"] = \
                attr["per_group"]["floor"]["observed_frac"]
        cohort[seed] = row

    def med(k):
        vals = [v[k] for v in cohort.values() if v.get(k) is not None]
        return statistics.median(vals) if vals else None
    headline = runs[headline_seed]["office"]
    out = {
        "note": ("round-5 office headline: stratified-pitch rig "
                 "(VERDICT r4 weak #2 fixed), reference eval settings "
                 "(quadrant MC res 256 x 8), depth_loss_clamp 3.0, "
                 f"{len(cohort)}-seed cohort; headline seed "
                 f"{headline_seed} runs the full mesh trio"),
        "protocol": {k: headline[k] for k in
                     ("views", "image_size", "epochs", "depth_loss_clamp",
                      "mc_resolution")},
        "cohort_median": {
            "mean_psnr": med("mean_psnr"),
            "mc_fscore": med("mc_fscore"),
            "mc_recall": med("mc_recall"),
            "chamfer_mean": med("chamfer_mean"),
        },
        "cohort": {str(s): row for s, row in cohort.items()},
        "headline": headline,
        "headline_attribution": runs[headline_seed]["attribution"],
    }
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", type=str, default="/tmp/office_r5")
    parser.add_argument("--headline-seed", type=int, default=42)
    parser.add_argument("--out", type=str,
                        default="results/office_r5.json")
    args = parser.parse_args()
    runs = load_cohort(args.logdir)
    out = assemble(runs, args.headline_seed)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"seeds": sorted(runs),
                      "cohort_median": out["cohort_median"]}, indent=1))


if __name__ == "__main__":
    main()
