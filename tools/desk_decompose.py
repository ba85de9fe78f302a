"""Decompose the desk's rendered error (VERDICT r4 #4, weak #4).

The desk is the office's worst surface group by PSNR. This tool explains
why, post-hoc on a ``tools/office_protocol.py`` workdir's saved eval
renders (pure CPU — no chip): desk pixels are split by

- which GT face the ray hits: the TOP slab face (z = -1.25·s, the face
  downward-looking cameras see) vs the SIDE faces (floor-standing walls of
  the box, seen only at grazing angles near the room corner), and
- image-space EDGE vs INTERIOR (an edge pixel's 3x3 neighborhood contains
  a non-desk group — silhouette pixels mix foreground/background radiance
  and dominate the L2 of tiny groups),

reporting pixel counts, PSNR and mean |depth error| per split, plus the
desk's share of each view. Layout reference:
``vf_nerf_tpu/datasets/synthetic.py::office_layout`` (desk slab
x[0.7,1.5]·s, y[-1.6,-0.9]·s, z[-2,-1.25]·s).

Usage: python tools/desk_decompose.py [--workdir /tmp/vf_office]
Writes <workdir>/desk_decompose.json.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DESK_GROUP = 6  # index in office_attribution.GROUPS


def decompose(ds, out_dir):
    import numpy as np

    from vf_nerf_tpu.datasets.base import pixel_grid
    from vf_nerf_tpu.datasets.synthetic import trace_rects
    from vf_nerf_tpu.utils import io as io_utils

    h, w = ds.image_size
    s = ds.half_size / 2.0
    top_z = -1.25 * s
    uv = pixel_grid(h, w)
    fx, fy = ds.intrinsics[0, 0], ds.intrinsics[1, 1]
    cx, cy = ds.intrinsics[0, 2], ds.intrinsics[1, 2]
    dirs_cam = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                         np.ones(h * w)], axis=-1)

    splits = ["top_interior", "top_edge", "side_interior", "side_edge"]
    n = {k: 0 for k in splits}
    se = {k: 0.0 for k in splits}      # sum squared rgb error
    dep = {k: 0.0 for k in splits}     # sum |depth err|
    per_view_frac = []
    for i, pose in enumerate(ds.poses):
        dirs = dirs_cam @ pose[:3, :3].T
        t, group = trace_rects(pose[:3, 3][None], dirs, ds.rects)
        group = group.reshape(h, w)
        desk = group == DESK_GROUP
        per_view_frac.append(float(desk.mean()))
        if not desk.any():
            continue
        # hit z decides top vs side (top face at z = -1.25 s exactly)
        hit_z = (pose[2, 3] + t * dirs[:, 2]).reshape(h, w)
        top = desk & (np.abs(hit_z - top_z) < 1e-6 * max(1.0, abs(top_z)))
        # edge: 3x3 neighborhood touches a non-desk pixel
        pad = np.pad(desk, 1, constant_values=False)
        interior = desk.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                interior &= pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        gt_rgb = ds.rgb_images[i].reshape(h, w, 3)
        gt_depth = ds.depth_images[i].reshape(h, w)
        pred_rgb = io_utils.load_rgb(
            os.path.join(out_dir, "rendered_images", f"image-{i}.png"),
            transpose=False).reshape(h, w, 3)
        pred_depth = np.load(os.path.join(
            out_dir, "rendered_images", f"depth-{i}.npy")).reshape(h, w)
        sq = ((pred_rgb - gt_rgb) ** 2).mean(-1)
        de = np.abs(pred_depth - gt_depth)
        for key, m in [("top_interior", top & interior),
                       ("top_edge", top & ~interior),
                       ("side_interior", ~top & desk & interior),
                       ("side_edge", ~top & desk & ~interior)]:
            n[key] += int(m.sum())
            se[key] += float(sq[m].sum())
            dep[key] += float(de[m].sum())

    def row(key):
        if n[key] == 0:
            return {"pixels": 0}
        mse = se[key] / n[key]
        return {"pixels": n[key],
                "psnr": float(-10.0 * np.log10(max(mse, 1e-12))),
                "mean_abs_depth_err": dep[key] / n[key]}

    total_px = sum(n.values())
    mse_all = sum(se.values()) / max(total_px, 1)
    return {
        "desk_pixels_total": total_px,
        "desk_psnr": float(-10.0 * np.log10(max(mse_all, 1e-12))),
        "splits": {k: row(k) for k in splits},
        "per_view_desk_pixel_frac": per_view_frac,
        "views_seeing_desk": int(sum(f > 0 for f in per_view_frac)),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/tmp/vf_office")
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--size", type=int, nargs=2, default=[240, 320])
    parser.add_argument("--pitch", type=float, default=1.1)
    parser.add_argument("--down-views", type=int, default=0,
                        help="must match the protocol's --down-views so "
                             "the rebuilt rig matches the trained poses")
    args = parser.parse_args()

    from vf_nerf_tpu.datasets.synthetic import SyntheticOfficeDataset

    ds = SyntheticOfficeDataset(n_images=args.views,
                                image_size=tuple(args.size),
                                pixels_per_batch=64,
                                pitch_range=args.pitch,
                                extra_down_views=args.down_views)
    out_dir = os.path.join(args.workdir, "evals", "office_office",
                           "run_latest")
    result = decompose(ds, out_dir)
    print(json.dumps(result, indent=1))
    with open(os.path.join(args.workdir, "desk_decompose.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
