"""Attribute an office-run's 3D recall gap: visibility vs method error.

Post-processes a ``tools/office_protocol.py`` workdir. Samples the GT mesh,
splits the samples into camera-OBSERVED vs UNOBSERVED (projective depth test
against the dataset's GT depth maps), and reports recall per surface group
(walls / floor / ceiling / corner_block / column / thin_wall / desk) on each
side — separating "the cameras never saw it" (not a method error; TSDF
fusion cannot carve unobserved space) from "seen but not reconstructed"
(a real failure, localized to the object that loses it).

Also probes the trained vector field for zero crossings along lines through
the column and the thin free-standing wall (a missing crossing means the
density there is identically ~0 via the dead-cutoff quirk, so rays render
straight through), and measures rendered-vs-GT depth and RGB error on the
failing object's pixels — the signature of the shape-radiance ambiguity +
clamped-depth-gradient equilibrium documented in PARITY.md (r4).

Usage: python tools/office_attribution.py [--workdir /tmp/vf_office]
       [--views 24] [--size 240 320] [--thresh 0.05]
Writes <workdir>/attribution.json.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GROUPS = ["walls", "floor", "ceiling", "corner_block", "column",
          "thin_wall", "desk"]


def observed_mask(gt_pts, ds):
    """A GT-surface sample is observed iff some camera sees it within its
    GT depth map (2 cm slack for sampling/quantization)."""
    import numpy as np

    h, w = ds.image_size
    fx, fy = ds.intrinsics[0, 0], ds.intrinsics[1, 1]
    cx, cy = ds.intrinsics[0, 2], ds.intrinsics[1, 2]
    depths = ds.depth_images.reshape(ds.n_images, h, w)
    obs = np.zeros(len(gt_pts), bool)
    for i, pose in enumerate(ds.poses):
        pc = (gt_pts - pose[:3, 3]) @ pose[:3, :3]
        z = pc[:, 2]
        u = np.round(pc[:, 0] / np.maximum(z, 1e-6) * fx + cx).astype(int)
        v = np.round(pc[:, 1] / np.maximum(z, 1e-6) * fy + cy).astype(int)
        ok = (z > 1e-3) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        dmap = depths[i][np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)]
        obs |= ok & (z <= dmap + 0.02)
    return obs


def group_attribution(gt_pts, rects):
    """Index of the surface group owning each GT sample (nearest rect)."""
    import numpy as np

    from vf_nerf_tpu.datasets.synthetic import _other_axes

    best_d2 = np.full(len(gt_pts), np.inf)
    best_g = np.zeros(len(gt_pts), int)
    for r in rects:
        a0, a1 = _other_axes(r.axis)
        q = gt_pts.copy()
        q[:, r.axis] = r.coord
        q[:, a0] = np.clip(gt_pts[:, a0], r.lo[0], r.hi[0])
        q[:, a1] = np.clip(gt_pts[:, a1], r.lo[1], r.hi[1])
        d2 = ((q - gt_pts) ** 2).sum(-1)
        upd = d2 < best_d2
        best_d2 = np.where(upd, d2, best_d2)
        best_g[upd] = r.group
    return best_g


def field_crossings(model, segments):
    """Sign flips of the normalized VF direction along straight probe
    segments (a crossing = consecutive directions with negative dot)."""
    import jax.numpy as jnp
    import numpy as np

    out = {}
    for name, (a, b, n) in segments.items():
        ts = np.linspace(0.0, 1.0, n)[:, None]
        pts = np.asarray(a) * (1 - ts) + np.asarray(b) * ts
        vf = np.asarray(model.get_vector_field(
            jnp.asarray(pts, jnp.float32)))
        u = vf / np.maximum(np.linalg.norm(vf, axis=-1, keepdims=True),
                            1e-9)
        cos = (u[:-1] * u[1:]).sum(-1)
        flips = np.nonzero(cos < 0.0)[0]
        out[name] = [[float(v) for v in pts[i]] for i in flips]
    return out


def per_group_render_errors(ds, out_dir):
    """Rendered-vs-GT depth and RGB error per surface group — the desk/
    column failure signature (rendered depth lands on the surface behind
    while RGB is painted as view-dependent radiance). Reads the eval's
    rendered_images dir (image-i.png + depth-i.npy)."""
    import numpy as np

    from vf_nerf_tpu.datasets.base import pixel_grid
    from vf_nerf_tpu.datasets.synthetic import trace_rects
    from vf_nerf_tpu.utils import io as io_utils

    img_dir = os.path.join(out_dir, "rendered_images")
    if not os.path.exists(os.path.join(img_dir, "depth-0.npy")):
        return None
    h, w = ds.image_size
    uv = pixel_grid(h, w)
    fx, fy = ds.intrinsics[0, 0], ds.intrinsics[1, 1]
    cx, cy = ds.intrinsics[0, 2], ds.intrinsics[1, 2]
    dirs_cam = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                         np.ones(h * w)], axis=-1)
    depth_abs = np.zeros(len(GROUPS))
    rgb_abs = np.zeros(len(GROUPS))
    cnt = np.zeros(len(GROUPS), np.int64)
    for i, pose in enumerate(ds.poses):
        dirs = dirs_cam @ pose[:3, :3].T
        _, group = trace_rects(pose[:3, 3][None], dirs, ds.rects)
        gt_rgb = ds.rgb_images[i].reshape(-1, 3)
        gt_depth = ds.depth_images[i].reshape(-1)
        pred_rgb = io_utils.load_rgb(
            os.path.join(img_dir, f"image-{i}.png"),
            transpose=False).reshape(-1, 3)
        pred_depth = np.load(
            os.path.join(img_dir, f"depth-{i}.npy")).reshape(-1)
        d_err = np.abs(pred_depth - gt_depth)
        c_err = np.abs(pred_rgb - gt_rgb).mean(-1)
        for g in range(len(GROUPS)):
            m = group == g
            depth_abs[g] += float(d_err[m].sum())
            rgb_abs[g] += float(c_err[m].sum())
            cnt[g] += int(m.sum())
    return {name: {"mean_abs_depth_err": float(depth_abs[g] /
                                               max(cnt[g], 1)),
                   "mean_abs_rgb_err": float(rgb_abs[g] / max(cnt[g], 1)),
                   "pixels": int(cnt[g])}
            for g, name in enumerate(GROUPS) if cnt[g]}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/tmp/vf_office")
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--size", type=int, nargs=2, default=[240, 320])
    parser.add_argument("--pitch", type=float, default=1.1)
    parser.add_argument("--thresh", type=float, default=0.05)
    parser.add_argument("--samples", type=int, default=250000)
    parser.add_argument("--down-views", type=int, default=0,
                        help="must match the protocol's --down-views so "
                             "the rebuilt rig matches the trained poses")
    args = parser.parse_args()

    import numpy as np

    from vf_nerf_tpu.datasets.synthetic import SyntheticOfficeDataset
    from vf_nerf_tpu.utils.meshes import _tree, sample_surface
    from vf_nerf_tpu.utils.ply import load_ply

    ds = SyntheticOfficeDataset(n_images=args.views,
                                image_size=tuple(args.size),
                                pixels_per_batch=64,
                                pitch_range=args.pitch,
                                extra_down_views=args.down_views)
    gt_v, gt_f = load_ply(os.path.join(args.workdir, "Replica",
                                       "office_mesh.ply"))
    out_dir = os.path.join(args.workdir, "evals", "office_office",
                           "run_latest")
    gt_pts = sample_surface(gt_v, gt_f, args.samples, 0)
    obs = observed_mask(gt_pts, ds)
    g = group_attribution(gt_pts, ds.rects)

    def recall_attribution(pr_v):
        d, _ = _tree(pr_v).query(gt_pts, workers=-1)
        missed = d > args.thresh
        per_group = {}
        for gi, name in enumerate(GROUPS):
            m = g == gi
            if not m.sum():
                continue
            mo = m & obs
            per_group[name] = {
                "gt_frac": float(m.mean()),
                "observed_frac": float(obs[m].mean()),
                "recall": float(1 - missed[m].mean()),
                "recall_observed": (float(1 - missed[mo].mean())
                                    if mo.sum() else None),
            }
        return {
            "recall_overall": float(1 - missed.mean()),
            "observed_gt_fraction": float(obs.mean()),
            "recall_observed": float(1 - missed[obs].mean()),
            "recall_unobserved": float(1 - missed[~obs].mean()),
            "distance_thresh": args.thresh,
            "per_group": per_group,
        }

    pr_v, _ = load_ply(os.path.join(out_dir, "tsdf-mesh", "tsdf.ply"))
    summary = recall_attribution(pr_v)
    # Same split for the headline quadrant-MC mesh when the protocol ran
    # it (office_protocol --mc): the MC mesh is the field's own geometry,
    # free of TSDF fusion's view-coverage limits.
    mc_path = os.path.join(out_dir, "merged-mesh",
                           "merged-mesh-scaled-latest.ply")
    if os.path.exists(mc_path):
        mc_v, _ = load_ply(mc_path)
        if len(mc_v):
            summary["mc_mesh"] = recall_attribution(mc_v)

    errs = per_group_render_errors(ds, out_dir)
    if errs is not None:
        summary["render_errors_per_group"] = errs
    print(json.dumps(summary, indent=1), flush=True)

    # Field probes through the two free-standing occluders (scaled from the
    # layout authored at half_size=2: column x[-1.3,-0.9] y[-0.5,-0.1],
    # thin wall x[-0.3,-0.24] y[-1.7,-0.5]).
    s = ds.half_size / 2.0
    # Layout authored at half_size=2: column x[-1.3,-0.9] y[-0.5,-0.1],
    # thin wall x[-0.3,-0.24] y[-1.7,-0.5], desk x[0.7,1.5] y[-1.6,-0.9]
    # z[-2,-1.25] (a low slab: top face at z=-1.25s).
    segments = {
        "through_column": ([-1.99 * s, -0.3 * s, 0.0],
                           [0.5 * s, -0.3 * s, 0.0], 250),
        "through_thin_wall": ([-0.8 * s, -1.0 * s, 0.0],
                              [0.3 * s, -1.0 * s, 0.0], 200),
        "through_desk_horizontal": ([0.2 * s, -1.25 * s, -1.6 * s],
                                    [1.9 * s, -1.25 * s, -1.6 * s], 250),
        "through_desk_top": ([1.1 * s, -1.25 * s, -0.6 * s],
                             [1.1 * s, -1.25 * s, -1.95 * s], 250),
    }
    try:
        from vf_nerf_tpu.config.parser import parse_config
        from vf_nerf_tpu.models.nerf import VectorFieldNerf
        cfg = parse_config(scene="office",
                           config_path=os.path.join(args.workdir,
                                                    "run.conf"),
                           expname="office", timestamp="run",
                           checkpoint="latest",
                           data_root_dir=args.workdir, offline=True)
        model = VectorFieldNerf(cfg.vf_nerf_config, seed=0)
        model.load(os.path.join(args.workdir, "exps", "office_office",
                                "run", "checkpoints", "vf_nerf",
                                "latest.ckpt"))
        model.eval()
        summary["field_crossings"] = field_crossings(model, segments)
        print("field crossings:",
              {k: len(v) for k, v in summary["field_crossings"].items()},
              flush=True)
    except Exception as exc:  # pragma: no cover — probe is best-effort
        summary["field_crossings_error"] = f"{type(exc).__name__}: {exc}"

    with open(os.path.join(args.workdir, "attribution.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {os.path.join(args.workdir, 'attribution.json')}")


if __name__ == "__main__":
    main()
