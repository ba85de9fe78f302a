"""Measure eval image-render wall time at Replica resolution (VERDICT r3 #5).

r3 measured 4-5 s/image at 680×1200 (816k rays) against a ~2.8 s ceiling at
the 288k rays/s chunk rate — the super-chunk fetch serialized with the next
image's dispatches. ``render_images`` now double-buffers across images
(``models/nerf.py::render_image_async``); this tool measures the sustained
per-image wall time through the REAL ``render_images`` path (dataset → PNG +
depth artifacts), with an untrained model (rendering speed does not depend
on the weights).

Usage: python tools/bench_eval_overlap.py [--views 8] [--size 680 1200]
       [--serial]   (--serial forces the old fetch-then-dispatch order for
                     an A/B on the same session)
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--size", type=int, nargs=2, default=[680, 1200])
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--serial", action="store_true")
    parser.add_argument("--workdir", type=str, default="/tmp/vf_evalbench")
    args = parser.parse_args()

    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
    from vf_nerf_tpu.evaluation import methods
    from vf_nerf_tpu.models.nerf import VectorFieldNerf

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    print("== exporting scene ==", flush=True)
    ds = SyntheticBoxDataset(n_images=args.views,
                             image_size=tuple(args.size),
                             pixels_per_batch=args.chunk)
    ds.export_replica_format(args.workdir, scene="boxroom")

    conf = os.path.join(REPO, "confs", "vf_nerf.conf")
    config = parse_config(scene="boxroom", config_path=conf,
                          expname="evalbench", data_root_dir=args.workdir,
                          offline=True)
    # The eval dataset applies the train-time `factor` image subsample
    # (reference quirk, replica_dataset.py:42; default 20) — with it, a
    # small bench export renders a single image and the pipelined-vs-
    # serial A/B measures nothing. Pin factor=1 so every view renders.
    config.dataset_config.factor = 1
    model = VectorFieldNerf(config.vf_nerf_config, seed=0)
    model.eval()
    model.fine_n_samples = 30

    if args.serial:
        # Old order: fetch image i before dispatching i+1.
        orig_async = model.render_image_async

        def serial_async(*a, **kw):
            handle = orig_async(*a, **kw)
            VectorFieldNerf.render_image_fetch(handle)  # hard sync
            return handle

        model.render_image_async = serial_async

    eval_path = os.path.join(args.workdir, "eval")
    # Warmup pass (first image pays the scan compile).
    print("== warmup (compile) ==", flush=True)
    t0 = time.perf_counter()
    methods.render_images(model, eval_path, config.dataset_config, epoch=0,
                          split_size=args.chunk)
    warm_total = time.perf_counter() - t0
    print(f"cold pass: {warm_total:.1f}s total", flush=True)

    img_dir = os.path.join(eval_path, "rendered_images")
    n_rendered = len([f for f in os.listdir(img_dir)
                      if f.startswith("image-")])
    shutil.rmtree(img_dir)
    t0 = time.perf_counter()
    methods.render_images(model, eval_path, config.dataset_config, epoch=0,
                          split_size=args.chunk)
    total = time.perf_counter() - t0
    h, w = args.size
    per_image = total / n_rendered
    rays_per_sec = n_rendered * h * w / total
    print(json.dumps({
        "mode": "serial" if args.serial else "pipelined",
        "views": args.views, "images_rendered": n_rendered,
        "size": args.size,
        "total_s": round(total, 2),
        "s_per_image": round(per_image, 2),
        "rays_per_sec": round(rays_per_sec, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
