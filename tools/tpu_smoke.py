"""Full-size TPU smoke run: train a few epochs + eval on the real chip.

Exports a synthetic box scene at a realistic image size, regenerates VF-init
weights, trains the full 256-wide config (100 coarse + 30 fine samples,
1024-ray batches) for a few epochs on the TPU, then runs render-images +
metrics. Validates the production path end-to-end on hardware (the test
suite runs on a virtual CPU mesh).

Usage: python tools/tpu_smoke.py [--epochs 3] [--workdir /tmp/vf_smoke]
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--workdir", type=str, default="/tmp/vf_smoke")
    parser.add_argument("--images", type=int, default=6)
    parser.add_argument("--size", type=int, nargs=2, default=[96, 128])
    parser.add_argument("--joint", action="store_true",
                        help="also run a short joint pose+field stage from "
                             "the trained checkpoint")
    parser.add_argument("--save-freq", type=int, default=1,
                        help="checkpoint save frequency (use e.g. 500 for "
                             "long full-protocol runs — every save breaks "
                             "the span dispatch and writes ~50 MB)")
    args = parser.parse_args()

    import numpy as np

    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
    from vf_nerf_tpu.evaluation.evaluate import evaluate
    from vf_nerf_tpu.train.runner import VectorFieldNerfRunner
    from vf_nerf_tpu.train.vf_init import default_vf_config, fit_vf_init

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    print("== exporting synthetic scene ==", flush=True)
    ds = SyntheticBoxDataset(n_images=args.images,
                             image_size=tuple(args.size),
                             pixels_per_batch=1024)
    ds.export_replica_format(args.workdir, scene="boxroom")

    # Patch a run conf: full nets, short run.
    conf_src = os.path.join(REPO, "confs", "vf_nerf.conf")
    conf_path = os.path.join(args.workdir, "run.conf")
    exps = os.path.join(args.workdir, "exps_vf_nerf")
    with open(conf_src) as f:
        conf = f.read()
    conf = conf.replace("num_epochs = 3001", f"num_epochs = {args.epochs}")
    conf = conf.replace("save_frequency = 100",
                        f"save_frequency = {args.save_freq}")
    conf = conf.replace('exps_folder = "./exps_vf_nerf"',
                        f'exps_folder = "{exps}"')
    conf = conf.replace("factor = 20", "factor = 1") \
        if "factor" in conf else conf
    # the default conf has no dataset.factor line; add one
    conf = conf.replace('data_dir = "Replica"',
                        'data_dir = "Replica"\n    factor = 1')
    with open(conf_path, "w") as f:
        f.write(conf)

    print("== fitting VF init (full net) ==", flush=True)
    wall_radius = ds.max_depth * 1.25 / 2.0
    t0 = time.perf_counter()
    params, stats = fit_vf_init(default_vf_config(), "exterior_scene",
                                np.zeros(3),
                                sample_extent=1.5 * wall_radius,
                                wall_radius=wall_radius, steps=800,
                                batch=8192, seed=0)
    print(f"   vf_init took {time.perf_counter() - t0:.1f}s", flush=True)
    with open(os.path.join(args.workdir, "Replica", "boxroom",
                           "boxroom.pkl"), "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)

    print("== training ==", flush=True)
    config = parse_config(scene="boxroom", config_path=conf_path,
                          expname="smoke", timestamp="tpu",
                          data_root_dir=args.workdir, offline=True)
    runner = VectorFieldNerfRunner(config)
    t0 = time.perf_counter()
    runner.train()
    train_s = time.perf_counter() - t0
    steps = args.epochs * len(runner.dataset)
    rays = steps * runner._batch_rays()
    print(f"   {steps} steps in {train_s:.1f}s → "
          f"{rays / train_s:.0f} train rays/s (incl. compiles)", flush=True)

    print("== eval: render-images + metrics ==", flush=True)
    config2 = parse_config(scene="boxroom", config_path=conf_path,
                           expname="smoke", timestamp="tpu",
                           checkpoint="latest", data_root_dir=args.workdir,
                           offline=True)
    t0 = time.perf_counter()
    evaluate(config2, method="metrics", resolution=64,
             eval_root_folder=os.path.join(args.workdir, "evals"),
             chunk_size=1024, distance_thresh=0.05, num_quadrants=8)
    print(f"   eval took {time.perf_counter() - t0:.1f}s", flush=True)

    with open(os.path.join(args.workdir, "evals", "smoke_boxroom",
                           "tpu_latest", "metrics.json")) as f:
        metrics = json.load(f)
    summary = {"epochs": args.epochs,
               "train_rays_per_sec": rays / train_s,
               "mean_psnr": metrics["mean_psnr"]}

    if args.joint:
        print("== joint pose+field optimization ==", flush=True)
        summary.update(run_joint_stage(args.workdir, conf_path))
    print(json.dumps(summary))


def run_joint_stage(workdir: str, conf_path: str) -> dict:
    """Short joint pose-and-field run from the trained checkpoint
    (BASELINE configs[4] on real hardware)."""
    import numpy as np

    from vf_nerf_tpu.config.joint_parser import parse_config as parse_joint

    joint_conf = os.path.join(workdir, "joint.conf")
    with open(joint_conf, "w") as f:
        f.write("""
train {
    initial_training_epochs = 0
    supervised_vf_epochs = 1
    joint_epochs = 4
    supervise_every = 2
    supervision_epochs = 1
    refinement_init_lr = 1e-4
    reset_scheduler = False
}
joint_optimization {
    save_frequency = 2
    num_bases = 6
    decimation = 1.0
    self_supervise = True
}
""")
    cfg = parse_joint(scene="boxroom", vf_config_path=conf_path,
                      joint_config_path=joint_conf, expname="smoke",
                      timestamp="joint_tpu", checkpoint="latest",
                      data_root_dir=workdir, offline=True)
    src = os.path.join(cfg.vf_config.exps_folder, "smoke_boxroom", "tpu",
                       "checkpoints", "vf_nerf", "latest.ckpt")
    dst_dir = os.path.join(cfg.vf_config.exps_folder, "smoke_boxroom",
                           "joint_tpu", "checkpoints", "vf_nerf")
    os.makedirs(dst_dir, exist_ok=True)
    shutil.copy(src, os.path.join(dst_dir, "latest.ckpt"))

    from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
    t0 = time.perf_counter()
    runner = JointOptimizationRunner(cfg)
    initial = runner.pose_params.copy()
    metrics = runner.train()
    refined = runner.refined_poses()
    rtr = refined[:, :3, :3] @ refined[:, :3, :3].transpose(0, 2, 1)
    return {"joint_wall_s": round(time.perf_counter() - t0, 1),
            "joint_loss": metrics.get("loss"),
            "max_pose_drift": float(np.abs(runner.pose_params -
                                           initial).max()),
            "rotation_orthonormality_err": float(
                np.abs(rtr - np.eye(3)).max())}


if __name__ == "__main__":
    main()
