"""Sustained training throughput through the real runner on the real chip.

Measures the end-to-end hot loop of the reference trainer
(``train/vector_field_nerf_train.py:161-260``) as rebuilt in
``train/runner.py``: host batch assembly + packing + transfer + jitted
train step + epoch-end metric fetch, at the headline workload (1024-ray
mixed-view batches, full 256-wide nets, 100 coarse + fine samples) on a
Replica-resolution synthetic scene. Timing is wall-clock over whole epochs
(each epoch ends in a device fetch, so the axon relay cannot lie).

Usage: python tools/train_throughput.py [--epochs 6] [--views 8]
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
    parser.add_argument("--epochs", type=int, default=6)
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--size", type=int, nargs=2, default=[680, 1200])
    parser.add_argument("--workdir", type=str, default="/tmp/vf_throughput")
    parser.add_argument("--span", action="store_true",
                        help="measure the epoch-spanning dispatch path "
                             "(runner._train_span) instead of per-epoch "
                             "scan dispatches")
    parser.add_argument("--static-fine", action="store_true",
                        help="enable static_fine_growth (one compiled "
                             "program across growth stages)")
    parser.add_argument("--spd", type=int, default=0,
                        help="override steps_per_dispatch")
    parser.add_argument("--pure", action="store_true",
                        help="time the span step on DEVICE-RESIDENT inputs "
                             "(no host assembly/transfer per dispatch) — "
                             "isolates the compiled graph's execution rate "
                             "from the host pipeline")
    parser.add_argument("--joint", action="store_true",
                        help="measure the joint pose+field stage "
                             "(train/joint_runner.py scan dispatch) instead "
                             "of the main trainer")
    parser.add_argument("--remat", type=str, default="none",
                        choices=["none", "full", "dots"],
                        help="train_remat device knob A/B: rematerialize "
                             "the loss backward (the step is HBM-roofline-"
                             "bound, results/train_flop_attribution_r5"
                             ".json, so trading recompute FLOPs for "
                             "residual bytes is the headroom direction)")
    parser.add_argument("--platform", type=str, default="",
                        help="JAX platform override (e.g. cpu to validate "
                             "the tool without touching the chip)")
    parser.add_argument("--attribution", action="store_true",
                        help="(with --pure) FLOP-attribute the train step: "
                             "XLA cost analysis of the compiled span step "
                             "(total) plus render-forward, render-fwd+bwd "
                             "and adam sub-budgets; reports effective "
                             "TFLOP/s against the measured step time "
                             "(VERDICT r4 #8)")
    args = parser.parse_args()

    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.datasets.synthetic import SyntheticBoxDataset
    from vf_nerf_tpu.train.runner import VectorFieldNerfRunner

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)

    print("== exporting synthetic scene at "
          f"{args.size[0]}x{args.size[1]} x{args.views} views ==", flush=True)
    ds = SyntheticBoxDataset(n_images=args.views,
                             image_size=tuple(args.size),
                             pixels_per_batch=1024)
    ds.export_replica_format(args.workdir, scene="boxroom")

    conf_path = os.path.join(args.workdir, "run.conf")
    exps = os.path.join(args.workdir, "exps_vf_nerf")
    with open(os.path.join(REPO, "confs", "vf_nerf.conf")) as f:
        conf = f.read()
    conf = conf.replace("num_epochs = 3001", "num_epochs = 1000")
    conf = conf.replace("save_frequency = 100", "save_frequency = 100000")
    conf = conf.replace('exps_folder = "./exps_vf_nerf"',
                        f'exps_folder = "{exps}"')
    with open(conf_path, "w") as f:
        f.write(conf)

    if args.joint:
        # Joint-stage sustained throughput (VERDICT r2 #4): pure joint
        # epochs (supervision blocks off — supervise_every=0), fresh-init
        # model, same 1024-ray batches as the main measurement. The runner
        # logs per-epoch rays_per_sec (each epoch ends in a device fetch);
        # the first epochs carry the compile, so report the median of the
        # post-warmup epochs.
        from vf_nerf_tpu.config.joint_parser import parse_config as \
            parse_joint
        from vf_nerf_tpu.train.joint_runner import JointOptimizationRunner
        joint_conf = os.path.join(args.workdir, "joint.conf")
        with open(joint_conf, "w") as f:
            f.write(f"""
train {{
    initial_training_epochs = 0
    supervised_vf_epochs = 0
    joint_epochs = {args.epochs + 2}
    supervise_every = 0
    supervision_epochs = 0
    refinement_init_lr = 1e-4
    reset_scheduler = False
}}
joint_optimization {{
    save_frequency = 100000
    num_bases = 6
    decimation = 1.0
    self_supervise = True
}}
""")
        cfg = parse_joint(scene="boxroom", vf_config_path=conf_path,
                          joint_config_path=joint_conf,
                          gpu=args.platform or "auto",
                          expname="throughput", timestamp="joint",
                          data_root_dir=args.workdir, offline=True)
        cfg.vf_config.dataset_config.factor = 1  # keep all exported views
        if args.spd:
            cfg.vf_config.vf_nerf_config.device_config \
                .steps_per_dispatch = args.spd
        runner = JointOptimizationRunner(cfg)
        n_rays = runner._trim(
            cfg.vf_config.vf_nerf_config.ray_sampler_config.rays_per_batch)
        print(f"== joint stage: {args.epochs + 2} epochs x "
              f"{len(runner.dataset)} steps x {n_rays} rays "
              "(first 2 epochs = warmup/compile) ==", flush=True)
        runner.train()
        with open(os.path.join(runner.run_dir, "metrics.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        rates = sorted(r["rays_per_sec"] for r in rows[2:])
        median = rates[len(rates) // 2]
        print(json.dumps({
            "metric": "sustained joint-stage rays/sec (scan dispatch)",
            "value": round(median, 1),
            "unit": "rays/sec",
            "per_step_ms": round(n_rays / median * 1e3, 2),
            "n_rays": n_rays,
            "per_epoch": [round(r["rays_per_sec"], 1) for r in rows],
        }), flush=True)
        return

    config = parse_config(scene="boxroom", config_path=conf_path,
                          gpu=args.platform or "auto",
                          expname="throughput", data_root_dir=args.workdir,
                          offline=True)
    config.dataset_config.factor = 1  # keep all exported views
    config.num_epochs = args.epochs + 1
    if args.static_fine:
        config.vf_nerf_config.device_config.static_fine_growth = True
    if args.spd:
        config.vf_nerf_config.device_config.steps_per_dispatch = args.spd
    config.vf_nerf_config.device_config.train_remat = args.remat
    runner = VectorFieldNerfRunner(config)
    n_rays = runner._batch_rays()
    steps_per_epoch = len(runner.dataset)

    if args.pure:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from vf_nerf_tpu.parallel.train_step import (pack_batch,
                                                     pack_batch_compact,
                                                     pack_span_aux)
        spd = config.vf_nerf_config.device_config.steps_per_dispatch or 64
        rs = config.vf_nerf_config.ray_sampler_config
        if rs.fine_sampling():  # steady-state fine count after epoch 0
            runner.model.fine_n_samples = min(
                runner.model.fine_n_samples + 5, rs.max_samples)
        window = runner.model.update_annealing(2)
        compact = runner._use_compact()
        pack = pack_batch_compact if compact else pack_batch
        runner.dataset.sample_new_images()
        batches = list(runner.dataset.epoch_batches(runner._epoch_rng))
        packs = [pack({k: v[:n_rays] for k, v in
                       batches[i % len(batches)].items() if v.size > 0})
                 for i in range(spd)]
        fed = runner._feed_stack(np.stack(packs))
        key = np.asarray(jax.random.PRNGKey(7))
        aux = jnp.asarray(pack_span_aux(
            [2] * spd, [runner.model.fine_n_samples] * spd,
            np.stack([key] * spd),
            np.stack([np.asarray(window, np.float32)] * spd)))
        near, far = jnp.float32(runner.model.near), \
            jnp.float32(runner.model.far)
        centroid = jnp.asarray(runner.dataset.get_centroid())
        tables = ()
        if compact:
            tables = (jnp.asarray(np.asarray(runner.dataset.poses,
                                             np.float32)),
                      jnp.asarray(np.asarray(runner.dataset.intrinsics,
                                             np.float32)))
        span_step = runner._get_span_step()
        state = runner.model.state
        print(f"== warmup (2 x {spd}-step span dispatches, device-resident "
              "inputs) ==", flush=True)
        t0 = time.perf_counter()
        for _ in range(2):
            state, metrics = span_step(state, fed, aux, near, far,
                                       centroid, *tables)
        int(jax.device_get(state.step))
        print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)
        reps = max(1, (args.epochs * steps_per_epoch) // spd)
        print(f"== timing {reps} x {spd}-step dispatches ==", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, metrics = span_step(state, fed, aux, near, far,
                                       centroid, *tables)
        int(jax.device_get(state.step))
        elapsed = time.perf_counter() - t0
        per_step_s = elapsed / (reps * spd)
        print(json.dumps({
            "metric": "pure span-step rays/sec (device-resident inputs)",
            "value": round(reps * spd * n_rays / elapsed, 1),
            "unit": "rays/sec",
            "per_step_ms": round(per_step_s * 1e3, 2),
            "n_rays": n_rays,
            "remat": args.remat,
        }), flush=True)

        if args.attribution:
            # FLOP attribution (VERDICT r4 #8): XLA cost analysis of the
            # exact compiled span program (everything: fwd, bwd,
            # supervision, adam, metric sums), plus sub-budgets lowered
            # separately. Lowering uses ShapeDtypeStructs (no live arrays —
            # the span step donates). NOTE: cost_analysis counts a
            # while/scan BODY ONCE, not x trip-count (verified in-process
            # below), so the span program's flops ARE one step's flops —
            # no division by steps_per_dispatch.
            import optax

            def _scan_cost_probe():
                def make(n):
                    def f(x, w):
                        def body(c, _):
                            return jnp.tanh(c @ w), None
                        return jax.lax.scan(body, x, None, length=n)[0]
                    return jax.jit(f)
                s = jax.ShapeDtypeStruct((128, 128), jnp.float32)
                fl = []
                for n in (2, 8):
                    c = make(n).lower(s, s).compile().cost_analysis()
                    if isinstance(c, (list, tuple)):
                        c = c[0] if c else {}
                    fl.append(float(c.get("flops", float("nan"))))
                assert fl[0] == fl[1], (
                    "XLA cost_analysis multiplies scan bodies by trip "
                    f"count on this version ({fl}); the attribution must "
                    "divide the span program's flops by steps_per_dispatch")

            _scan_cost_probe()

            def abstract(tree):
                return jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                                   jnp.result_type(x)),
                    tree)

            def cost(jitted, *abs_args):
                c = jitted.lower(*abs_args).compile().cost_analysis()
                if isinstance(c, (list, tuple)):
                    c = c[0] if c else {}
                return {"flops": float(c.get("flops", float("nan"))),
                        "bytes": float(c.get("bytes accessed",
                                             float("nan")))}

            total = cost(span_step, abstract(state), abstract(fed),
                         abstract(aux), abstract(near), abstract(far),
                         abstract(centroid),
                         *[abstract(t) for t in tables])

            from vf_nerf_tpu.parallel.train_step import make_loss_fn

            # The EXACT loss closure the compiled step differentiates
            # (same statics/supervision/BN-quirk semantics).
            statics, sup = runner._step_statics()
            loss_fn = make_loss_fn(runner.model.modules, statics, sup,
                                   config.vf_loss_weights,
                                   config.vf_loss_config)
            params_abs = abstract(state.params)
            bs_abs = abstract(state.batch_stats)
            batch_ex = {k: v[:n_rays] for k, v in batches[0].items()
                        if v.size > 0}
            batch_abs = abstract({k: jnp.asarray(v)
                                  for k, v in batch_ex.items()})
            key_abs = abstract(jax.random.PRNGKey(0))
            scalar = jax.ShapeDtypeStruct((), jnp.float32)
            epoch_abs = jax.ShapeDtypeStruct((), jnp.int32)
            c_abs = jax.ShapeDtypeStruct((3,), jnp.float32)
            def fwd_fn(params, bstats, batch, k1, k2, ep, w, nr, fr, cen):
                return loss_fn(params, bstats, batch, k1, k2, ep, w, nr,
                               fr, cen)[0]

            args_abs = (params_abs, bs_abs, batch_abs, key_abs, key_abs,
                        epoch_abs, abstract(window), scalar, scalar, c_abs)
            loss_fwd = cost(jax.jit(fwd_fn), *args_abs)

            def fwd_bwd_fn(params, bstats, batch, k1, k2, ep, w, nr, fr,
                           cen):
                return jax.value_and_grad(fwd_fn)(params, bstats, batch,
                                                  k1, k2, ep, w, nr, fr,
                                                  cen)

            loss_grad = cost(jax.jit(fwd_bwd_fn), *args_abs)

            # Optimizer-only budget: the model's REAL transform (adam +
            # clip + the duplicate-VF quirk), lowered on abstract grads.
            tx = runner.model.optimizer
            opt_abs = jax.eval_shape(tx.init, params_abs)

            def opt_step(g, s, p):
                u, s2 = tx.update(g, s, p)
                return optax.apply_updates(p, u), s2

            adam = cost(jax.jit(opt_step), params_abs, opt_abs, params_abs)

            n_params = sum(int(np.prod(x.shape)) for x in
                           jax.tree_util.tree_leaves(params_abs))
            step_flops = total["flops"]  # scan body counted once (probe)
            residual = step_flops - loss_grad["flops"] - adam["flops"]
            print(json.dumps({
                "metric": "train-step FLOP attribution",
                "steps_per_dispatch": spd,
                "n_rays": n_rays,
                "fine_samples": runner.model.fine_n_samples,
                "n_params": n_params,
                "total_flops_per_step": step_flops,
                "loss_forward_flops": loss_fwd["flops"],
                "loss_fwd_bwd_flops": loss_grad["flops"],
                "backward_flops": loss_grad["flops"] - loss_fwd["flops"],
                "optimizer_flops": adam["flops"],
                "misc_flops_residual": residual,
                "hbm_bytes_per_step": total["bytes"],
                "measured_per_step_ms": round(per_step_s * 1e3, 3),
                "effective_tflops_per_sec": round(
                    step_flops / per_step_s / 1e12, 2),
                "flops_per_ray": round(step_flops / n_rays),
            }), flush=True)
        return

    if args.span:
        import jax
        spd = config.vf_nerf_config.device_config.steps_per_dispatch
        # Warmup must execute every dispatch shape the TIMED run will
        # produce (the full chunk and the timed run's tail) — the relay
        # compiles server-side at first execution of each shape, which
        # would otherwise land inside the timed region. After the epoch-0
        # save flush, the warmup dispatches (warm-1)*steps_per_epoch steps
        # in `chunk`-sized pieces; choosing warm = epochs + m + 1 with
        # m*steps_per_epoch ≡ 0 (mod chunk) makes the warmup tail length
        # CONGRUENT to the timed tail (epochs*steps_per_epoch mod chunk),
        # so both the chunk shape and the exact tail shape are pre-compiled
        # for any --epochs/--spd combination.
        import math
        chunk = spd if spd > 0 else steps_per_epoch
        m = chunk // math.gcd(chunk, steps_per_epoch)
        warm = args.epochs + m + 1
        print(f"== warmup ({warm} epochs through _train_span) ==",
              flush=True)
        t0 = time.perf_counter()
        config.start_epoch, config.num_epochs = 0, warm
        runner._train_span(spd)
        int(jax.device_get(runner.model.state.step))
        print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)
        print(f"== timing {args.epochs} epochs x {steps_per_epoch} steps "
              f"x {n_rays} rays (span) ==", flush=True)
        config.start_epoch, config.num_epochs = warm, warm + args.epochs
        t0 = time.perf_counter()
        runner._train_span(spd)
        int(jax.device_get(runner.model.state.step))
        elapsed = time.perf_counter() - t0
        total_rays = args.epochs * steps_per_epoch * n_rays
        print(json.dumps({
            "metric": "sustained train rays/sec (span dispatch)",
            "value": round(total_rays / elapsed, 1),
            "unit": "rays/sec",
            "per_step_ms": round(
                elapsed / (args.epochs * steps_per_epoch) * 1e3, 2),
            "n_rays": n_rays,
        }), flush=True)
        return

    # The epoch-ahead assembler (runner.train()'s scan-mode path):
    # epoch-boundary host work overlaps the in-flight device scan.
    from vf_nerf_tpu.train.runner import _EpochAssembler
    spd = config.vf_nerf_config.device_config.steps_per_dispatch
    assembler = _EpochAssembler(runner, range(0, args.epochs + 2), depth=2) \
        if spd != 1 else None
    if assembler is None:
        runner.dataset.sample_new_images()

    print("== warmup epochs (compile + first relay execution) ==", flush=True)
    t0 = time.perf_counter()
    import jax
    # Two epochs + a hard sync: the scan dispatch is async and its FIRST
    # execution through the relay pays the remote compile (~1-3 min); the
    # deferred epoch-log fetch would otherwise absorb that wait inside the
    # timed region.
    runner.train_epoch(0, assembler)
    runner.train_epoch(1, assembler)
    runner._resolve_pending_log()
    int(jax.device_get(runner.model.state.step))
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    print(f"== timing {args.epochs} epochs x {steps_per_epoch} steps "
          f"x {n_rays} rays ==", flush=True)
    t0 = time.perf_counter()
    for epoch in range(2, args.epochs + 2):
        runner.train_epoch(epoch, assembler)
    runner._resolve_pending_log()
    int(jax.device_get(runner.model.state.step))
    elapsed = time.perf_counter() - t0
    total_rays = args.epochs * steps_per_epoch * n_rays
    per_step_ms = elapsed / (args.epochs * steps_per_epoch) * 1e3
    print(json.dumps({
        "metric": "sustained train rays/sec (runner end-to-end)",
        "value": round(total_rays / elapsed, 1),
        "unit": "rays/sec",
        "per_step_ms": round(per_step_ms, 2),
        "n_rays": n_rays,
    }), flush=True)


if __name__ == "__main__":
    main()
