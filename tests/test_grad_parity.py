"""Gradient parity: one training step's parameter gradients vs the
reference's autograd.

Setup mirrors a deterministic training iteration: transplanted weights, a
fitted field (so surface crossings exist), perturb off, rays filtered to
those whose coarse argmax > 0 (fully deterministic fine sampling in both
implementations), border/centre supervision off (it samples points with
different RNGs). Loss = rgb L1 + clamped depth L1 + unit-norm — the shared
deterministic terms. Gradients are compared per parameter tensor.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402

from test_render_parity_e2e import build_reference_model, trained_setup  # noqa: E402,F401
from vf_nerf_tpu.models.renderer import RenderStatics, render_rays  # noqa: E402


def test_gradient_parity(trained_setup):  # noqa: F811
    cfg, modules, variables = trained_setup
    ref_model = build_reference_model(cfg, variables)
    ref_model.vector_field_network.eval()   # BN frozen, like our train quirk
    ref_model.rendering_network.eval()

    rng = np.random.RandomState(0)
    n_rays = 64
    uv = rng.uniform(0, 40, (n_rays, 2)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    pose[:, :3, 3] = [0.1, -0.2, 0.05]
    intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 30.0
    intr[:, 0, 2], intr[:, 1, 2] = 20.0, 16.0
    near, far = 0.0, 4.0
    ref_model.ray_sampler.near, ref_model.ray_sampler.far = near, far
    ref_model.fine_sampler.near, ref_model.fine_sampler.far = near, far

    gt_rgb = rng.rand(n_rays, 3).astype(np.float32)
    gt_depth = rng.uniform(0.5, 3.0, (n_rays, 1)).astype(np.float32)

    # --- determine the deterministic rays via a no-grad reference pass ----
    torch.manual_seed(0)
    with torch.no_grad():
        probe = ref_model.render(torch.from_numpy(pose),
                                 torch.from_numpy(uv),
                                 torch.from_numpy(intr), epoch=0)
    statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
    ours_probe = render_rays(modules, variables, jnp.asarray(uv),
                             jnp.asarray(pose), jnp.asarray(intr),
                             jnp.float32(near), jnp.float32(far),
                             jnp.asarray(cfg.cos_sim_weights),
                             jax.random.PRNGKey(1), statics)
    det = np.all(np.abs(probe.z_vals.numpy() -
                        np.asarray(ours_probe["z_vals"])) < 1e-5, axis=1)
    assert det.sum() >= 8, f"too few deterministic rays: {det.sum()}"
    idx = np.nonzero(det)[0]

    uv, pose, intr = uv[idx], pose[idx], intr[idx]
    gt_rgb, gt_depth = gt_rgb[idx], gt_depth[idx]

    # ------------------------------------------------- reference gradients
    torch.manual_seed(0)
    out = ref_model.render(torch.from_numpy(pose), torch.from_numpy(uv),
                           torch.from_numpy(intr), epoch=0)
    rgb_loss = torch.nn.functional.l1_loss(out.coarse_rgb_values,
                                           torch.from_numpy(gt_rgb))
    depth_loss = torch.nn.functional.l1_loss(
        out.coarse_depth_map, torch.from_numpy(gt_depth),
        reduction="none").clamp(max=0.5).mean()
    norms = torch.norm(out.coarse_normals.reshape(-1, 3), dim=1)
    unit_loss = torch.mean((norms - 1.0) ** 2)
    total_ref = 2.0 * rgb_loss + 0.5 * depth_loss + 0.1 * unit_loss
    total_ref.backward()

    ref_grads = {name: p.grad.numpy() if p.grad is not None else None
                 for name, p in
                 ref_model.vector_field_network.named_parameters()}
    ref_rn_grads = {name: p.grad.numpy() if p.grad is not None else None
                    for name, p in
                    ref_model.rendering_network.named_parameters()}
    ref_density_grads = {
        "beta": ref_model.density.beta.grad,
        "scale": ref_model.density.scale.grad,
        "mean": ref_model.density.mean.grad}

    # ------------------------------------------------------ our gradients
    def loss_fn(params):
        vars_ = {"params": params,
                 "batch_stats": variables["batch_stats"]}
        o = render_rays(modules, vars_, jnp.asarray(uv), jnp.asarray(pose),
                        jnp.asarray(intr), jnp.float32(near),
                        jnp.float32(far), jnp.asarray(cfg.cos_sim_weights),
                        jax.random.PRNGKey(1), statics)
        rgb_l = jnp.mean(jnp.abs(o["rgb"] - gt_rgb))
        depth_l = jnp.mean(jnp.minimum(jnp.abs(o["depth"] - gt_depth), 0.5))
        n = jnp.linalg.norm(o["normals"].reshape(-1, 3), axis=1)
        unit_l = jnp.mean((n - 1.0) ** 2)
        return 2.0 * rgb_l + 0.5 * depth_l + 0.1 * unit_l

    total_ours, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(total_ours), float(total_ref),
                               rtol=1e-4, atol=1e-5)

    # --- compare per-tensor: vf net ---------------------------------------
    def check(our, theirs, name, transpose=False, rtol=3e-2, atol=2e-5):
        """fp32 reassociation across the 9-layer backward gives ~1% spread
        between XLA and torch; assert agreement at that level plus a tight
        bound on the overall gradient direction."""
        if theirs is None:
            return
        ours_np = np.asarray(our)
        if transpose:
            ours_np = ours_np.T
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(
            ours_np, theirs, rtol=rtol, atol=max(atol, 6e-3 * scale),
            err_msg=name)
        cos = np.sum(ours_np * theirs) / max(
            np.linalg.norm(ours_np) * np.linalg.norm(theirs), 1e-12)
        assert cos > 0.9999, f"{name}: gradient direction cosine {cos}"

    vf_g = grads["vf"]
    n_vf_layers = len(cfg.vf_net_config.dimensions) + 1
    for i in range(n_vf_layers):
        has_bn = cfg.vf_net_config.batch_norm and i < n_vf_layers - 1
        prefix = f"layers.{i}.0" if has_bn else f"layers.{i}"
        check(vf_g[f"layer_{i}"]["Dense_0"]["kernel"],
              ref_grads.get(f"{prefix}.weight"), f"vf layer {i} W",
              transpose=True)
        check(vf_g[f"layer_{i}"]["Dense_0"]["bias"],
              ref_grads.get(f"{prefix}.bias"), f"vf layer {i} b")
        if has_bn:
            check(vf_g[f"layer_{i}"]["BatchNorm_0"]["scale"],
                  ref_grads.get(f"layers.{i}.1.weight"), f"vf bn {i} γ")
            check(vf_g[f"layer_{i}"]["BatchNorm_0"]["bias"],
                  ref_grads.get(f"layers.{i}.1.bias"), f"vf bn {i} β")

    rn_g = grads["render"]
    n_rn_layers = len(cfg.rendering_net_config.dimensions) + 1
    for i in range(n_rn_layers):
        has_bn = cfg.rendering_net_config.batch_norm and i < n_rn_layers - 1
        prefix = f"layers.{i}.0" if has_bn else f"layers.{i}"
        check(rn_g[f"layer_{i}"]["Dense_0"]["kernel"],
              ref_rn_grads.get(f"{prefix}.weight"), f"rn layer {i} W",
              transpose=True)
        check(rn_g[f"layer_{i}"]["Dense_0"]["bias"],
              ref_rn_grads.get(f"{prefix}.bias"), f"rn layer {i} b")

    d_g = grads["density"]
    for name in ("beta", "scale", "mean"):
        theirs = ref_density_grads[name]
        if theirs is not None:
            ours_val = float(getattr(d_g, name))
            theirs_val = float(theirs)
            assert abs(ours_val - theirs_val) <= \
                2e-3 * max(abs(theirs_val), 1e-6) + 1e-7, \
                f"density {name}: {ours_val} vs {theirs_val}"


def test_duplicate_vf_optimizer_exact_vs_torch():
    """The duplicate-VF quirk optimizer vs torch Adam + ExponentialLR +
    clip_grad_norm_ with the VF tensors listed twice (exactly the reference's
    ``parameters()`` with fine sampling on, ``vector_field_nerf.py:127-137``)
    — identical synthetic gradients, exact per-step parameter equality."""
    import optax

    from vf_nerf_tpu.config.schema import SchedulerConfig as OurSched
    from vf_nerf_tpu.models.nerf import make_optimizer
    from vf_nerf_tpu.ops.density import DensityParams

    rng = np.random.RandomState(0)
    vf_a0 = rng.randn(4, 3).astype(np.float32)
    vf_b0 = rng.randn(5).astype(np.float32)
    rn_w0 = rng.randn(3, 3).astype(np.float32)
    d0 = np.array([0.5, 100.0, 0.7], np.float32)

    params = {"vf": {"a": jnp.asarray(vf_a0), "b": jnp.asarray(vf_b0)},
              "render": {"w": jnp.asarray(rn_w0)},
              "density": DensityParams(beta=jnp.asarray(d0[0]),
                                       scale=jnp.asarray(d0[1]),
                                       mean=jnp.asarray(d0[2]))}
    tx, _ = make_optimizer(OurSched(lr=1e-3, lr_decay_factor=0.1,
                                    lr_decay_steps=100, clip_norm=0.5,
                                    weight_decay=0.0), duplicate_vf=True)
    opt_state = tx.init(params)

    t_vf_a = torch.nn.Parameter(torch.from_numpy(vf_a0.copy()))
    t_vf_b = torch.nn.Parameter(torch.from_numpy(vf_b0.copy()))
    t_rn_w = torch.nn.Parameter(torch.from_numpy(rn_w0.copy()))
    t_d = [torch.nn.Parameter(torch.tensor(float(x))) for x in d0]
    # VF tensors listed twice, like the reference facade's parameters().
    dup_list = [t_vf_a, t_vf_b, t_rn_w, *t_d, t_vf_a, t_vf_b]
    opt = torch.optim.Adam(dup_list, lr=1e-3, weight_decay=0.0)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, 0.1 ** (1.0 / 100))

    for step_i in range(10):
        g_rng = np.random.RandomState(100 + step_i)
        # Alternate large/small grads so clipping engages on some steps only.
        mag = 3.0 if step_i % 2 == 0 else 0.05
        g = {"vf": {"a": g_rng.randn(4, 3).astype(np.float32) * mag,
                    "b": g_rng.randn(5).astype(np.float32) * mag},
             "render": {"w": g_rng.randn(3, 3).astype(np.float32) * mag},
             "density": np.array(g_rng.randn(3), np.float32) * mag}

        opt.zero_grad()
        t_vf_a.grad = torch.from_numpy(g["vf"]["a"].copy())
        t_vf_b.grad = torch.from_numpy(g["vf"]["b"].copy())
        t_rn_w.grad = torch.from_numpy(g["render"]["w"].copy())
        for p, gv in zip(t_d, g["density"]):
            p.grad = torch.tensor(float(gv))
        torch.nn.utils.clip_grad_norm_(dup_list, 0.5)
        opt.step()
        sched.step()

        grads = {"vf": {k: jnp.asarray(v) for k, v in g["vf"].items()},
                 "render": {"w": jnp.asarray(g["render"]["w"])},
                 "density": DensityParams(*[jnp.asarray(x)
                                            for x in g["density"]])}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(np.asarray(params["vf"]["a"]),
                                   t_vf_a.detach().numpy(), atol=1e-6,
                                   err_msg=f"vf.a step {step_i}")
        np.testing.assert_allclose(np.asarray(params["vf"]["b"]),
                                   t_vf_b.detach().numpy(), atol=1e-6,
                                   err_msg=f"vf.b step {step_i}")
        np.testing.assert_allclose(np.asarray(params["render"]["w"]),
                                   t_rn_w.detach().numpy(), atol=1e-6,
                                   err_msg=f"render.w step {step_i}")
        for name, tp in zip(("beta", "scale", "mean"), t_d):
            assert float(getattr(params["density"], name)) == pytest.approx(
                float(tp), abs=1e-6), f"density {name} step {step_i}"


def test_training_trajectory_parity(trained_setup):  # noqa: F811
    """Six full optimizer steps vs the reference's Adam + per-iteration
    ExponentialLR + global-norm clip 0.5 (``vector_field_nerf.py:63-67``,
    ``vector_field_nerf_train.py:251-260``): shared deterministic batches,
    transplanted weights; asserts per-step loss equality and per-tensor
    parameter drift agreement. Pins optimizer/schedule semantics (Adam eps,
    bias correction, LR-decay timing, clip ordering) that single-step
    gradient parity cannot see."""
    import optax

    from vf_nerf_tpu.config.schema import SchedulerConfig as OurSched
    from vf_nerf_tpu.models.nerf import make_optimizer

    cfg, modules, variables = trained_setup
    ref_model = build_reference_model(cfg, variables)
    ref_model.vector_field_network.eval()   # BN frozen (trainer quirk)
    ref_model.rendering_network.eval()

    n_steps = 6
    rng = np.random.RandomState(0)
    n_rays = 64
    uv = rng.uniform(0, 40, (n_rays, 2)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    pose[:, :3, 3] = [0.1, -0.2, 0.05]
    intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 30.0
    intr[:, 0, 2], intr[:, 1, 2] = 20.0, 16.0
    near, far = 0.0, 4.0
    ref_model.ray_sampler.near, ref_model.ray_sampler.far = near, far
    ref_model.fine_sampler.near, ref_model.fine_sampler.far = near, far
    gt_rgb = rng.rand(n_rays, 3).astype(np.float32)
    gt_depth = rng.uniform(0.5, 3.0, (n_rays, 1)).astype(np.float32)

    # Keep only rays deterministic in both implementations (coarse argmax>0).
    statics = RenderStatics.from_config(cfg, n_fine=6, train=False)
    torch.manual_seed(0)
    with torch.no_grad():
        probe = ref_model.render(torch.from_numpy(pose),
                                 torch.from_numpy(uv),
                                 torch.from_numpy(intr), epoch=0)
    ours_probe = render_rays(modules, variables, jnp.asarray(uv),
                             jnp.asarray(pose), jnp.asarray(intr),
                             jnp.float32(near), jnp.float32(far),
                             jnp.asarray(cfg.cos_sim_weights),
                             jax.random.PRNGKey(1), statics)
    det = np.all(np.abs(probe.z_vals.numpy() -
                        np.asarray(ours_probe["z_vals"])) < 1e-5, axis=1)
    assert det.sum() >= 8
    idx = np.nonzero(det)[0]
    uv, pose, intr = uv[idx], pose[idx], intr[idx]
    gt_rgb, gt_depth = gt_rgb[idx], gt_depth[idx]
    t_pose, t_uv, t_intr = map(torch.from_numpy, (pose, uv, intr))
    t_rgb, t_depth = torch.from_numpy(gt_rgb), torch.from_numpy(gt_depth)

    # --- reference trajectory: the RefModel's OWN optimizer + scheduler ----
    # (built at vector_field_nerf.py:63-67 from the same lr=5e-4,
    # decay 0.1^(1/100) that build_reference_model passes).
    ref_losses = []
    ref_z = []
    for _ in range(n_steps):
        torch.manual_seed(0)
        out = ref_model.render(t_pose, t_uv, t_intr, epoch=0)
        rgb_l = torch.nn.functional.l1_loss(out.coarse_rgb_values, t_rgb)
        depth_l = torch.nn.functional.l1_loss(
            out.coarse_depth_map, t_depth,
            reduction="none").clamp(max=0.5).mean()
        norms = torch.norm(out.coarse_normals.reshape(-1, 3), dim=1)
        unit_l = torch.mean((norms - 1.0) ** 2)
        total = 2.0 * rgb_l + 0.5 * depth_l + 0.1 * unit_l
        ref_model.optimizer.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 0.5)
        ref_model.optimizer.step()
        ref_model.scheduler.step()
        ref_losses.append(float(total))
        ref_z.append(out.z_vals.detach().numpy())

    # --- our trajectory: production make_optimizer (Adam + exp decay + clip).
    # duplicate_vf reproduces the reference's duplicated-VF-params quirk
    # (fine sampling is on in this config, as in every reference run).
    tx, schedule = make_optimizer(
        OurSched(lr=5e-4, lr_decay_factor=0.1, lr_decay_steps=100,
                 clip_norm=0.5, weight_decay=0.0), decay_steps=100,
        duplicate_vf=True)
    params = variables["params"]
    opt_state = tx.init(params)
    batch_stats = variables["batch_stats"]

    def loss_fn(params):
        vars_ = {"params": params, "batch_stats": batch_stats}
        o = render_rays(modules, vars_, jnp.asarray(uv), jnp.asarray(pose),
                        jnp.asarray(intr), jnp.float32(near),
                        jnp.float32(far), jnp.asarray(cfg.cos_sim_weights),
                        jax.random.PRNGKey(1), statics)
        rgb_l = jnp.mean(jnp.abs(o["rgb"] - gt_rgb))
        depth_l = jnp.mean(jnp.minimum(jnp.abs(o["depth"] - gt_depth), 0.5))
        n = jnp.linalg.norm(o["normals"].reshape(-1, 3), axis=1)
        unit_l = jnp.mean((n - 1.0) ** 2)
        return 2.0 * rgb_l + 0.5 * depth_l + 0.1 * unit_l, o["z_vals"]

    @jax.jit
    def step(params, opt_state):
        (loss, z), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, z

    our_losses = []
    for t in range(n_steps):
        params, opt_state, loss, z = step(params, opt_state)
        our_losses.append(float(loss))
        # Both sides must have sampled identical fine depths this step —
        # guards against a ray's argmax drifting to 0 (non-deterministic).
        np.testing.assert_allclose(np.asarray(z), ref_z[t], atol=1e-4,
                                   err_msg=f"z divergence at step {t}")

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)

    # LR schedules decayed identically (per-iteration timing).
    assert float(schedule(n_steps)) == pytest.approx(
        ref_model.scheduler.get_last_lr()[0], rel=1e-5)

    # --- per-tensor parameter drift ----------------------------------------
    ref_vf = dict(ref_model.vector_field_network.named_parameters())
    ref_rn = dict(ref_model.rendering_network.named_parameters())
    p0 = variables["params"]

    def check_drift(our_new, our_old, theirs_final, theirs_init, name,
                    transpose=False):
        d_ours = np.asarray(our_new) - np.asarray(our_old)
        if transpose:
            d_ours = d_ours.T
        d_ref = theirs_final.detach().numpy() - theirs_init
        scale = np.linalg.norm(d_ref)
        if scale < 1e-9:
            assert np.linalg.norm(d_ours) < 1e-7, f"{name}: spurious drift"
            return
        # Adam's ~sign(g) normalization turns fp32 forward/backward noise on
        # near-zero-grad elements into ±lr update differences (doubled for
        # VF by the duplicate quirk), so drift tolerances are noise-level;
        # exact optimizer semantics are pinned separately by
        # test_duplicate_vf_optimizer_exact_vs_torch.
        err = np.linalg.norm(d_ours - d_ref) / scale
        assert err < 0.3, f"{name}: drift error {err:.4f}"
        cos = np.sum(d_ours * d_ref) / max(
            np.linalg.norm(d_ours) * scale, 1e-12)
        assert cos > 0.97, f"{name}: drift cosine {cos}"

    # Reconstruct initial torch tensors from our (shared) initial params.
    for net_key, ref_named, net_cfg in (
            ("vf", ref_vf, cfg.vf_net_config),
            ("render", ref_rn, cfg.rendering_net_config)):
        n_layers = len(net_cfg.dimensions) + 1
        for i in range(n_layers):
            has_bn = net_cfg.batch_norm and i < n_layers - 1
            prefix = f"layers.{i}.0" if has_bn else f"layers.{i}"
            lp0 = p0[net_key][f"layer_{i}"]
            lpN = params[net_key][f"layer_{i}"]
            check_drift(lpN["Dense_0"]["kernel"], lp0["Dense_0"]["kernel"],
                        ref_named[f"{prefix}.weight"],
                        np.asarray(lp0["Dense_0"]["kernel"]).T,
                        f"{net_key} layer {i} W", transpose=True)
            check_drift(lpN["Dense_0"]["bias"], lp0["Dense_0"]["bias"],
                        ref_named[f"{prefix}.bias"],
                        np.asarray(lp0["Dense_0"]["bias"]),
                        f"{net_key} layer {i} b")
            if has_bn:
                check_drift(lpN["BatchNorm_0"]["scale"],
                            lp0["BatchNorm_0"]["scale"],
                            ref_named[f"layers.{i}.1.weight"],
                            np.asarray(lp0["BatchNorm_0"]["scale"]),
                            f"{net_key} bn {i} γ")
                check_drift(lpN["BatchNorm_0"]["bias"],
                            lp0["BatchNorm_0"]["bias"],
                            ref_named[f"layers.{i}.1.bias"],
                            np.asarray(lp0["BatchNorm_0"]["bias"]),
                            f"{net_key} bn {i} β")

    for name in ("beta", "scale", "mean"):
        d_ours = float(getattr(params["density"], name)) - \
            float(getattr(p0["density"], name))
        d_ref = float(getattr(ref_model.density, name)) - \
            float(getattr(p0["density"], name))
        assert abs(d_ours - d_ref) <= 0.3 * max(abs(d_ref), 1e-8) + 1e-6, \
            f"density {name}: drift {d_ours} vs {d_ref}"
