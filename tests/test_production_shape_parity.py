"""Production-shape oracle parity (VERDICT r3 #4).

The existing e2e parity tests prove the math matches at ~32-wide toy shapes
(``test_render_parity_e2e.py``); this slow-marked module closes the gap to
the SHIPPED configuration: one 1024-ray chunk at the full ``confs/
vf_nerf.conf`` shapes — 8×256 VF net + 256-wide rendering net, 100 coarse +
30 fine samples, frozen BN, perturb off — against the torch reference facade
with transplanted weights, plus per-tensor gradient direction cosines at the
same shape.

These run in the full default suite (they ARE part of "tests/ green");
deselect for a quick pass with ``-m "not slow"``.
"""

import dataclasses
import os
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from reference_oracle import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402

from test_render_parity_e2e import build_reference_model  # noqa: E402
from vf_nerf_tpu.models.renderer import (RenderStatics, VFNerfModules,  # noqa: E402
                                         render_rays)

pytestmark = pytest.mark.slow

N_RAYS = 1024
N_FINE = 30


@pytest.fixture(scope="module")
def production_setup():
    """The shipped config with a fitted full-size field (surface crossings
    make the reference's fine sampling deterministic for most rays)."""
    from vf_nerf_tpu.config.parser import parse_config
    from vf_nerf_tpu.train.vf_init import fit_vf_init

    repo = str(Path(__file__).resolve().parents[1])
    cfg = parse_config(scene="office0",
                       config_path=os.path.join(repo, "confs",
                                                "vf_nerf.conf"),
                       expname="prod_parity").vf_nerf_config
    cfg = dataclasses.replace(
        cfg,
        ray_sampler_config=dataclasses.replace(cfg.ray_sampler_config,
                                               perturb=False))
    modules = VFNerfModules(cfg)
    variables = modules.init_variables(jax.random.PRNGKey(0))
    vf_params, vf_stats = fit_vf_init(cfg.vf_net_config, "exterior_scene",
                                      np.zeros(3), sample_extent=3.0,
                                      wall_radius=1.5, steps=150,
                                      batch=2048, seed=0)
    variables = {
        "params": {**variables["params"], "vf": vf_params},
        "batch_stats": {**variables["batch_stats"], "vf": vf_stats},
    }
    return cfg, modules, variables


def _rays(n_rays):
    rng = np.random.RandomState(0)
    uv = rng.uniform(0, 640, (n_rays, 2)).astype(np.float32)
    pose = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    pose[:, :3, 3] = [0.1, -0.2, 0.05]
    intr = np.tile(np.eye(4, dtype=np.float32), (n_rays, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 480.0
    intr[:, 0, 2], intr[:, 1, 2] = 320.0, 240.0
    return uv, pose, intr


def test_shipped_config_shapes(production_setup):
    cfg, _, _ = production_setup
    v, r, s = (cfg.vf_net_config, cfg.rendering_net_config,
               cfg.ray_sampler_config)
    assert list(v.dimensions) == [256] * 8
    assert list(r.dimensions) == [256, 256, 256, 256]
    assert (s.n_samples, s.n_importance, s.rays_per_batch) == (100, 30, 1024)


def test_production_shape_forward_parity(production_setup):
    """One 1024-ray chunk at the shipped shapes: rgb/depth/normals within
    rtol 1e-4 of the torch facade on the deterministic rays."""
    cfg, modules, variables = production_setup
    ref_model = build_reference_model(cfg, variables)

    uv, pose, intr = _rays(N_RAYS)
    near, far = 0.0, 4.0
    ref_model.ray_sampler.near, ref_model.ray_sampler.far = near, far
    ref_model.fine_sampler.near, ref_model.fine_sampler.far = near, far

    torch.manual_seed(0)
    with torch.no_grad():
        ref_out = ref_model.render(torch.from_numpy(pose),
                                   torch.from_numpy(uv),
                                   torch.from_numpy(intr), epoch=0)

    statics = RenderStatics.from_config(cfg, n_fine=N_FINE, train=False)
    ours = render_rays(modules, variables, jnp.asarray(uv),
                       jnp.asarray(pose), jnp.asarray(intr),
                       jnp.float32(near), jnp.float32(far),
                       jnp.asarray(cfg.cos_sim_weights),
                       jax.random.PRNGKey(1), statics)

    # Deterministic rays: reference fine-z matches ours exactly (rays with
    # coarse argmax 0 get torch-random extra depths even with perturb off).
    z_ref = ref_out.z_vals.numpy()
    z_ours = np.asarray(ours["z_vals"])
    det = np.all(np.abs(z_ref - z_ours) < 1e-5, axis=1)
    assert det.sum() >= N_RAYS // 2, \
        f"too few deterministic rays: {det.sum()}/{N_RAYS}"

    np.testing.assert_allclose(
        np.asarray(ours["rgb"])[det],
        ref_out.coarse_rgb_values.numpy()[det], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours["depth"])[det],
        ref_out.coarse_depth_map.numpy()[det], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours["normals"])[det],
        ref_out.coarse_normals.numpy()[det], rtol=1e-4, atol=1e-5)


def test_production_shape_grad_cosine(production_setup):
    """Per-tensor gradient direction cosine > 0.999 at the shipped shape
    (512 deterministic rays; loss = the shared deterministic terms)."""
    cfg, modules, variables = production_setup
    ref_model = build_reference_model(cfg, variables)
    ref_model.vector_field_network.eval()
    ref_model.rendering_network.eval()

    uv, pose, intr = _rays(N_RAYS)
    near, far = 0.0, 4.0
    ref_model.ray_sampler.near, ref_model.ray_sampler.far = near, far
    ref_model.fine_sampler.near, ref_model.fine_sampler.far = near, far
    rng = np.random.RandomState(1)
    gt_rgb = rng.rand(N_RAYS, 3).astype(np.float32)
    gt_depth = rng.uniform(0.5, 3.0, (N_RAYS, 1)).astype(np.float32)

    statics = RenderStatics.from_config(cfg, n_fine=N_FINE, train=False)
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
    idx = np.nonzero(det)[0][:512]
    assert len(idx) >= 256, f"too few deterministic rays: {det.sum()}"
    uv, pose, intr = uv[idx], pose[idx], intr[idx]
    gt_rgb, gt_depth = gt_rgb[idx], gt_depth[idx]

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
    (2.0 * rgb_loss + 0.5 * depth_loss + 0.1 * unit_loss).backward()
    ref_vf = {n: p.grad.numpy() if p.grad is not None else None for n, p in
              ref_model.vector_field_network.named_parameters()}
    ref_rn = {n: p.grad.numpy() if p.grad is not None else None for n, p in
              ref_model.rendering_network.named_parameters()}

    def loss_fn(params):
        vars_ = {"params": params, "batch_stats": variables["batch_stats"]}
        o = render_rays(modules, vars_, jnp.asarray(uv), jnp.asarray(pose),
                        jnp.asarray(intr), jnp.float32(near),
                        jnp.float32(far), jnp.asarray(cfg.cos_sim_weights),
                        jax.random.PRNGKey(1), statics)
        rgb_l = jnp.mean(jnp.abs(o["rgb"] - gt_rgb))
        depth_l = jnp.mean(jnp.minimum(jnp.abs(o["depth"] - gt_depth), 0.5))
        n = jnp.linalg.norm(o["normals"].reshape(-1, 3), axis=1)
        return 2.0 * rgb_l + 0.5 * depth_l + 0.1 * jnp.mean((n - 1.0) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])

    def cosine(our, theirs, transpose):
        a = np.asarray(our)
        if transpose:
            a = a.T
        return float((a * theirs).sum() /
                     max(np.linalg.norm(a) * np.linalg.norm(theirs), 1e-12))

    checked = 0
    for net_key, net_cfg, ref_g in (("vf", cfg.vf_net_config, ref_vf),
                                    ("render", cfg.rendering_net_config,
                                     ref_rn)):
        g = grads[net_key]
        n_layers = len(net_cfg.dimensions) + 1
        for i in range(n_layers):
            has_bn = net_cfg.batch_norm and i < n_layers - 1
            prefix = f"layers.{i}.0" if has_bn else f"layers.{i}"
            for ours_name, ref_name, tr in (
                    ("kernel", f"{prefix}.weight", True),
                    ("bias", f"{prefix}.bias", False)):
                theirs = ref_g.get(ref_name)
                if theirs is None:
                    continue
                cos = cosine(g[f"layer_{i}"]["Dense_0"][ours_name], theirs,
                             tr)
                assert cos > 0.999, \
                    f"{net_key} layer {i} {ours_name}: cosine {cos}"
                checked += 1
    assert checked >= 20, f"only {checked} tensors compared"
