"""Network tests: shapes, parameter-count parity, and — the strong check —
forward parity against the reference torch nets with transplanted weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import add_reference_to_path, reference_available
from vf_nerf_tpu.config.schema import RenderingNetConfig, VFNetConfig
from vf_nerf_tpu.models.networks import (RenderingMLP, VectorFieldMLP,
                                         directional_derivatives,
                                         numerical_vf_jacobian, vf_jacobian)
from vf_nerf_tpu.utils.torch_import import mlp_state_from_torch

VF_CFG = VFNetConfig(input_dims=3, output_dims=3, dimensions=[256] * 8,
                     feature_vector_dims=256, embedder_multires=6,
                     weight_norm=False, batch_norm=True,
                     skip_connection_in=[4], bias_init=0.0, dropout=False,
                     dropout_probability=0.2, xavier_init=False, init="")

RENDER_CFG = RenderingNetConfig(output_dims=3, dimensions=[256] * 4,
                                feature_vector_dims=256, weight_norm=False,
                                batch_norm=True, mode="idr",
                                embedder_multires=4, detach_normals=True)


def _init_vf(cfg=VF_CFG, n=16):
    net = VectorFieldMLP(cfg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((n, 3)), train=False)
    return net, variables


class TestVectorFieldMLP:
    def test_output_shape(self):
        net, variables = _init_vf()
        out = net.apply(variables, jnp.zeros((16, 3)), train=False)
        assert out.shape == (16, 259)
        assert np.all(np.abs(np.asarray(out[:, :3])) <= 1.0)  # tanh bounded

    def test_no_batch_norm_variant(self):
        import dataclasses
        cfg = dataclasses.replace(VF_CFG, batch_norm=False)
        net, variables = _init_vf(cfg)
        assert "batch_stats" not in variables
        out = net.apply(variables, jnp.zeros((4, 3)), train=False)
        assert out.shape == (4, 259)

    def test_jacobian_forward_vs_reverse_exact(self):
        net, variables = _init_vf()
        pts = jax.random.normal(jax.random.PRNGKey(1), (8, 3))

        def apply_fn(p):
            return net.apply(variables, p, train=False)

        jac_fwd = vf_jacobian(apply_fn, pts)
        # Exact oracle: reverse-mode per-point Jacobian.
        jac_rev = jax.vmap(jax.jacrev(lambda q: apply_fn(q[None, :])[0, :3]))(
            pts)
        np.testing.assert_allclose(np.asarray(jac_fwd), np.asarray(jac_rev),
                                   rtol=1e-4, atol=1e-5)

    def test_jacobian_numerical_close(self):
        # Central differences through PE(6) in fp32 carry O(f³ε²) truncation
        # noise — loose tolerance, small net.
        import dataclasses
        cfg = dataclasses.replace(VF_CFG, dimensions=[32] * 2,
                                  feature_vector_dims=8,
                                  skip_connection_in=None,
                                  embedder_multires=2, batch_norm=False)
        net, variables = _init_vf(cfg)
        pts = jax.random.normal(jax.random.PRNGKey(4), (8, 3))

        def apply_fn(p):
            return net.apply(variables, p, train=False)

        jac_fwd = vf_jacobian(apply_fn, pts)
        jac_num = numerical_vf_jacobian(apply_fn, pts, epsilon=1e-3)
        np.testing.assert_allclose(np.asarray(jac_fwd), np.asarray(jac_num),
                                   rtol=0.05, atol=5e-3)

    def test_directional_derivatives_shape_and_orthogonality(self):
        normals = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
        jac = jax.random.normal(jax.random.PRNGKey(3), (10, 3, 3))
        dd = directional_derivatives(normals, jac)
        assert dd.shape == (10, 2, 3)


class TestRenderingMLP:
    def test_output_shape_and_range(self):
        net = RenderingMLP(RENDER_CFG)
        n = 16
        args = (jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)),
                jnp.zeros((n, 256)))
        variables = net.init(jax.random.PRNGKey(0), *args, train=False)
        out = net.apply(variables, *args, train=False)
        assert out.shape == (n, 3)
        assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))

    def test_no_feature_vector_path(self):
        net = RenderingMLP(RENDER_CFG)
        n = 4
        args = (jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)),
                jnp.zeros((n, 0)))
        variables = net.init(jax.random.PRNGKey(0), *args, train=False)
        out = net.apply(variables, *args, train=False)
        assert out.shape == (n, 3)


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
class TestTorchParity:
    """Transplant reference torch weights into our Flax nets and compare."""

    def test_vf_forward_parity(self):
        add_reference_to_path()
        import torch
        from config_parser.vf_nerf_config import VFNetConfig as RefVFCfg
        from models.vector_field.vector_field_network import \
            VectorFieldNetwork

        torch.manual_seed(0)
        ref_cfg = RefVFCfg(input_dims=3, output_dims=3, dimensions=[256] * 8,
                           feature_vector_dims=256, embedder_multires=6,
                           weight_norm=False, batch_norm=True,
                           skip_connection_in=[4], bias_init=0.0,
                           dropout=False, dropout_probability=0.2,
                           xavier_init=False, init="")
        ref_net = VectorFieldNetwork(ref_cfg).eval()
        # Randomize BN running stats so the parity check exercises them.
        with torch.no_grad():
            for m in ref_net.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 2.0)

        params, batch_stats = mlp_state_from_torch(ref_net.state_dict(),
                                                   n_layers=9,
                                                   batch_norm=True,
                                                   weight_norm=False)
        net = VectorFieldMLP(VF_CFG)
        variables = {"params": params, "batch_stats": batch_stats}

        pts = np.random.RandomState(0).randn(32, 3).astype(np.float32)
        with torch.no_grad():
            theirs = ref_net(torch.from_numpy(pts)).numpy()
        ours = np.asarray(net.apply(variables, jnp.asarray(pts), train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_vf_jacobian_parity_vs_torch_autograd(self):
        add_reference_to_path()
        import torch
        from config_parser.vf_nerf_config import VFNetConfig as RefVFCfg
        from models.vector_field.vector_field_network import \
            VectorFieldNetwork

        torch.manual_seed(1)
        ref_cfg = RefVFCfg(input_dims=3, output_dims=3, dimensions=[64] * 4,
                           feature_vector_dims=32, embedder_multires=6,
                           weight_norm=False, batch_norm=False,
                           skip_connection_in=[2], bias_init=0.0,
                           dropout=False, dropout_probability=0.0,
                           xavier_init=False, init="")
        ref_net = VectorFieldNetwork(ref_cfg)
        ref_net.train()  # training forward appends the autograd Jacobian

        import dataclasses
        cfg = dataclasses.replace(VF_CFG, dimensions=[64] * 4,
                                  feature_vector_dims=32, batch_norm=False,
                                  skip_connection_in=[2])
        params, _ = mlp_state_from_torch(ref_net.state_dict(), n_layers=5,
                                         batch_norm=False, weight_norm=False)
        net = VectorFieldMLP(cfg)
        variables = {"params": params}

        pts = np.random.RandomState(2).randn(8, 3).astype(np.float32)
        theirs = ref_net(torch.from_numpy(pts)).detach().numpy()
        their_jac = theirs[:, 35:].reshape(8, 3, 3)

        def apply_fn(p):
            return net.apply(variables, p, train=False)

        our_jac = np.asarray(vf_jacobian(apply_fn, jnp.asarray(pts)))
        np.testing.assert_allclose(our_jac, their_jac, rtol=1e-3, atol=1e-4)

    def test_rendering_forward_parity(self):
        add_reference_to_path()
        import torch
        from config_parser.vf_nerf_config import \
            RenderingNetConfig as RefRenderCfg
        from models.vector_field.rendering_network import RenderingNetwork

        torch.manual_seed(3)
        ref_cfg = RefRenderCfg(output_dims=3, dimensions=[256] * 4,
                               feature_vector_dims=256, weight_norm=False,
                               batch_norm=True, mode="idr",
                               embedder_multires=4, detach_normals=True)
        ref_net = RenderingNetwork(ref_cfg).eval()

        params, batch_stats = mlp_state_from_torch(ref_net.state_dict(),
                                                   n_layers=5,
                                                   batch_norm=True,
                                                   weight_norm=False)
        net = RenderingMLP(RENDER_CFG)
        variables = {"params": params, "batch_stats": batch_stats}

        rng = np.random.RandomState(4)
        pts = rng.randn(16, 3).astype(np.float32)
        normals = rng.randn(16, 3).astype(np.float32)
        dirs = rng.randn(16, 3).astype(np.float32)
        feats = rng.randn(16, 256).astype(np.float32)

        with torch.no_grad():
            theirs = ref_net(torch.from_numpy(pts), torch.from_numpy(normals),
                             torch.from_numpy(dirs),
                             torch.from_numpy(feats)).numpy()
        ours = np.asarray(net.apply(variables, jnp.asarray(pts),
                                    jnp.asarray(normals), jnp.asarray(dirs),
                                    jnp.asarray(feats), train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_vf_weight_norm_parity(self):
        """Weight-normalized VF net (``nn.utils.weight_norm``; dim=0 →
        per-output-row gains) with transplanted v/g/bias."""
        add_reference_to_path()
        import dataclasses

        import torch
        from config_parser.vf_nerf_config import VFNetConfig as RefVFCfg
        from models.vector_field.vector_field_network import \
            VectorFieldNetwork

        torch.manual_seed(5)
        ref_cfg = RefVFCfg(input_dims=3, output_dims=3, dimensions=[64] * 4,
                           feature_vector_dims=32, embedder_multires=6,
                           weight_norm=True, batch_norm=False,
                           skip_connection_in=[2], bias_init=0.0,
                           dropout=False, dropout_probability=0.0,
                           xavier_init=False, init="")
        ref_net = VectorFieldNetwork(ref_cfg).eval()

        cfg = dataclasses.replace(VF_CFG, dimensions=[64] * 4,
                                  feature_vector_dims=32, batch_norm=False,
                                  weight_norm=True, skip_connection_in=[2])
        params, _ = mlp_state_from_torch(ref_net.state_dict(), n_layers=5,
                                         batch_norm=False, weight_norm=True)
        net = VectorFieldMLP(cfg)

        pts = np.random.RandomState(6).randn(32, 3).astype(np.float32)
        with torch.no_grad():
            theirs = ref_net(torch.from_numpy(pts)).numpy()
        ours = np.asarray(net.apply({"params": params}, jnp.asarray(pts),
                                    train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_rendering_weight_norm_parity(self):
        add_reference_to_path()
        import dataclasses

        import torch
        from config_parser.vf_nerf_config import \
            RenderingNetConfig as RefRenderCfg
        from models.vector_field.rendering_network import RenderingNetwork

        torch.manual_seed(7)
        ref_cfg = RefRenderCfg(output_dims=3, dimensions=[64] * 4,
                               feature_vector_dims=32, weight_norm=True,
                               batch_norm=False, mode="idr",
                               embedder_multires=4, detach_normals=True)
        ref_net = RenderingNetwork(ref_cfg).eval()

        cfg = dataclasses.replace(RENDER_CFG, dimensions=[64] * 4,
                                  feature_vector_dims=32, weight_norm=True,
                                  batch_norm=False)
        params, _ = mlp_state_from_torch(ref_net.state_dict(), n_layers=5,
                                         batch_norm=False, weight_norm=True)
        net = RenderingMLP(cfg)

        rng = np.random.RandomState(8)
        pts = rng.randn(16, 3).astype(np.float32)
        normals = rng.randn(16, 3).astype(np.float32)
        dirs = rng.randn(16, 3).astype(np.float32)
        feats = rng.randn(16, 32).astype(np.float32)
        with torch.no_grad():
            theirs = ref_net(torch.from_numpy(pts),
                             torch.from_numpy(normals),
                             torch.from_numpy(dirs),
                             torch.from_numpy(feats)).numpy()
        ours = np.asarray(net.apply({"params": params}, jnp.asarray(pts),
                                    jnp.asarray(normals), jnp.asarray(dirs),
                                    jnp.asarray(feats), train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("mode", ["no_view_dir", "no_normals"])
    def test_rendering_mode_parity(self, mode):
        """The two non-idr input assemblies (``rendering_network.py:25-30``,
        forward :81-101) against the reference with transplanted weights.

        QUIRK: the reference sizes layer 0 for the embedded view dirs
        unconditionally (``:38-39``) but only concatenates them in
        idr/no_normals — ``no_view_dir`` with ``embedder_multires > 0``
        CRASHES upstream (pinned below), so its parity case runs with the
        embedder off."""
        add_reference_to_path()
        import dataclasses

        import torch
        from config_parser.vf_nerf_config import \
            RenderingNetConfig as RefRenderCfg
        from models.vector_field.rendering_network import RenderingNetwork

        torch.manual_seed(9)
        multires = 0 if mode == "no_view_dir" else 4
        ref_cfg = RefRenderCfg(output_dims=3, dimensions=[64] * 3,
                               feature_vector_dims=32, weight_norm=False,
                               batch_norm=True, mode=mode,
                               embedder_multires=multires,
                               detach_normals=True)
        ref_net = RenderingNetwork(ref_cfg).eval()

        cfg = dataclasses.replace(RENDER_CFG, dimensions=[64] * 3,
                                  feature_vector_dims=32, mode=mode,
                                  embedder_multires=multires)
        params, batch_stats = mlp_state_from_torch(
            ref_net.state_dict(), n_layers=4, batch_norm=True,
            weight_norm=False)
        net = RenderingMLP(cfg)

        rng = np.random.RandomState(10)
        pts = rng.randn(16, 3).astype(np.float32)
        normals = rng.randn(16, 3).astype(np.float32)
        dirs = rng.randn(16, 3).astype(np.float32)
        feats = rng.randn(16, 32).astype(np.float32)
        with torch.no_grad():
            theirs = ref_net(torch.from_numpy(pts),
                             torch.from_numpy(normals),
                             torch.from_numpy(dirs),
                             torch.from_numpy(feats)).numpy()
        ours = np.asarray(net.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(dirs),
            jnp.asarray(feats), train=False))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_no_view_dir_embedder_quirk(self):
        """Pin the upstream crash: ``no_view_dir`` + ``embedder_multires>0``
        raises a matmul shape error in the reference (layer 0 sized for
        embedded view dirs that the forward never concatenates,
        ``rendering_network.py:38-39`` vs ``:92-101``); our RenderingMLP
        sizes layers from the actual input and works."""
        add_reference_to_path()
        import dataclasses

        import torch
        from config_parser.vf_nerf_config import \
            RenderingNetConfig as RefRenderCfg
        from models.vector_field.rendering_network import RenderingNetwork

        ref_cfg = RefRenderCfg(output_dims=3, dimensions=[32] * 2,
                               feature_vector_dims=16, weight_norm=False,
                               batch_norm=True, mode="no_view_dir",
                               embedder_multires=4, detach_normals=True)
        ref_net = RenderingNetwork(ref_cfg).eval()
        rng = np.random.RandomState(0)
        args = [torch.from_numpy(rng.randn(8, d).astype(np.float32))
                for d in (3, 3, 3, 16)]
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                ref_net(*args)

        cfg = dataclasses.replace(RENDER_CFG, dimensions=[32] * 2,
                                  feature_vector_dims=16,
                                  mode="no_view_dir", embedder_multires=4)
        net = RenderingMLP(cfg)
        jargs = (jnp.zeros((8, 3)), jnp.zeros((8, 3)), jnp.zeros((8, 3)),
                 jnp.zeros((8, 16)))
        variables = net.init(jax.random.PRNGKey(0), *jargs, train=False)
        out = net.apply(variables, *jargs, train=False)
        assert out.shape == (8, 3) and bool(jnp.all(jnp.isfinite(out)))
