"""Bidirectional .pth checkpoint interop: export our weights to the
reference format, load them into the reference model, and bring them back —
forward outputs must agree at every hop."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import add_reference_to_path, reference_available
from test_renderer import tiny_config
from vf_nerf_tpu.models.nerf import VectorFieldNerf


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
def test_pth_export_import_round_trip(tmp_path):
    add_reference_to_path()
    import torch

    from test_render_parity_e2e import build_reference_model
    from vf_nerf_tpu.utils.torch_export import export_reference_pth

    cfg = tiny_config()
    model = VectorFieldNerf(cfg, decay_steps=100)
    path = os.path.join(str(tmp_path), "export.pth")
    export_reference_pth(model, epoch=7, path=path)

    # The reference model loads our export.
    ref_model = build_reference_model(cfg, model.state.variables())
    blob = torch.load(path)
    ref_model.vector_field_network.load_state_dict(blob["vf_net"])
    ref_model.rendering_network.load_state_dict(blob["rendering_net"])
    ref_model.density.load_state_dict(blob["density"])
    assert blob["epoch"] == 7

    pts = np.random.RandomState(0).randn(16, 3).astype(np.float32)
    ref_model.vector_field_network.eval()
    with torch.no_grad():
        theirs = ref_model.vector_field_network(
            torch.from_numpy(pts)).numpy()
    ours = np.asarray(model.modules.vf_apply(model.state.variables(),
                                             jnp.asarray(pts), train=False))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # And back: import the export through the .pth import path.
    model2 = VectorFieldNerf(cfg, decay_steps=100)
    epoch = model2.load_reference_pth(path)
    assert epoch == 8  # reference semantics: saved epoch + 1
    back = np.asarray(model2.modules.vf_apply(model2.state.variables(),
                                              jnp.asarray(pts),
                                              train=False))
    np.testing.assert_allclose(back, ours, rtol=1e-5, atol=1e-6)
