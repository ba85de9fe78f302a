"""Export our checkpoints as reference-loadable ``.pth`` files.

Completes the interop story (SURVEY.md §5.4: keep ``.pth``-compatible import
for parity runs): ``torch_import`` brings reference weights in,
``export_reference_pth`` writes a dict the reference's
``VectorFieldNerf.load`` (``models/nerf/vector_field_nerf.py:162-194``) can
consume — keys ``vf_net`` / ``rendering_net`` / ``density`` / ``epoch``
(optimizer/scheduler state is architecture-specific and left for the
reference to reinitialize; its ``load`` requires the keys, so fresh torch
Adam/ExponentialLR state dicts are synthesized).
"""

from __future__ import annotations

from typing import Any, Dict

from vf_nerf_tpu.utils.torch_import import mlp_state_to_torch


def reference_state_dicts(model) -> Dict[str, Any]:
    """Our ``VectorFieldNerf`` → reference-layout torch state dicts."""
    import torch

    cfg = model.config
    params = model.state.params
    stats = model.state.batch_stats
    vf_cfg = cfg.vf_net_config
    rn_cfg = cfg.rendering_net_config

    vf_sd = mlp_state_to_torch(params["vf"], stats.get("vf", {}),
                               n_layers=len(vf_cfg.dimensions) + 1,
                               batch_norm=vf_cfg.batch_norm,
                               weight_norm=vf_cfg.weight_norm)
    rn_sd = mlp_state_to_torch(params["render"], stats.get("render", {}),
                               n_layers=len(rn_cfg.dimensions) + 1,
                               batch_norm=rn_cfg.batch_norm,
                               weight_norm=rn_cfg.weight_norm)
    density_sd = {
        "beta": torch.tensor(float(params["density"].beta)),
        "scale": torch.tensor(float(params["density"].scale)),
        "mean": torch.tensor(float(params["density"].mean)),
    }
    return {"vf_net": vf_sd, "rendering_net": rn_sd, "density": density_sd}


def export_reference_pth(model, epoch: int, path: str) -> str:
    """Write a reference-loadable checkpoint. torch required at call time."""
    import torch

    blob = reference_state_dicts(model)
    blob["epoch"] = epoch
    # The reference's load() requires optimizer/scheduler keys; synthesize
    # fresh torch state for a parameter list of matching shapes.
    dummy = [torch.nn.Parameter(v.clone())
             for sd in (blob["vf_net"], blob["rendering_net"],
                        blob["density"])
             for v in sd.values() if v.dtype.is_floating_point]
    optimizer = torch.optim.Adam(dummy, lr=5e-4)
    scheduler = torch.optim.lr_scheduler.ExponentialLR(optimizer, 0.9999)
    blob["optimizer"] = optimizer.state_dict()
    blob["scheduler"] = scheduler.state_dict()
    torch.save(blob, path)
    return path
