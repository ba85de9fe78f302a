"""Import reference PyTorch ``.pth`` checkpoints into our Flax pytrees.

The reference saves a single torch dict with keys ``vf_net``,
``rendering_net``, ``density``, ``epoch``, ``optimizer``, ``scheduler``
(``models/nerf/vector_field_nerf.py:196-214``). This module converts the
network state dicts to the (params, batch_stats) pytrees of
``VectorFieldMLP`` / ``RenderingMLP`` so parity runs can start from reference
weights (SURVEY.md §5.4: keep ``.pth``-compatible import).

torch is only imported inside ``load_torch_checkpoint`` — the training and
serving paths never need it.

torch layer naming (reference ``vector_field_network.py:47-60``):
- plain:       ``layers.{i}.weight`` / ``layers.{i}.bias``
- batch norm:  ``layers.{i}.0.{weight,bias}`` (linear) +
               ``layers.{i}.1.{weight,bias,running_mean,running_var}`` (BN)
- weight norm: ``layers.{i}.weight_g`` / ``layers.{i}.weight_v`` / ``.bias``
(optionally behind a ``module.`` DataParallel prefix).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _strip_module_prefix(state: Dict[str, Any]) -> Dict[str, Any]:
    if any(k.startswith("module.") for k in state):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in state.items()}
    return state


def _to_numpy(t: Any) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def mlp_state_from_torch(state_dict: Dict[str, Any],
                         n_layers: int,
                         batch_norm: bool,
                         weight_norm: bool
                         ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a reference MLP state dict to Flax (params, batch_stats).

    Layer ``i`` maps to module scope ``layer_{i}``; the last layer never has
    BN (reference ``vector_field_network.py:59``).
    """
    state = _strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for i in range(n_layers):
        scope: Dict[str, Any] = {}
        has_bn = batch_norm and not weight_norm and i < n_layers - 1
        if weight_norm:
            # torch weight_norm(dim=0): weight_g is (out, 1) — per-output
            # -row gains with the norm over the input dim. Our
            # WeightNormDense keeps v as (in, out) and g as (out,).
            scope["WeightNormDense_0"] = {
                "v": _to_numpy(state[f"layers.{i}.weight_v"]).T,
                "g": _to_numpy(state[f"layers.{i}.weight_g"]).reshape(-1),
                "bias": _to_numpy(state[f"layers.{i}.bias"]),
            }
        elif has_bn:
            scope["Dense_0"] = {
                "kernel": _to_numpy(state[f"layers.{i}.0.weight"]).T,
                "bias": _to_numpy(state[f"layers.{i}.0.bias"]),
            }
            scope["BatchNorm_0"] = {
                "scale": _to_numpy(state[f"layers.{i}.1.weight"]),
                "bias": _to_numpy(state[f"layers.{i}.1.bias"]),
            }
            batch_stats[f"layer_{i}"] = {
                "BatchNorm_0": {
                    "mean": _to_numpy(state[f"layers.{i}.1.running_mean"]),
                    "var": _to_numpy(state[f"layers.{i}.1.running_var"]),
                }
            }
        else:
            scope["Dense_0"] = {
                "kernel": _to_numpy(state[f"layers.{i}.weight"]).T,
                "bias": _to_numpy(state[f"layers.{i}.bias"]),
            }
        params[f"layer_{i}"] = scope

    return params, batch_stats


def density_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, float]:
    """Reference density state dict → {beta, scale, mean} floats."""
    state = _strip_module_prefix(state_dict)
    return {k: float(_to_numpy(v)) for k, v in state.items()
            if k in ("beta", "scale", "mean")}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint (torch required at call time)."""
    import torch
    return torch.load(path, map_location="cpu")


def mlp_state_to_torch(params: Dict[str, Any],
                       batch_stats: Dict[str, Any],
                       n_layers: int,
                       batch_norm: bool,
                       weight_norm: bool) -> Dict[str, Any]:
    """Inverse of ``mlp_state_from_torch``: Flax (params, batch_stats) → a
    reference-layout torch state dict (used by parity tests to transplant
    our weights into the reference nets, and for ``.pth`` export)."""
    import torch

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x),
                                                     dtype=np.float32))

    state: Dict[str, Any] = {}
    for i in range(n_layers):
        scope = params[f"layer_{i}"]
        has_bn = batch_norm and not weight_norm and i < n_layers - 1
        if weight_norm:
            wnd = scope["WeightNormDense_0"]
            state[f"layers.{i}.weight_v"] = t(wnd["v"]).T
            state[f"layers.{i}.weight_g"] = t(wnd["g"]).reshape(1)
            state[f"layers.{i}.bias"] = t(wnd["bias"])
        elif has_bn:
            state[f"layers.{i}.0.weight"] = t(scope["Dense_0"]["kernel"]).T
            state[f"layers.{i}.0.bias"] = t(scope["Dense_0"]["bias"])
            state[f"layers.{i}.1.weight"] = t(scope["BatchNorm_0"]["scale"])
            state[f"layers.{i}.1.bias"] = t(scope["BatchNorm_0"]["bias"])
            stats = batch_stats[f"layer_{i}"]["BatchNorm_0"]
            state[f"layers.{i}.1.running_mean"] = t(stats["mean"])
            state[f"layers.{i}.1.running_var"] = t(stats["var"])
            state[f"layers.{i}.1.num_batches_tracked"] = \
                torch.zeros((), dtype=torch.long)
        else:
            state[f"layers.{i}.weight"] = t(scope["Dense_0"]["kernel"]).T
            state[f"layers.{i}.bias"] = t(scope["Dense_0"]["bias"])
    return state
