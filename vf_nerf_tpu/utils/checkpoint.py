"""Native checkpoint save/load.

Mirrors the reference checkpoint *semantics* (SURVEY.md §5.4): one blob per
save holding network params + batch stats, learned density scalars, epoch,
optimizer state, and schedule step; written as ``{epoch}.ckpt`` AND
``latest.ckpt`` under ``<exp>/<timestamp>/checkpoints/vf_nerf/``
(reference ``models/nerf/vector_field_nerf.py:196-214``,
``train/vector_field_nerf_train.py:151-157``).

Format: flax msgpack of a pure state-dict tree — dependency-free, fast, and
stable across topology changes (params are replicated; restore rebuilds
shardings). ``.pth`` import for reference-weight parity lives in
``torch_import.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    # One batched device_get for the whole tree: fetching the ~200 state
    # leaves individually pays a host↔device round-trip each (~60 ms on a
    # remote-attached TPU → ~12 s per checkpoint).
    return jax.device_get(tree)


def save_checkpoint(path_dir: str, epoch: int, state: Dict[str, Any]) -> str:
    """Serialize ``state`` to ``{epoch}.ckpt`` and ``latest.ckpt``.

    :param state: arbitrary pytree (variables, opt_state, epoch, ...).
    :return: path of the epoch-named file.
    """
    os.makedirs(path_dir, exist_ok=True)
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state)))
    epoch_path = os.path.join(path_dir, f"{epoch}.ckpt")
    for p in (epoch_path, os.path.join(path_dir, "latest.ckpt")):
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, p)  # atomic publish — a crash never corrupts 'latest'
    return epoch_path


def load_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint into the structure of ``target`` (a template
    pytree with freshly-initialized leaves)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target, raw)


def checkpoint_exists(path_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(path_dir, f"{name}.ckpt"))
