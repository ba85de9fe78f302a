"""Vector-field and rendering MLPs (Flax linen).

Reference: ``models/vector_field/vector_field_network.py:14-208`` (VF net) and
``models/vector_field/rendering_network.py:13-108`` (IDR-style color net).

Architecture reproduced from the reference config contract:

- **VectorFieldMLP** — PE(multires=6) on xyz (3→39), 8×256 hidden layers,
  skip-concat of the embedded input at the layer listed in
  ``skip_connection_in`` divided by √2 (``vector_field_network.py:192-193``),
  BatchNorm1d between hidden layers, ReLU hidden / Tanh final; output is
  ``[vf(3) | features(256)]``. The train-mode Jacobian of the vf head wrt the
  input points (reference: three reverse-mode autograd calls,
  ``:146-173``) is computed here with **three forward-mode JVPs**
  (``vf_jacobian``) — same 3×3 matrix, cheaper on TPU and jit-clean.
- **RenderingMLP** — mode "idr": input ``[xyz(3), PE4(view)(27), normals(3),
  feat(256)]`` → 4×256 → 3, ReLU hidden / Sigmoid out, optional BatchNorm;
  ``detach_normals`` stops color gradients into the VF
  (``rendering_network.py:76-77``).

Initialization matches torch defaults (uniform ±1/√fan_in for both kernel and
bias) unless ``xavier_init`` is set, so training dynamics track the reference.
BatchNorm semantics: the reference trainer runs the whole model in eval mode
when the directional-derivative weight is 0 (the default;
``train/vector_field_nerf_train.py:140-141``), freezing BN to running stats —
callers pass ``train=False`` to reproduce that.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vf_nerf_tpu.config.schema import RenderingNetConfig, VFNetConfig
from vf_nerf_tpu.ops.embedding import embedding_dim, positional_encoding


def torch_linear_init(fan_in: int):
    """torch ``nn.Linear`` default init: kaiming_uniform(a=√5) for the kernel
    and U(±1/√fan_in) for the bias — both reduce to U(±1/√fan_in)."""
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization (torch ``nn.utils.weight_norm``
    parameterization: W = g · V / ||V||, norm over input dim)."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        v = self.param("v", torch_linear_init(self.fan_in),
                       (self.fan_in, self.features))
        g = self.param("g", lambda k, s: jnp.linalg.norm(v, axis=0),
                       (self.features,))
        b = self.param("bias", torch_linear_init(self.fan_in),
                       (self.features,))
        w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True),
                                 1e-12))
        return x @ w + b


class _MLPLayer(nn.Module):
    """One linear(+BN) layer with reference init/normalization options.

    ``compute_dtype`` (e.g. bfloat16) sets the matmul/activation compute
    precision — params stay float32 (flax mixed precision). Measured
    throughput-neutral on v5e at production shapes (PARITY.md serving
    sweep); float32 stays the default.
    """

    features: int
    fan_in: int
    use_batch_norm: bool
    use_weight_norm: bool
    xavier_init: bool
    bias_init: float
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.use_weight_norm:
            x = WeightNormDense(self.features, self.fan_in)(x)
        else:
            if self.xavier_init:
                kernel_init = nn.initializers.xavier_uniform()
                bias_init = nn.initializers.constant(self.bias_init)
            else:
                kernel_init = torch_linear_init(self.fan_in)
                bias_init = torch_linear_init(self.fan_in)
            x = nn.Dense(self.features, kernel_init=kernel_init,
                         bias_init=bias_init,
                         dtype=self.compute_dtype)(x)
        if self.use_batch_norm:
            # torch BatchNorm1d defaults: eps=1e-5, momentum=0.1 (flax
            # momentum is the complement of torch's).
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.compute_dtype)(x)
        return x


class VectorFieldMLP(nn.Module):
    """The neural vector field v: R^3 → S^2 (+ feature vector).

    Reference: ``models/vector_field/vector_field_network.py:14-208``.
    """

    config: VFNetConfig
    compute_dtype: Optional[jnp.dtype] = None

    def _dimensions(self) -> List[int]:
        cfg = self.config
        in_dim = embedding_dim(cfg.embedder_multires, cfg.input_dims)
        return [in_dim] + list(cfg.dimensions) + \
            [cfg.output_dims + cfg.feature_vector_dims]

    @nn.compact
    def __call__(self, points: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """points (N, 3) → (N, output_dims + feature_dims); apply Tanh last.

        Skip connections: at layer ``i`` listed in ``skip_connection_in`` the
        embedded input is re-concatenated and the pair divided by √2
        (``vector_field_network.py:192-193``); the producing layer ``i-1``
        shrinks its output so widths stay constant (``:49-52``).
        """
        cfg = self.config
        dims = self._dimensions()
        skips = list(cfg.skip_connection_in or [])
        n_layers = len(dims) - 1

        x = positional_encoding(points, cfg.embedder_multires)
        embedded = x
        for i in range(n_layers):
            if i in skips:
                x = jnp.concatenate([x, embedded], axis=1) / jnp.sqrt(
                    jnp.asarray(2.0, x.dtype))
            out_dim = dims[i + 1] - dims[0] if (i + 1) in skips else dims[i + 1]
            fan_in = x.shape[-1]
            is_last = i == n_layers - 1
            x = _MLPLayer(out_dim, fan_in,
                          use_batch_norm=(cfg.batch_norm and
                                          not cfg.weight_norm and not is_last),
                          use_weight_norm=cfg.weight_norm,
                          xavier_init=cfg.xavier_init,
                          bias_init=cfg.bias_init,
                          compute_dtype=self.compute_dtype,
                          name=f"layer_{i}")(x, train)
            if not is_last:
                x = nn.relu(x)
                if cfg.dropout:
                    x = nn.Dropout(rate=cfg.dropout_probability,
                                   deterministic=not train)(x)
            else:
                x = nn.tanh(x)
        return x.astype(points.dtype)

    def split_outputs(self, out: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(N, 3+F) → (normals (N, 3), features (N, F));
        reference ``get_outputs``, ``vector_field_network.py:77-91``."""
        return out[:, :self.config.output_dims], out[:, self.config.output_dims:]


def vf_jacobian(apply_fn, points: jnp.ndarray) -> jnp.ndarray:
    """3×3 Jacobian of the vf head wrt input points via 3 forward-mode JVPs.

    ``apply_fn`` maps (N, 3) points → (N, ≥3) outputs; only the first three
    output channels (the field) are differentiated. Returns (N, 3, 3) with
    ``jac[n, i, j] = d v_i / d p_j``, matching the reference's stacked
    reverse-mode rows (``vector_field_network.py:146-173``).
    """
    def field(p):
        return apply_fn(p)[:, :3]

    cols = []
    eye = jnp.eye(3, dtype=points.dtype)
    for j in range(3):
        tangent = jnp.broadcast_to(eye[j], points.shape)
        _, dv = jax.jvp(field, (points,), (tangent,))
        cols.append(dv)  # (N, 3) = d v / d p_j
    return jnp.stack(cols, axis=-1)  # (N, 3, 3): [i, j] = dv_i/dp_j


def numerical_vf_jacobian(apply_fn, points: jnp.ndarray,
                          epsilon: float = 1e-5) -> jnp.ndarray:
    """Central-difference Jacobian (reference
    ``compute_numerical_directional_derivatives``,
    ``models/nerf/vector_field_nerf.py:500-526``)."""
    cols = []
    eye = jnp.eye(3, dtype=points.dtype)
    for j in range(3):
        offset = eye[j] * epsilon
        pos = apply_fn(points + offset)[:, :3]
        neg = apply_fn(points - offset)[:, :3]
        cols.append((pos - neg) / (2.0 * epsilon))
    return jnp.stack(cols, axis=-1)


def directional_derivatives(normals: jnp.ndarray,
                            jac: jnp.ndarray) -> jnp.ndarray:
    """Field derivatives along two tangent directions of each normal.

    Reference ``compute_directional_derivatives``
    (``models/nerf/vector_field_nerf.py:476-498``): tangent 1 is the 90°
    xy-rotation ``(n_y, -n_x, 0)``, tangent 2 is ``n × t1``; returns
    (N, 2, 3) = jac · normalized tangents.
    """
    t1 = jnp.stack([normals[:, 1], -normals[:, 0],
                    jnp.zeros_like(normals[:, 0])], axis=1)
    t2 = jnp.cross(normals, t1)

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)

    d1 = jnp.einsum("nij,nj->ni", jac, _norm(t1))
    d2 = jnp.einsum("nij,nj->ni", jac, _norm(t2))
    return jnp.stack([d1, d2], axis=1)


class RenderingMLP(nn.Module):
    """IDR-style color network.

    Reference: ``models/vector_field/rendering_network.py:13-108``.
    """

    config: RenderingNetConfig
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self,
                 points: jnp.ndarray,
                 normals: jnp.ndarray,
                 view_dirs: jnp.ndarray,
                 feature_vectors: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        cfg = self.config
        if cfg.detach_normals:
            normals = jax.lax.stop_gradient(normals)
        if cfg.embedder_multires > 0:
            view_dirs = positional_encoding(view_dirs, cfg.embedder_multires)

        parts: List[jnp.ndarray] = [points]
        if cfg.mode in ("idr", "no_normals"):
            parts.append(view_dirs)
        if cfg.mode in ("idr", "no_view_dir"):
            parts.append(normals)
        if (feature_vectors is not None and feature_vectors.size > 0
                and cfg.feature_vector_dims > 0
                and feature_vectors.shape[1] == cfg.feature_vector_dims):
            parts.append(feature_vectors)
        x = jnp.concatenate(parts, axis=-1)

        dims = list(cfg.dimensions) + [cfg.output_dims]
        n_layers = len(dims)
        for i in range(n_layers):
            is_last = i == n_layers - 1
            x = _MLPLayer(dims[i], x.shape[-1],
                          use_batch_norm=(cfg.batch_norm and
                                          not cfg.weight_norm and not is_last),
                          use_weight_norm=cfg.weight_norm,
                          xavier_init=False,
                          bias_init=0.0,
                          compute_dtype=self.compute_dtype,
                          name=f"layer_{i}")(x, train)
            if not is_last:
                x = nn.relu(x)
        return nn.sigmoid(x).astype(points.dtype)
