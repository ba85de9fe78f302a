"""Device-resident MC pipeline vs the host pipeline (borderline divergence
cells may flip at the f32/f64 threshold — compare as near-identical vertex
sets, not bit-equal)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_mesh_stack import analytic_box_vf_fn
from vf_nerf_tpu.evaluation.mc.device_pipeline import extract_vf_mesh_device
from vf_nerf_tpu.evaluation.mc.pipeline import extract_vf_mesh


def analytic_box_vf_jax(half=1.0):
    def fn(p):
        dist = half - jnp.abs(p)
        inside = (dist > 0).all(axis=-1)
        axis = jnp.argmin(dist, axis=-1)
        rows = jnp.arange(p.shape[0])
        sign = jnp.sign(p[rows, axis])
        sign = jnp.where(sign == 0, 1.0, sign)
        v_in = jnp.zeros_like(p).at[rows, axis].set(sign)
        closest = jnp.clip(p, -half, half)
        delta = closest - p
        v_out = delta / jnp.maximum(
            jnp.linalg.norm(delta, axis=-1, keepdims=True), 1e-8)
        v = jnp.where(inside[:, None], v_in, v_out)
        udf = jnp.where(jnp.min(dist, axis=-1) > 0,
                        jnp.min(dist, axis=-1),
                        jnp.linalg.norm(p - closest, axis=-1))
        return v * jnp.maximum(udf, 1e-4)[:, None]
    return fn


def test_device_matches_host_pipeline():
    from scipy.spatial import cKDTree
    res = 32
    v_host, f_host = extract_vf_mesh(
        analytic_box_vf_fn(1.0), resolution=res, scale=1.5,
        centroid=np.zeros(3), translation=np.zeros(3, np.float32),
        max_batch=8192)
    v_dev, f_dev = extract_vf_mesh_device(
        analytic_box_vf_jax(1.0), resolution=res, scale=1.5,
        centroid=np.zeros(3), translation=np.zeros(3, np.float32),
        chunk=8192, cell_bucket=4096)
    assert len(v_dev) > 0 and len(f_dev) > 0
    # Vertex counts within 2% (borderline divergence-threshold cells).
    assert abs(len(v_dev) - len(v_host)) < 0.02 * len(v_host)
    # Every device vertex sits on (or within a voxel of) the host surface.
    d = cKDTree(v_host).query(v_dev, k=1)[0]
    voxel = 2 * 1.5 / (res - 1)
    assert np.median(d) < 1e-5
    assert d.max() < 2 * voxel


def test_empty_field_yields_empty_mesh():
    def constant_field(p):
        return jnp.ones_like(p) / np.sqrt(3.0)
    v, f = extract_vf_mesh_device(constant_field, resolution=16, scale=1.0,
                                  centroid=np.zeros(3),
                                  translation=np.zeros(3, np.float32),
                                  chunk=4096, cell_bucket=1024)
    assert len(v) == 0 and len(f) == 0


def test_extract_many_matches_sequential():
    """Pipelined multi-octant extraction ≡ per-octant extracts (bit-exact:
    same jits, same emission)."""
    from vf_nerf_tpu.evaluation.mc.device_pipeline import DeviceMeshExtractor
    from vf_nerf_tpu.evaluation.mc.pipeline import quadrant_translations

    res, scale = 32, 1.5
    extractor = DeviceMeshExtractor(analytic_box_vf_jax(1.0), res,
                                    chunk=8192, cell_bucket=4096)
    octants = list(quadrant_translations(8, scale))
    centroid = np.zeros(3)
    piped = extractor.extract_many(octants, centroid)
    assert sum(len(v) for v, _ in piped) > 0
    for (translation, sub_scale), (v_p, f_p) in zip(octants, piped):
        v_s, f_s = extractor.extract(sub_scale, centroid, translation)
        np.testing.assert_array_equal(v_p, v_s)
        np.testing.assert_array_equal(f_p, f_s)


def test_native_emission_matches_numpy():
    """csrc emit_mc_triangles ≡ the vectorized numpy path, bit-exact,
    including degenerate edges and no-crossing cells."""
    from vf_nerf_tpu.evaluation.mc.contrastive import (_load_meshops,
                                                       emit_triangles,
                                                       emit_triangles_numpy)
    from vf_nerf_tpu.evaluation.mc.tables import CORNER_OFFSETS

    if _load_meshops() is None:
        pytest.skip("native meshops unavailable (no g++)")
    rng = np.random.RandomState(0)
    m = 4096
    cells = rng.randint(0, 31, (m, 3))
    node = (cells[:, None, :] + CORNER_OFFSETS[None]).astype(np.float64)
    gv = node / 32 * 2.0 - 1.0
    vv = rng.randn(m, 8)
    vv[:64] = np.abs(vv[:64])                        # no crossings
    vv[64:128] = vv[64:128, :1] + rng.randn(64, 8) * 1e-7  # degenerate edges
    a = emit_triangles(gv, vv)
    b = emit_triangles_numpy(gv, vv)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_extract_many_multichip_matches_sequential():
    """Octant-level multi-device extraction (round-robin over the 8-device
    CPU mesh) ≡ sequential single-device extraction, bit-exact."""
    import jax as _jax

    from vf_nerf_tpu.evaluation.mc.device_pipeline import DeviceMeshExtractor
    from vf_nerf_tpu.evaluation.mc.pipeline import quadrant_translations

    res, scale = 32, 1.5
    extractor = DeviceMeshExtractor(analytic_box_vf_jax(1.0), res,
                                    chunk=8192, cell_bucket=4096)
    octants = list(quadrant_translations(8, scale))
    centroid = np.zeros(3)
    seq = extractor.extract_many(octants, centroid)
    multi = extractor.extract_many(octants, centroid,
                                   devices=_jax.devices())
    assert sum(len(v) for v, _ in multi) > 0
    for (v_s, f_s), (v_m, f_m) in zip(seq, multi):
        np.testing.assert_array_equal(v_m, v_s)
        np.testing.assert_array_equal(f_m, f_s)


@pytest.mark.parametrize("smooth_all,smooth_after", [(True, False),
                                                     (False, True)])
def test_device_smoothing_matches_host_pipeline(smooth_all, smooth_after):
    """On-device Gaussian smoothing (k3/σ1 pre-divergence, k9/σ2
    pre-classification) ≡ the host pipeline's scipy smoothing, up to
    borderline-cell tolerance (f32 vs f64 thresholds)."""
    from scipy.spatial import cKDTree

    from vf_nerf_tpu.evaluation.mc.device_pipeline import DeviceMeshExtractor

    res = 32
    v_host, f_host = extract_vf_mesh(
        analytic_box_vf_fn(1.0), resolution=res, scale=1.5,
        centroid=np.zeros(3), translation=np.zeros(3, np.float32),
        max_batch=8192, smooth_before=smooth_all, smooth_after=smooth_after)
    extractor = DeviceMeshExtractor(analytic_box_vf_jax(1.0), res,
                                    chunk=8192, cell_bucket=4096,
                                    smooth_before=smooth_all,
                                    smooth_after=smooth_after)
    v_dev, f_dev = extractor.extract(1.5, np.zeros(3),
                                     np.zeros(3, np.float32))
    assert len(v_dev) > 0 and len(f_dev) > 0
    assert abs(len(v_dev) - len(v_host)) < 0.03 * len(v_host)
    d = cKDTree(v_host).query(v_dev, k=1)[0]
    voxel = 2 * 1.5 / (res - 1)
    assert np.median(d) < 1e-4
    assert d.max() < 2 * voxel
