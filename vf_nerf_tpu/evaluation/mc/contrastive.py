"""Vectorized contrastive marching cubes.

Reference: ``evaluation/utils/marching_cubes_vt.py:62-315``. The reference
classifies each surface cell's 8 corners from the 28 pair-crossing flags
(``combs_to_verts``), forms a signed pseudo-SDF (±field-norm), and runs
classic table-based MC **per cell in a serial Python loop** — its hot spot
(SURVEY.md §3.4). Here the whole thing is vectorized over cells:

- anchor pair = argmax of the crossing flags; every other corner joins the
  anchor whose crossing value against it is smaller (``:62-102``),
- signed values = side · corner norm; config id = bitmask(signed < iso),
- edge interpolation reproduces ``vertex_interpolate``'s endpoint-swap rule
  (``:9-15``; the swap is a static property of each edge on a monotonic
  grid), including the |v1−v2| ≤ 1e-5 degenerate-edge guard,
- triangles gathered through the generated EDGE/TRI tables, compacted, and
  vertex-deduplicated with ``np.unique`` (the reference deduped via a python
  dict keyed on exact float tuples — identical geometry, different vertex
  order).

The dead-code numba global-optimization variant (``combs_to_verts_glb_opt``,
``:105-183``) intentionally has no counterpart: it is unreachable in the
reference (SURVEY.md headline facts).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from vf_nerf_tpu.evaluation.mc.tables import (COMB_I, COMB_J, CORNER_COMB,
                                              CORNER_LANE, CORNER_OFFSETS,
                                              EDGE_TABLE, EDGE_VERTEX,
                                              PAIR_TO_COMB, TRI_TABLE)

# vertex_interpolate (marching_cubes_vt.py:9-15) swaps endpoints when
# any(p1 > p2); on a monotonic grid this is a static per-edge property.
_EDGE_SWAP = np.array([np.any(CORNER_OFFSETS[a] > CORNER_OFFSETS[b])
                       for a, b in EDGE_VERTEX])

_DEGENERATE_EPS = 1e-5


def combs_to_vert_values(comb_values: np.ndarray,
                         pair_norms: np.ndarray) -> np.ndarray:
    """(M, 28) crossing flags + (M, 28, 2) pair norms → (M, 8) signed values.

    Vectorized ``combs_to_verts`` (reference ``:62-102``): corners on the
    second anchor's side get +norm, the rest −norm; cells whose max crossing
    flag ≤ 0.5 yield all-zero values (no surface).
    """
    m = comb_values.shape[0]
    rows = np.arange(m)
    has_surface = comb_values.max(axis=1) > 0.5

    anchor_comb = np.argmax(comb_values, axis=1)
    a0 = COMB_I[anchor_comb]   # (M,)
    a1 = COMB_J[anchor_comb]

    verts = np.arange(8)
    # crossing value of each corner against each anchor
    c0 = comb_values[rows[:, None], PAIR_TO_COMB[verts[None, :], a0[:, None]]]
    c1 = comb_values[rows[:, None], PAIR_TO_COMB[verts[None, :], a1[:, None]]]
    side1 = c0 > c1                      # closer (less crossed) to anchor 1
    side1[rows, a0] = False
    side1[rows, a1] = True

    corner_norms = pair_norms[:, CORNER_COMB, CORNER_LANE]  # (M, 8)
    signed = np.where(side1, 1.0, -1.0) * corner_norms
    signed[~has_surface] = 0.0
    return signed


# int32 copies of the generated tables for the native emission path.
_EDGE_TABLE_I32 = np.ascontiguousarray(EDGE_TABLE, np.int32)
_EDGE_VERTEX_I32 = np.ascontiguousarray(EDGE_VERTEX, np.int32)
_EDGE_SWAP_I32 = np.ascontiguousarray(_EDGE_SWAP, np.int32)


def _active_tri_table() -> np.ndarray:
    """Triangle table for this extraction: the generated one by default;
    the classic constant (bit-equal to the reference's embedded table)
    under ``VFNERF_CLASSIC_MC_TABLE=1`` for triangle-identical mesh diffs
    against reference-produced .ply files (VERDICT r3 #7). Both share the
    (unique) EDGE_TABLE; only fan orders differ."""
    from vf_nerf_tpu.evaluation.mc.classic_tables import (
        CLASSIC_TRI_TABLE, use_classic_tri_table)
    if use_classic_tri_table():
        return CLASSIC_TRI_TABLE
    return TRI_TABLE


def emit_triangles(grid_verts: np.ndarray,
                   vert_values: np.ndarray,
                   isovalue: float = 0.0) -> np.ndarray:
    """Classic table-based triangle emission.

    Native C++ loop (``csrc/meshops.cpp::emit_mc_triangles``, bit-exact with
    the numpy path and ~25× faster at res-256 octant scale) with the
    vectorized numpy implementation as fallback/oracle.

    :param grid_verts: (M, 8, 3) corner positions (reference corner order).
    :param vert_values: (M, 8) signed field values.
    :return: (T, 3, 3) triangle vertex positions.
    """
    m = grid_verts.shape[0]
    if m == 0:
        return np.zeros((0, 3, 3), np.float64)
    lib = _load_meshops()
    if lib is not None and hasattr(lib, "emit_mc_triangles"):
        import ctypes
        dptr = lambda a: a.ctypes.data_as(  # noqa: E731
            ctypes.POINTER(ctypes.c_double))
        iptr = lambda a: a.ctypes.data_as(  # noqa: E731
            ctypes.POINTER(ctypes.c_int32))
        gv = np.ascontiguousarray(grid_verts, np.float64)
        vv = np.ascontiguousarray(vert_values, np.float64)
        tri_i32 = np.ascontiguousarray(_active_tri_table(), np.int32)
        out = np.empty((5 * m, 3, 3), np.float64)
        n = lib.emit_mc_triangles(
            dptr(gv), dptr(vv), ctypes.c_int64(m),
            ctypes.c_double(isovalue), iptr(_EDGE_TABLE_I32),
            iptr(_EDGE_VERTEX_I32), iptr(_EDGE_SWAP_I32),
            iptr(tri_i32), dptr(out))
        return out[:n]
    return emit_triangles_numpy(grid_verts, vert_values, isovalue)


def emit_triangles_numpy(grid_verts: np.ndarray,
                         vert_values: np.ndarray,
                         isovalue: float = 0.0) -> np.ndarray:
    """Vectorized-numpy emission (fallback + parity oracle for the native
    path)."""
    m = grid_verts.shape[0]
    if m == 0:
        return np.zeros((0, 3, 3), np.float64)
    inside = (vert_values < isovalue).astype(np.int64)
    config = (inside * (1 << np.arange(8))[None, :]).sum(axis=1)

    active = EDGE_TABLE[config] != 0
    if not np.any(active):
        return np.zeros((0, 3, 3), np.float64)
    grid_verts = grid_verts[active].astype(np.float64)
    vert_values = vert_values[active].astype(np.float64)
    config = config[active]

    # Interpolate all 12 edges per cell (unused ones are masked later).
    ev0, ev1 = EDGE_VERTEX[:, 0], EDGE_VERTEX[:, 1]
    p1 = grid_verts[:, ev0]            # (M', 12, 3)
    p2 = grid_verts[:, ev1]
    v1 = vert_values[:, ev0]           # (M', 12)
    v2 = vert_values[:, ev1]
    swap = _EDGE_SWAP[None, :]
    pa = np.where(swap[..., None], p2, p1)
    pb = np.where(swap[..., None], p1, p2)
    va = np.where(swap, v2, v1)
    vb = np.where(swap, v1, v2)
    denom = vb - va
    degenerate = np.abs(denom) <= _DEGENERATE_EPS
    t = np.where(degenerate, 0.0,
                 (isovalue - va) / np.where(degenerate, 1.0, denom))
    edge_cut = pa + t[..., None] * (pb - pa)   # (M', 12, 3)

    tri_edges = _active_tri_table()[config][:, :15].reshape(-1, 5, 3)
    valid = tri_edges[:, :, 0] >= 0                          # (M', 5)
    safe = np.maximum(tri_edges, 0)
    rows = np.arange(edge_cut.shape[0])[:, None, None]
    tri_pts = edge_cut[rows, safe]                           # (M', 5, 3, 3)
    return tri_pts[valid]                                    # (T, 3, 3)


def dedup_mesh(triangles: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, 3, 3) triangle soup → (vertices (V, 3), faces (T, 3)).

    Uses the native hash dedup (``csrc/meshops.cpp``; exact-bits identity,
    O(n)) when available — numpy's sort-based ``np.unique`` costs ~15 s at
    res-256 scale — with ``np.unique`` as the fallback."""
    if len(triangles) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    flat = np.ascontiguousarray(triangles.reshape(-1, 3), np.float64)
    lib = _load_meshops()
    if lib is not None:
        import ctypes
        n = len(flat)
        out_verts = np.empty((n, 3), np.float64)
        inverse = np.empty(n, np.int32)
        count = lib.dedup_vertices(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n),
            out_verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        verts = out_verts[:count]
    else:
        verts, inverse = np.unique(flat, axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int32)
    return verts.astype(np.float32), faces


_meshops_lib = None
_meshops_failed = False


def _load_meshops():
    global _meshops_lib, _meshops_failed
    if _meshops_lib is not None or _meshops_failed:
        return _meshops_lib
    import ctypes
    import os
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    src = os.path.join(repo, "csrc", "meshops.cpp")
    lib_path = os.path.join(repo, "csrc", "libmeshops.so")
    try:
        if (not os.path.exists(lib_path) or
                os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o",
                            lib_path, src], check=True, capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.dedup_vertices.restype = ctypes.c_int64
        if hasattr(lib, "emit_mc_triangles"):
            lib.emit_mc_triangles.restype = ctypes.c_int64
        _meshops_lib = lib
    except Exception:  # noqa: BLE001 — numpy fallback
        _meshops_failed = True
    return _meshops_lib


def contrastive_marching_cubes(comb_values: np.ndarray,
                               pair_norms: np.ndarray,
                               cells: np.ndarray,
                               resolution: int,
                               size: float = 2.0,
                               isovalue: float = 0.0
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Surface cells → deduplicated mesh in the canonical cube.

    Node positions follow the reference's canonical grid: ``res+1`` nodes
    spanning ``[-size/2, size/2]`` (``marching_cubes_vt.py:191-193``) —
    note this differs from the sampling grid's ``res`` nodes by a factor
    ``(res−1)/res``; the reference has this quirk and callers reproduce its
    scale/translate pipeline on top.
    """
    signed = combs_to_vert_values(comb_values, pair_norms)
    node = (cells[:, None, :] + CORNER_OFFSETS[None]).astype(np.float64)
    grid_verts = node / resolution * size - size / 2.0
    triangles = emit_triangles(grid_verts, signed, isovalue)
    return dedup_mesh(triangles)
