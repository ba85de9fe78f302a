"""Device-resident VF mesh-extraction pipeline.

The host pipeline (``pipeline.extract_vf_mesh``) downloads the full field
grid (~200 MB at res 256) for numpy field ops; on a remote-attached TPU the
transfer alone dominates (~25 MB/s relay). This pipeline keeps everything on
device and downloads only:

- the surface-cell mask (res³ bool ≈ 17 MB at 256),
- the signed corner values of the surface cells (M × 8 f32, ~10 MB).

Stages (same math as ``field_ops``/``contrastive``, JAX versions):
grid positions are *generated* on device (no upload), the field is evaluated
chunk-wise under one jit, divergence → mask, then for the host-selected cells:
corner gathers → most-opposed-pair side assignment → 28-comb crossing flags →
signed corner values. Triangle emission + dedup stay on host (table lookups).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vf_nerf_tpu.evaluation.mc.contrastive import dedup_mesh, emit_triangles
from vf_nerf_tpu.evaluation.mc.field_ops import FACE_AREA, SHAPE_VOLUME
from vf_nerf_tpu.evaluation.mc.tables import (COMB_I, COMB_J, CORNER_COMB,
                                              CORNER_LANE, CORNER_OFFSETS,
                                              PAIR_TO_COMB)

_CORNERS = jnp.asarray(CORNER_OFFSETS, jnp.int32)
_COMB_I = jnp.asarray(COMB_I)
_COMB_J = jnp.asarray(COMB_J)
_PAIR_TO_COMB = jnp.asarray(PAIR_TO_COMB)
_CORNER_COMB = jnp.asarray(CORNER_COMB)
_CORNER_LANE = jnp.asarray(CORNER_LANE)


def _grid_points(res: int, scale, offset: jnp.ndarray,
                 flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Sample positions for flat grid indices (x slowest, reference order).
    ``scale`` may be a traced scalar (per-octant sub-scales share one
    compile)."""
    voxel = scale * 2.0 / (res - 1)
    x = (flat_idx // (res * res)) % res
    y = (flat_idx // res) % res
    z = flat_idx % res
    pts = jnp.stack([x, y, z], axis=-1).astype(jnp.float32) * voxel - scale
    return pts + offset


def build_raw_field_grid(vf_apply: Callable[[jnp.ndarray], jnp.ndarray],
                         res: int, scale, offset: jnp.ndarray,
                         chunk: int = 1 << 20) -> jnp.ndarray:
    """Evaluate the raw field over the res³ grid on device →
    (res, res, res, 3)."""
    n = res ** 3
    n_chunks = -(-n // chunk)

    def eval_chunk(c):
        idx = c * chunk + jnp.arange(chunk)
        pts = _grid_points(res, scale, offset, idx)
        return vf_apply(pts)

    field = jax.lax.map(eval_chunk, jnp.arange(n_chunks))
    return field.reshape(n_chunks * chunk, 3)[:n].reshape(res, res, res, 3)


def _normalize_grid(grid: jnp.ndarray):
    norms = jnp.linalg.norm(grid, axis=-1)
    vt = grid / jnp.maximum(norms[..., None], 1e-12)
    return vt, norms


def build_field_grid(vf_apply: Callable[[jnp.ndarray], jnp.ndarray],
                     res: int, scale, offset: jnp.ndarray,
                     chunk: int = 1 << 20):
    """Evaluate the field over the res³ grid on device.

    :param vf_apply: jit-friendly (N, 3) → (N, 3) field function.
    :return: (vt (res,res,res,3) unit field, norms (res,res,res)) device
        arrays.
    """
    return _normalize_grid(build_raw_field_grid(vf_apply, res, scale,
                                                offset, chunk))


def surface_mask(vt: jnp.ndarray, threshold: float = -0.5) -> jnp.ndarray:
    """Divergence surface-cell mask (``field_ops.extract_divergence`` math,
    f32, device)."""
    n = vt.shape[0]
    div = jnp.zeros((n - 1, n - 1, n - 1), jnp.float32)
    for idx in range(8):
        off = ((idx // 4) % 2, (idx // 2) % 2, idx % 2)
        direction = np.array([2.0 * o - 1.0 for o in off], np.float32)
        direction /= np.linalg.norm(direction)
        corner = vt[off[0]:off[0] + n - 1,
                    off[1]:off[1] + n - 1,
                    off[2]:off[2] + n - 1]
        d = corner @ jnp.asarray(direction)
        div = div + d * jnp.abs(d) * FACE_AREA
    div = div / SHAPE_VOLUME
    mask = jnp.zeros((n, n, n), jnp.bool_)
    return mask.at[:-1, :-1, :-1].set(div <= threshold)


def cell_signed_values(vt: jnp.ndarray, norms: jnp.ndarray,
                       cells: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device version of unify_direction → make_comb_format →
    combs_to_vert_values for a padded batch of cells.

    :param cells: (M, 3) int32 (padding rows may repeat a valid cell).
    :return: (signed corner values (M, 8), any-crossing flags (M,)).
    """
    pad_width = [(0, 1)] * 3
    vt_pad = jnp.pad(vt, pad_width + [(0, 0)])
    norms_pad = jnp.pad(norms, pad_width)

    idx = cells[:, None, :] + _CORNERS[None]          # (M, 8, 3)
    corners = vt_pad[idx[..., 0], idx[..., 1], idx[..., 2]]       # (M, 8, 3)
    corner_norms = norms_pad[idx[..., 0], idx[..., 1], idx[..., 2]]

    dots = jnp.einsum("mac,mbc->mab", corners, corners)
    flat = (1.0 - dots).reshape(-1, 64)
    extreme = jnp.argmax(flat, axis=-1)
    first = extreme // 8
    second = extreme % 8
    m = jnp.arange(cells.shape[0])
    v_first = corners[m, first]
    v_second = corners[m, second]
    d_first = jnp.linalg.norm(corners - v_first[:, None], axis=-1)
    d_second = jnp.linalg.norm(corners - v_second[:, None], axis=-1)
    choice = (d_second < d_first)                      # (M, 8) bool

    different = (choice[:, _COMB_I] != choice[:, _COMB_J])        # (M, 28)
    comb_values = different.astype(jnp.float32)
    has_crossing = comb_values.max(axis=1) > 0.5

    anchor = jnp.argmax(comb_values, axis=1)
    a0 = _COMB_I[anchor]
    a1 = _COMB_J[anchor]
    verts = jnp.arange(8)
    c0 = comb_values[m[:, None], _PAIR_TO_COMB[verts[None, :], a0[:, None]]]
    c1 = comb_values[m[:, None], _PAIR_TO_COMB[verts[None, :], a1[:, None]]]
    side1 = c0 > c1
    side1 = side1.at[m, a0].set(False)
    side1 = side1.at[m, a1].set(True)

    signed = jnp.where(side1, 1.0, -1.0) * corner_norms
    signed = jnp.where(has_crossing[:, None], signed, 0.0)
    return signed, has_crossing


_EMPTY = (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))


class DeviceMeshExtractor:
    """Build-once device MC extractor: the stage-1 (field grid + divergence
    mask) and stage-2 (corner classification) jits are traced a single time
    — scale and offset are traced scalars, so every octant of a quadrant
    run shares the same executables (previously each octant re-traced
    stage1, paying the remote-compiler cache lookup per octant)."""

    def __init__(self, vf_apply: Callable[[jnp.ndarray], jnp.ndarray],
                 resolution: int, chunk: int = 1 << 20,
                 cell_bucket: int = 1 << 16,
                 smooth_before: bool = False,
                 smooth_after: bool = False) -> None:
        """``smooth_before``/``smooth_after`` run the reference's Gaussian
        smoothing ON DEVICE (k=3/σ=1 before divergence, k=9/σ=2 before
        classification — host pipeline semantics ``mc/pipeline.py:96-100``),
        so the smoothed mesh variants no longer download the ~200 MB field
        grid through the relay."""
        self.resolution = resolution
        n_total = resolution ** 3
        # Don't pad tiny grids up to a full chunk.
        self.chunk = min(chunk, 1 << max(int(np.ceil(np.log2(n_total))), 10))
        self.cell_bucket = min(
            cell_bucket, 1 << max(int(np.ceil(np.log2(n_total))), 10))

        from vf_nerf_tpu.evaluation.mc.smoothing import smooth_vf

        @jax.jit
        def stage1(scale, offset):
            grid = build_raw_field_grid(vf_apply, resolution, scale, offset,
                                        self.chunk)
            if smooth_before:
                grid = smooth_vf(grid, k=3, sigma=1.0)
            vt_div, norms_raw = _normalize_grid(grid)
            mask = surface_mask(vt_div)
            if smooth_before or smooth_after:
                grid = smooth_vf(grid, k=9, sigma=2.0)
                vt, norms = _normalize_grid(grid)
            else:
                vt, norms = vt_div, norms_raw
            return vt, norms, mask

        self._stage1 = stage1
        self._stage2 = jax.jit(cell_signed_values)

    # ------------------------------------------------------- device stages
    def device_stages(self, scale: float, offset: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Field grid → mask → corner classification for one cube.

        :return: (crossing cells (M, 3) int32, signed corner values (M, 8)).
        """
        vt, norms, mask = self._stage1(jnp.float32(scale),
                                       jnp.asarray(offset, jnp.float32))
        mask_host = np.asarray(jax.device_get(mask))
        cells = np.argwhere(mask_host).astype(np.int32)
        if len(cells) == 0:
            return cells, np.zeros((0, 8), np.float32)

        bucket = self.cell_bucket
        signed_all = np.empty((len(cells), 8), np.float32)
        crossing_all = np.empty((len(cells),), bool)
        for start in range(0, len(cells), bucket):
            end = min(start + bucket, len(cells))
            block = cells[start:end]
            pad = bucket - (end - start)
            if pad:
                block = np.concatenate([block,
                                        np.repeat(block[-1:], pad, 0)])
            signed, crossing = self._stage2(vt, norms, jnp.asarray(block))
            signed_all[start:end] = np.asarray(signed)[:end - start]
            crossing_all[start:end] = np.asarray(crossing)[:end - start]
        return cells[crossing_all], signed_all[crossing_all]

    # --------------------------------------------------------- host stages
    def host_tail(self, cells: np.ndarray, signed: np.ndarray,
                  scale: float, offset: np.ndarray, world_coords: bool
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Triangle emission (native C++) + dedup + world transform."""
        if len(cells) == 0:
            return _EMPTY
        node = (cells[:, None, :] + CORNER_OFFSETS[None]).astype(np.float64)
        grid_verts = node / self.resolution * 2.0 - 1.0
        triangles = emit_triangles(grid_verts, signed.astype(np.float64))
        verts, faces = dedup_mesh(triangles)
        if world_coords and len(verts):
            verts = verts * scale + np.asarray(offset, np.float32)
        return verts, faces

    # ---------------------------------------------------------- extraction
    def extract(self, scale: float, centroid: np.ndarray,
                translation: np.ndarray, world_coords: bool = True
                ) -> Tuple[np.ndarray, np.ndarray]:
        offset = np.asarray(translation) + np.asarray(centroid)
        cells, signed = self.device_stages(scale, offset)
        return self.host_tail(cells, signed, scale, offset, world_coords)

    def extract_many(self, octants, centroid: np.ndarray,
                     world_coords: bool = True, devices=None):
        """Pipelined multi-octant extraction: octant k's host-side triangle
        emission/dedup runs in a worker thread while octant k+1's device
        stages execute (VERDICT r1 item 8 — overlap host triangulation with
        device field evaluation).

        :param octants: iterable of (translation, sub_scale).
        :param devices: optional list of devices — octants round-robin
            across them and their field grids evaluate CONCURRENTLY
            (octant-level multi-chip parallelism; octants are independent
            sub-volumes, so no halo exchange is needed). Bit-equal to the
            sequential path (``tests/test_device_pipeline.py``).
        :return: list of (verts, faces), octant order preserved.
        """
        from concurrent.futures import ThreadPoolExecutor

        octants = list(octants)
        if devices is not None and len(devices) > 1:
            return self._extract_many_multichip(octants, centroid,
                                                world_coords, devices)
        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = []
            for translation, sub_scale in octants:
                offset = np.asarray(translation) + np.asarray(centroid)
                cells, signed = self.device_stages(sub_scale, offset)
                futures.append(pool.submit(self.host_tail, cells, signed,
                                           sub_scale, offset, world_coords))
            return [f.result() for f in futures]

    def _extract_many_multichip(self, octants, centroid, world_coords,
                                devices):
        """Octants round-robin over devices; stage-1 (field grid + mask)
        dispatches run concurrently across chips, but in-flight octants are
        BOUNDED to 2 per device — dispatching all up front kept every
        octant's (vt, norms) grids alive at once (~270 MB/octant at res 256
        → multi-GB/chip pinned at 64 octants; advisor r2 finding). The next
        octant's stage-1 only dispatches after a completed one is drained,
        preserving the concurrency without accumulating field grids."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        max_inflight = 2 * len(devices)
        staged: deque = deque()
        results = []

        def drain_one(pool) -> None:
            # Pops the oldest octant so its (vt, norms) buffers die as soon
            # as the stage-2 loop is done with them.
            (vt, norms, mask), offset, sub_scale = staged.popleft()
            mask_host = np.asarray(jax.device_get(mask))
            cells = np.argwhere(mask_host).astype(np.int32)
            if len(cells) == 0:
                results.append(pool.submit(lambda: _EMPTY))
                return
            bucket = self.cell_bucket
            signed_all = np.empty((len(cells), 8), np.float32)
            crossing_all = np.empty((len(cells),), bool)
            for start in range(0, len(cells), bucket):
                end = min(start + bucket, len(cells))
                block = cells[start:end]
                pad = bucket - (end - start)
                if pad:
                    block = np.concatenate(
                        [block, np.repeat(block[-1:], pad, 0)])
                dev = vt.devices().pop()
                signed, crossing = self._stage2(
                    vt, norms, jax.device_put(jnp.asarray(block), dev))
                signed_all[start:end] = np.asarray(signed)[:end - start]
                crossing_all[start:end] = \
                    np.asarray(crossing)[:end - start]
            results.append(pool.submit(
                self.host_tail, cells[crossing_all],
                signed_all[crossing_all], sub_scale, offset, world_coords))

        with ThreadPoolExecutor(max_workers=2) as pool:
            for k, (translation, sub_scale) in enumerate(octants):
                if len(staged) >= max_inflight:
                    drain_one(pool)
                dev = devices[k % len(devices)]
                offset = np.asarray(translation) + np.asarray(centroid)
                scale_d = jax.device_put(jnp.float32(sub_scale), dev)
                off_d = jax.device_put(jnp.asarray(offset, jnp.float32),
                                       dev)
                staged.append((self._stage1(scale_d, off_d), offset,
                               sub_scale))
            while staged:
                drain_one(pool)
            return [f.result() for f in results]


def extract_vf_mesh_device(vf_apply: Callable[[jnp.ndarray], jnp.ndarray],
                           resolution: int,
                           scale: float,
                           centroid: np.ndarray,
                           translation: np.ndarray,
                           world_coords: bool = True,
                           chunk: int = 1 << 20,
                           cell_bucket: int = 1 << 16
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Device-resident equivalent of ``pipeline.extract_vf_mesh``
    (plain variant). One-shot wrapper around :class:`DeviceMeshExtractor`;
    construct the extractor directly for the smoothed variants or
    multi-octant pipelining."""
    extractor = DeviceMeshExtractor(vf_apply, resolution, chunk, cell_bucket)
    return extractor.extract(scale, centroid, translation, world_coords)
