"""Base dataset: host-side numpy ray-batch assembly.

Reference: ``datasets/normal_datasets/base_dataset.py:6-127``. Same contract:

- ``pixels_per_batch`` is divided by ``n_images`` in shuffle-views mode
  (``base_dataset.py:29-32``), so one item is a mixed-view batch of
  ``n_images * (pixels_per_batch // n_images)`` rays,
- ``all_pixels`` switches items to whole-image ray grids (eval),
- ``white_bkgd`` is hard-set False (``:37``),
- hooks: ``get_bounds`` / ``get_vf_init_method`` / ``sample_new_images`` /
  ``get_centroid``.

TPU-shaped rebuild: images are stored as stacked numpy arrays
(``(n_images, n_pixels, C)``), batch assembly is one vectorized gather
instead of a per-image python loop, and an epoch is an iterator of
ready-to-ship numpy dicts (the device feed happens in the runner).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

from vf_nerf_tpu.datasets.output import DatasetOutput


def pixel_grid(height: int, width: int) -> np.ndarray:
    """(H*W, 2) float32 (x, y) pixel coordinates in row-major order
    (reference builds this with ``np.mgrid`` + flip,
    ``replica_dataset.py:152-154``)."""
    ys, xs = np.mgrid[0:height, 0:width]
    return np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)


def _sample_pixels(rng, n_pixels: int, k: int) -> np.ndarray:
    """``k`` distinct pixel indices, uniform without replacement.

    Same distribution as the reference's ``randperm(n)[:k]``
    (``replica_dataset.py:168``), but O(k): a full permutation of a
    680×1200 Replica frame costs ~24 ms — ~470 ms per 20-view mixed batch,
    which alone capped sustained training at ~1/3 of pure-compute
    throughput. ``Generator.choice(replace=False)`` is ~2000× faster here.
    """
    if k >= n_pixels:
        return rng.permutation(n_pixels)[:k]
    gen = np.random.Generator(np.random.PCG64(rng.randint(0, 2**31 - 1)))
    return gen.choice(n_pixels, k, replace=False)


class BaseDataset:
    """In-memory ray dataset. Subclasses fill ``rgb_images`` (n, P, 3),
    ``depth_images`` (n, P, 1), ``poses`` (n, 4, 4), ``intrinsics`` (4, 4)
    and ``image_size`` (H, W)."""

    def __init__(self, n_images: int, shuffle_views: bool,
                 pixels_per_batch: int, all_pixels: bool = False) -> None:
        self.n_images = n_images
        self._shuffle_views = shuffle_views
        self._pixels_per_batch = pixels_per_batch
        if shuffle_views:
            self._pixels_per_batch = pixels_per_batch // max(n_images, 1)
        self.total_pixels = self.n_images * self._pixels_per_batch
        self._all_pixels = all_pixels
        self.white_bkgd = False  # hard-set, reference base_dataset.py:37
        self.scale = 3.5

        # Filled by subclasses.
        self.rgb_images: np.ndarray = np.zeros((0, 0, 3), np.float32)
        self.depth_images: np.ndarray = np.zeros((0, 0, 1), np.float32)
        self.poses: np.ndarray = np.zeros((0, 4, 4), np.float32)
        self.intrinsics: np.ndarray = np.eye(4, dtype=np.float32)
        self.image_size: Tuple[int, int] = (0, 0)
        self.far_per_ray: bool = False
        self._uv_cache: Tuple[Tuple[int, int], np.ndarray] = ((0, 0),
                                                              np.zeros(0))

    def _uv_grid(self) -> np.ndarray:
        """Memoized ``pixel_grid(*image_size)`` (rebuilt per batch it costs
        ~8 ms at Replica resolution)."""
        if self._uv_cache[0] != self.image_size:
            self._uv_cache = (self.image_size,
                              pixel_grid(*self.image_size))
        return self._uv_cache[1]

    # --------------------------------------------------------- properties
    @property
    def shuffle_views(self) -> bool:
        return self._shuffle_views

    @property
    def pixels_per_batch(self) -> int:
        return self._pixels_per_batch

    @pixels_per_batch.setter
    def pixels_per_batch(self, value: int) -> None:
        self._pixels_per_batch = value
        if self._shuffle_views:
            self._pixels_per_batch = value // max(self.n_images, 1)
        self.total_pixels = self.n_images * self._pixels_per_batch

    @property
    def all_pixels(self) -> bool:
        return self._all_pixels

    @all_pixels.setter
    def all_pixels(self, value: bool) -> None:
        self._all_pixels = value

    # --------------------------------------------------------------- api
    def __len__(self) -> int:
        return self.n_images

    @property
    def n_pixels(self) -> int:
        return self.image_size[0] * self.image_size[1]

    def _active_images(self) -> int:
        return len(self.rgb_images)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        if self._all_pixels:
            return self._whole_image_item(idx)
        if self._shuffle_views:
            return self._mixed_view_item(np.random)
        return self._single_view_item(idx, np.random)

    def _whole_image_item(self, idx: int) -> Dict[str, np.ndarray]:
        n = self.n_pixels
        uv = self._uv_grid()
        depth = self.depth_images[idx]
        far = depth * 1.25 if self.far_per_ray else np.zeros((0,), np.float32)
        return DatasetOutput(
            rgb=self.rgb_images[idx], uv=uv,
            intrinsics=np.broadcast_to(self.intrinsics, (n, 4, 4)).copy(),
            pose=np.broadcast_to(self.poses[idx], (n, 4, 4)).copy(),
            depth=depth, far=far).to_dict()

    def _mixed_view_item(self, rng) -> Dict[str, np.ndarray]:
        """One mixed-view batch: ``pixels_per_batch`` random pixels from every
        image, concatenated (reference ``replica_dataset.py:165-198``), as a
        single vectorized gather."""
        n_img = self._active_images()
        ppb = self._pixels_per_batch
        idx = np.stack([_sample_pixels(rng, self.n_pixels, ppb)
                        for _ in range(n_img)])          # (n_img, ppb)
        img_idx = np.repeat(np.arange(n_img), ppb)
        pix_idx = idx.reshape(-1)
        uv = self._uv_grid()
        depth = self.depth_images[img_idx, pix_idx]
        far = depth * 1.25 if self.far_per_ray else np.zeros((0,), np.float32)
        out = DatasetOutput(
            rgb=self.rgb_images[img_idx, pix_idx],
            uv=uv[pix_idx],
            intrinsics=np.broadcast_to(self.intrinsics,
                                       (len(pix_idx), 4, 4)).copy(),
            pose=self.poses[img_idx],
            depth=depth, far=far).to_dict()
        # Per-ray source view — consumed by the joint pose-optimization
        # stage to index its optimizable pose table (extra key; absent from
        # the reference DatasetOutput contract).
        out["view_idx"] = img_idx.astype(np.int32)
        return out

    def _single_view_item(self, idx: int, rng) -> Dict[str, np.ndarray]:
        ppb = self._pixels_per_batch
        pix_idx = _sample_pixels(rng, self.n_pixels, ppb)
        uv = self._uv_grid()
        depth = self.depth_images[idx][pix_idx]
        far = depth * 1.25 if self.far_per_ray else np.zeros((0,), np.float32)
        return DatasetOutput(
            rgb=self.rgb_images[idx][pix_idx], uv=uv[pix_idx],
            intrinsics=np.broadcast_to(self.intrinsics, (ppb, 4, 4)).copy(),
            pose=np.broadcast_to(self.poses[idx], (ppb, 4, 4)).copy(),
            depth=depth, far=far).to_dict()

    def epoch_batches(self, rng: np.random.RandomState
                      ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch = ``len(self)`` items in shuffled order (reference
        ``DataLoader(batch_size=1, shuffle=True)``,
        ``vector_field_nerf_train.py:51-53``)."""
        for idx in rng.permutation(len(self)):
            if self._all_pixels:
                yield self._whole_image_item(int(idx))
            elif self._shuffle_views:
                yield self._mixed_view_item(rng)
            else:
                yield self._single_view_item(int(idx), rng)

    # ------------------------------------------------------------- hooks
    def get_bounds(self) -> Tuple[float, float]:
        raise NotImplementedError

    def get_vf_init_method(self) -> Tuple[str, str]:
        """Default: point-to-centre init (reference ``base_dataset.py:109-114``)."""
        return "center", ""

    def sample_new_images(self) -> None:
        """Per-epoch image resampling hook (``random_img_sampling``)."""

    def get_centroid(self) -> np.ndarray:
        return np.zeros(3, np.float32)
