"""Image/depth I/O (reference ``utils/utils.py:73-150``; imageio + cv2,
skimage replaced by a direct uint→float conversion).

``load_rgb`` returns float32 in [0, 1], channels-first by default (the
reference transposes to (3, H, W)); ``load_depth`` reads 16-bit depth PNGs
unchanged as float32 (callers divide by the dataset depth scale).
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import List, Optional

import numpy as np


def mkdir_ifnotexists(directory: str) -> None:
    os.makedirs(directory, exist_ok=True)


def glob_imgs(path: str) -> List[str]:
    imgs: List[str] = []
    for ext in ("*.png", "*.jpg", "*.JPEG", "*.JPG"):
        imgs.extend(glob(os.path.join(path, ext)))
    return imgs


def _img_as_float32(img: np.ndarray) -> np.ndarray:
    """skimage ``img_as_float32`` semantics for the common dtypes."""
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def load_rgb(path: str, normalize_rgb: bool = False,
             transpose: bool = True) -> np.ndarray:
    import imageio.v2 as imageio
    img = _img_as_float32(np.asarray(imageio.imread(path)))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3]
    if normalize_rgb:  # [0,1] → [-1,1]
        img = (img - 0.5) * 2.0
    if transpose:
        img = img.transpose(2, 0, 1)
    return img


def save_rgb(path: str, image: np.ndarray) -> None:
    import imageio.v2 as imageio
    imageio.imwrite(path, (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8))


def load_depth(path: str) -> np.ndarray:
    """Raw depth png values as float32 (reference divides by the dataset's
    png depth scale afterwards)."""
    import cv2
    depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(path)
    return depth.astype(np.float32)


def save_depth(path: str, depth: np.ndarray) -> None:
    """``<path>.npy`` raw + ``<path>.png`` plasma colormap (reference
    ``save_depth``, ``utils/utils.py:111-124``)."""
    np.save(path, depth)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    cax = ax.imshow(depth, cmap="plasma")
    fig.colorbar(cax, ax=ax, label="Depth value")
    ax.axis("off")
    fig.savefig(path + ".png", bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def save_pcl(points: np.ndarray, path: str,
             colors: Optional[np.ndarray] = None) -> None:
    """Point cloud → PLY (reference used open3d; ``utils/utils.py:136-150``)."""
    from vf_nerf_tpu.utils.ply import save_ply
    save_ply(path, np.asarray(points, np.float32),
             np.zeros((0, 3), np.int32))


def get_timestamp() -> str:
    import datetime
    return datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")


def write_json(path: str, payload) -> None:
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
