"""Image loading (reference utils/io_util.py:37-56).

Whole scenes fit in host RAM (reference loads everything up-front too,
reference dataio/DTU.py:72-82); arrays stay numpy until staged to device.
"""
import glob
import os
from typing import List

import imageio.v2 as imageio
import numpy as np


def glob_imgs(path: str) -> List[str]:
    imgs = []
    for ext in ["*.png", "*.jpg", "*.JPEG", "*.JPG"]:
        imgs.extend(glob.glob(os.path.join(path, ext)))
    return imgs


def _rescale(img: np.ndarray, factor: float) -> np.ndarray:
    """Downscale by 1/factor with bilinear interpolation (stand-in for
    skimage.transform.rescale(anti_aliasing=False), io_util.py:41)."""
    import cv2
    h, w = img.shape[:2]
    new_w, new_h = int(round(w / factor)), int(round(h / factor))
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)


def load_rgb(path: str, downscale: float = 1) -> np.ndarray:
    """float32 [0,1] CHW image (io_util.py:37-47)."""
    img = imageio.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3]
    if downscale != 1:
        img = _rescale(img, downscale)
    return img.transpose(2, 0, 1)


def load_mask(path: str, downscale: float = 1) -> np.ndarray:
    """bool mask: gray > 127.5 (io_util.py:49-56)."""
    alpha = imageio.imread(path, mode="F" if path.endswith(
        (".png", ".jpg")) else None)
    alpha = np.asarray(alpha, np.float32)
    if alpha.ndim == 3:
        alpha = alpha.mean(-1)
    if downscale != 1:
        alpha = _rescale(alpha, downscale)
    return alpha > 127.5
