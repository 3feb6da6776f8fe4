"""Image resizing with torch-compatible kernels, as matrix products.

The stylization losses depend on torch's exact resize semantics
(`F.interpolate(mode='bilinear'/'bicubic', align_corners=False)` — used by
reference criteria/perp_loss.py:45-46, clip_loss.py:167,
patchnce_loss.py:101,215). jax.image.resize's cubic kernel uses a=-0.5
(Keys) while torch uses a=-0.75, so we build the interpolation weights
ourselves.

TPU-first design: a 1-D resize is a [out, in] sparse-banded weight matrix;
a 2-D resize is two dense matmuls (rows then cols) that run on the MXU and
fuse with the surrounding network — no gathers in the hot path. Weight
matrices are built at trace time (static shapes) and constant-folded.
"""
import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """[out_size, in_size] interpolation weights, align_corners=False."""
    scale = in_size / out_size
    # sample positions in input space (half-pixel centers)
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    m = np.zeros((out_size, in_size), np.float32)
    if mode == "bilinear":
        x0 = np.floor(x).astype(int)
        t = x - x0
        for k, w in ((x0, 1 - t), (x0 + 1, t)):
            kc = np.clip(k, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), kc), w)
    elif mode == "bicubic":
        a = -0.75  # torch's cubic coefficient

        def cubic(d):
            d = np.abs(d)
            w = np.where(
                d <= 1, ((a + 2) * d - (a + 3)) * d * d + 1,
                np.where(d < 2, (((d - 5) * d + 8) * d - 4) * a, 0.0))
            return w

        x0 = np.floor(x).astype(int)
        for off in (-1, 0, 1, 2):
            k = x0 + off
            w = cubic(x - k)
            kc = np.clip(k, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), kc), w)
    else:
        raise ValueError(mode)
    return m


def resize2d(img: jnp.ndarray, out_hw: Tuple[int, int],
             mode: str = "bilinear") -> jnp.ndarray:
    """Resize [..., H, W] -> [..., H', W'] (channels lead, torch layout)."""
    H, W = img.shape[-2], img.shape[-1]
    out_h, out_w = out_hw
    mh = jnp.asarray(_resize_matrix(H, out_h, mode))  # [H', H]
    mw = jnp.asarray(_resize_matrix(W, out_w, mode))  # [W', W]
    img = jnp.einsum("oh,...hw->...ow", mh, img)
    img = jnp.einsum("ow,...hw->...ho", mw, img)
    return img
