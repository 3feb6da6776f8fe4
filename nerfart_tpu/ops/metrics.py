"""Image quality metrics (PSNR / SSIM) for reconstruction evaluation.

The reference has no metrics module (its de-facto metric is eyeballing
val renders, SURVEY.md §4); these back tools/eval_psnr.py and QUALITY.md.
Pure JAX, jittable, CPU/TPU.
"""
from typing import Tuple

import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0):
    """Peak signal-to-noise ratio in dB over the whole array."""
    mse = jnp.mean((pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


def _filter2d(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' gaussian filter over [H, W, C]."""
    size = k1d.shape[0]
    c = img.shape[-1]
    x = jnp.moveaxis(img, -1, 0)[:, None]          # [C, 1, H, W]
    kh = jnp.broadcast_to(k1d[None, None, :, None], (1, 1, size, 1))
    kw = jnp.broadcast_to(k1d[None, None, None, :], (1, 1, 1, size))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW",
                                                        "NCHW"))
    # HIGHEST precision: TPU's default bf16 conv passes break the
    # E[x^2]-mu^2 variance cancellation in SSIM (observed SSIM > 1)
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn,
                                 feature_group_count=1,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=dn,
                                 feature_group_count=1,
                                 precision=lax.Precision.HIGHEST)
    return jnp.moveaxis(x[:, 0], 0, -1)            # [H', W', C]


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (standard Wang et al. 2004
    formulation with an 11x11 gaussian window, as torchmetrics/skimage)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    kernel = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu_p = _filter2d(pred, kernel)
    mu_g = _filter2d(gt, kernel)
    mu_pp = mu_p * mu_p
    mu_gg = mu_g * mu_g
    mu_pg = mu_p * mu_g
    sigma_pp = jnp.maximum(_filter2d(pred * pred, kernel) - mu_pp, 0.0)
    sigma_gg = jnp.maximum(_filter2d(gt * gt, kernel) - mu_gg, 0.0)
    sigma_pg = _filter2d(pred * gt, kernel) - mu_pg

    num = (2.0 * mu_pg + c1) * (2.0 * sigma_pg + c2)
    den = (mu_pp + mu_gg + c1) * (sigma_pp + sigma_gg + c2)
    return jnp.mean(num / den)


def psnr_ssim(pred: jnp.ndarray, gt: jnp.ndarray,
              max_val: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return psnr(pred, gt, max_val), ssim(pred, gt, max_val)


def object_masked_metrics(pred: jnp.ndarray, gt: jnp.ndarray,
                          mask: jnp.ndarray) -> Tuple[float, float]:
    """(masked PSNR, composite SSIM) for mask-supervised protocols.

    Under `with_mask` training the photometric loss covers only
    object-mask pixels (reference neus.py:599-606; `w_mask: 0.0` leaves
    the background unsupervised), so the protocol-aligned metrics are
    PSNR over the masked pixels and SSIM with the prediction composited
    over the GT background. `pred`/`gt` are [H, W, C] in [0, 1];
    `mask` is [H, W] bool-ish.
    """
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    m = jnp.asarray(mask) > 0.5
    se = jnp.where(m[..., None], (pred - gt) ** 2, 0.0)
    mse = se.sum() / jnp.maximum(m.sum() * pred.shape[-1], 1)
    psnr_obj = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
    composite = jnp.where(m[..., None], pred, gt)
    return float(psnr_obj), float(ssim(composite, gt))
