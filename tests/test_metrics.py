"""PSNR/SSIM metrics sanity + cross-check against skimage when present."""
import numpy as np
import pytest

from nerfart_tpu.ops.metrics import psnr, ssim


def test_psnr_known_values():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20 dB
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4
    assert float(psnr(a, a)) >= 100.0


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = np.clip(img + rng.normal(0, 0.25, img.shape), 0, 1).astype(
        np.float32)
    v = float(ssim(img, noisy))
    assert 0.0 < v < 0.9
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(0, 0.6, img.shape), 0, 1).astype(
        np.float32)
    assert float(ssim(img, noisier)) < v


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    ours = float(ssim(img, noisy))
    theirs = skimage.structural_similarity(
        img, noisy, channel_axis=-1, data_range=1.0,
        gaussian_weights=True, sigma=1.5, use_sample_covariance=False)
    # 'valid' vs reflect-padded windows differ at borders; centers match
    assert abs(ours - theirs) < 0.02


def test_object_masked_metrics():
    """Masked PSNR counts only mask pixels; composite SSIM is 1 when the
    prediction is exact inside the mask (background differences must not
    leak into either metric — the mask-supervised protocol never trains
    background pixels, reference neus.py:599-606)."""
    from nerfart_tpu.ops.metrics import object_masked_metrics
    rng = np.random.RandomState(0)
    gt = rng.uniform(0.2, 0.8, (24, 16, 3)).astype(np.float32)
    mask = np.zeros((24, 16), bool)
    mask[6:18, 4:12] = True

    # exact inside the mask, garbage outside -> perfect masked scores
    pred = np.where(mask[..., None], gt, rng.uniform(size=gt.shape))
    p, s = object_masked_metrics(pred, gt, mask)
    assert p > 100.0 and s > 0.999

    # known error inside the mask -> PSNR reflects exactly that MSE
    delta = 0.1
    pred2 = np.where(mask[..., None], np.clip(gt + delta, 0, 1), 0.0)
    p2, _ = object_masked_metrics(pred2, gt, mask)
    expect = 10 * np.log10(1.0 / delta**2)
    assert abs(p2 - expect) < 0.2
