"""Combined stylization loss (reference Trainer.calc_style_loss,
volsdf.py:878-915 / neus.py:629-665).

loss = w_clip * directional_clip
     + w_perceptual * vgg_block2_l1
     + w_contrastive * contrastive(1 random negative text)
     + w_patchnce * patchnce(8 random negative texts, 12 random crops)

Pure function of (clip_params, vgg_params, text bank, images, PRNG key);
the reference's host-side `random.choice`/`random.sample` negative
selection becomes on-device random index draws.
"""
import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerfart_tpu.criteria import losses as L
from nerfart_tpu.models.clip import model as clip_model

Params = Any


@dataclasses.dataclass(frozen=True)
class StyleCfg:
    w_clip: float = 1.0
    w_perceptual: float = 2.0
    w_contrastive: float = 0.2
    w_patchnce: float = 0.1
    n_patch_negs: int = 8          # volsdf.py:909
    patch: L.PatchNCECfg = L.PatchNCECfg()
    clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
    # optional reference CLIPLoss/ContrastiveLoss modes
    # (clip_loss.py:157, contrastive_loss.py:93)
    direction_loss_type: str = "cosine"    # cosine | mse | mae
    use_distance: bool = False             # + 1.0 * clip_distance_loss
    contrastive_distance_type: str = "euclidean"  # | cosine | infonce


def style_loss(clip_params: Params, vgg_params: Params, bank: L.TextBank,
               rgb_pred: jnp.ndarray, rgb_gt: jnp.ndarray, H: int,
               key: jax.Array, cfg: StyleCfg
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """rgb_pred/rgb_gt: [B, H*W, 3] flat images (volsdf.py:889-890)."""
    B = rgb_pred.shape[0]
    rgb_pred = rgb_pred.reshape(B, H, -1, 3).transpose(0, 3, 1, 2)
    rgb_gt = rgb_gt.reshape(B, H, -1, 3).transpose(0, 3, 1, 2)

    k_con, k_pnce_sel, k_pnce = jax.random.split(key, 3)
    n_neg = bank.neg_feats.shape[0]
    assert n_neg > 0, ("style_loss needs a non-empty negative text bank "
                       "(criteria/neg_text.txt)")

    losses = {}
    losses["clip"] = cfg.w_clip * L.directional_clip_loss(
        clip_params, rgb_gt, rgb_pred, bank.text_direction,
        clip_cfg=cfg.clip_cfg, loss_type=cfg.direction_loss_type)
    if cfg.use_distance:
        # CLIPLoss.forward adds 1.0 * clip_distance_loss when
        # use_distance is set (clip_loss.py:299-302), inside the
        # w_clip-weighted term
        assert bank.text_distance is not None, (
            "use_distance needs TextBank.text_distance")
        losses["clip"] = losses["clip"] + cfg.w_clip * L.clip_distance_loss(
            clip_params, rgb_gt, rgb_pred, bank.text_distance,
            clip_cfg=cfg.clip_cfg)
    losses["perceptual"] = cfg.w_perceptual * L.vgg_perceptual_loss(
        vgg_params, rgb_pred, rgb_gt)

    # one random negative text (volsdf.py:902-905)
    neg_idx = jax.random.randint(k_con, (), 0, n_neg)
    losses["contrastive"] = cfg.w_contrastive * L.global_contrastive_loss(
        clip_params, rgb_gt, rgb_pred, bank.target_feats,
        bank.neg_feats[neg_idx], clip_cfg=cfg.clip_cfg,
        distance_type=cfg.contrastive_distance_type)

    # 8 random negative texts for PatchNCE (volsdf.py:909-913). The
    # reference uses sampling without replacement; with a ~100-text bank a
    # with-replacement draw is statistically indistinguishable and stays
    # on-device.
    sel = jax.random.randint(k_pnce_sel, (cfg.n_patch_negs,), 0, n_neg)
    losses["patchnce"] = cfg.w_patchnce * L.patchnce_loss(
        clip_params, rgb_pred, bank.target_feats, bank.neg_feats[sel],
        k_pnce, cfg.patch, clip_cfg=cfg.clip_cfg)

    total = losses["clip"] + losses["perceptual"] \
        + losses["contrastive"] + losses["patchnce"]
    return total, losses
