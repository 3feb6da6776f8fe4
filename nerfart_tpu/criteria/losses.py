"""Stylization loss stack: directional CLIP, VGG perceptual, global
contrastive, local PatchNCE (+ the NeRF_pl-variant extras: InfoNCE and the
weights regularizers).

Design: text features are precomputed once on the host (`TextBank`), so
the per-step loss is a single pure jit-able function of
(clip_params, vgg_params, rgb_pred, rgb_gt, sampled negative indices,
patch crop positions) — CLIP/VGG forward+backward never leave the device.

Reference semantics preserved per function (file:line cited inline).
"""
import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.criteria import preprocess as pp
from nerfart_tpu.criteria.templates import imagenet_templates
from nerfart_tpu.models import vgg as vgg_mod
from nerfart_tpu.models.clip import model as clip_model
from nerfart_tpu.ops.resize import resize2d

Params = Any


# --------------------------------------------------------------------------
# text feature precomputation
# --------------------------------------------------------------------------

def encode_templates(clip_params: Params, tokenizer, class_str: str,
                     templates: Sequence[str] = imagenet_templates,
                     batch: int = 128,
                     clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32,
                     norm: bool = True) -> jnp.ndarray:
    """Per-template text features [T, 512], normalized unless norm=False
    (reference clip_loss.py:222-232)."""
    texts = [t.format(class_str) for t in templates]
    tokens = tokenizer.tokenize(texts)
    feats = []
    enc = jax.jit(clip_model.encode_text, static_argnames=("cfg",))
    for i in range(0, len(tokens), batch):
        feats.append(enc(clip_params, jnp.asarray(tokens[i:i + batch]),
                         cfg=clip_cfg))
    feats = jnp.concatenate(feats, axis=0)
    if not norm:
        return feats
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def compute_text_direction(src_feats: jnp.ndarray,
                           tgt_feats: jnp.ndarray) -> jnp.ndarray:
    """Normalized mean edit direction [1, 512] (clip_loss.py:234-242)."""
    d = (tgt_feats - src_feats).mean(axis=0, keepdims=True)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def compute_text_distance(src_feats_unnorm: jnp.ndarray,
                          tgt_feats_unnorm: jnp.ndarray) -> jnp.ndarray:
    """Squared UN-normalized mean edit direction [1, 512] — the
    `text_distance` target of the reference's distance loss
    (clip_loss.py:256-258: compute_text_direction(norm=False) ** 2)."""
    d = (tgt_feats_unnorm - src_feats_unnorm).mean(axis=0, keepdims=True)
    return d ** 2


def compute_feature_direction(clip_params: Params, src_imgs: jnp.ndarray,
                              tar_imgs: jnp.ndarray,
                              clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
                              ) -> jnp.ndarray:
    """Image-pair feature direction from example image lists
    (reference clip_loss.py:176-198 + 272-279).

    src_imgs/tar_imgs: [N, 3, H, W] in [0, 1] (the reference's
    ToTensor'd PIL images). Reproduces the reference exactly, including
    its quirk at clip_loss.py:195: the SOURCE mean is divided a second
    time by len(tar_img_list) while the target features stay an unscaled
    SUM (the final direction is normalized, but the asymmetric scaling
    still changes where the difference points)."""
    def mean_feats(imgs):
        f = _img_features(clip_params, pp.preprocess_square224(imgs),
                          clip_cfg=clip_cfg)
        return f.sum(axis=0, keepdims=True)

    src = mean_feats(src_imgs) / src_imgs.shape[0] / tar_imgs.shape[0]
    tar = mean_feats(tar_imgs)
    d = (tar - src).mean(axis=0, keepdims=True)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@dataclasses.dataclass
class TextBank:
    """All text features a stylization run needs, precomputed once."""
    text_direction: jnp.ndarray        # [1, 512]
    target_feats: jnp.ndarray          # [T, 512] target templates
    neg_feats: jnp.ndarray             # [N_neg, T, 512] negative-text templates
    # [1, 512] squared unnorm direction (clip_loss.py:258); only needed
    # when StyleCfg.use_distance is on
    text_distance: Optional[jnp.ndarray] = None

    @staticmethod
    def build(clip_params: Params, tokenizer, src_text: str, target_text: str,
              neg_texts: List[str],
              clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
              ) -> "TextBank":
        # encode once unnormalized; derive both the normalized features
        # and the distance-loss target from the same pass
        src_u = encode_templates(clip_params, tokenizer, src_text,
                                 clip_cfg=clip_cfg, norm=False)
        tgt_u = encode_templates(clip_params, tokenizer, target_text,
                                 clip_cfg=clip_cfg, norm=False)
        src = src_u / jnp.linalg.norm(src_u, axis=-1, keepdims=True)
        tgt = tgt_u / jnp.linalg.norm(tgt_u, axis=-1, keepdims=True)
        negs = [encode_templates(clip_params, tokenizer, t, clip_cfg=clip_cfg)
                for t in neg_texts]
        return TextBank(
            text_direction=compute_text_direction(src, tgt),
            target_feats=tgt,
            neg_feats=jnp.stack(negs) if negs else jnp.zeros((0, *tgt.shape)),
            text_distance=compute_text_distance(src_u, tgt_u),
        )


# --------------------------------------------------------------------------
# image feature helpers
# --------------------------------------------------------------------------

def _img_features(clip_params, img, norm=True,
                  clip_cfg=clip_model.VIT_B_32):
    f = clip_model.encode_image(clip_params, img, clip_cfg)
    if norm:
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    return f


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

def direction_loss(x: jnp.ndarray, y: jnp.ndarray,
                   loss_type: str = "cosine") -> jnp.ndarray:
    """The reference's DirectionLoss (clip_loss.py:136-153):
    cosine -> 1 - cos per row; mse/mae -> element-mean over the
    broadcast pair (torch's default 'mean' reduction)."""
    if loss_type == "cosine":
        return 1.0 - jnp.sum(x * y, axis=-1) / (
            jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1))
    x, y = jnp.broadcast_arrays(x, y)
    if loss_type == "mse":
        return ((x - y) ** 2).mean()
    if loss_type == "mae":
        return jnp.abs(x - y).mean()
    raise ValueError(f"unknown DirectionLoss type {loss_type!r}")


def directional_clip_loss(clip_params: Params, rgb_gt: jnp.ndarray,
                          rgb_pred: jnp.ndarray,
                          text_direction: jnp.ndarray,
                          clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32,
                          loss_type: str = "cosine") -> jnp.ndarray:
    """DirectionLoss(image edit direction, text direction)
    (reference clip_loss.py:244-254; default 'cosine' = 1 - cos).
    Also serves the image-pair variant (clip_loss.py:281-291) by passing
    a `compute_feature_direction` result as `text_direction`."""
    src = _img_features(clip_params, pp.preprocess_square224(rgb_gt),
                        clip_cfg=clip_cfg)
    tgt = _img_features(clip_params, pp.preprocess_square224(rgb_pred),
                        clip_cfg=clip_cfg)
    edit = tgt - src
    edit = edit / jnp.linalg.norm(edit, axis=-1, keepdims=True)
    return direction_loss(edit, text_direction, loss_type).mean()


def clip_distance_loss(clip_params: Params, rgb_gt: jnp.ndarray,
                       rgb_pred: jnp.ndarray, text_distance: jnp.ndarray,
                       scale: float = 1.0,
                       clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
                       ) -> jnp.ndarray:
    """Squared-feature-distance matching (reference clip_loss.py:256-268,
    `use_distance`): image features UN-normalized, edit distance
    scale*(tgt-src)^2 pulled toward the squared text direction."""
    src = _img_features(clip_params, pp.preprocess_square224(rgb_gt),
                        norm=False, clip_cfg=clip_cfg)
    tgt = _img_features(clip_params, pp.preprocess_square224(rgb_pred),
                        norm=False, clip_cfg=clip_cfg)
    edit_distance = scale * (tgt - src) ** 2
    return ((edit_distance - text_distance) ** 2).mean()


def vgg_perceptual_loss(vgg_params: Params, rgb_pred: jnp.ndarray,
                        rgb_gt: jnp.ndarray) -> jnp.ndarray:
    """L1 on VGG16 block-2 features after ImageNet normalize + bilinear 224
    (reference perp_loss.py:28-57: only block index 2 contributes)."""
    mean = jnp.asarray(vgg_mod.IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(vgg_mod.IMAGENET_STD).reshape(1, 3, 1, 1)
    x = resize2d((rgb_pred - mean) / std, (224, 224), mode="bilinear")
    y = resize2d((rgb_gt - mean) / std, (224, 224), mode="bilinear")
    fx = vgg_mod.vgg16_block_features(vgg_params, x)
    fy = vgg_mod.vgg16_block_features(vgg_params, y)
    return jnp.abs(fx[2] - fy[2]).mean()


def global_contrastive_loss(clip_params: Params, rgb_gt: jnp.ndarray,
                            rgb_pred: jnp.ndarray,
                            target_feats: jnp.ndarray,
                            neg_feat: jnp.ndarray,
                            margin: float = 2.0,
                            clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32,
                            distance_type: str = "euclidean"
                            ) -> jnp.ndarray:
    """Contrastive triplet on CLIP features with the reference's three
    distance types (reference contrastive_loss.py:139-181):
    pull pred toward target-text templates, push from (negative text,
    original image). 'euclidean' = margin-2 hinge on L2 distances;
    'cosine' = the same hinge shape on raw cosine similarities;
    'infonce' (reference spelling 'infornce') = softmax over the three
    L2 distances at temperature 1."""
    src_enc = _img_features(clip_params, pp.preprocess_shorter_crop224(
        pp.gan_unnormalize(rgb_gt)), clip_cfg=clip_cfg)
    tgt_enc = _img_features(clip_params, pp.preprocess_shorter_crop224(
        pp.gan_unnormalize(rgb_pred)), clip_cfg=clip_cfg)
    if distance_type == "cosine":
        # nn.CosineSimilarity on already-normalized features
        c_near = jnp.sum(tgt_enc * target_feats, axis=-1)            # [T]
        c_far_text = jnp.sum(tgt_enc * neg_feat, axis=-1)            # [T]
        c_far_img = jnp.sum(tgt_enc * src_enc, axis=-1)              # [1]
        return jnp.mean(c_near ** 2
                        + jnp.clip(margin - c_far_text, a_min=0.0) ** 2
                        + jnp.clip(margin - c_far_img, a_min=0.0) ** 2)
    d_near = jnp.linalg.norm(tgt_enc - target_feats, axis=-1)        # [T]
    d_far_text = jnp.linalg.norm(tgt_enc - neg_feat, axis=-1)        # [T]
    d_far_img = jnp.linalg.norm(tgt_enc - src_enc, axis=-1)          # [1]
    if distance_type in ("infonce", "infornce"):
        # temperature-1 softmax over the three distances
        # (contrastive_loss.py:164-175; note pos = exp(+distance), as
        # written in the reference)
        pos = jnp.exp(d_near)
        neg_text = jnp.exp(d_far_text)
        neg_img = jnp.exp(d_far_img)
        return jnp.mean(-jnp.log(pos / (pos + neg_text + neg_img)))
    if distance_type != "euclidean":
        raise ValueError(f"unknown distance_type {distance_type!r}")
    return jnp.mean(d_near ** 2
                    + jnp.clip(margin - d_far_text, a_min=0.0) ** 2
                    + jnp.clip(margin - d_far_img, a_min=0.0) ** 2)


def _patch_infonce(clip_params, patch, target_feats, neg_feats,
                   temperature=0.07, clip_cfg=clip_model.VIT_B_32):
    """Per-patch InfoNCE vs target (pos) and negative texts
    (reference patchnce_loss.py:153-173)."""
    enc = _img_features(clip_params, pp.clip_normalize(patch),
                        clip_cfg=clip_cfg)
    cos_near = jnp.sum(enc * target_feats, axis=-1)                   # [T]
    pos = jnp.exp(cos_near / temperature)
    cos_far = jnp.einsum("bd,ntd->nt", enc, neg_feats)                # [N, T]
    negs = jnp.exp(cos_far / temperature).sum(axis=0)                 # [T]
    return jnp.mean(-jnp.log(pos / (pos + negs)))


@dataclasses.dataclass(frozen=True)
class PatchNCECfg:
    """Geometry of the patch sampling (reference patchnce_loss.py:107-216).

    The zero-pad is the reference's final hardcoded value (l,r,t,b) =
    (270, 270, 480, 480) (patchnce_loss.py:114); target_hw is the full-res
    dataset size; is_full_res selects 224 vs 112->224 patches."""
    target_h: int = 960
    target_w: int = 540
    pad_lr: int = 270
    pad_tb: int = 480
    n_patches: int = 12
    is_full_res: bool = False

    @property
    def patch_size(self) -> int:
        return 224 if self.is_full_res else 112

    def crop_bounds(self) -> Tuple[int, int, int, int]:
        """(i_lo, i_hi, j_lo, j_hi) exclusive-hi randint bounds
        (patchnce_loss.py:196-211)."""
        H, W, th = self.target_h, self.target_w, self.patch_size
        if H != W:
            m = 200 if self.is_full_res else 100
        else:
            m = 80 if self.is_full_res else 40
        return m, H - th + 1 - m, 0, W - th + 1


def patchnce_loss_at(clip_params: Params, rgb_pred: jnp.ndarray,
                     target_feats: jnp.ndarray, neg_feats: jnp.ndarray,
                     iis: jnp.ndarray, jjs: jnp.ndarray,
                     cfg: PatchNCECfg,
                     clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
                     ) -> jnp.ndarray:
    """Local PatchNCE at explicit crop positions (reference
    patchnce_loss.py:175-220). The zero-pad happens BEFORE the GAN
    un-normalize, exactly as the reference (which pads the [0,1] render
    and un-normalizes per patch inside encode_images, so pad pixels land
    at 0.5); the affine un-normalize commutes with the bicubic resizes."""
    img = jnp.pad(rgb_pred, ((0, 0), (0, 0), (cfg.pad_tb, cfg.pad_tb),
                             (cfg.pad_lr, cfg.pad_lr)))
    img = pp.gan_unnormalize(img)
    img = resize2d(img, (cfg.target_h, cfg.target_w), mode="bicubic")

    th = cfg.patch_size

    def one_patch(carry, ij):
        i, j = ij
        patch = jax.lax.dynamic_slice(
            img, (0, 0, i, j), (img.shape[0], 3, th, th))
        if not cfg.is_full_res:
            patch = resize2d(patch, (224, 224), mode="bicubic")
        loss = _patch_infonce(clip_params, patch, target_feats, neg_feats,
                              clip_cfg=clip_cfg)
        return carry + loss, None

    total, _ = jax.lax.scan(one_patch, jnp.float32(0.0), (iis, jjs))
    return total


def patchnce_loss(clip_params: Params, rgb_pred: jnp.ndarray,
                  target_feats: jnp.ndarray, neg_feats: jnp.ndarray,
                  key: jax.Array, cfg: PatchNCECfg,
                  clip_cfg: clip_model.CLIPCfg = clip_model.VIT_B_32
                  ) -> jnp.ndarray:
    """Local PatchNCE with random crops (reference patchnce_loss.py:175-220)."""
    i_lo, i_hi, j_lo, j_hi = cfg.crop_bounds()
    ki, kj = jax.random.split(key)
    iis = jax.random.randint(ki, (cfg.n_patches,), i_lo, i_hi)
    jjs = jax.random.randint(kj, (cfg.n_patches,), j_lo, j_hi)
    return patchnce_loss_at(clip_params, rgb_pred, target_feats, neg_feats,
                            iis, jjs, cfg, clip_cfg=clip_cfg)


def infonce_loss(clip_params: Params, rgb_pred: jnp.ndarray,
                 target_feats: jnp.ndarray, neg_feats: jnp.ndarray,
                 temperature: float = 0.07) -> jnp.ndarray:
    """Whole-image text-negative InfoNCE (reference criteria/
    infonce_loss.py:90-162; not wired into the reference trainer — kept for
    capability parity with the NeRF_pl variant)."""
    enc = _img_features(clip_params, pp.preprocess_shorter_crop224(
        pp.gan_unnormalize(rgb_pred)))
    cos_near = jnp.sum(enc * target_feats, axis=-1)
    pos = jnp.exp(cos_near / temperature)
    cos_far = jnp.einsum("bd,ntd->nt", enc, neg_feats)
    negs = jnp.exp(cos_far / temperature).sum(axis=0)
    return jnp.mean(-jnp.log(pos / (pos + negs)))


# --------------------------------------------------------------------------
# weights regularizers (reference criteria/weights*.py — NeRF_pl-variant
# optional losses, not imported by the reference trainer; kept for parity)
# --------------------------------------------------------------------------

def weights_loss(weights: jnp.ndarray, deltas: jnp.ndarray, key: jax.Array,
                 start: int = 0, end: int = 192) -> jnp.ndarray:
    """Random-pair weight-product x distance (reference weights_loss.py:32-66)."""
    k1, k2 = jax.random.split(key)
    x1 = jax.random.randint(k1, (), start, end - 1)
    x2 = jax.random.randint(k2, (), x1 + 1, end)
    idx = jnp.arange(weights.shape[-1])
    seg = jnp.where((idx >= x1) & (idx < x2), deltas, 0.0)
    distance = seg.sum(axis=-1)
    w1 = jnp.take_along_axis(weights, x1[None].repeat(weights.shape[0])[:, None],
                             axis=-1)[:, 0]
    w2 = jnp.take_along_axis(weights, x2[None].repeat(weights.shape[0])[:, None],
                             axis=-1)[:, 0]
    return jnp.mean(w1 * w2 * distance)


def weights_sum_loss(weights: jnp.ndarray, avg: jnp.ndarray, key: jax.Array,
                     steps: int = 20, start: int = 50, mask_split: int = 185,
                     end: int = 192) -> jnp.ndarray:
    """MSE-to-average split loss (reference weights_sum_loss.py:32-55)."""
    keys = jax.random.split(key, 2 * steps)
    total = jnp.float32(0.0)
    for s in range(steps):
        x1 = jax.random.randint(keys[2 * s], (), start, mask_split)
        x2 = jax.random.randint(keys[2 * s + 1], (), mask_split, end)
        w1 = jnp.take_along_axis(weights, jnp.broadcast_to(
            x1, (weights.shape[0], 1)), axis=-1)[:, 0]
        w2 = jnp.take_along_axis(weights, jnp.broadcast_to(
            x2, (weights.shape[0], 1)), axis=-1)[:, 0]
        total = total + ((w1 - avg) ** 2).mean() - ((w2 - w1) ** 2).mean()
    return total


def weights_reg_loss(weights: jnp.ndarray, H: int, W: int, key: jax.Array,
                     window: int = 20) -> jnp.ndarray:
    """Neighbor-ray weight MSE in a random window (reference
    weightsreg_loss.py:20-41), vectorized over the window."""
    weights = weights.reshape(H, W, -1)
    kx, ky = jax.random.split(key)
    x = jax.random.randint(kx, (), 0, H - window)
    y = jax.random.randint(ky, (), 0, W - window)
    win = jax.lax.dynamic_slice(weights, (x, y, 0),
                                (window, window, weights.shape[-1]))
    dx = ((win[:-1, :-1] - win[1:, :-1]) ** 2).mean(axis=-1)
    dy = ((win[:-1, :-1] - win[:-1, 1:]) ** 2).mean(axis=-1)
    return (dx + dy).sum()
