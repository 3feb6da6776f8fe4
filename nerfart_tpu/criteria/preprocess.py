"""Image preprocessing pipelines feeding CLIP / VGG.

The reference builds three subtly different torchvision pipelines; each is
preserved exactly (they shift the style optimum):

- CLIPLoss (clip_loss.py:166-168): square bicubic resize to 224 + CLIP
  normalize. Input assumed [0, 1].
- Contrastive/InfoNCE (contrastive_loss.py:98-101): 'GAN un-normalize'
  x <- (x+1)/2 first (a quirk — renders are already [0,1], so values land
  in [0.5, 1]), then shorter-side bicubic resize + center-crop 224 + CLIP
  normalize.
- PatchNCE (patchnce_loss.py:98-102): GAN un-normalize, square resize 224,
  CLIP normalize (the patches themselves are cropped beforehand).
"""
import jax.numpy as jnp

from nerfart_tpu.models.clip.model import CLIP_MEAN, CLIP_STD
from nerfart_tpu.ops.resize import resize2d


def clip_normalize(img: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    return (img - mean) / std


def gan_unnormalize(img: jnp.ndarray) -> jnp.ndarray:
    """Normalize(mean=-1, std=2): x <- (x + 1) / 2."""
    return (img + 1.0) / 2.0


def preprocess_square224(img: jnp.ndarray) -> jnp.ndarray:
    """[B,3,H,W] -> [B,3,224,224]: bicubic square resize + CLIP normalize."""
    return clip_normalize(resize2d(img, (224, 224), mode="bicubic"))


def preprocess_shorter_crop224(img: jnp.ndarray) -> jnp.ndarray:
    """torchvision Resize(224) (shorter side) + CenterCrop(224) + normalize."""
    H, W = img.shape[-2], img.shape[-1]
    # torchvision Resize truncates (int(size * long / short)), not rounds
    if H < W:
        new_h, new_w = 224, max(224, int(224 * W / H))
    else:
        new_h, new_w = max(224, int(224 * H / W)), 224
    img = resize2d(img, (new_h, new_w), mode="bicubic")
    top = (new_h - 224) // 2
    left = (new_w - 224) // 2
    img = img[..., top:top + 224, left:left + 224]
    return clip_normalize(img)
