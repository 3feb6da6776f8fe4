"""VGG16 feature extractor in JAX (for the perceptual loss).

The reference uses torchvision's pretrained VGG16 `features` stack split
into blocks [:4], [4:9], [9:16], [16:23] (reference criteria/perp_loss.py:
12-18); only block index 2's L1 difference contributes to the loss
(perp_loss.py:50-56). This module reproduces `features[:23]` (through
conv4_3+ReLU) with a torchvision state_dict converter and a random-init
fallback for offline testing.

TPU notes: convs run via lax.conv_general_dilated with NCHW logical layout
(XLA re-layouts for the MXU); inputs are 224x224 so everything is static.
"""
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

# torchvision VGG16 `features` conv channel plan up to index 22 (conv4_3,
# the last layer any reference block uses); 'M' = maxpool.
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512]
# sequential indices of those convs in torchvision vgg16.features
_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_vgg16_params(key: jax.Array) -> Params:
    convs: List[Dict[str, jnp.ndarray]] = []
    cin = 3
    keys = jax.random.split(key, len([c for c in _VGG16_PLAN if c != "M"]))
    ki = 0
    for c in _VGG16_PLAN:
        if c == "M":
            continue
        fan_in = cin * 9
        std = float(np.sqrt(2.0 / fan_in))
        convs.append({
            "w": std * jax.random.normal(keys[ki], (c, cin, 3, 3)),
            "b": jnp.zeros((c,)),
        })
        cin = c
        ki += 1
    return {"convs": convs}


def params_from_torchvision_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """Convert torchvision vgg16().state_dict() ('features.N.weight')."""
    convs = []
    for i in _CONV_IDX:
        if f"features.{i}.weight" not in sd:
            break
        convs.append({
            # cast-to-f32 guards against fp16 on-disk artifacts
            "w": jnp.asarray(np.asarray(sd[f"features.{i}.weight"]),
                             jnp.float32),
            "b": jnp.asarray(np.asarray(sd[f"features.{i}.bias"]),
                             jnp.float32),
        })
    return {"convs": convs}


def _conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vgg16_block_features(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [B, 3, H, W] (ImageNet-normalized) -> features after sequential
    positions 4, 9, 16, 23 (the reference's 4 block outputs)."""
    feats = []
    ci = 0
    seq_pos = 0
    block_ends = {4, 9, 16, 23}
    for c in _VGG16_PLAN:
        if c == "M":
            x = _maxpool(x)
            seq_pos += 1
        else:
            x = jax.nn.relu(_conv(params["convs"][ci], x))
            ci += 1
            seq_pos += 2
        if seq_pos in block_ends:
            feats.append(x)
    return feats


def load_vgg16_params(path_or_none: Optional[str],
                      key: Optional[jax.Array] = None) -> Params:
    """Load converted VGG16 weights (.npz of torchvision state_dict or
    torch .pt), or random-init with a warning."""
    if path_or_none is None:
        import warnings
        warnings.warn("VGG16 weights unavailable — using RANDOM weights. "
                      "Perceptual-loss quality requires pretrained weights "
                      "(convert with tools/convert_vgg.py).")
        return init_vgg16_params(key if key is not None
                                 else jax.random.PRNGKey(0))
    if path_or_none.endswith(".npz"):
        return params_from_torchvision_state_dict(dict(np.load(path_or_none)))
    import torch
    blob = torch.load(path_or_none, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    sd = {k: v.detach().cpu().numpy() for k, v in blob.items()}
    return params_from_torchvision_state_dict(sd)
