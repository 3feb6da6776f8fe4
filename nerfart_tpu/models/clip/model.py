"""CLIP ViT-B/32 (image + text towers) in pure JAX.

Architecture matches OpenAI CLIP (the model the reference loads at
criteria/clip_loss.py:165 et al.): pre-LN transformer with QuickGELU,
32x32 conv patch embedding, class token, causal text tower with features
taken at the EOT (argmax) token, and learned projections to the shared
512-d space.

Weights convert from the OpenAI state_dict (or HF CLIPModel) via
`params_from_openai_state_dict` / `params_from_hf_state_dict`;
`init_clip_params` provides a random-weight model of the exact same
topology for offline testing.

TPU notes: attention is jnp einsum on [B, h, T, d] (MXU); all shapes are
static (T=50 vision / 77 text); parameters can be bf16-cast for inference.
"""
import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


@dataclasses.dataclass(frozen=True)
class CLIPCfg:
    # vision
    image_resolution: int = 224
    vision_patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    embed_dim: int = 512

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size


VIT_B_32 = CLIPCfg()

# OpenAI CLIP's input normalization (applied by its preprocess pipeline)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _attention(p, x, heads: int, causal_mask: Optional[jnp.ndarray]):
    """Multi-head self-attention, torch nn.MultiheadAttention layout:
    in_proj [3D, D], out_proj [D, D]."""
    B, T, D = x.shape
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = D // heads

    def split(a):
        return a.reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    if causal_mask is not None:
        attn = attn + causal_mask
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ p["out_proj_w"].T + p["out_proj_b"]


def _resblock(p, x, heads: int, causal_mask=None):
    x = x + _attention(p["attn"], layer_norm(p["ln_1"], x), heads, causal_mask)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(h @ p["mlp_fc_w"].T + p["mlp_fc_b"])
    h = h @ p["mlp_proj_w"].T + p["mlp_proj_b"]
    return x + h


def encode_image(params: Params, images: jnp.ndarray,
                 cfg: CLIPCfg = VIT_B_32) -> jnp.ndarray:
    """images [B, 3, H, W] (already CLIP-normalized) -> [B, embed_dim]."""
    v = params["visual"]
    B = images.shape[0]
    g, ps = cfg.grid, cfg.vision_patch_size
    # conv1 as patch-unfold matmul: [B, 3, g, ps, g, ps] -> [B, g*g, 3*ps*ps]
    x = images.reshape(B, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, g * g, 3 * ps * ps)
    w = v["conv1_w"].reshape(cfg.vision_width, 3 * ps * ps)
    x = x @ w.T  # [B, g*g, width] (conv has no bias in CLIP)

    cls = jnp.broadcast_to(v["class_embedding"], (B, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["positional_embedding"]
    x = layer_norm(v["ln_pre"], x)
    for blk in v["resblocks"]:
        x = _resblock(blk, x, cfg.vision_heads)
    x = layer_norm(v["ln_post"], x[:, :1, :])[:, 0]
    return x @ v["proj"]


def encode_text(params: Params, tokens: jnp.ndarray,
                cfg: CLIPCfg = VIT_B_32) -> jnp.ndarray:
    """tokens [B, 77] int32 -> [B, embed_dim]; features at the EOT token
    (argmax over token ids, as in OpenAI CLIP)."""
    x = params["token_embedding"][tokens]
    x = x + params["positional_embedding"]
    T = cfg.context_length
    mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
    for blk in params["resblocks"]:
        x = _resblock(blk, x, cfg.text_heads, causal_mask=mask)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None].repeat(x.shape[-1], -1),
                            axis=1)[:, 0]
    return x @ params["text_projection"]


# --------------------------------------------------------------------------
# parameter construction / conversion
# --------------------------------------------------------------------------

def _init_block(key, width):
    k = jax.random.split(key, 6)
    s = width ** -0.5

    def lin(kk, din, dout, std):
        return std * jax.random.normal(kk, (dout, din))

    return {
        "ln_1": {"w": jnp.ones(width), "b": jnp.zeros(width)},
        "ln_2": {"w": jnp.ones(width), "b": jnp.zeros(width)},
        "attn": {
            "in_proj_w": lin(k[0], width, 3 * width, s),
            "in_proj_b": jnp.zeros(3 * width),
            "out_proj_w": lin(k[1], width, width, s),
            "out_proj_b": jnp.zeros(width),
        },
        "mlp_fc_w": lin(k[2], width, 4 * width, s),
        "mlp_fc_b": jnp.zeros(4 * width),
        "mlp_proj_w": lin(k[3], 4 * width, width, s),
        "mlp_proj_b": jnp.zeros(width),
    }


def init_clip_params(key: jax.Array, cfg: CLIPCfg = VIT_B_32) -> Params:
    """Random-weight CLIP of the exact architecture (for tests / offline)."""
    keys = jax.random.split(key, cfg.vision_layers + cfg.text_layers + 8)
    vw, tw = cfg.vision_width, cfg.text_width
    visual = {
        "conv1_w": 0.02 * jax.random.normal(
            keys[0], (vw, 3, cfg.vision_patch_size, cfg.vision_patch_size)),
        "class_embedding": 0.02 * jax.random.normal(keys[1], (vw,)),
        "positional_embedding": 0.01 * jax.random.normal(
            keys[2], (cfg.grid ** 2 + 1, vw)),
        "ln_pre": {"w": jnp.ones(vw), "b": jnp.zeros(vw)},
        "ln_post": {"w": jnp.ones(vw), "b": jnp.zeros(vw)},
        "proj": (vw ** -0.5) * jax.random.normal(keys[3], (vw, cfg.embed_dim)),
        "resblocks": [_init_block(keys[8 + i], vw)
                      for i in range(cfg.vision_layers)],
    }
    params = {
        "visual": visual,
        "token_embedding": 0.02 * jax.random.normal(
            keys[4], (cfg.vocab_size, tw)),
        "positional_embedding": 0.01 * jax.random.normal(
            keys[5], (cfg.context_length, tw)),
        "ln_final": {"w": jnp.ones(tw), "b": jnp.zeros(tw)},
        "text_projection": (tw ** -0.5) * jax.random.normal(
            keys[6], (tw, cfg.embed_dim)),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "resblocks": [_init_block(keys[8 + cfg.vision_layers + i], tw)
                      for i in range(cfg.text_layers)],
    }
    return params


def _a(sd, key):
    """Fetch + cast to f32: the published OpenAI ViT-B-32.pt ships fp16
    tensors (the reference's `clip.load` casts on CPU via model.float());
    plain asarray would silently build a mixed-fp16 model."""
    return jnp.asarray(np.asarray(sd[key]), jnp.float32)


def _block_from_sd(sd, prefix):
    return {
        "ln_1": {"w": _a(sd, f"{prefix}.ln_1.weight"),
                 "b": _a(sd, f"{prefix}.ln_1.bias")},
        "ln_2": {"w": _a(sd, f"{prefix}.ln_2.weight"),
                 "b": _a(sd, f"{prefix}.ln_2.bias")},
        "attn": {
            "in_proj_w": _a(sd, f"{prefix}.attn.in_proj_weight"),
            "in_proj_b": _a(sd, f"{prefix}.attn.in_proj_bias"),
            "out_proj_w": _a(sd, f"{prefix}.attn.out_proj.weight"),
            "out_proj_b": _a(sd, f"{prefix}.attn.out_proj.bias"),
        },
        "mlp_fc_w": _a(sd, f"{prefix}.mlp.c_fc.weight"),
        "mlp_fc_b": _a(sd, f"{prefix}.mlp.c_fc.bias"),
        "mlp_proj_w": _a(sd, f"{prefix}.mlp.c_proj.weight"),
        "mlp_proj_b": _a(sd, f"{prefix}.mlp.c_proj.bias"),
    }


def params_from_openai_state_dict(sd: Dict[str, np.ndarray],
                                  cfg: CLIPCfg = VIT_B_32) -> Params:
    """Convert an OpenAI `clip` package state_dict {name: ndarray}.

    fp16 inputs (the published artifact's on-disk dtype) are cast to f32."""
    visual = {
        "conv1_w": _a(sd, "visual.conv1.weight"),
        "class_embedding": _a(sd, "visual.class_embedding"),
        "positional_embedding": _a(sd, "visual.positional_embedding"),
        "ln_pre": {"w": _a(sd, "visual.ln_pre.weight"),
                   "b": _a(sd, "visual.ln_pre.bias")},
        "ln_post": {"w": _a(sd, "visual.ln_post.weight"),
                    "b": _a(sd, "visual.ln_post.bias")},
        "proj": _a(sd, "visual.proj"),
        "resblocks": [
            _block_from_sd(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)],
    }
    return {
        "visual": visual,
        "token_embedding": _a(sd, "token_embedding.weight"),
        "positional_embedding": _a(sd, "positional_embedding"),
        "ln_final": {"w": _a(sd, "ln_final.weight"),
                     "b": _a(sd, "ln_final.bias")},
        "text_projection": _a(sd, "text_projection"),
        "logit_scale": _a(sd, "logit_scale"),
        "resblocks": [_block_from_sd(sd, f"transformer.resblocks.{i}")
                      for i in range(cfg.text_layers)],
    }


def params_from_hf_state_dict(sd: Dict[str, np.ndarray],
                              cfg: CLIPCfg = VIT_B_32) -> Params:
    """Convert a HuggingFace `transformers.CLIPModel` state_dict.

    Maps HF names to the OpenAI layout and reuses the OpenAI converter:
    per-layer q/k/v projections concatenate into in_proj (q,k,v order),
    and the HF projection Linears ([out,in]) transpose into the OpenAI
    [in,out] matmul matrices.
    """
    def n(key):
        return np.asarray(sd[key], np.float32)

    out: Dict[str, np.ndarray] = {
        "visual.conv1.weight": n("vision_model.embeddings.patch_embedding.weight"),
        "visual.class_embedding": n("vision_model.embeddings.class_embedding"),
        "visual.positional_embedding": n("vision_model.embeddings.position_embedding.weight"),
        # HF's attribute really is spelled 'pre_layrnorm'
        "visual.ln_pre.weight": n("vision_model.pre_layrnorm.weight"),
        "visual.ln_pre.bias": n("vision_model.pre_layrnorm.bias"),
        "visual.ln_post.weight": n("vision_model.post_layernorm.weight"),
        "visual.ln_post.bias": n("vision_model.post_layernorm.bias"),
        "visual.proj": n("visual_projection.weight").T,
        "token_embedding.weight": n("text_model.embeddings.token_embedding.weight"),
        "positional_embedding": n("text_model.embeddings.position_embedding.weight"),
        "ln_final.weight": n("text_model.final_layer_norm.weight"),
        "ln_final.bias": n("text_model.final_layer_norm.bias"),
        "text_projection": n("text_projection.weight").T,
        "logit_scale": n("logit_scale"),
    }

    def map_layers(hf_prefix, oa_prefix, n_layers):
        for i in range(n_layers):
            h = f"{hf_prefix}.layers.{i}"
            o = f"{oa_prefix}.resblocks.{i}"
            out[f"{o}.ln_1.weight"] = n(f"{h}.layer_norm1.weight")
            out[f"{o}.ln_1.bias"] = n(f"{h}.layer_norm1.bias")
            out[f"{o}.ln_2.weight"] = n(f"{h}.layer_norm2.weight")
            out[f"{o}.ln_2.bias"] = n(f"{h}.layer_norm2.bias")
            out[f"{o}.attn.in_proj_weight"] = np.concatenate(
                [n(f"{h}.self_attn.{p}_proj.weight") for p in "qkv"], axis=0)
            out[f"{o}.attn.in_proj_bias"] = np.concatenate(
                [n(f"{h}.self_attn.{p}_proj.bias") for p in "qkv"], axis=0)
            out[f"{o}.attn.out_proj.weight"] = n(f"{h}.self_attn.out_proj.weight")
            out[f"{o}.attn.out_proj.bias"] = n(f"{h}.self_attn.out_proj.bias")
            out[f"{o}.mlp.c_fc.weight"] = n(f"{h}.mlp.fc1.weight")
            out[f"{o}.mlp.c_fc.bias"] = n(f"{h}.mlp.fc1.bias")
            out[f"{o}.mlp.c_proj.weight"] = n(f"{h}.mlp.fc2.weight")
            out[f"{o}.mlp.c_proj.bias"] = n(f"{h}.mlp.fc2.bias")

    map_layers("vision_model.encoder", "visual.transformer",
               cfg.vision_layers)
    map_layers("text_model.encoder", "transformer", cfg.text_layers)
    return params_from_openai_state_dict(out, cfg)


def load_clip_params(path_or_none: Optional[str],
                     cfg: CLIPCfg = VIT_B_32,
                     key: Optional[jax.Array] = None) -> Params:
    """Load converted CLIP weights from an .npz/.pt, or random-init.

    Accepts: a .npz of the OpenAI state_dict arrays, a torch .pt of the
    same, or None (random init with a warning — offline environments)."""
    if path_or_none is None:
        import warnings
        warnings.warn("CLIP weights unavailable — using RANDOM weights. "
                      "Stylization quality requires real CLIP weights "
                      "(convert with tools/convert_clip.py).")
        return init_clip_params(key if key is not None
                                else jax.random.PRNGKey(0), cfg)
    if path_or_none.endswith(".npz"):
        sd = dict(np.load(path_or_none))
    else:
        import torch
        blob = torch.load(path_or_none, map_location="cpu",
                          weights_only=False)
        if hasattr(blob, "state_dict"):
            blob = blob.state_dict()
        sd = {k: v.detach().cpu().numpy() for k, v in blob.items()}
    if any(k.startswith("vision_model.") for k in sd):
        return params_from_hf_state_dict(sd, cfg)
    return params_from_openai_state_dict(sd, cfg)
