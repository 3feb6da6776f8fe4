"""CLIP weight-converter validation without pretrained weights: build an
OpenAI-format state_dict from random params of the same topology, convert,
and check the towers produce identical outputs."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models.clip import model as cm
from tests.test_criteria import TINY_CLIP


def _to_openai_sd(params, cfg):
    """Inverse of params_from_openai_state_dict for test purposes."""
    sd = {}
    v = params["visual"]
    sd["visual.conv1.weight"] = np.asarray(v["conv1_w"])
    sd["visual.class_embedding"] = np.asarray(v["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(v["positional_embedding"])
    sd["visual.ln_pre.weight"] = np.asarray(v["ln_pre"]["w"])
    sd["visual.ln_pre.bias"] = np.asarray(v["ln_pre"]["b"])
    sd["visual.ln_post.weight"] = np.asarray(v["ln_post"]["w"])
    sd["visual.ln_post.bias"] = np.asarray(v["ln_post"]["b"])
    sd["visual.proj"] = np.asarray(v["proj"])

    def put_block(prefix, blk):
        sd[f"{prefix}.ln_1.weight"] = np.asarray(blk["ln_1"]["w"])
        sd[f"{prefix}.ln_1.bias"] = np.asarray(blk["ln_1"]["b"])
        sd[f"{prefix}.ln_2.weight"] = np.asarray(blk["ln_2"]["w"])
        sd[f"{prefix}.ln_2.bias"] = np.asarray(blk["ln_2"]["b"])
        sd[f"{prefix}.attn.in_proj_weight"] = np.asarray(
            blk["attn"]["in_proj_w"])
        sd[f"{prefix}.attn.in_proj_bias"] = np.asarray(
            blk["attn"]["in_proj_b"])
        sd[f"{prefix}.attn.out_proj.weight"] = np.asarray(
            blk["attn"]["out_proj_w"])
        sd[f"{prefix}.attn.out_proj.bias"] = np.asarray(
            blk["attn"]["out_proj_b"])
        sd[f"{prefix}.mlp.c_fc.weight"] = np.asarray(blk["mlp_fc_w"])
        sd[f"{prefix}.mlp.c_fc.bias"] = np.asarray(blk["mlp_fc_b"])
        sd[f"{prefix}.mlp.c_proj.weight"] = np.asarray(blk["mlp_proj_w"])
        sd[f"{prefix}.mlp.c_proj.bias"] = np.asarray(blk["mlp_proj_b"])

    for i, blk in enumerate(v["resblocks"]):
        put_block(f"visual.transformer.resblocks.{i}", blk)
    for i, blk in enumerate(params["resblocks"]):
        put_block(f"transformer.resblocks.{i}", blk)
    sd["token_embedding.weight"] = np.asarray(params["token_embedding"])
    sd["positional_embedding"] = np.asarray(params["positional_embedding"])
    sd["ln_final.weight"] = np.asarray(params["ln_final"]["w"])
    sd["ln_final.bias"] = np.asarray(params["ln_final"]["b"])
    sd["text_projection"] = np.asarray(params["text_projection"])
    sd["logit_scale"] = np.asarray(params["logit_scale"])
    return sd


def test_openai_state_dict_roundtrip():
    p0 = cm.init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    sd = _to_openai_sd(p0, TINY_CLIP)
    p1 = cm.params_from_openai_state_dict(sd, TINY_CLIP)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 224, 224))
    f0 = cm.encode_image(p0, imgs, TINY_CLIP)
    f1 = cm.encode_image(p1, imgs, TINY_CLIP)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
    toks = jnp.asarray([[49406, 320, 1125, 49407] + [0] * 73])
    t0 = cm.encode_text(p0, toks, TINY_CLIP)
    t1 = cm.encode_text(p1, toks, TINY_CLIP)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), atol=1e-6)


def _to_hf_sd(sd, cfg):
    """OpenAI-layout -> HF CLIPModel layout (inverse of the mapping in
    params_from_hf_state_dict), for offline converter testing."""
    hf = {
        "vision_model.embeddings.patch_embedding.weight":
            sd["visual.conv1.weight"],
        "vision_model.embeddings.class_embedding":
            sd["visual.class_embedding"],
        "vision_model.embeddings.position_embedding.weight":
            sd["visual.positional_embedding"],
        "vision_model.pre_layrnorm.weight": sd["visual.ln_pre.weight"],
        "vision_model.pre_layrnorm.bias": sd["visual.ln_pre.bias"],
        "vision_model.post_layernorm.weight": sd["visual.ln_post.weight"],
        "vision_model.post_layernorm.bias": sd["visual.ln_post.bias"],
        "visual_projection.weight": sd["visual.proj"].T,
        "text_model.embeddings.token_embedding.weight":
            sd["token_embedding.weight"],
        "text_model.embeddings.position_embedding.weight":
            sd["positional_embedding"],
        "text_model.final_layer_norm.weight": sd["ln_final.weight"],
        "text_model.final_layer_norm.bias": sd["ln_final.bias"],
        "text_projection.weight": sd["text_projection"].T,
        "logit_scale": sd["logit_scale"],
    }

    def split_layers(oa_prefix, hf_prefix, n_layers):
        for i in range(n_layers):
            o = f"{oa_prefix}.resblocks.{i}"
            h = f"{hf_prefix}.layers.{i}"
            hf[f"{h}.layer_norm1.weight"] = sd[f"{o}.ln_1.weight"]
            hf[f"{h}.layer_norm1.bias"] = sd[f"{o}.ln_1.bias"]
            hf[f"{h}.layer_norm2.weight"] = sd[f"{o}.ln_2.weight"]
            hf[f"{h}.layer_norm2.bias"] = sd[f"{o}.ln_2.bias"]
            w3 = np.split(sd[f"{o}.attn.in_proj_weight"], 3, axis=0)
            b3 = np.split(sd[f"{o}.attn.in_proj_bias"], 3, axis=0)
            for p, w, b in zip("qkv", w3, b3):
                hf[f"{h}.self_attn.{p}_proj.weight"] = w
                hf[f"{h}.self_attn.{p}_proj.bias"] = b
            hf[f"{h}.self_attn.out_proj.weight"] = \
                sd[f"{o}.attn.out_proj.weight"]
            hf[f"{h}.self_attn.out_proj.bias"] = \
                sd[f"{o}.attn.out_proj.bias"]
            hf[f"{h}.mlp.fc1.weight"] = sd[f"{o}.mlp.c_fc.weight"]
            hf[f"{h}.mlp.fc1.bias"] = sd[f"{o}.mlp.c_fc.bias"]
            hf[f"{h}.mlp.fc2.weight"] = sd[f"{o}.mlp.c_proj.weight"]
            hf[f"{h}.mlp.fc2.bias"] = sd[f"{o}.mlp.c_proj.bias"]

    split_layers("visual.transformer", "vision_model.encoder",
                 cfg.vision_layers)
    split_layers("transformer", "text_model.encoder", cfg.text_layers)
    return hf


def test_hf_state_dict_matches_openai():
    """params_from_hf_state_dict must produce the same params as the
    OpenAI converter given equivalent weights (q/k/v concat order,
    projection transposes)."""
    p0 = cm.init_clip_params(jax.random.PRNGKey(2), TINY_CLIP)
    sd = _to_openai_sd(p0, TINY_CLIP)
    hf = _to_hf_sd(sd, TINY_CLIP)
    p1 = cm.params_from_hf_state_dict(hf, TINY_CLIP)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fp16_state_dict_converts_to_f32():
    """The published OpenAI artifact ships fp16 tensors; conversion must
    yield f32 params whose outputs match the f32-converted model to fp16
    rounding (VERDICT r4 weak-6)."""
    p0 = cm.init_clip_params(jax.random.PRNGKey(3), TINY_CLIP)
    sd = _to_openai_sd(p0, TINY_CLIP)
    sd16 = {k: v.astype(np.float16) for k, v in sd.items()}
    p16 = cm.params_from_openai_state_dict(sd16, TINY_CLIP)
    for leaf in jax.tree_util.tree_leaves(p16):
        assert leaf.dtype == jnp.float32
    imgs = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 224, 224))
    f0 = np.asarray(cm.encode_image(p0, imgs, TINY_CLIP))
    f16 = np.asarray(cm.encode_image(p16, imgs, TINY_CLIP))
    np.testing.assert_allclose(
        f16 / np.linalg.norm(f16), f0 / np.linalg.norm(f0), atol=5e-3)
