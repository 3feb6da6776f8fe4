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
