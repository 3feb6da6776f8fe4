"""Stylization-stack tests: resize parity vs torch, CLIP/VGG towers,
losses and the combined style loss on tiny random models."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.criteria import losses as L
from nerfart_tpu.criteria import neg_text
from nerfart_tpu.criteria.style import StyleCfg, style_loss
from nerfart_tpu.models import vgg as vgg_mod
from nerfart_tpu.models.clip import (SimpleTokenizer, VIT_B_32,
                                     encode_image, encode_text,
                                     init_clip_params)
from nerfart_tpu.models.clip.model import CLIPCfg
from nerfart_tpu.ops.resize import resize2d

TINY_CLIP = CLIPCfg(image_resolution=224, vision_patch_size=32,
                    vision_width=64, vision_layers=2, vision_heads=2,
                    context_length=77, vocab_size=49408, text_width=32,
                    text_heads=2, text_layers=2, embed_dim=16)


@pytest.fixture(scope="module")
def tiny_clip():
    return init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)


def test_resize_bilinear_matches_torch(golden):
    g = golden("resize")
    out = resize2d(jnp.asarray(g["src"]), (224, 224), mode="bilinear")
    np.testing.assert_allclose(out, g["bilinear_224"], atol=1e-5)


def test_resize_bicubic_matches_torch(golden):
    g = golden("resize")
    out = resize2d(jnp.asarray(g["src"]), (224, 224), mode="bicubic")
    np.testing.assert_allclose(out, g["bicubic_224"], atol=1e-4)
    up = resize2d(jnp.asarray(g["src2"]), (224, 224), mode="bicubic")
    np.testing.assert_allclose(up, g["bicubic_up"], atol=1e-4)


def test_clip_towers_shapes(tiny_clip):
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 224, 224))
    feats = encode_image(tiny_clip, imgs, TINY_CLIP)
    assert feats.shape == (2, 16)
    tok = SimpleTokenizer()  # hash fallback (no BPE file in this env)
    tokens = jnp.asarray(tok.tokenize(["a photo of a face", "zombie"]))
    tfeats = encode_text(tiny_clip, tokens, TINY_CLIP)
    assert tfeats.shape == (2, 16)
    assert bool(jnp.isfinite(feats).all() and jnp.isfinite(tfeats).all())


def test_tokenizer_framing():
    tok = SimpleTokenizer()
    t = tok.tokenize("hello world")
    assert t.shape == (1, 77)
    assert t[0, 0] == SimpleTokenizer.SOT
    assert SimpleTokenizer.EOT in t[0]
    # deterministic
    np.testing.assert_array_equal(t, tok.tokenize("hello world"))


def test_neg_text_bank():
    texts = neg_text.create_fine_neg_texts("a zombie face")
    all_texts = neg_text.parse_neg_text()
    assert len(texts) > 0
    # zombie category removed
    assert not any(t in texts for t in all_texts["zombie"])
    texts2 = neg_text.create_fine_neg_texts("van gogh painting")
    assert not any(t in texts2 for t in all_texts["portrait"])


def test_vgg_blocks():
    params = vgg_mod.init_vgg16_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 224, 224))
    feats = vgg_mod.vgg16_block_features(params, x)
    assert len(feats) == 4
    assert feats[0].shape == (1, 64, 224, 224)
    assert feats[1].shape == (1, 128, 112, 112)
    assert feats[2].shape == (1, 256, 56, 56)
    assert feats[3].shape == (1, 512, 28, 28)


def test_style_loss_end_to_end(tiny_clip):
    """Full combined style loss is finite and differentiable w.r.t. the
    rendered image (the gradient that drives pass 2 of the finetune)."""
    vgg_params = vgg_mod.init_vgg16_params(jax.random.PRNGKey(2))
    H, W = 60, 40
    rgb_pred = jax.random.uniform(jax.random.PRNGKey(3), (1, H * W, 3))
    rgb_gt = jax.random.uniform(jax.random.PRNGKey(4), (1, H * W, 3))

    T, D = 5, 16
    bank = L.TextBank(
        text_direction=jnp.ones((1, D)) / np.sqrt(D),
        target_feats=jax.random.normal(jax.random.PRNGKey(5), (T, D)),
        neg_feats=jax.random.normal(jax.random.PRNGKey(6), (4, T, D)))

    import nerfart_tpu.criteria.losses as Lmod
    # patch geometry scaled down for the tiny image
    # crop bounds need target_h >= 311 for the 112-patch margin rules
    scfg = StyleCfg(patch=Lmod.PatchNCECfg(target_h=340, target_w=240,
                                           pad_lr=20, pad_tb=30,
                                           n_patches=2, is_full_res=False))
    # monkeypatch: tiny clip via closure — style_loss calls the global CLIP
    # encode; here we only check the jax graph plumbing with the tiny cfg
    import nerfart_tpu.models.clip.model as cm
    orig = cm.encode_image

    def tiny_encode(params, images, cfg=VIT_B_32):
        return orig(params, images, TINY_CLIP)

    cm.encode_image = tiny_encode
    try:
        def f(pred):
            total, parts = style_loss(tiny_clip, vgg_params, bank, pred,
                                      rgb_gt, H, jax.random.PRNGKey(7), scfg)
            return total, parts

        (total, parts), grad = jax.value_and_grad(f, has_aux=True)(rgb_pred)
        assert np.isfinite(float(total))
        assert set(parts) == {"clip", "perceptual", "contrastive", "patchnce"}
        assert bool(jnp.isfinite(grad).all())
        assert float(jnp.abs(grad).max()) > 0
    finally:
        cm.encode_image = orig


def test_patchnce_patch_size_fullres_flag():
    cfg = L.PatchNCECfg(target_h=960, target_w=540, is_full_res=True)
    assert cfg.patch_size == 224
    i_lo, i_hi, j_lo, j_hi = cfg.crop_bounds()
    assert (i_lo, i_hi) == (200, 960 - 224 + 1 - 200)
    cfg2 = L.PatchNCECfg(target_h=960, target_w=540, is_full_res=False)
    assert cfg2.patch_size == 112
    assert cfg2.crop_bounds()[0] == 100


def test_neg_text_bank_matches_reference():
    """The shipped bank is the reference's criteria/neg_text.txt verbatim
    (137 lines, 7 categories); category names and per-category counts are
    pinned so the negative-sampling distribution matches the reference."""
    cats = neg_text.parse_neg_text()
    assert {k: len(v) for k, v in cats.items()} == {
        "base": 15, "disney": 25, "cartoon": 13, "sketch": 21,
        "zombie": 20, "anime": 19, "portrait": 18}
    with open(neg_text.DEFAULT_PATH) as f:
        lines = f.read().splitlines()
    assert len(lines) == 138  # wc -l says 137: no trailing newline
    assert sum(1 for l in lines if l.startswith("#")) == 7


# ---------------------------------------------------------------------------
# Value-level golden parity with the REFERENCE loss implementations
# (tests/gen_golden_criteria.py runs the reference's CLIPLoss /
# VGGPerceptualLoss / ContrastiveLoss / PatchNCELoss on a seeded tiny CLIP
# + VGG whose weights are shared bit-exactly with this rebuild)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def crit_golden():
    import pathlib
    path = pathlib.Path(__file__).parent / "golden" / "criteria_losses.npz"
    if not path.exists():
        pytest.skip("criteria_losses.npz not generated")
    return dict(np.load(path, allow_pickle=True))


@pytest.fixture(scope="module")
def crit_setup(crit_golden):
    from nerfart_tpu.models.clip import model as cm
    from nerfart_tpu.models import vgg as vgg_mod

    g = crit_golden
    clip_sd = {k[len("clip."):]: v for k, v in g.items()
               if k.startswith("clip.")}
    if any(k.startswith("vgg.") for k in g):
        # legacy golden file with the weights embedded
        vgg_sd = {k[len("vgg."):]: v for k, v in g.items()
                  if k.startswith("vgg.")}
    else:
        # rebuilt from the shared seeded torch twin (tests/vgg_twin.py)
        from tests.vgg_twin import seeded_vgg16
        _, vgg_sd = seeded_vgg16()
    clip_params = cm.params_from_openai_state_dict(clip_sd, TINY_CLIP)
    vgg_params = vgg_mod.params_from_torchvision_state_dict(vgg_sd)
    tok = SimpleTokenizer()
    return g, clip_params, vgg_params, tok


def _templates_feats(clip_params, tok, text):
    return L.encode_templates(clip_params, tok, str(text),
                              clip_cfg=TINY_CLIP)


def test_golden_directional_clip_loss(crit_setup):
    g, clip_params, _, tok = crit_setup
    src = _templates_feats(clip_params, tok, g["src_text"])
    tgt = _templates_feats(clip_params, tok, g["tgt_text"])
    direction = L.compute_text_direction(src, tgt)
    np.testing.assert_allclose(np.asarray(direction), g["text_direction"],
                               atol=2e-5)
    loss = L.directional_clip_loss(
        clip_params, jnp.asarray(g["rgb_gt"]), jnp.asarray(g["rgb_pred"]),
        direction, clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(float(loss), float(g["dir_clip_loss"]),
                               atol=2e-4)


def test_golden_vgg_perceptual_loss(crit_setup):
    g, _, vgg_params, _ = crit_setup
    loss = L.vgg_perceptual_loss(vgg_params, jnp.asarray(g["rgb_pred"]),
                                 jnp.asarray(g["rgb_gt"]))
    np.testing.assert_allclose(float(loss), float(g["vgg_loss"]), rtol=1e-4)


def test_golden_contrastive_loss(crit_setup):
    g, clip_params, _, tok = crit_setup
    tgt = _templates_feats(clip_params, tok, g["tgt_text"])
    neg = _templates_feats(clip_params, tok, g["neg_text_1"])
    loss = L.global_contrastive_loss(
        clip_params, jnp.asarray(g["rgb_gt"]), jnp.asarray(g["rgb_pred"]),
        tgt, neg, clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(float(loss), float(g["contrastive_loss"]),
                               rtol=1e-4)


def test_golden_patchnce_loss(crit_setup):
    g, clip_params, _, tok = crit_setup
    tgt = _templates_feats(clip_params, tok, g["tgt_text"])
    negs = jnp.stack([_templates_feats(clip_params, tok, t)
                      for t in g["neg_texts_8"]])
    pos = np.asarray(g["patch_positions"])
    cfg = L.PatchNCECfg(target_h=960, target_w=540, is_full_res=False)
    loss = L.patchnce_loss_at(
        clip_params, jnp.asarray(g["rgb_pred"]), tgt, negs,
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]), cfg,
        clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(float(loss), float(g["patchnce_loss"]),
                               rtol=2e-4)


def test_golden_direction_loss_types(crit_setup):
    """mse/mae DirectionLoss variants (reference clip_loss.py:136-153)."""
    g, clip_params, _, tok = crit_setup
    src = _templates_feats(clip_params, tok, g["src_text"])
    tgt = _templates_feats(clip_params, tok, g["tgt_text"])
    direction = L.compute_text_direction(src, tgt)
    for lt in ("mse", "mae"):
        if f"dir_clip_loss_{lt}" not in g:
            pytest.skip("regenerate criteria_losses.npz for loss modes")
        loss = L.directional_clip_loss(
            clip_params, jnp.asarray(g["rgb_gt"]),
            jnp.asarray(g["rgb_pred"]), direction, clip_cfg=TINY_CLIP,
            loss_type=lt)
        np.testing.assert_allclose(float(loss),
                                   float(g[f"dir_clip_loss_{lt}"]),
                                   atol=2e-4)


def test_golden_clip_distance_loss(crit_setup):
    """use_distance mode (reference clip_loss.py:256-268, 296-303)."""
    g, clip_params, _, tok = crit_setup
    if "clip_distance_loss" not in g:
        pytest.skip("regenerate criteria_losses.npz for loss modes")
    src_u = L.encode_templates(clip_params, tok, str(g["src_text"]),
                               clip_cfg=TINY_CLIP, norm=False)
    tgt_u = L.encode_templates(clip_params, tok, str(g["tgt_text"]),
                               clip_cfg=TINY_CLIP, norm=False)
    tdist = L.compute_text_distance(src_u, tgt_u)
    np.testing.assert_allclose(np.asarray(tdist), g["text_distance"],
                               atol=2e-4)
    loss = L.clip_distance_loss(
        clip_params, jnp.asarray(g["rgb_gt"]), jnp.asarray(g["rgb_pred"]),
        tdist, clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(float(loss), float(g["clip_distance_loss"]),
                               rtol=2e-4, atol=1e-6)
    # forward() with use_distance=True = directional + 1.0 * distance
    src = src_u / jnp.linalg.norm(src_u, axis=-1, keepdims=True)
    tgt = tgt_u / jnp.linalg.norm(tgt_u, axis=-1, keepdims=True)
    direction = L.compute_text_direction(src, tgt)
    combined = L.directional_clip_loss(
        clip_params, jnp.asarray(g["rgb_gt"]), jnp.asarray(g["rgb_pred"]),
        direction, clip_cfg=TINY_CLIP) + loss
    np.testing.assert_allclose(float(combined),
                               float(g["clip_loss_with_distance"]),
                               atol=3e-4)


def test_golden_feature_directional_loss(crit_setup):
    """Image-pair feature direction (reference clip_loss.py:176-198,
    272-291), including the reference's asymmetric src scaling."""
    g, clip_params, _, tok = crit_setup
    if "feature_directional_loss" not in g:
        pytest.skip("regenerate criteria_losses.npz for loss modes")
    fdir = L.compute_feature_direction(
        clip_params, jnp.asarray(g["feat_src_imgs"]),
        jnp.asarray(g["feat_tar_imgs"]), clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(np.asarray(fdir), g["feature_direction"],
                               atol=2e-5)
    loss = L.directional_clip_loss(
        clip_params, jnp.asarray(g["rgb_gt"]), jnp.asarray(g["rgb_pred"]),
        fdir, clip_cfg=TINY_CLIP)
    np.testing.assert_allclose(float(loss),
                               float(g["feature_directional_loss"]),
                               atol=2e-4)


def test_golden_contrastive_distance_types(crit_setup):
    """cosine / infonce contrastive variants
    (reference contrastive_loss.py:154-181)."""
    g, clip_params, _, tok = crit_setup
    tgt = _templates_feats(clip_params, tok, g["tgt_text"])
    neg = _templates_feats(clip_params, tok, g["neg_text_1"])
    for dt, key in (("cosine", "contrastive_loss_cosine"),
                    ("infonce", "contrastive_loss_infornce")):
        if key not in g:
            pytest.skip("regenerate criteria_losses.npz for loss modes")
        loss = L.global_contrastive_loss(
            clip_params, jnp.asarray(g["rgb_gt"]),
            jnp.asarray(g["rgb_pred"]), tgt, neg, clip_cfg=TINY_CLIP,
            distance_type=dt)
        np.testing.assert_allclose(float(loss), float(g[key]), rtol=2e-4,
                                   atol=1e-6)
