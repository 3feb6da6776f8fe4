"""Real-weights readiness: validate converted CLIP/VGG .npz artifacts.

The zero-egress build environment cannot download the pretrained towers
the reference loads (OpenAI CLIP ViT-B/32, reference criteria/
clip_loss.py:165; torchvision VGG16, perp_loss.py:13-18), so stylization
runs here use seeded random weights. This tool makes closing that gap a
same-day exercise once any weight channel exists:

  1. connected env:  python tools/convert_clip.py  [--out clip_vit_b32.npz]
                     python tools/convert_vgg.py   [--out vgg16.npz]
                     python tools/record_tower_golden.py --clip ViT-B/32 \
                         --out tower_golden.json      (runs the TORCH towers)
  2. this env:       python tools/validate_towers.py --clip clip_vit_b32.npz \
                         --vgg vgg16.npz [--golden tower_golden.json]

Without --golden it still performs the structural gates (fp16->f32
conversion sanity, finiteness, logit_scale, parameter count, tokenizer +
self-consistency probes). With --golden it additionally asserts that the
JAX towers reproduce the recorded torch features on fixed probes —
the end-to-end conversion-fidelity check.
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


# deterministic probes shared with tools/record_tower_golden.py
PROBE_TEXTS = [
    "a photo of a dog",
    "a painting in the style of vincent van gogh",
    "a 3d render of a zombie face",
    "a photo of a person",
]


def probe_image(size: int = 224) -> np.ndarray:
    """Deterministic RGB probe in [0,1], [1, 3, size, size] (no PIL/resize
    so both frameworks see bit-identical input)."""
    y, x = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                       indexing="ij")
    r = 0.5 + 0.5 * np.sin(7.0 * x + 3.0 * y)
    g = y
    b = 0.5 + 0.5 * np.cos(5.0 * (x - 0.3) * (y + 0.2))
    img = np.stack([r, g, b], axis=0).astype(np.float32)
    return img[None]


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def validate_clip(path, golden=None, atol=5e-3):
    import jax.numpy as jnp

    from nerfart_tpu.criteria.preprocess import clip_normalize
    from nerfart_tpu.models.clip import model as cm
    from nerfart_tpu.models.clip.tokenizer import SimpleTokenizer

    print(f"[clip] loading {path}")
    params = cm.load_clip_params(path)
    leaves = _leaves(params)

    # 1. conversion sanity: all f32 (the OpenAI artifact is fp16 on disk),
    #    finite, non-degenerate
    for leaf in leaves:
        assert leaf.dtype == jnp.float32, f"non-f32 leaf: {leaf.dtype}"
        assert bool(jnp.isfinite(leaf).all()), "non-finite tensor after load"
    n_params = sum(int(l.size) for l in leaves)
    assert n_params == 151_277_313, \
        f"ViT-B/32 must have 151,277,313 params, got {n_params:,}"

    # 2. logit_scale: trained OpenAI value is ln(100)=4.6052 (clamped max);
    #    a randomly-initialized tower would carry ln(1/0.07)=2.659
    ls = float(params["logit_scale"])
    assert 2.0 <= ls <= 4.7, f"implausible logit_scale {ls}"
    if abs(ls - 4.6052) > 0.2:
        print(f"[clip] WARNING logit_scale {ls:.4f} != ln(100); "
              "not the released OpenAI ViT-B/32?")

    # 3. behavioral probes
    tok = SimpleTokenizer()
    tokens = jnp.asarray(tok.tokenize(PROBE_TEXTS))
    tfeat = np.array(cm.encode_text(params, tokens))
    tfeat /= np.linalg.norm(tfeat, axis=-1, keepdims=True)
    text_cos = tfeat @ tfeat.T
    # identical prompt twice -> identical feature; distinct prompts differ
    t2 = np.array(cm.encode_text(params, tokens[:1]))
    t2 /= np.linalg.norm(t2, axis=-1, keepdims=True)
    # batch-1 vs batch-4 runs take different XLA fusion paths; 1e-3 on the
    # normalized feature is the determinism gate, not a precision claim
    assert np.allclose(t2[0], tfeat[0], atol=1e-3), \
        float(np.abs(t2[0] - tfeat[0]).max())
    off_diag = text_cos[~np.eye(len(PROBE_TEXTS), dtype=bool)]
    assert off_diag.max() < 0.995, "distinct prompts map to identical feats"

    img = clip_normalize(jnp.asarray(probe_image()))
    ifeat = np.array(cm.encode_image(params, img))
    ifeat /= np.linalg.norm(ifeat, axis=-1, keepdims=True)
    img_text_cos = (ifeat @ tfeat.T)[0]
    print(f"[clip] structural gates OK (params={n_params:,}, "
          f"logit_scale={ls:.4f})")
    print(f"[clip] text cosines:\n{np.round(text_cos, 4)}")
    print(f"[clip] image-text cosines: {np.round(img_text_cos, 4)}")

    if golden is not None and "clip" in golden:
        g = golden["clip"]
        np.testing.assert_allclose(ls, g["logit_scale"], atol=1e-3)
        np.testing.assert_allclose(text_cos, np.asarray(g["text_cosines"]),
                                   atol=atol)
        np.testing.assert_allclose(img_text_cos,
                                   np.asarray(g["image_text_cosines"]),
                                   atol=atol)
        print("[clip] GOLDEN parity vs recorded torch features OK")
    return True


def validate_vgg(path, golden=None, atol=5e-3):
    import jax.numpy as jnp

    from nerfart_tpu.models import vgg as vm

    print(f"[vgg] loading {path}")
    params = vm.load_vgg16_params(path)
    leaves = _leaves(params)
    for leaf in leaves:
        assert leaf.dtype == jnp.float32, f"non-f32 leaf: {leaf.dtype}"
        assert bool(jnp.isfinite(leaf).all()), "non-finite tensor after load"
    n_params = sum(int(l.size) for l in leaves)
    # the 10 conv layers of torchvision vgg16.features[0:23] (blocks 1-4)
    assert n_params == 7_635_264, \
        f"vgg16 feature convs must have 7,635,264 params, got {n_params:,}"

    # ImageNet-normalized probe (the loss path's convention,
    # criteria/losses.py vgg_perceptual_loss)
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    x = jnp.asarray((probe_image() - mean) / std)
    feats = vm.vgg16_block_features(params, x)
    stats = [[float(np.asarray(f).mean()), float(np.asarray(f).std())]
             for f in feats]
    print(f"[vgg] structural gates OK (params={n_params:,}); "
          f"block mean/std: {np.round(np.asarray(stats), 4).tolist()}")
    if golden is not None and "vgg" in golden:
        np.testing.assert_allclose(
            np.asarray(stats), np.asarray(golden["vgg"]["block_stats"]),
            rtol=1e-2, atol=atol)
        print("[vgg] GOLDEN parity vs recorded torch features OK")
    return True


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", type=str, default=None,
                    help="converted CLIP ViT-B/32 .npz (tools/convert_clip.py)")
    ap.add_argument("--vgg", type=str, default=None,
                    help="converted VGG16 .npz (tools/convert_vgg.py)")
    ap.add_argument("--golden", type=str, default=None,
                    help="tower_golden.json from tools/record_tower_golden.py")
    ap.add_argument("--atol", type=float, default=5e-3)
    args = ap.parse_args()
    if args.clip is None and args.vgg is None:
        ap.error("nothing to validate: pass --clip and/or --vgg")
    golden = None
    if args.golden:
        with open(args.golden) as f:
            golden = json.load(f)
    ok = True
    if args.clip:
        ok &= validate_clip(args.clip, golden, args.atol)
    if args.vgg:
        ok &= validate_vgg(args.vgg, golden, args.atol)
    print("ALL TOWER GATES PASSED" if ok else "FAILED")
    sys.exit(0 if ok else 1)
