"""Golden parity data for the stylization LOSS MATH (VERDICT r1 #5).

Runs the REFERENCE loss classes (criteria/clip_loss.py, perp_loss.py,
contrastive_loss.py, patchnce_loss.py) on a SEEDED TINY CLIP + VGG whose
weights are shared with the JAX rebuild, and records value-level goldens.
Zero egress blocks real CLIP/VGG weights, but the loss math itself
(directions, margins, crop geometry, InfoNCE) is exactly testable this way.

Run manually: python tests/gen_golden_criteria.py
Produces tests/golden/criteria_losses.npz consumed by test_criteria.py.

The torch CLIP/VGG twins below implement the public OpenAI-CLIP and
torchvision-VGG16 architectures (the stand-ins for `clip.load` /
`torchvision.models.vgg16` which aren't installed here); weights come from
the JAX `init_clip_params`/`init_vgg16_params` via the existing exporters,
so both frameworks consume bit-identical parameters.
"""
import math
import pathlib
import sys
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).parent / "golden"
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# --------------------------------------------------------------------------
# torch CLIP twin (OpenAI ViT architecture, fp32)
# --------------------------------------------------------------------------

class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.heads = heads
        self.ln_1 = nn.LayerNorm(width)
        self.ln_2 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads)
        self.mlp = nn.Sequential()
        self.mlp.c_fc = nn.Linear(width, 4 * width)
        self.mlp.gelu = QuickGELU()
        self.mlp.c_proj = nn.Linear(4 * width, width)

    def forward(self, x, attn_mask=None):  # x: [T, B, D]
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + h
        x = x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(self.ln_2(x))))
        return x


class TorchTinyCLIP(nn.Module):
    """encode_image/encode_text with OpenAI CLIP's exact forward."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        vw, tw = cfg.vision_width, cfg.text_width
        self.visual = nn.Module()
        self.visual.conv1 = nn.Conv2d(3, vw, cfg.vision_patch_size,
                                      stride=cfg.vision_patch_size,
                                      bias=False)
        self.visual.class_embedding = nn.Parameter(torch.zeros(vw))
        self.visual.positional_embedding = nn.Parameter(
            torch.zeros(cfg.grid ** 2 + 1, vw))
        self.visual.ln_pre = nn.LayerNorm(vw)
        self.visual.ln_post = nn.LayerNorm(vw)
        self.visual.proj = nn.Parameter(torch.zeros(vw, cfg.embed_dim))
        self.visual.transformer = nn.Module()
        self.visual.transformer.resblocks = nn.ModuleList(
            [ResBlock(vw, cfg.vision_heads) for _ in range(cfg.vision_layers)])
        self.token_embedding = nn.Embedding(cfg.vocab_size, tw)
        self.positional_embedding = nn.Parameter(
            torch.zeros(cfg.context_length, tw))
        self.ln_final = nn.LayerNorm(tw)
        self.text_projection = nn.Parameter(torch.zeros(tw, cfg.embed_dim))
        self.logit_scale = nn.Parameter(torch.tensor(math.log(1 / 0.07)))
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [ResBlock(tw, cfg.text_heads) for _ in range(cfg.text_layers)])

    def encode_image(self, images):
        v = self.visual
        x = v.conv1(images)                        # [B, W, g, g]
        x = x.flatten(2).permute(0, 2, 1)          # [B, g*g, W]
        cls = v.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + v.positional_embedding
        x = v.ln_pre(x).permute(1, 0, 2)           # [T, B, W]
        for blk in v.transformer.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        x = v.ln_post(x[:, 0, :])
        return x @ v.proj

    def encode_text(self, tokens):
        T = self.cfg.context_length
        x = self.token_embedding(tokens) + self.positional_embedding
        mask = torch.full((T, T), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)
        for blk in self.transformer.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = tokens.argmax(dim=-1)
        x = x[torch.arange(x.shape[0]), eot]
        return x @ self.text_projection


def build_torch_clip(cfg, openai_sd):
    model = TorchTinyCLIP(cfg)
    sd = {}
    for k, v in openai_sd.items():
        t = torch.from_numpy(np.asarray(v, np.float32))
        # nn.MultiheadAttention stores in_proj under different names
        k = (k.replace(".attn.in_proj_weight", ".attn.in_proj_weight")
              .replace(".mlp.c_fc.", ".mlp.c_fc.")
              .replace("transformer.resblocks", "transformer.resblocks"))
        sd[k] = t
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    return model.eval()


# --------------------------------------------------------------------------
# torch VGG16 twin: shared seeded builder (tests/vgg_twin.py) so the
# 59 MB of conv weights never land in the golden npz
# --------------------------------------------------------------------------

from vgg_twin import seeded_vgg16  # noqa: E402


# --------------------------------------------------------------------------
# torchvision / clip stubs for the reference imports
# --------------------------------------------------------------------------

def _resize(img, size, mode):
    if isinstance(size, int):
        h, w = img.shape[-2:]
        if h < w:
            nh, nw = size, int(size * w / h)   # torchvision floors
        else:
            nh, nw = int(size * h / w), size
    else:
        nh, nw = size
    if (nh, nw) == tuple(img.shape[-2:]):
        return img
    return F.interpolate(img, size=(nh, nw), mode=mode, align_corners=False)


class _Resize:
    def __init__(self, size, interpolation="bicubic", **kw):
        self.size = size
        self.mode = getattr(interpolation, "value", str(interpolation))
        if "cubic" in self.mode:
            self.mode = "bicubic"
        elif "linear" in self.mode:
            self.mode = "bilinear"

    def __call__(self, img):
        return _resize(img, self.size, self.mode)


class _CenterCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        h, w = img.shape[-2:]
        top = (h - self.size) // 2
        left = (w - self.size) // 2
        return img[..., top:top + self.size, left:left + self.size]


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(1, 3, 1, 1)
        self.std = torch.tensor(std).view(1, 3, 1, 1)

    def __call__(self, img):
        return (img - self.mean) / self.std


class _Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


def install_stubs(clip_model, vgg_model, tokenize_fn):
    from nerfart_tpu.models.clip.model import CLIP_MEAN, CLIP_STD

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Compose = _Compose
    tr.Resize = _Resize
    tr.CenterCrop = _CenterCrop
    tr.Normalize = _Normalize

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
    tr.InterpolationMode = InterpolationMode
    def _to_tensor(x):
        # real torchvision semantics for the PIL path (clip_loss.py:178-183
        # feeds PIL images); tensors pass through unchanged
        if isinstance(x, torch.Tensor):
            return x
        arr = np.asarray(x, np.float32) / 255.0
        return torch.from_numpy(arr).permute(2, 0, 1)
    tr.ToTensor = lambda: _to_tensor
    trf = types.ModuleType("torchvision.transforms.functional")

    def crop(img, i, j, h, w):
        return img[..., i:i + h, j:j + w]
    trf.crop = crop
    tr.functional = trf
    models = types.ModuleType("torchvision.models")
    models.vgg16 = lambda pretrained=True, **kw: vgg_model
    tv.transforms = tr
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = trf
    sys.modules["torchvision.models"] = models

    # the real CLIP preprocess transform list is
    # [Resize(224, bicubic), CenterCrop(224), _to_rgb, ToTensor, Normalize];
    # reference code slices it as [:2], [4:], [-1]
    preprocess = _Compose([
        _Resize(224, "bicubic"), _CenterCrop(224),
        lambda x: x, lambda x: x, _Normalize(CLIP_MEAN, CLIP_STD)])

    clip_mod = types.ModuleType("clip")
    clip_mod.load = lambda name, device=None, **kw: (clip_model, preprocess)
    clip_mod.tokenize = tokenize_fn
    sys.modules["clip"] = clip_mod

    # the reference hardcodes device='cuda'; run everything on cpu instead
    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)
    torch.Tensor.to = _to

    from PIL import Image  # noqa: F401  (present in env)


def main():
    import jax

    from nerfart_tpu.models.clip import model as cm
    from nerfart_tpu.models import vgg as vgg_mod
    from nerfart_tpu.models.clip.tokenizer import SimpleTokenizer
    from test_criteria import TINY_CLIP
    from test_clip_convert import _to_openai_sd

    torch.manual_seed(0)

    # --- shared weights -------------------------------------------------
    jax_clip = cm.init_clip_params(jax.random.PRNGKey(0), TINY_CLIP)
    openai_sd = _to_openai_sd(jax_clip, TINY_CLIP)
    tclip = build_torch_clip(TINY_CLIP, openai_sd)

    tvgg, vgg_sd = seeded_vgg16()

    tok = SimpleTokenizer()  # hash fallback — deterministic, shared

    def tokenize(texts):
        if isinstance(texts, str):
            texts = [texts]
        return torch.from_numpy(np.asarray(tok.tokenize(texts)))

    # --- tower parity check (torch twin vs JAX model) --------------------
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    img = rng.rand(2, 3, 224, 224).astype(np.float32)
    f_t = tclip.encode_image(torch.from_numpy(img)).detach().numpy()
    f_j = np.asarray(cm.encode_image(jax_clip, jnp.asarray(img), TINY_CLIP))
    np.testing.assert_allclose(f_j, f_t, atol=2e-5)
    toks = tokenize(["a photo of a face", "van gogh painting"])
    t_t = tclip.encode_text(toks).detach().numpy()
    t_j = np.asarray(cm.encode_text(jax_clip, jnp.asarray(toks.numpy()),
                                    TINY_CLIP))
    np.testing.assert_allclose(t_j, t_t, atol=2e-5)
    print("tower parity torch<->jax OK")

    # --- VGG parity check ------------------------------------------------
    jvgg = vgg_mod.params_from_torchvision_state_dict(vgg_sd)
    x = rng.rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        feats_t = []
        for lo, hi in [(0, 4), (4, 9), (9, 16), (16, 23)]:
            xt = tvgg.features[lo:hi](xt)
            feats_t.append(xt.numpy())
    feats_j = vgg_mod.vgg16_block_features(jvgg, jnp.asarray(x))
    for a, b in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)
    print("vgg block parity torch<->jax OK")

    # --- run the reference losses ----------------------------------------
    install_stubs(tclip, tvgg, tokenize)
    sys.path.insert(0, str(REFERENCE))
    from criteria.clip_loss import CLIPLoss
    from criteria.contrastive_loss import ContrastiveLoss
    from criteria.patchnce_loss import PatchNCELoss
    from criteria.perp_loss import VGGPerceptualLoss

    H, W = 96, 54
    rgb_gt = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))
    rgb_pred = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))
    src_text, tgt_text = "photo", "van gogh painting"
    neg_text_1 = "cartoon"
    neg_texts_8 = ["human", "sketch", "painting of a man", "zombie",
                   "anime drawing", "disney character", "a 3d render",
                   "human face"]

    out = {}
    with torch.no_grad():
        clip_loss = CLIPLoss()
        out["dir_clip_loss"] = float(clip_loss(
            rgb_gt, src_text, rgb_pred, tgt_text))
        out["text_direction"] = clip_loss.text_direction.numpy()

        # optional CLIPLoss modes (clip_loss.py:136-291)
        for lt in ("mse", "mae"):
            out[f"dir_clip_loss_{lt}"] = float(
                CLIPLoss(direction_loss_type=lt)(
                    rgb_gt, src_text, rgb_pred, tgt_text))
        dist_loss = CLIPLoss(use_distance=True)
        out["clip_loss_with_distance"] = float(dist_loss(
            rgb_gt, src_text, rgb_pred, tgt_text))
        out["clip_distance_loss"] = float(dist_loss.clip_distance_loss(
            rgb_gt, src_text, rgb_pred, tgt_text))
        out["text_distance"] = dist_loss.text_distance.numpy()

        # image-pair feature direction: feed example images via temp PNGs
        # (the reference constructor reads them from paths with PIL)
        import tempfile
        from PIL import Image as PILImage
        src_arrs = [rng.rand(40, 32, 3).astype(np.float32)
                    for _ in range(2)]
        tar_arrs = [rng.rand(40, 32, 3).astype(np.float32)
                    for _ in range(3)]

        def save_pngs(arrs, tag, tdir):
            paths = []
            for i, a in enumerate(arrs):
                p = f"{tdir}/{tag}_{i}.png"
                PILImage.fromarray((a * 255).astype(np.uint8)).save(p)
                paths.append(p)
            return paths

        with tempfile.TemporaryDirectory() as tdir:
            src_paths = save_pngs(src_arrs, "src", tdir)
            tar_paths = save_pngs(tar_arrs, "tar", tdir)
            # PIL roundtrips through uint8; record the exact pixels the
            # reference saw so the JAX side consumes identical inputs
            out["feat_src_imgs"] = np.stack(
                [np.asarray(PILImage.open(p).convert("RGB"),
                            np.float32) / 255.0 for p in src_paths]
            ).transpose(0, 3, 1, 2)
            out["feat_tar_imgs"] = np.stack(
                [np.asarray(PILImage.open(p).convert("RGB"),
                            np.float32) / 255.0 for p in tar_paths]
            ).transpose(0, 3, 1, 2)
            feat_loss = CLIPLoss(src_img_list=src_paths,
                                 tar_img_list=tar_paths)
            out["feature_directional_loss"] = float(
                feat_loss.forward_features(rgb_gt, rgb_pred))
            out["feature_direction"] = (
                feat_loss.feature_direction.numpy())

        out["vgg_loss"] = float(VGGPerceptualLoss()(rgb_pred, rgb_gt))

        out["contrastive_loss"] = float(ContrastiveLoss()(
            rgb_gt, neg_text_1, rgb_pred, tgt_text))
        for dt in ("cosine", "infornce"):
            out[f"contrastive_loss_{dt}"] = float(
                ContrastiveLoss(distance_type=dt)(
                    rgb_gt, neg_text_1, rgb_pred, tgt_text))

        # record the crop positions the reference samples
        positions = []
        orig_randint = torch.randint

        def rec_randint(lo, hi, size=(1,), **kw):
            v = orig_randint(lo, hi, size=size, **kw)
            positions.append(int(v.item()))
            return v
        torch.randint = rec_randint
        pnce = PatchNCELoss(target_hw=[960, 540])
        out["patchnce_loss"] = float(pnce(
            neg_texts_8, rgb_pred, tgt_text, False))
        torch.randint = orig_randint
        # for H != W the reference draws i, overwrites it with the
        # margin-constrained i, then draws j -> 3 randints per patch
        # (patchnce_loss.py:198-211); keep the effective (i, j)
        out["patch_positions"] = np.asarray(positions).reshape(12, 3)[:, 1:]

    out["rgb_gt"] = rgb_gt.numpy()
    out["rgb_pred"] = rgb_pred.numpy()
    out["src_text"] = src_text
    out["tgt_text"] = tgt_text
    out["neg_text_1"] = neg_text_1
    out["neg_texts_8"] = np.asarray(neg_texts_8)
    # VGG weights are NOT stored: tests rebuild them from the shared
    # seeded builder (tests/vgg_twin.seeded_vgg16) — keeps the golden
    # file ~60 MB smaller per regeneration
    for k, v in openai_sd.items():
        out[f"clip.{k}"] = np.asarray(v)

    OUT.mkdir(exist_ok=True)
    np.savez_compressed(OUT / "criteria_losses.npz", **out)
    print("wrote", OUT / "criteria_losses.npz",
          {k: out[k] for k in ["dir_clip_loss", "vgg_loss",
                               "contrastive_loss", "patchnce_loss"]})


if __name__ == "__main__":
    main()
