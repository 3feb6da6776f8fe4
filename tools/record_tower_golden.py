"""Record golden tower features with the reference's TORCH models.

Run in a CONNECTED environment (needs the `clip` package + torchvision
pretrained weights — the models the reference loads at criteria/
clip_loss.py:165 and perp_loss.py:13-18). Writes tower_golden.json with
feature statistics on the same deterministic probes that
tools/validate_towers.py replays through the JAX towers — the end-to-end
conversion-fidelity check for this repo's converted .npz weights.

    python tools/record_tower_golden.py --out tower_golden.json
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.validate_towers import PROBE_TEXTS, probe_image  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="tower_golden.json")
    ap.add_argument("--skip-vgg", action="store_true")
    args = ap.parse_args()

    import clip  # type: ignore
    import torch

    golden = {}

    model, _ = clip.load("ViT-B/32", device="cpu")
    model = model.float().eval()
    with torch.no_grad():
        tokens = clip.tokenize(PROBE_TEXTS)
        tfeat = model.encode_text(tokens).float()
        tfeat = tfeat / tfeat.norm(dim=-1, keepdim=True)
        text_cos = (tfeat @ tfeat.T).numpy()

        img = torch.from_numpy(probe_image())
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]) \
            .view(1, 3, 1, 1)
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711]) \
            .view(1, 3, 1, 1)
        ifeat = model.encode_image((img - mean) / std).float()
        ifeat = ifeat / ifeat.norm(dim=-1, keepdim=True)
        img_text = (ifeat @ tfeat.T)[0].numpy()

    golden["clip"] = {
        "logit_scale": float(model.logit_scale.detach()),
        "text_cosines": text_cos.tolist(),
        "image_text_cosines": img_text.tolist(),
    }

    if not args.skip_vgg:
        from torchvision import models as tvm
        vgg = tvm.vgg16(pretrained=True).features.eval()
        # the four blocks the loss stack uses (reference perp_loss.py:13-18)
        slices = [(0, 4), (4, 9), (9, 16), (16, 23)]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (torch.from_numpy(probe_image()) - mean) / std
        stats = []
        with torch.no_grad():
            for a, b in slices:
                for i in range(a, b):
                    x = vgg[i](x)
                stats.append([float(x.mean()), float(x.std())])
        golden["vgg"] = {"block_stats": stats}

    with open(args.out, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {args.out}")
