"""Convert OpenAI CLIP ViT-B/32 weights to the nerfart_tpu .npz format.

Run in an environment with the `clip` package (or a downloaded
ViT-B-32.pt): the zero-egress build environment cannot download weights,
so stylization runs there use random weights unless an .npz is supplied
via --out / $CLIP_WEIGHTS.
"""
import argparse

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, default=None,
                        help="path to ViT-B-32.pt (torch.jit archive or "
                             "state_dict); default: load via the clip pkg")
    parser.add_argument("--out", type=str, default="clip_vit_b32.npz")
    args = parser.parse_args()

    import torch
    if args.src is None:
        import clip  # type: ignore
        model, _ = clip.load("ViT-B/32", device="cpu")
        sd = model.state_dict()
    else:
        blob = torch.jit.load(args.src, map_location="cpu") \
            if args.src.endswith(".pt") else torch.load(args.src)
        sd = blob.state_dict() if hasattr(blob, "state_dict") else blob
    arrays = {k: v.detach().float().cpu().numpy() for k, v in sd.items()
              if hasattr(v, "detach")}
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} tensors)")
