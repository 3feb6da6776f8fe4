"""Convert torchvision VGG16 weights to the nerfart_tpu .npz format.

Run in an environment with torchvision (zero-egress builds can't download;
supply the resulting .npz via $VGG16_WEIGHTS)."""
import argparse

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, default=None,
                        help="path to a vgg16 state_dict .pth; default: "
                             "torchvision pretrained download")
    parser.add_argument("--out", type=str, default="vgg16_features.npz")
    args = parser.parse_args()

    import torch
    if args.src is None:
        from torchvision.models import vgg16  # type: ignore
        sd = vgg16(pretrained=True).state_dict()
    else:
        sd = torch.load(args.src, map_location="cpu")
    arrays = {k: v.detach().float().cpu().numpy() for k, v in sd.items()
              if k.startswith("features.")}
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} tensors)")
