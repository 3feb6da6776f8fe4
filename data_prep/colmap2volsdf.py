"""COLMAP sparse model -> cameras_before_normalization.npz
(reference data/colmap2volsdf.py)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.data.colmap import colmap_to_world_mats, normalize_cameras

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str,
                        default="./data/fangzhou_mouth/")
    parser.add_argument("--normalize", action="store_true",
                        help="also write cameras.npz with scale_mat entries "
                             "normalizing the rig into a unit sphere")
    parser.add_argument("--target_radius", type=float, default=1.0)
    args = parser.parse_args()

    world_mats = colmap_to_world_mats(args.root_dir)
    np.savez(os.path.join(args.root_dir,
                          "cameras_before_normalization.npz"), **world_mats)
    if args.normalize:
        full = normalize_cameras(world_mats, args.target_radius)
        np.savez(os.path.join(args.root_dir, "cameras.npz"), **full)
    print("Done")
