"""COLMAP reconstruction -> LLFF poses_bounds.npy
(reference data/img2poses.py + pose_utils.gen_poses).

Assumes COLMAP has already produced sparse/0 (the reference optionally
shells out to the colmap binary; run `colmap automatic_reconstructor`
yourself if needed)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.data.colmap import gen_poses_bounds

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--match_type", type=str,
                        default="exhaustive_matcher")
    parser.add_argument("scenedir", type=str)
    args = parser.parse_args()
    if args.match_type not in ("exhaustive_matcher", "sequential_matcher"):
        print(f"ERROR: matcher type {args.match_type} is not valid. Aborting")
        sys.exit(1)
    if not os.path.exists(os.path.join(args.scenedir, "sparse/0")):
        print("ERROR: no COLMAP sparse/0 found — run colmap first "
              "(the zero-egress build does not ship the colmap binary).")
        sys.exit(1)
    gen_poses_bounds(args.scenedir)
    print("Done")
