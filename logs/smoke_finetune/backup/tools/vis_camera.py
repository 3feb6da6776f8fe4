"""Camera extrinsics frustum visualization (reference tools/vis_camera.py).

matplotlib-based; draws pyramid frustums for each camera plus axes.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def frustum_points(K, w, h, scale):
    """5 corner points of a camera frustum in camera coords."""
    fx, fy = K[0, 0], K[1, 1]
    z = scale
    x = w / fx * z
    y = h / fy * z
    return np.array([
        [0, 0, 0], [-x, -y, z], [x, -y, z], [x, y, z], [-x, y, z]])


def draw_camera(ax, K, cam_width, cam_height, scale_focal, extrinsics,
                annotate=False):
    """Draw all camera frustums; returns (min, max) plot bounds
    (matches the reference vis_camera.draw_camera interface)."""
    mins = np.full(3, np.inf)
    maxs = np.full(3, -np.inf)
    pts_c = frustum_points(K, cam_width * scale_focal,
                           cam_height * scale_focal, 0.4)
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    for i, extr in enumerate(extrinsics):
        c2w = np.linalg.inv(extr) if extr.shape == (4, 4) else extr
        R, t = c2w[:3, :3], c2w[:3, 3]
        pts_w = pts_c @ R.T + t
        for a, b in edges:
            ax.plot([pts_w[a, 0], pts_w[b, 0]],
                    [pts_w[a, 2], pts_w[b, 2]],
                    [-pts_w[a, 1], -pts_w[b, 1]], color="C0", linewidth=0.8)
        if annotate:
            ax.text(pts_w[0, 0], pts_w[0, 2], -pts_w[0, 1], str(i),
                    fontsize=6)
        mins = np.minimum(mins, pts_w.min(0))
        maxs = np.maximum(maxs, pts_w.max(0))
    return mins, maxs


def visualize(camera_matrix, extrinsics, out=None):
    import matplotlib
    if out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.set_aspect("auto")
    draw_camera(ax, camera_matrix, 0.1, 0.05, 2000, extrinsics, True)
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_zlabel("-y")
    if out:
        plt.savefig(out, dpi=120)
        print("saved", out)
    else:
        plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=False)
    parser.add_argument("--data_dir", type=str,
                        default="./data/fangzhou_nature")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from nerfart_tpu.data.dtu import SceneDataset
    ds = SceneDataset(False, args.data_dir, downscale=4)
    c2ws = np.stack(ds.c2w_all)
    extr = np.linalg.inv(c2ws)
    visualize(ds.intrinsics_all[0], extr, args.out)
