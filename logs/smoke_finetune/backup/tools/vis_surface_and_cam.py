"""Extracted-mesh + camera frustum viewer (reference
tools/vis_surface_and_cam.py, which used open3d; matplotlib here)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.vis_camera import draw_camera


def read_ply(path):
    """Minimal PLY reader for the files written by utils/mesh_util."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        n_verts = int([l for l in lines if l.startswith("element vertex")]
                      [0].split()[-1])
        n_faces = int([l for l in lines if l.startswith("element face")]
                      [0].split()[-1])
        verts = np.frombuffer(f.read(n_verts * 12), "<f4").reshape(-1, 3)
        rec = np.frombuffer(f.read(n_faces * 13),
                            dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        return verts, rec["idx"]


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default=None)
    parser.add_argument("--n_pts", type=int, default=5000)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    verts, faces = read_ply(args.mesh)
    import matplotlib
    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    sel = np.random.RandomState(0).choice(
        len(verts), min(args.n_pts, len(verts)), replace=False)
    ax.scatter(verts[sel, 0], verts[sel, 2], -verts[sel, 1], s=0.5)
    if args.data_dir:
        from nerfart_tpu.data.dtu import SceneDataset
        ds = SceneDataset(False, args.data_dir, downscale=8)
        extr = np.linalg.inv(np.stack(ds.c2w_all))
        draw_camera(ax, ds.intrinsics_all[0], 0.1, 0.05, 2000, extr)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    if args.out:
        plt.savefig(args.out, dpi=120)
        print("saved", args.out)
    else:
        plt.show()
