"""Ray direction quiver plot over a dataset (reference tools/vis_ray.py)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.utils.platform import apply_env_platform  # noqa: E402
apply_env_platform()

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str,
                        default="./data/fangzhou_nature")
    parser.add_argument("--n_views", type=int, default=8)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    import jax.numpy as jnp
    from nerfart_tpu.data.dtu import SceneDataset
    from nerfart_tpu.ops.rays import get_rays

    ds = SceneDataset(False, args.data_dir, downscale=8)
    import matplotlib
    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    for i in range(0, len(ds), max(1, len(ds) // args.n_views)):
        _, s, _ = ds[i]
        ro, rd, _ = get_rays(jnp.asarray(s["c2w"])[None],
                             jnp.asarray(s["intrinsics"])[None],
                             ds.H, ds.W, N_rays=16,
                             key=__import__("jax").random.PRNGKey(i))
        ro, rd = np.asarray(ro[0]), np.asarray(rd[0])
        rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
        ax.quiver(ro[:, 0], ro[:, 2], -ro[:, 1],
                  rd[:, 0], rd[:, 2], -rd[:, 1], length=1.0, color="C1",
                  linewidth=0.5)
    ax.set_xlabel("x"); ax.set_ylabel("z"); ax.set_zlabel("-y")
    if args.out:
        plt.savefig(args.out, dpi=120)
        print("saved", args.out)
    else:
        plt.show()
