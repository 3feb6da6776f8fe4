"""Extract the implicit surface as a PLY mesh from a checkpoint
(reference tools/extract_surface.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.utils.platform import apply_env_platform  # noqa: E402
apply_env_platform()

import jax
import jax.numpy as jnp

from nerfart_tpu.models import base as nets
from nerfart_tpu.utils import mesh_util
from nerfart_tpu.utils.checkpoints import CheckpointIO


def main_function(args):
    cfg = nets.ImplicitSurfaceCfg(
        D=args.D, W=args.W, skips=tuple(int(s) for s in args.skips.split(","))
        if args.skips else (), W_geo_feat=args.W_geo_feat,
        embed_multires=args.embed_multires, radius_init=args.init_r)
    if args.load_pt is not None:
        io = CheckpointIO(os.path.dirname(args.load_pt) or ".",
                          allow_mkdir=False)
        blob = io.load_file(args.load_pt, framework="volsdf")
        params = blob["model"]["implicit_surface"]
    else:
        params = nets.init_implicit_surface(jax.random.PRNGKey(0), cfg)

    if args.out is None:
        from datetime import datetime
        args.out = "surface_" + datetime.now().strftime("%Y%m%d%H%M%S") + ".ply"

    @jax.jit
    def sdf_query(pts):
        return nets.implicit_surface_fwd(params, pts, cfg, return_h=False)

    mesh_util.extract_mesh(sdf_query, filepath=args.out,
                           volume_size=args.volume_size, N=args.N,
                           chunk=args.chunk, show_progress=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--N", type=int, default=512,
                        help="resolution of the iso-surface grid")
    parser.add_argument("--volume_size", type=float, default=2.0)
    parser.add_argument("--load_pt", type=str, default=None,
                        help="trained checkpoint (.npz or reference .pt)")
    parser.add_argument("--chunk", type=int, default=16 * 1024)
    parser.add_argument("--init_r", type=float, default=1.0)
    # network shape (reference defaults)
    parser.add_argument("--D", type=int, default=8)
    parser.add_argument("--W", type=int, default=256)
    parser.add_argument("--skips", type=str, default="4")
    parser.add_argument("--W_geo_feat", type=int, default=256)
    parser.add_argument("--embed_multires", type=int, default=6)
    main_function(parser.parse_args())
