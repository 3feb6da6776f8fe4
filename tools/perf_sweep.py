"""Single-chip render-throughput sweep on a (trained) checkpoint.

Measures rays/s of the full-quality VolSDF render across rays_chunk sizes,
sampler dtypes, and param dtypes —
the evidence PERF.md's chosen defaults rest on.

Usage (on TPU):
    python tools/perf_sweep.py --ckpt logs/volsdf_fangzhou_r2/ckpts/latest.npz
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfart_tpu.models import base as nets  # noqa: E402
from nerfart_tpu.models import volsdf as V  # noqa: E402
from nerfart_tpu.ops.rays import get_rays  # noqa: E402


def full_mcfg(beta_init=0.1):
    return V.VolSDFCfg(
        beta_init=beta_init, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=256, D=8, skips=(4,),
                                        W_geo_feat=256, embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=4, W=256, skips=(), W_geo_feat=256,
                                     embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=270)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunks", type=str, default="1080,2160,4320,8640")
    args = ap.parse_args()

    mcfg = full_mcfg()
    if args.ckpt:
        from nerfart_tpu.utils.checkpoints import CheckpointIO
        blob = CheckpointIO(os.path.dirname(args.ckpt) or ".",
                            allow_mkdir=False).load_file(args.ckpt,
                                                         framework="volsdf")
        params = jax.tree_util.tree_map(jnp.asarray, blob["model"])
        print("loaded ckpt step", blob.get("global_step"))
    else:
        params = V.init_volsdf(jax.random.PRNGKey(42), mcfg)

    H, W = args.H, args.W
    c2w = jnp.eye(4).at[2, 3].set(-2.5)
    intr = (jnp.eye(4).at[0, 0].set(550.0).at[1, 1].set(550.0)
            .at[0, 2].set(W / 2).at[1, 2].set(H / 2))
    rays_o, rays_d, _ = get_rays(c2w[None], intr[None], H, W, N_rays=-1)

    render = jax.jit(V.volume_render, static_argnames=("mcfg", "rcfg"))

    def timed(fn):
        out = fn()
        jax.block_until_ready(out[0])
        float(np.asarray(out[0].reshape(-1)[0]) if hasattr(out[0], "reshape")
              else out[0][0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            jax.block_until_ready(out[0])
            np.asarray(out[0]).reshape(-1)[0]
        return H * W / ((time.perf_counter() - t0) / args.iters)

    results = {}
    for chunk in [int(c) for c in args.chunks.split(",")]:
        for sdt in ["bfloat16", "float32"]:
            rcfg = V.VolSDFRenderCfg(
                near=0.0, far=6.0, obj_bounding_radius=3.0,
                N_samples=128, N_importance=64, max_upsample_steps=6,
                max_bisection_steps=10, epsilon=0.1, calc_normal=True,
                require_nablas=True, detailed_output=False,
                rays_chunk=chunk, sampler_dtype=sdt)
            key = f"chunk{chunk}_{sdt}"
            try:
                results[key] = round(timed(lambda: render(
                    params, rays_o, rays_d, mcfg=mcfg, rcfg=rcfg)), 1)
            except Exception as e:  # noqa: BLE001
                results[key] = f"ERR {type(e).__name__}"
            print(key, results[key], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
