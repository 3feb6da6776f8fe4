"""Capture a jax.profiler trace of a VolSDF render scenario.

--scenario converged (default) = the reference's 6-iteration error-bounded
budget; dense = the TPU-native headline path (512-pt init + opacity-CDF
importance, no refinement, bf16-resident render, chunk 4320) — the program
the bench headline measures (VERDICT r4 weak-2 asked for its profile).

Writes a trace under out/profile_render/ for TensorBoard's trace viewer;
prints the steady-state rays/s it measured around the capture.

Usage (on TPU, with the chip otherwise idle):
    python tools/profile_render.py --ckpt pretrained/volsdf_fangzhou_r2.npz
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfart_tpu.models import base as nets  # noqa: E402
from nerfart_tpu.models import volsdf as V  # noqa: E402
from nerfart_tpu.ops.rays import get_rays  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--H", type=int, default=480)
    ap.add_argument("--W", type=int, default=270)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--outdir", type=str, default="out/profile_render")
    ap.add_argument("--scenario", type=str, default="converged",
                    choices=["converged", "dense", "stress"])
    ap.add_argument("--render_dtype", type=str, default=None)
    ap.add_argument("--dense_direct", action="store_true",
                    help="uniform-only dense mode (implies dense scenario "
                         "semantics; pair with --N_samples)")
    ap.add_argument("--N_samples", type=int, default=128)
    ap.add_argument("--no_trace", action="store_true",
                    help="timing A/B only; skip the jax.profiler capture")
    args = ap.parse_args()
    # scenario defaults mirror bench.py
    if args.chunk is None:
        args.chunk = 4320 if args.scenario == "dense" else 1080
    if args.render_dtype is None:
        args.render_dtype = ("bfloat16" if args.scenario == "dense"
                             else "float32")

    mcfg = V.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=256, D=8, skips=(4,),
                                        W_geo_feat=256, embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=4, W=256, skips=(), W_geo_feat=256,
                                     embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))
    if args.ckpt and os.path.exists(args.ckpt):
        from nerfart_tpu.utils.checkpoints import CheckpointIO
        blob = CheckpointIO(os.path.dirname(args.ckpt) or ".",
                            allow_mkdir=False).load_file(args.ckpt,
                                                         framework="volsdf")
        params = jax.tree_util.tree_map(jnp.asarray, blob["model"])
    else:
        params = V.init_volsdf(jax.random.PRNGKey(42), mcfg)

    H, W = args.H, args.W
    c2w = jnp.eye(4).at[2, 3].set(-2.5)
    intr = (jnp.eye(4).at[0, 0].set(550.0).at[1, 1].set(550.0)
            .at[0, 2].set(W / 2).at[1, 2].set(H / 2))
    rays_o, rays_d, _ = get_rays(c2w[None], intr[None], H, W, N_rays=-1)

    rcfg = V.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=args.N_samples,
        N_importance=0 if args.dense_direct else 64,
        max_upsample_steps=0 if (args.scenario == "dense"
                                 or args.dense_direct) else 6,
        max_bisection_steps=10,
        epsilon=1e-4 if args.scenario == "stress" else 0.1,
        calc_normal=True, require_nablas=True,
        detailed_output=False, rays_chunk=args.chunk,
        sampler_dtype="bfloat16", render_dtype=args.render_dtype,
        dense_direct=args.dense_direct)
    render = jax.jit(V.volume_render, static_argnames=("mcfg", "rcfg"))

    def once():
        rgb, _, _ = render(params, rays_o, rays_d, mcfg=mcfg, rcfg=rcfg)
        jax.block_until_ready(rgb)
        return float(np.asarray(rgb.reshape(-1)[0]))

    t0 = time.perf_counter()
    print("compiling...", flush=True)
    once()  # compile
    print(f"compile+first render: {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    once()
    print(f"pre-capture: {H * W / (time.perf_counter() - t0):.0f} rays/s")

    if args.no_trace:
        t0 = time.perf_counter()
        for _ in range(3):
            once()
        print(f"steady: {3 * H * W / (time.perf_counter() - t0):.0f} rays/s")
        return
    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        once()
    t0 = time.perf_counter()
    once()
    print(f"post-capture: {H * W / (time.perf_counter() - t0):.0f} rays/s")
    print("trace in", args.outdir)


if __name__ == "__main__":
    main()
