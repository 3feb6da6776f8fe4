"""Held-out-view PSNR evaluation for a trained checkpoint.

Renders dataset views with the full volume renderer and reports per-view
and mean PSNR against the ground-truth images — the quantitative parity
protocol for BASELINE.md's PSNR >= 35 target (the reference has no eval
script; its de-facto metric is the val-image render in train.py:175-208).

Usage:
    python tools/eval_psnr.py --config configs/volsdf_fangzhou_nature.yaml \
        --load_pt logs/<exp>/ckpts/latest.npz --downscale 4 --views 0,25,50,75
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfart_tpu.utils.platform import apply_env_platform  # noqa: E402
apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfart_tpu.data import get_data  # noqa: E402
from nerfart_tpu.frameworks import get_model  # noqa: E402
from nerfart_tpu.ops.rays import get_rays  # noqa: E402
from nerfart_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts  # noqa: E402
from nerfart_tpu.utils.config import create_args_parser, load_config  # noqa: E402
from nerfart_tpu.utils.print_fn import log  # noqa: E402


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred - gt) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main(args):
    bundle = get_model(args)
    if args.load_pt is None:
        ckpt = sorted_ckpts(
            os.path.join(args["training"]["exp_dir"], "ckpts"))[-1]
    else:
        ckpt = args.load_pt
    log.info("=> Eval ckpt: %s", ckpt)
    io = CheckpointIO(os.path.dirname(ckpt) or ".", allow_mkdir=False)
    blob = io.load_file(ckpt, framework=bundle.name)
    params = jax.tree_util.tree_map(jnp.asarray, blob["model"])
    step = blob.get("global_step", "?")

    dataset = get_data(args, downscale=args.downscale)
    H, W = dataset.H, dataset.W
    views = [int(v) for v in str(args.views).split(",") if v != ""]

    dump_iu = bool(getattr(args, "dump_iter_usage", False)) \
        and bundle.name == "volsdf"
    rcfg = bundle.make_render_cfg(
        test=True, rays_chunk=args.rayschunk, calc_normal=False,
        detailed_output=dump_iu,
        **({"require_nablas": False} if bundle.name == "volsdf" else {}))

    @jax.jit
    def render_view(c2w, intrinsics):
        rays_o, rays_d, _ = get_rays(c2w[None], intrinsics[None], H, W,
                                     N_rays=-1)
        rgb, _, extras = bundle.volume_render(params, rays_o, rays_d,
                                              bundle.mcfg, rcfg)
        if dump_iu:
            return rgb, extras["iter_usage"]
        return rgb, None

    iter_usages = []

    def record_iter_usage(iu):
        """Empirical executed-iteration basis for the converged-scenario
        MFU (bench.py BENCH_REF_EXEC_ITERS; VERDICT r4 weak-7): upsample
        iterations run per rays_chunk block (whole-block lax.cond), so a
        block executes max(iter_usage) iterations (-1 = never converged =
        all max_upsample_steps) and every ray in it pays them."""
        iu = np.asarray(iu).reshape(-1)
        max_steps = getattr(rcfg, "max_upsample_steps", 0)
        iu = np.where(iu < 0, max_steps, iu)
        n = args.rayschunk
        blocks = [iu[i:i + n] for i in range(0, iu.size, n)]
        per_block = np.asarray([b.max() for b in blocks])
        iter_usages.append({
            "per_ray_mean": float(iu.mean()),
            "per_block_max_mean": float(per_block.mean()),
        })

    from nerfart_tpu.ops.metrics import object_masked_metrics
    from nerfart_tpu.ops.metrics import ssim as ssim_fn
    scores = []
    ssims = []
    obj_scores = []
    obj_ssims = []
    outdir = None
    if args.dump_dir:
        outdir = args.dump_dir
        os.makedirs(outdir, exist_ok=True)
    for v in views:
        _, model_input, gt = dataset[v]
        t0 = time.time()
        rgb, iu = render_view(
            jnp.asarray(model_input["c2w"], jnp.float32),
            jnp.asarray(model_input["intrinsics"], jnp.float32))
        if iu is not None:
            record_iter_usage(iu)
        rgb = np.asarray(rgb).reshape(H, W, 3)
        gt_img = np.asarray(gt["rgb"]).reshape(H, W, 3)
        s = psnr(np.clip(rgb, 0, 1), gt_img)
        sim = float(ssim_fn(np.clip(rgb, 0, 1), gt_img))
        scores.append(s)
        ssims.append(sim)
        obj_note = ""
        if "object_mask" in model_input:
            # protocol-aligned metrics for mask-supervised training
            # (see ops/metrics.object_masked_metrics)
            m = np.asarray(model_input["object_mask"]).reshape(H, W)
            s_obj, sim_obj = object_masked_metrics(
                np.clip(rgb, 0, 1), gt_img, m)
            obj_scores.append(s_obj)
            obj_ssims.append(sim_obj)
            obj_note = f" | object-masked PSNR {s_obj:.2f} dB SSIM {sim_obj:.3f}"
        log.info("view %d: PSNR %.2f dB SSIM %.3f%s (%.1fs, %.0f rays/s)",
                 v, s, sim, obj_note, time.time() - t0,
                 H * W / max(time.time() - t0, 1e-9))
        if outdir is not None:
            import imageio.v2 as imageio
            imageio.imwrite(os.path.join(outdir, f"eval_{v:03d}_pred.png"),
                            (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(outdir, f"eval_{v:03d}_gt.png"),
                            (gt_img * 255).astype(np.uint8))
    log.info("ckpt step %s | %d views @ %dx%d | mean PSNR %.2f dB "
             "mean SSIM %.3f", str(step), len(views), H, W,
             float(np.mean(scores)), float(np.mean(ssims)))
    out = {"step": step, "views": views, "H": H, "W": W,
           "psnr": [round(s, 2) for s in scores],
           "mean_psnr": round(float(np.mean(scores)), 2),
           "ssim": [round(s, 3) for s in ssims],
           "mean_ssim": round(float(np.mean(ssims)), 3)}
    if obj_scores:
        out["psnr_object_masked"] = [round(s, 2) for s in obj_scores]
        out["mean_psnr_object_masked"] = round(
            float(np.mean(obj_scores)), 2)
        out["ssim_object_composite"] = [round(s, 3) for s in obj_ssims]
        out["mean_ssim_object_composite"] = round(
            float(np.mean(obj_ssims)), 3)
    if iter_usages:
        out["iter_usage_per_ray_mean"] = round(float(np.mean(
            [u["per_ray_mean"] for u in iter_usages])), 3)
        out["iter_usage_per_block_max_mean"] = round(float(np.mean(
            [u["per_block_max_mean"] for u in iter_usages])), 3)
    print(out)


if __name__ == "__main__":
    parser = create_args_parser()
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--downscale", type=float, default=4)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument("--views", type=str, default="0,25,50,75")
    parser.add_argument("--dump_dir", type=str, default=None)
    parser.add_argument("--dump_iter_usage", action="store_true",
                        help="report VolSDF upsample-iteration usage "
                             "(empirical basis for bench.py's "
                             "BENCH_REF_EXEC_ITERS)")
    cli_args, unknown = parser.parse_known_args()
    config = load_config(cli_args, unknown)
    main(config)
