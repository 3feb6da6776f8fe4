"""Novel-view rendering CLI (reference render.py).

Same surface: --config/--resume_dir + --load_pt + camera paths
[spiral, interpolation, small_circle, great_circle, spherical_spiral],
--H/--W/--H_scale/--W_scale intrinsics rescale, --use_surface_render,
--alter_radiance, per-frame PNGs and rgb/depth/normal mp4+gif.

TPU redesign: the whole image renders as ONE jitted call per view
(lax.map over ray blocks inside); frames stream back to host only for
encoding.
"""
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from nerfart_tpu.utils.platform import apply_env_platform
apply_env_platform()

from nerfart_tpu.data import get_data
from nerfart_tpu.frameworks import get_model
from nerfart_tpu.parallel import mesh as pmesh
from nerfart_tpu.utils import camera_paths
from nerfart_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts
from nerfart_tpu.utils.config import cond_mkdir, create_args_parser, load_config
from nerfart_tpu.utils.print_fn import log
from nerfart_tpu.ops.rays import get_rays


def load_params(args, bundle):
    if args.load_pt is None:
        ckpt_file = sorted_ckpts(
            os.path.join(args["training"]["exp_dir"], "ckpts"))[-1]
    else:
        ckpt_file = args.load_pt
    log.info("=> Use ckpt: %s", str(ckpt_file))
    io = CheckpointIO(os.path.dirname(ckpt_file) or ".", allow_mkdir=False)
    blob = io.load_file(ckpt_file, framework=bundle.name)
    return blob["model"]


def main_function(args):
    cond_mkdir("./out")
    assert 1 < args.rot_percentile <= 100
    bundle = get_model(args)
    params = load_params(args, bundle)

    if args.alter_radiance is not None:
        # swap radiance net weights from another checkpoint (render.py:276-283)
        io = CheckpointIO(os.path.dirname(args.alter_radiance) or ".",
                          allow_mkdir=False)
        other = io.load_file(args.alter_radiance, framework=bundle.name)
        params = dict(params)
        params["radiance_net"] = other["model"]["radiance_net"]
        log.info("=> Altered radiance net from %s", args.alter_radiance)

    dataset = get_data(args, downscale=args.downscale)
    _, model_input, _ = dataset[0]
    intrinsics = np.array(model_input["intrinsics"], np.float32)
    H, W = dataset.H, dataset.W
    # fx/fy scale with H/W ratio (render.py:294-306)
    if args.H is not None:
        intrinsics[1, 2] *= args.H / dataset.H
        H = args.H
    if args.H_scale is not None:
        H = int(dataset.H * args.H_scale)
        intrinsics[1, 2] *= H / dataset.H
    if args.W is not None:
        intrinsics[0, 2] *= args.W / dataset.W
        W = args.W
    if args.W_scale is not None:
        W = int(dataset.W * args.W_scale)
        intrinsics[0, 2] *= W / dataset.W
    log.info("=> Rendering resolution @ [%d x %d]", H, W)

    c2ws = np.stack(dataset.c2w_all, axis=0)
    if args.poses_avg == "mean":
        # render_view_.py variant: average all poses instead of pose 0
        camera_paths.poses_avg = camera_paths.poses_avg_mean
    render_c2ws = camera_paths.generate_camera_path(
        args.camera_path, c2ws, args.num_views, args.camera_inds,
        args.rot_percentile, args.rot_rad)
    log.info("=> Camera path: %s", args.camera_path)
    if args.debug:
        # visualize the generated camera path before rendering
        # (reference render.py:375-380 plots it via tools/vis_camera;
        # headless here, so save the figure next to the outputs)
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.vis_camera import visualize as vis_cams
        dbg_out = os.path.join(args.outbase or "out",
                               f"camera_path_{args.camera_path}.png")
        cond_mkdir(os.path.dirname(dbg_out))
        vis_cams(intrinsics, np.linalg.inv(np.asarray(render_c2ws)),
                 out=dbg_out)
        log.info("=> Camera path plot saved: %s", dbg_out)

    use_surface = args.use_surface_render
    if use_surface:
        assert use_surface in ("sphere_tracing", "root_finding")
        from nerfart_tpu.models import ray_casting
        from nerfart_tpu.models import base as nets

        mcfg = bundle.mcfg

        def sdf_fn(pts):
            return nets.implicit_surface_fwd(
                params["implicit_surface"], pts, mcfg.surface, return_h=False)

        def model_forward(pts, view_dirs):
            if bundle.name == "volsdf":
                from nerfart_tpu.models import volsdf as fw
                return fw.forward(params, pts, view_dirs, mcfg)
            from nerfart_tpu.models import neus as fw
            return fw.forward(params, pts, view_dirs, mcfg)

        far = args["data"].get("far", 2.0 * bundle.mcfg.obj_bounding_radius)

        @jax.jit
        def render_view(c2w):
            rays_o, rays_d, _ = get_rays(c2w[None], jnp.asarray(intrinsics)[None],
                                         H, W, N_rays=-1)
            color, depth, extras = ray_casting.surface_render(
                params, rays_o[0], rays_d[0], model_forward, sdf_fn,
                calc_normal=True, ray_casting_algo=use_surface,
                near=0.0, far=float(far), rays_chunk=args.rayschunk)
            return color, depth, extras["normals_surface"]
    else:
        rcfg = bundle.make_render_cfg(
            test=True, rays_chunk=args.rayschunk, calc_normal=True,
            detailed_output=False,
            **({"require_nablas": True} if bundle.name == "volsdf" else {}))
        # multi-chip: per-view ray megabatch splits over all devices
        # (embarrassingly parallel, zero collectives; the TPU equivalent
        # of the reference's DataParallel ray dim split, volsdf.py:632)
        mesh = None if bool(args.get("no_mesh", False)) else pmesh.auto_mesh()
        if mesh is not None:
            log.info("=> Rendering on %d devices", mesh.devices.size)
            params = pmesh.replicate(params, mesh)

            def _flat(p, ro, rd):
                rgb, depth, extras = bundle.volume_render(
                    p, ro, rd, bundle.mcfg, rcfg)
                return (rgb, depth,
                        extras.get("normals_volume", jnp.zeros_like(rgb)))

            _sharded = pmesh.shard_map_render(_flat, mesh, n_rays=H * W)

            @jax.jit
            def render_view(c2w):
                rays_o, rays_d, _ = get_rays(
                    c2w[None], jnp.asarray(intrinsics)[None], H, W, N_rays=-1)
                return _sharded(params, rays_o[0], rays_d[0])
        else:
            @jax.jit
            def render_view(c2w):
                rays_o, rays_d, _ = get_rays(
                    c2w[None], jnp.asarray(intrinsics)[None], H, W, N_rays=-1)
                rgb, depth, extras = bundle.volume_render(
                    params, rays_o, rays_d, bundle.mcfg, rcfg)
                return rgb, depth, extras.get("normals_volume",
                                              jnp.zeros_like(rgb))

    def integerify(img):
        return (np.clip(img, 0, 1) * 255.0).astype(np.uint8)

    rgb_imgs, depth_imgs, normal_imgs = [], [], []
    outbase = args.outbase or "out"
    outdir = os.path.join(outbase, args.exp_name or args["expname"])
    cond_mkdir(outdir)
    cond_mkdir(os.path.join(outdir, "rgb"))

    import imageio.v2 as imageio
    import time
    for i, c2w in enumerate(render_c2ws):
        t0 = time.time()
        rgb, depth, normals = render_view(jnp.asarray(c2w, jnp.float32))
        rgb = np.asarray(rgb).reshape(H, W, 3)
        depth = np.asarray(depth).reshape(H, W, 1)
        normals = np.asarray(normals).reshape(H, W, 3)
        log.info("view %d/%d rendered in %.2fs (%.0f rays/s)", i + 1,
                 len(render_c2ws), time.time() - t0,
                 H * W / max(time.time() - t0, 1e-9))
        depth = depth / (depth.max() + 1e-10)
        rgb_img = integerify(rgb)
        if args.save_images:
            imageio.imwrite(
                os.path.join(outdir, "rgb", f"{i + 1:05d}.png"), rgb_img)
        rgb_imgs.append(rgb_img)
        depth_imgs.append(np.repeat(integerify(depth), 3, axis=-1))
        normal_imgs.append(integerify(normals / 2.0 + 0.5))

    name = args.exp_name or args["expname"]

    def write_video(path, frames, **kw):
        # mp4 needs an ffmpeg/pyav imageio backend; when absent (this
        # sandbox), write an animated gif instead of failing per-file
        try:
            imageio.mimwrite(path, frames, fps=args.fps, **kw)
        except Exception:
            gif = os.path.splitext(path)[0] + ".gif"
            try:
                imageio.mimwrite(gif, frames, fps=args.fps)
                log.info("no mp4 backend; wrote %s instead", gif)
            except Exception as e:  # last resort: PNG frames
                log.warning("video write failed for %s (%s); dumping frames",
                            path, type(e).__name__)
                base = os.path.splitext(path)[0]
                cond_mkdir(base)
                for i, f in enumerate(frames):
                    imageio.imwrite(
                        os.path.join(base, f"{i + 1:05d}.png"), f)

    if not args.disable_rgb:
        write_video(os.path.join(outbase, f"{name}_rgb.mp4"),
                    rgb_imgs, quality=10)
        write_video(os.path.join(outbase, f"{name}_rgb.gif"), rgb_imgs)
        if args.save_depth:
            write_video(os.path.join(outbase, f"{name}_depth.mp4"),
                        depth_imgs, quality=10)
        if args.save_normal:
            write_video(os.path.join(outbase, f"{name}_normal.mp4"),
                        normal_imgs, quality=10)
            both = [np.concatenate([r, n], axis=0)
                    for r, n in zip(rgb_imgs, normal_imgs)]
            write_video(os.path.join(outbase, f"{name}_rgb&normal.mp4"),
                        both, quality=10)
    log.info("=> Done. Outputs in ./out")


if __name__ == "__main__":
    pmesh.init_distributed()  # multi-host no-op on one host
    parser = create_args_parser()
    parser.add_argument("--num_views", type=int, default=200)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--downscale", type=float, default=1)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--camera_path", type=str, default="spiral",
                        help="[spiral, interpolation, small_circle, "
                             "great_circle, spherical_spiral]")
    parser.add_argument("--camera_inds", type=str, default="11,15")
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--H", type=int, default=None)
    parser.add_argument("--H_scale", type=float, default=None)
    parser.add_argument("--W", type=int, default=None)
    parser.add_argument("--W_scale", type=float, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--disable_rgb", action="store_true")
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--alter_radiance", type=str, default=None)
    parser.add_argument("--outbase", type=str, default=None)
    parser.add_argument("--use_surface_render", type=str, default=None,
                        help="[sphere_tracing, root_finding]. NOTE: uses "
                             "the raw network SDF (as the reference does, "
                             "ray_casting.py:223) — meaningful for "
                             "NeuS-style checkpoints; VolSDF 'builtin' "
                             "checkpoints only constrain the SDF inside "
                             "the scene sphere, so hits are sparse")
    parser.add_argument("--poses_avg", type=str, default="first",
                        choices=["first", "mean"],
                        help="spiral center pose: reference render.py uses "
                             "pose 0 ('first'); tools/render_view_.py uses "
                             "the mean of all poses")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--rot_rad", type=float, default=0.3)
    parser.add_argument("--rot_percentile", type=int, default=85)
    parser.add_argument("--save_depth", type=bool, default=True)
    parser.add_argument("--save_normal", type=bool, default=True)
    cli_args, unknown = parser.parse_known_args()
    config = load_config(cli_args, unknown)
    main_function(config)
