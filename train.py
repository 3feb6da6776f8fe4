"""Training / fine-tuning CLI (reference train.py).

Same surface: `python train.py --config configs/X.yaml [--k v --sec:key v]`,
`--resume_dir`, periodic latest/numbered checkpoints, validation image +
mesh rendering, tensorboard scalars, SIGINT save.

TPU redesign: the train step is one jitted program (sampling + render +
losses + grads + optimizer); validation renders are a second jitted
program. Multi-chip data parallelism comes from sharding the ray batch
over a jax Mesh (see nerfart_tpu/parallel) instead of DDP.
"""
import dataclasses
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfart_tpu.utils.platform import apply_env_platform
apply_env_platform()

from nerfart_tpu import training
from nerfart_tpu.data import get_data
from nerfart_tpu.parallel import mesh as pmesh
from nerfart_tpu.frameworks import get_model
from nerfart_tpu.models import base as nets
from nerfart_tpu.utils import mesh_util
from nerfart_tpu.utils.checkpoints import CheckpointIO
from nerfart_tpu.utils.config import (cond_mkdir, create_args_parser,
                                      load_config, save_config)
from nerfart_tpu.utils.logger import Logger
from nerfart_tpu.utils.print_fn import log
from nerfart_tpu.ops.rays import get_rays, lin2img


def backup_codes(backup_dir):
    """Copy the framework's .py sources into the exp dir
    (reference io_util.py:72-110)."""
    import shutil
    src_root = os.path.dirname(os.path.abspath(__file__))
    for subdir in ["", "nerfart_tpu", "nerfart_tpu/ops", "nerfart_tpu/models",
                   "nerfart_tpu/models/clip", "nerfart_tpu/criteria",
                   "nerfart_tpu/data", "nerfart_tpu/utils",
                   "nerfart_tpu/parallel", "tools"]:
        sdir = os.path.join(src_root, subdir)
        if not os.path.isdir(sdir):
            continue
        ddir = os.path.join(backup_dir, subdir)
        cond_mkdir(ddir)
        for f in os.listdir(sdir):
            if f.endswith(".py"):
                shutil.copyfile(os.path.join(sdir, f), os.path.join(ddir, f))


def stage_batch(model_input, ground_truth):
    batch = {
        "c2w": jnp.asarray(model_input["c2w"])[None],
        "intrinsics": jnp.asarray(model_input["intrinsics"])[None],
        "rgb": jnp.asarray(ground_truth["rgb"])[None],
    }
    if "object_mask" in model_input:
        batch["object_mask"] = jnp.asarray(model_input["object_mask"])[None]
    if "mask_ignore" in model_input:
        batch["mask_ignore"] = jnp.asarray(model_input["mask_ignore"])[None]
    return batch


def main_function(args):
    is_finetune = bool(args["training"]["is_finetune"])
    section = args["finetune"] if is_finetune else args["training"]
    NUM_ITERS = int(section["num_iters"])
    I_VAL = int(section.get("i_val", 500))
    I_VAL_MESH = int(section.get("i_val_mesh", 10000))
    I_BACKUP = int(section.get("i_backup", 50000))
    I_SAVE = int(section.get("i_save", 900))
    # Internal wall-clock deadline (seconds; 0 = off). Checked after each
    # step's host readback, so the exit is clean: no in-flight device work
    # (killing a client mid-device-work wedges the tunneled PJRT server for
    # ~35 min — bench.py _run_child). Saves latest.npz like SIGINT does.
    MAX_WALL_SEC = float(section.get("max_wall_sec", 0))

    exp_dir = args["training"]["exp_dir"]
    mesh_dir = os.path.join(exp_dir, "meshes")
    logger = Logger(log_dir=exp_dir, img_dir=os.path.join(exp_dir, "imgs"),
                    monitoring=args["training"].get("monitoring",
                                                    "tensorboard"),
                    monitoring_dir=os.path.join(exp_dir, "events"))
    log.info("=> Experiments dir: %s", exp_dir)
    backup_codes(os.path.join(exp_dir, "backup"))
    save_config(args, os.path.join(exp_dir, "config.yaml"))

    dataset, val_dataset = get_data(
        args, return_val=True, val_downscale=args["data"].get(
            "val_downscale", 2.0))
    bundle = get_model(args)
    log.info("=> Framework: %s", bundle.name)

    H, W = dataset.H, dataset.W
    val_H, val_W = val_dataset.H, val_dataset.W

    # device mesh: multi-chip DP over rays is on by default when >1 local
    # device is visible (TPU equivalent of the reference's --ddp,
    # train.py:338 + dist_util.py; here SPMD needs no process launcher)
    mesh = None
    if not bool(args.get("no_mesh", False)):
        mesh = pmesh.auto_mesh(n_rays=int(args["data"]["N_rays"]))
    if mesh is not None:
        log.info("=> Device mesh: %d devices, DP over rays",
                 mesh.devices.size)

    # seed everything (the reference seeds to 42, dist_util.py:39)
    root_key = jax.random.PRNGKey(int(args.get("seed", 42)))
    k_init, k_train = jax.random.split(root_key)
    params = bundle.init_params(k_init)
    log.info("=> Nerf params: %s", str(training.count_parameters(params)))

    optimizer, schedule = training.make_optimizer(args, NUM_ITERS)
    opt_state = optimizer.init(params)

    # checkpoints
    # finetune always drops optimizer/step (reference train.py:118-119);
    # recon runs may request the same via training.ckpt_ignore_keys (e.g.
    # the low-lr schedule-extension configs).
    ignore_keys = ["optimizer", "global_step", "epoch_idx"] if is_finetune \
        else list(args["training"].get("ckpt_ignore_keys", None) or [])
    checkpoint_io = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    ckpt_file = args["finetune"]["pretrain_weight"] if is_finetune \
        else args["training"].get("ckpt_file", None)
    load_dict = checkpoint_io.load_file(
        ckpt_file, ignore_keys=ignore_keys,
        only_use_keys=args["training"].get("ckpt_only_use_keys", None),
        framework=bundle.name)
    if "model" in load_dict:
        params = jax.tree_util.tree_map(jnp.asarray, load_dict["model"])
    if "optimizer" in load_dict:
        opt_state = jax.tree_util.tree_map(
            jnp.asarray, load_dict["optimizer"])
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(optimizer.init(params)),
            jax.tree_util.tree_leaves(opt_state))
    logger.load_stats("stats.p")
    it = int(load_dict.get("global_step", 0))
    epoch_idx = int(load_dict.get("epoch_idx", 0))

    # SIREN sphere pretraining (train.py:146-151)
    if "lr_pretrain" in args["training"] and bundle.mcfg.surface.use_siren:
        params["implicit_surface"], _ = nets.pretrain_siren_sdf(
            params["implicit_surface"], bundle.mcfg.surface,
            jax.random.PRNGKey(0), lr=float(args["training"]["lr_pretrain"]))
        checkpoint_io.register_modules(model=lambda: params)
        checkpoint_io.save("latest.npz", global_step=it, epoch_idx=epoch_idx)

    if mesh is not None:
        # params replicated on every chip; the ray batch shards (the
        # reference's DDP layout: model replicated, data split)
        params = pmesh.replicate(params, mesh)
        opt_state = pmesh.replicate(opt_state, mesh)

    # ------------------------------------------------------------------
    # build the jitted step
    # ------------------------------------------------------------------
    if is_finetune:
        from nerfart_tpu import finetune as ft
        from nerfart_tpu.criteria import (StyleCfg, TextBank,
                                          create_fine_neg_texts)
        from nerfart_tpu.criteria.losses import PatchNCECfg
        from nerfart_tpu.models import clip as clip_mod
        from nerfart_tpu.models import vgg as vgg_mod

        fcfg_sec = args["finetune"]
        clip_params = clip_mod.load_clip_params(
            args.get("clip_weights", os.environ.get("CLIP_WEIGHTS")))
        vgg_params = vgg_mod.load_vgg16_params(
            args.get("vgg_weights", os.environ.get("VGG16_WEIGHTS")))
        tokenizer = clip_mod.SimpleTokenizer(clip_mod.default_bpe_path())
        neg_texts = create_fine_neg_texts(fcfg_sec["target_text"])
        limit = int(fcfg_sec.get("neg_texts_limit", 0) or 0)
        if limit > 0:  # smoke/CI runs: cap the text bank
            neg_texts = neg_texts[:limit]
        log.info("=> Building text bank (%d negatives)...", len(neg_texts))
        bank = TextBank.build(clip_params, tokenizer,
                              fcfg_sec["src_text"], fcfg_sec["target_text"],
                              neg_texts)
        scfg = StyleCfg(
            w_clip=float(fcfg_sec["w_clip"]),
            w_perceptual=float(fcfg_sec["w_perceptual"]),
            w_contrastive=float(fcfg_sec["w_contrastive"]),
            w_patchnce=float(fcfg_sec["w_patchnce"]),
            # optional reference CLIPLoss/ContrastiveLoss modes
            # (clip_loss.py:157,299-302; contrastive_loss.py:93)
            direction_loss_type=str(
                fcfg_sec.get("direction_loss_type", "cosine")),
            use_distance=bool(fcfg_sec.get("use_distance", False)),
            contrastive_distance_type=str(
                fcfg_sec.get("contrastive_distance_type", "euclidean")),
            patch=PatchNCECfg(
                target_h=dataset.H * int(args["data"]["downscale"]),
                target_w=dataset.W * int(args["data"]["downscale"]),
                is_full_res=int(args["data"]["downscale"]) == 1))
        # image-pair feature direction (reference clip_loss.py:176-198 +
        # forward_features): example src/tar image lists replace the text
        # direction driving the w_clip term
        src_imgs = fcfg_sec.get("src_img_list") or None
        tar_imgs = fcfg_sec.get("tar_img_list") or None
        if src_imgs and tar_imgs:
            from nerfart_tpu.criteria.losses import compute_feature_direction
            from nerfart_tpu.data.image_io import load_rgb

            def _stack(paths):
                return jnp.stack([jnp.asarray(load_rgb(p)) for p in paths])

            log.info("=> Image-pair feature direction from %d src / %d tar "
                     "images", len(src_imgs), len(tar_imgs))
            bank = dataclasses.replace(
                bank, text_direction=compute_feature_direction(
                    clip_params, _stack(src_imgs), _stack(tar_imgs)))
        fcfg = ft.FinetuneCfg(
            H=H, W=W, framework=bundle.name,
            w_eikonal=float(fcfg_sec.get("w_eikonal", 0.1)),
            use_eikonal=bool(fcfg_sec.get("use_eikonal", True)),
            # memory knobs (the reference hardcodes 2000/1200 'for
            # 3090Ti', volsdf.py:720,754); the full-size ds2 finetune
            # exhausts a single v5e's HBM at the defaults — see QUALITY.md
            render_chunk=int(fcfg_sec.get("render_chunk", 4096)),
            grad_chunk=int(fcfg_sec.get("grad_chunk", 2048)),
            split_programs=bool(fcfg_sec.get("split_programs", False)),
            fix_module="radiance_net" if bundle.name == "neus" else None)
        rcfg = bundle.make_render_cfg(test=False)
        step_fn = ft.make_finetune_step(
            clip_params, vgg_params, bank, bundle.mcfg, rcfg, scfg, fcfg,
            optimizer, mesh=mesh)
    else:
        if bundle.name == "unisurf":
            from nerfart_tpu.models.unisurf import UnisurfTrainCfg
            tr = args["training"]
            tcfg = UnisurfTrainCfg(
                H=H, W=W, N_rays=int(args["data"]["N_rays"]),
                w_reg=float(tr.get("w_reg", 0.0)),
                perturb_surface_pts=float(
                    tr.get("perturb_surface_pts", 0.01)),
                delta_max=float(tr.get("delta_max", 1.0)),
                delta_min=float(tr.get("delta_min", 0.05)),
                delta_beta=float(tr.get("delta_beta", 1e-5)))
        else:
            tcfg = training.TrainCfg(
                H=H, W=W, N_rays=int(args["data"]["N_rays"]),
                w_eikonal=float(args["training"].get("w_eikonal", 0.1)),
                with_mask=bool(args["training"].get("with_mask", False)),
                w_mask=float(args["training"].get("w_mask", 0.0)),
                obj_bounding_radius=float(
                    args["model"]["obj_bounding_radius"]))
        train_overrides = {}
        # scan-over-remat: chunk the ray batch inside the jitted step and
        # rematerialize each block in the backward pass, so training HBM
        # scales with the block size instead of N_rays (the TPU-native
        # answer to the reference's memory-tuned chunk sizes).
        if args["training"].get("rays_chunk"):
            train_overrides["rays_chunk"] = int(
                args["training"]["rays_chunk"])
        if args["training"].get("remat"):
            train_overrides["remat"] = True
        rcfg = bundle.make_render_cfg(
            test=False, detailed_output=True, **train_overrides,
            **({"require_nablas": True, "calc_normal": False}
               if bundle.name == "volsdf" else {}))
        step_fn = training.make_train_step(
            bundle.name, bundle.mcfg, rcfg, tcfg, optimizer, mesh=mesh)

    # validation render (full image at val downscale)
    val_rcfg = bundle.make_render_cfg(
        test=True, rays_chunk=int(args["data"].get("val_rayschunk", 1024)),
        calc_normal=True, detailed_output=True,
        **({"require_nablas": True} if bundle.name == "volsdf" else {}))

    if mesh is not None:
        # validation image rays split over chips (zero collectives)
        _val_sharded = pmesh.shard_map_render(
            lambda p, ro, rd: bundle.volume_render(
                p, ro, rd, bundle.mcfg, val_rcfg)[2],
            mesh, n_rays=val_H * val_W)

        @jax.jit
        def render_val(params, c2w, intrinsics):
            rays_o, rays_d, _ = get_rays(c2w, intrinsics, val_H, val_W,
                                         N_rays=-1)
            ret = _val_sharded(params, rays_o[0], rays_d[0])
            ret = jax.tree_util.tree_map(lambda x: x[None], ret)
            return ret["rgb"], ret["depth_volume"], ret
    else:
        @jax.jit
        def render_val(params, c2w, intrinsics):
            rays_o, rays_d, _ = get_rays(c2w, intrinsics, val_H, val_W,
                                         N_rays=-1)
            return bundle.volume_render(params, rays_o, rays_d, bundle.mcfg,
                                        val_rcfg)

    checkpoint_io.register_modules(
        model=lambda: params, optimizer=lambda: opt_state)

    t0 = time.time()
    t_wall0 = time.time()
    log.info("=> Start training..., it=%d, in %s", it, exp_dir)
    n_imgs = len(dataset)
    order_key = np.random.RandomState(42)
    special_i_val_mesh = [3000, 5000, 7000]

    try:
        while it <= NUM_ITERS:
            order = (order_key.permutation(n_imgs) if not is_finetune
                     else np.arange(n_imgs))
            for img_idx in order:
                idx, model_input, ground_truth = dataset[int(img_idx)]

                # ---------------- validation (train.py:175-208)
                if I_VAL > 0 and it % I_VAL == 0:
                    vidx, val_in, val_gt = val_dataset[
                        int(order_key.randint(len(val_dataset)))]
                    rgb, depth_v, ret = render_val(
                        params, jnp.asarray(val_in["c2w"])[None],
                        jnp.asarray(val_in["intrinsics"])[None])
                    to_img = lambda x: np.asarray(lin2img(
                        x, val_H, val_W, batched=True))
                    logger.add_imgs(to_img(jnp.asarray(
                        val_gt["rgb"])[None]), "val/gt_rgb", it)
                    logger.add_imgs(to_img(rgb), "val/predicted_rgb", it)
                    mse = float(np.mean((np.clip(np.asarray(rgb), 0, 1)
                                         - np.asarray(val_gt["rgb"])) ** 2))
                    val_psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
                    logger.add("val", "psnr", val_psnr, it)
                    log.info("=> val view %d PSNR %.2f dB", int(vidx),
                             val_psnr)
                    logger.add_imgs(to_img(
                        (depth_v / (depth_v.max() + 1e-10))[..., None]),
                        "val/pred_depth_volume", it)
                    logger.add_imgs(to_img(
                        ret["mask_volume"][..., None]),
                        "val/pred_mask_volume", it)
                    if "beta_map" in ret:
                        # beta heat map + upsample-iteration map (reference
                        # Trainer.val, volsdf.py:840-876)
                        beta_map = np.asarray(ret["beta_map"])
                        logger.add("val", "beta_mean",
                                   float(beta_map.mean()), it)
                        bm = beta_map.reshape(1, -1, 1)
                        rng_ = bm.max() - bm.min() + 1e-10
                        logger.add_imgs(to_img(
                            (bm - bm.min()) / rng_), "val/beta_heat_map", it)
                        iu = np.asarray(ret["iter_usage"]).reshape(1, -1, 1)
                        max_iter = val_rcfg.max_upsample_steps
                        iu = np.where(iu < 0, max_iter + 1, iu)
                        logger.add_imgs(to_img(iu / (max_iter + 1)),
                                        "val/upsample_iters", it)

                # ---------------- validate mesh (train.py:213-222)
                if (I_VAL_MESH > 0
                        and (it % I_VAL_MESH == 0
                             or it in special_i_val_mesh) and it != 0):
                    cond_mkdir(mesh_dir)
                    mcfg = bundle.mcfg

                    @jax.jit
                    def sdf_query(pts):
                        return nets.implicit_surface_fwd(
                            params["implicit_surface"], pts, mcfg.surface,
                            return_h=False)

                    mesh_util.extract_mesh(
                        sdf_query,
                        filepath=os.path.join(mesh_dir, f"{it:08d}.ply"),
                        volume_size=float(args["data"].get(
                            "volume_size", 2.0)),
                        N=int(args["data"].get("mesh_N", 256)))

                if it >= NUM_ITERS:
                    raise StopIteration

                # ---------------- train step
                start_time = time.time()
                batch = stage_batch(model_input, ground_truth)
                k_step = jax.random.fold_in(k_train, it)
                # profiler trace window (reference has no profiler; here:
                # --profile_start/--profile_steps dump a jax trace)
                if args.profile_steps > 0 and it == args.profile_start:
                    jax.profiler.start_trace(
                        os.path.join(exp_dir, "profile"))
                if (args.profile_steps > 0
                        and it == args.profile_start + args.profile_steps):
                    jax.profiler.stop_trace()
                    log.info("=> Wrote profiler trace to %s",
                             os.path.join(exp_dir, "profile"))
                if is_finetune:
                    params, opt_state, losses = step_fn(
                        params, opt_state, batch, k_step)
                    grad_norm = None
                else:
                    params, opt_state, losses, aux, grad_norm = step_fn(
                        params, opt_state, batch, k_step,
                        jnp.asarray(it, jnp.float32))

                # ---------------- logging (train.py:251-314)
                if I_SAVE > 0 and time.time() - t0 > I_SAVE:
                    checkpoint_io.save("latest.npz", global_step=it,
                                       epoch_idx=epoch_idx)
                    logger.save_stats("stats.p")
                    t0 = time.time()
                if I_BACKUP > 0 and it % I_BACKUP == 0 and it > 0:
                    checkpoint_io.save(f"{it:08d}.npz", global_step=it,
                                       epoch_idx=epoch_idx)

                for k, v in losses.items():
                    logger.add("losses", k, float(np.asarray(v)), it)
                if grad_norm is not None:
                    logger.add("grad", "total_norm",
                               float(np.asarray(grad_norm)), it)
                logger.add("learning rates", "whole",
                           float(np.asarray(schedule(it))), it)
                # extras stats: mean/min/max/norm (reference train.py:294-306)
                if not is_finetune and it % 10 == 0:
                    for n in ["radiance", "alpha", "implicit_surface",
                              "implicit_nablas_norm"]:
                        if n in aux:
                            v = np.asarray(aux[n])
                            logger.add(f"extras_{n}", "whole.mean",
                                       float(v.mean()), it)
                            logger.add(f"extras_{n}", "whole.min",
                                       float(v.min()), it)
                            logger.add(f"extras_{n}", "whole.max",
                                       float(v.max()), it)
                            logger.add(f"extras_{n}", "whole.norm",
                                       float(np.linalg.norm(v)), it)
                    if "beta_map" in aux:
                        logger.add("scalars", "beta",
                                   float(np.asarray(aux["beta_map"]).mean()),
                                   it)
                log.debug("=> One iteration time is %.2f",
                          time.time() - start_time)
                if it % 10 == 0:
                    log.info("it=%d loss=%.5f (%.2fs/it)", it,
                             float(np.asarray(losses["total"])),
                             time.time() - start_time)
                it += 1
                # losses were just read back to host, so the device is
                # quiescent here — the only safe point to stop a chip run.
                if MAX_WALL_SEC > 0 and time.time() - t_wall0 > MAX_WALL_SEC:
                    checkpoint_io.save("latest.npz", global_step=it,
                                       epoch_idx=epoch_idx)
                    logger.save_stats("stats.p")
                    log.info("=> max_wall_sec (%.0f s) reached at it=%d; "
                             "saved latest.npz and exiting cleanly.",
                             MAX_WALL_SEC, it)
                    return
            epoch_idx += 1
    except StopIteration:
        pass
    except KeyboardInterrupt:
        checkpoint_io.save("latest.npz", global_step=it,
                           epoch_idx=epoch_idx)
        logger.save_stats("stats.p")
        # os._exit, not sys.exit: non-daemon helper threads (tensorboard
        # writer, device transfer callbacks) keep the interpreter alive
        # after SystemExit, leaving a headless trainer racing the next
        # launch on the same chip/exp-dir (observed: two trainers
        # time-sharing the TPU after a ^C "exit").
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    checkpoint_io.save(f"final_{it:08d}.npz", global_step=it,
                       epoch_idx=epoch_idx)
    logger.save_stats("stats.p")
    log.info("Everything done.")


if __name__ == "__main__":
    pmesh.init_distributed()  # multi-host no-op on one host (dist_util.py:13)
    parser = create_args_parser()
    parser.add_argument("--ddp", action="store_true",
                        help="kept for reference-CLI compatibility; "
                             "multi-chip DP over rays is automatic whenever "
                             ">1 device is visible (disable: --no_mesh true)")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--profile_start", type=int, default=5)
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="if >0, write a jax profiler trace covering "
                             "this many steps starting at --profile_start")
    cli_args, unknown = parser.parse_known_args()
    config = load_config(cli_args, unknown)
    main_function(config)
