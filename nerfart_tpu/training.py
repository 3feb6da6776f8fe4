"""Reconstruction training: single-jit train steps for VolSDF and NeuS.

The reference splits a step across host-side pieces (ray sampling, chunked
render, loss, backward, optimizer; reference volsdf.py:689-837,
train.py:232-248). Here each step is ONE jitted function:
ray sampling (PRNG key), render, losses, grads and the optax update all
fuse into a single XLA program — no host round-trips, and under a device
mesh the batch shards over rays with XLA inserting the gradient
all-reduce (the TPU equivalent of the reference's DDP, SURVEY.md §2.6).
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.ops import rays as ray_ops

Params = Any


@dataclasses.dataclass(frozen=True)
class TrainCfg:
    H: int
    W: int
    N_rays: int = 2048
    w_eikonal: float = 0.1
    with_mask: bool = False          # NeuS mask supervision
    w_mask: float = 0.0
    obj_bounding_radius: float = 3.0  # eikonal sampling box (volsdf.py:799)


def _sample_batch_rays(batch: Dict[str, jnp.ndarray], key: jax.Array,
                       tcfg: TrainCfg, mesh=None) -> Tuple[jnp.ndarray, ...]:
    """Random pixel rays + gathered targets (volsdf.py:701-717).

    With a mesh, per-ray tensors get sharded over the 'data' axis — the TPU
    equivalent of the reference's DataParallel ray-split (volsdf.py:633)."""
    c2w = batch["c2w"]
    intrinsics = batch["intrinsics"]
    rays_o, rays_d, select_inds = ray_ops.get_rays(
        c2w, intrinsics, tcfg.H, tcfg.W, N_rays=tcfg.N_rays, key=key)
    target_rgb = jnp.take_along_axis(
        batch["rgb"], select_inds[..., None], axis=-2)
    mask_ignore = None
    if "mask_ignore" in batch:
        mask_ignore = jnp.take_along_axis(batch["mask_ignore"],
                                          select_inds, axis=-1)
    target_mask = None
    if "object_mask" in batch:
        target_mask = jnp.take_along_axis(batch["object_mask"],
                                          select_inds, axis=-1)
    if mesh is not None:
        from nerfart_tpu.parallel.mesh import shard_rays
        rays_o = shard_rays(rays_o, mesh)
        rays_d = shard_rays(rays_d, mesh)
        target_rgb = shard_rays(target_rgb, mesh)
        if mask_ignore is not None:
            mask_ignore = shard_rays(mask_ignore, mesh)
        if target_mask is not None:
            target_mask = shard_rays(target_mask, mesh)
    return rays_o, rays_d, select_inds, target_rgb, mask_ignore, target_mask


def volsdf_losses(params: Params, batch: Dict[str, jnp.ndarray],
                  key: jax.Array, mcfg: volsdf_fw.VolSDFCfg,
                  rcfg: volsdf_fw.VolSDFRenderCfg, tcfg: TrainCfg,
                  mesh=None):
    """VolSDF reconstruction losses (reference volsdf.py:784-823)."""
    k_rays, k_render, k_eik = jax.random.split(key, 3)
    rays_o, rays_d, select_inds, target_rgb, mask_ignore, _ = \
        _sample_batch_rays(batch, k_rays, tcfg, mesh)

    rgb, _, extras = volsdf_fw.volume_render(
        params, rays_o, rays_d, mcfg, rcfg, key=k_render)

    # eikonal: max-visibility surface point per ray + one uniform point
    # (VolSDF §3.5; volsdf.py:794-803)
    nablas = extras["implicit_nablas"]
    w = extras["visibility_weights"][..., :nablas.shape[-2]]
    ind = jnp.argmax(w, axis=-1)
    nablas_surf = jnp.take_along_axis(
        nablas, ind[..., None, None].repeat(3, axis=-1), axis=-2)
    eik_pts = jax.random.uniform(
        k_eik, nablas_surf.shape, minval=-tcfg.obj_bounding_radius,
        maxval=tcfg.obj_bounding_radius)
    _, nablas_eik, _ = nets.implicit_surface_with_nablas(
        params["implicit_surface"], eik_pts, mcfg.surface)
    nablas_all = jnp.concatenate([nablas_surf, nablas_eik], axis=-2)
    nablas_norm = jnp.linalg.norm(nablas_all, axis=-1)

    losses = {}
    loss_img = jnp.abs(rgb - target_rgb)
    if mask_ignore is not None:
        losses["loss_img"] = ((loss_img * mask_ignore[..., None]).sum()
                              / (mask_ignore.sum() + 1e-10))
    else:
        losses["loss_img"] = loss_img.mean()
    losses["loss_eikonal"] = tcfg.w_eikonal * jnp.mean(
        (nablas_norm - 1.0) ** 2)
    losses["total"] = losses["loss_img"] + losses["loss_eikonal"]

    aux = {
        "select_inds": select_inds,
        "implicit_nablas_norm": nablas_norm,
        "radiance": extras["radiance"],
        "alpha": extras["alpha"],
        "implicit_surface": extras["implicit_surface"],
        "beta_map": extras["beta_map"],
        "iter_usage": extras["iter_usage"],
    }
    return losses["total"], (losses, aux)


def neus_losses(params: Params, batch: Dict[str, jnp.ndarray],
                key: jax.Array, mcfg: neus_fw.NeuSCfg,
                rcfg: neus_fw.NeuSRenderCfg, tcfg: TrainCfg,
                mesh=None):
    """NeuS reconstruction losses (reference neus.py:578-617)."""
    k_rays, k_render = jax.random.split(key)
    rays_o, rays_d, select_inds, target_rgb, mask_ignore, target_mask = \
        _sample_batch_rays(batch, k_rays, tcfg, mesh)

    rgb, _, extras = neus_fw.volume_render(
        params, rays_o, rays_d, mcfg, rcfg, key=k_render)

    nablas_norm = jnp.linalg.norm(extras["implicit_nablas"], axis=-1)
    mask_volume = jnp.clip(extras["mask_volume"], 1e-3, 1 - 1e-3)

    losses = {}
    loss_img = jnp.abs(rgb - target_rgb)
    losses["loss_eikonal"] = tcfg.w_eikonal * jnp.mean(
        (nablas_norm - 1.0) ** 2)
    if tcfg.with_mask:
        assert target_mask is not None, "with_mask training needs object_mask"
        tm = target_mask.astype(jnp.float32)
        bce = -(tm * jnp.log(mask_volume)
                + (1 - tm) * jnp.log(1 - mask_volume))
        losses["loss_mask"] = tcfg.w_mask * bce.mean()
        eff = target_mask
        if mask_ignore is not None:
            eff = jnp.logical_and(target_mask, mask_ignore)
        losses["loss_img"] = ((loss_img * eff[..., None]).sum()
                              / (eff.sum() + 1e-10))
    else:
        if mask_ignore is not None:
            losses["loss_img"] = ((loss_img * mask_ignore[..., None]).sum()
                                  / (mask_ignore.sum() + 1e-10))
        else:
            losses["loss_img"] = loss_img.mean()
    losses["total"] = sum(losses.values())

    aux = {
        "select_inds": select_inds,
        "implicit_nablas_norm": nablas_norm,
        "radiance": extras["radiance"],
        "alpha": extras["alpha"],
        "implicit_surface": extras["implicit_surface"],
        "mask_volume_clipped": mask_volume,
    }
    return losses["total"], (losses, aux)


def make_optimizer(args, num_iters: int) -> optax.GradientTransformation:
    """Adam + the reference's LR schedule (base.py:486-584).

    `training.lr` is either a number or a dict {module_or_param: lr} with a
    required 'default' entry (reference base.py:487-521). Dict keys name
    top-level params-pytree entries (modules like 'radiance_net' or scalars
    like 'ln_beta'); unknown keys raise, like the reference. All groups
    share one schedule factor (LambdaLR semantics, base.py:566-580).
    """
    lr = args["training"]["lr"]
    sched_cfg = args["training"]["scheduler"]
    if isinstance(lr, dict):
        lr_dict = {k: float(v) for k, v in lr.items() if k != "default"}
        if "default" not in lr:
            raise KeyError("per-module lr dict needs a 'default' entry "
                           "(reference base.py:491)")
        default_lr = float(lr["default"])
        schedule = nets.make_schedule(sched_cfg, default_lr, num_iters)
        transforms = {"default": optax.adam(learning_rate=schedule)}
        for name, mlr in lr_dict.items():
            transforms[name] = optax.adam(
                learning_rate=nets.make_schedule(sched_cfg, mlr, num_iters))

        def label_params(params):
            for name in lr_dict:
                if name not in params:
                    raise RuntimeError(f"wrong lr key: {name}")
            return {
                k: jax.tree_util.tree_map(
                    lambda _: k if k in lr_dict else "default", v)
                for k, v in params.items()
            }

        return optax.multi_transform(transforms, label_params), schedule
    schedule = nets.make_schedule(sched_cfg, float(lr), num_iters)
    return optax.adam(learning_rate=schedule), schedule


def make_train_step(framework: str, mcfg, rcfg, tcfg: TrainCfg,
                    optimizer: optax.GradientTransformation,
                    frozen_module: Optional[str] = None,
                    donate: bool = True, mesh=None):
    """Build the jitted (params, opt_state, batch, key) -> ... step.

    frozen_module: 'implicit_surface' | 'radiance_net' | None — zeroes the
    module's gradients (reference fix_module, volsdf.py:371-386).
    mesh: optional jax Mesh — shards the ray batch over the 'data' axis
    (multi-chip DP; gradients all-reduce via XLA collectives over ICI).

    The returned step takes (params, opt_state, batch, key, it) — `it` is
    only consumed by UNISURF (its sampling interval decays with the step,
    reference unisurf.py:321).
    """
    fw = framework.lower()
    if fw == "unisurf":
        from nerfart_tpu.models.unisurf import unisurf_losses

        def loss_fn(params, batch, key, it):
            return unisurf_losses(params, batch, key, it, mcfg, rcfg, tcfg,
                                  mesh)
    else:
        base_loss = {"volsdf": volsdf_losses, "neus": neus_losses}[fw]

        def loss_fn(params, batch, key, it):
            return base_loss(params, batch, key, mcfg, rcfg, tcfg, mesh)

    def step(params, opt_state, batch, key, it=0):
        grads, (losses, aux) = jax.grad(
            loss_fn, has_aux=True)(params, batch, key, it)
        if frozen_module is not None:
            zeroed = jax.tree_util.tree_map(jnp.zeros_like,
                                            grads[frozen_module])
            grads = dict(grads)
            grads[frozen_module] = zeroed
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, aux, grad_norm

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def count_parameters(params: Params) -> int:
    """Trainable parameter count (reference utils/train_util.py:18-20)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
