"""Stylization fine-tuning: the NeRF-Art signature training path.

The reference implements two-pass "gradient caching" by hand
(reference volsdf.py:719-781 / neus.py:520-576):
  pass 1: render the FULL image under no_grad in 2000-ray chunks;
  compute the style loss on the image and cache dL/dRGB;
  pass 2: re-render 1200-ray batches WITH graph and inject the cached
  per-pixel gradient via rgb.backward(gradient_slice), plus a per-batch
  eikonal term.

Here the same algorithm is ONE jitted program:
  pass 1 = stop-gradient render via lax.map blocks;
  dL/dRGB = jax.grad of the style loss w.r.t. the rendered image
  (one CLIP+VGG backward, never materializing the render graph);
  pass 2 = lax.scan over ray blocks accumulating jax.vjp cotangents into
  the parameter gradients (the eikonal loss rides the same vjp via a
  second output with cotangent 1).
Peak memory = one block's render graph, exactly like the reference, but
with zero host round-trips and full XLA overlap between blocks.
"""
import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from nerfart_tpu.criteria.style import StyleCfg, style_loss
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.ops import rays as ray_ops

Params = Any


@dataclasses.dataclass(frozen=True)
class FinetuneCfg:
    H: int
    W: int
    framework: str = "volsdf"
    w_eikonal: float = 0.1
    use_eikonal: bool = True
    # pass-1 render block (reference: rayschunk 2000 volsdf / 4800 neus,
    # hardcoded 'for 3090Ti', volsdf.py:720, neus.py:523 — here just a
    # memory/efficiency knob)
    render_chunk: int = 4096
    # pass-2 gradient-accumulation block (reference: 1200, volsdf.py:754)
    grad_chunk: int = 2048
    # 'radiance_net' frozen for NeuS finetune (neus.py:28), None for VolSDF
    fix_module: Optional[str] = None
    # compile the step as three separate XLA programs (pass-1 render /
    # style gradient / pass-2 vjp scan + update) instead of one. Same
    # math and results; bounds XLA's global-optimization blowup — the
    # monolithic full-size program exceeded 28 min of compile on the
    # remote-compile path (QUALITY.md)
    split_programs: bool = False


def _render_fn(framework: str):
    return {"volsdf": volsdf_fw.volume_render,
            "neus": neus_fw.volume_render}[framework.lower()]


def _pass1_render(params: Params, batch: Dict[str, jnp.ndarray],
                  key: jax.Array, mcfg, rcfg, fcfg: FinetuneCfg, mesh=None):
    """Full-image no-grad render (volsdf.py:724-729). Returns
    (rgb, rays_o, rays_d)."""
    render = _render_fn(fcfg.framework)
    # full-image rays (N_rays=-1, volsdf.py:706-708)
    rays_o, rays_d, _ = ray_ops.get_rays(
        batch["c2w"], batch["intrinsics"], fcfg.H, fcfg.W, N_rays=-1)
    if mesh is not None:
        from nerfart_tpu.parallel.mesh import shard_rays
        rays_o = shard_rays(rays_o, mesh)
        rays_d = shard_rays(rays_d, mesh)

    is_volsdf = fcfg.framework.lower() == "volsdf"
    p1_kw = dict(detailed_output=False, calc_normal=False,
                 rays_chunk=fcfg.render_chunk)
    if is_volsdf:
        p1_kw["require_nablas"] = False
    rcfg_p1 = dataclasses.replace(rcfg, **p1_kw)
    rgb, _, _ = render(jax.lax.stop_gradient(params), rays_o, rays_d,
                       mcfg, rcfg_p1, key=key)
    return jax.lax.stop_gradient(rgb), rays_o, rays_d


def _style_grad(clip_params: Params, vgg_params: Params, bank,
                rgb: jnp.ndarray, target_rgb: jnp.ndarray, key: jax.Array,
                scfg: StyleCfg, fcfg: FinetuneCfg):
    """Style loss and its image-space gradient dL/dRGB — the reference's
    cached `rgb.grad` (volsdf.py:732-751)."""
    def sl(rgb_img):
        total, parts = style_loss(clip_params, vgg_params, bank, rgb_img,
                                  target_rgb, fcfg.H, key, scfg)
        return total, parts

    (loss_style, parts), rgb_grad = jax.value_and_grad(sl, has_aux=True)(rgb)
    return loss_style, parts, rgb_grad


def finetune_step(params: Params, opt_state, batch: Dict[str, jnp.ndarray],
                  key: jax.Array, clip_params: Params, vgg_params: Params,
                  bank, mcfg, rcfg, scfg: StyleCfg, fcfg: FinetuneCfg,
                  optimizer: optax.GradientTransformation, mesh=None):
    """One stylization step. batch: {'c2w' [B,4,4], 'intrinsics' [B,4,4],
    'rgb' [B, H*W, 3]}. Returns (params, opt_state, losses_dict).

    mesh: optional jax Mesh — the full-image rays of pass 1 and each
    pass-2 gradient block shard over the 'data' axis; XLA all-reduces the
    accumulated parameter grads (DDP-equivalent for stylization, which the
    reference never had: its finetune is single-GPU only)."""
    k_r1, k_style, k_r2 = jax.random.split(key, 3)

    rgb, rays_o, rays_d = _pass1_render(params, batch, k_r1, mcfg, rcfg,
                                        fcfg, mesh)
    loss_style, parts, rgb_grad = _style_grad(
        clip_params, vgg_params, bank, rgb, batch["rgb"], k_style, scfg,
        fcfg)
    params, opt_state, eik_avg = _pass2_update(
        params, opt_state, rays_o, rays_d, rgb_grad, k_r2, mcfg, rcfg,
        fcfg, optimizer, mesh)

    losses = dict(parts)
    losses["style_total"] = loss_style
    losses["eikonal_avg"] = eik_avg
    losses["total"] = loss_style + eik_avg
    return params, opt_state, losses


def _pass2_update(params: Params, opt_state, rays_o, rays_d, rgb_grad,
                  key: jax.Array, mcfg, rcfg, fcfg: FinetuneCfg,
                  optimizer: optax.GradientTransformation, mesh=None):
    """Blockwise vjp accumulation + optimizer update (volsdf.py:759-771).
    Returns (params, opt_state, eik_avg)."""
    render = _render_fn(fcfg.framework)
    is_volsdf = fcfg.framework.lower() == "volsdf"
    k_r2 = key
    B = rays_o.shape[0]
    M = rays_o.shape[1]
    chunk = fcfg.grad_chunk
    n_blocks = -(-M // chunk)
    pad = n_blocks * chunk - M

    def pad_blocks(x, zero_tail=False):
        tail = (jnp.zeros_like(x[:, -1:]).repeat(pad, axis=1) if zero_tail
                else jnp.broadcast_to(x[:, -1:], (B, pad, *x.shape[2:])))
        x = jnp.concatenate([x, tail], axis=1)
        return x.reshape(B, n_blocks, chunk, *x.shape[2:]).swapaxes(0, 1)

    ro_b = pad_blocks(rays_o)
    rd_b = pad_blocks(rays_d)
    # zero cotangent on padded rays: no spurious gradient
    g_b = pad_blocks(rgb_grad, zero_tail=True)
    keys_b = jax.random.split(k_r2, n_blocks)

    p2_kw = dict(detailed_output=True, calc_normal=False, rays_chunk=None)
    if is_volsdf:
        p2_kw["require_nablas"] = True
    rcfg_p2 = dataclasses.replace(rcfg, **p2_kw)

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def block_step(carry, blk):
        grads_acc, eik_acc = carry
        ro, rd, g, kk = blk
        if mesh is not None:
            from nerfart_tpu.parallel.mesh import shard_rays
            ro = shard_rays(ro, mesh)
            rd = shard_rays(rd, mesh)
            g = shard_rays(g, mesh)

        def f(p):
            rgb_p, _, extras = render(p, ro, rd, mcfg, rcfg_p2, key=kk)
            if fcfg.use_eikonal:
                nablas = extras["implicit_nablas"]
                nn_ = jnp.linalg.norm(
                    nablas.reshape(*nablas.shape[:-3], -1, 3), axis=-1)
                eik = fcfg.w_eikonal * jnp.mean((nn_ - 1.0) ** 2)
            else:
                eik = jnp.float32(0.0)
            return rgb_p, eik

        (rgb_p, eik), vjp_fn = jax.vjp(f, params)
        (g_params,) = vjp_fn((g, jnp.float32(1.0)))
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g_params)
        return (grads_acc, eik_acc + eik), None

    (grads, eik_total), _ = jax.lax.scan(
        block_step, (zero_grads, jnp.float32(0.0)),
        (ro_b, rd_b, g_b, keys_b))

    if fcfg.fix_module is not None:
        grads = dict(grads)
        grads[fcfg.fix_module] = jax.tree_util.tree_map(
            jnp.zeros_like, grads[fcfg.fix_module])

    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, eik_total / n_blocks


def make_finetune_step(clip_params, vgg_params, bank, mcfg, rcfg,
                       scfg: StyleCfg, fcfg: FinetuneCfg,
                       optimizer: optax.GradientTransformation, mesh=None):
    """jit-wrapped finetune step.

    The loss-network weights and text bank ride as jit ARGUMENTS (bound
    via partial application of the returned callable), not closure
    constants — closing over ~100 MB of CLIP/VGG weights makes XLA
    constant-fold them into the executable (minutes of extra compile)."""
    from nerfart_tpu.criteria.losses import TextBank

    if fcfg.split_programs:
        # three separate XLA programs; same math, bounded compile times.
        # Intermediate arrays stay on device — the host only sequences.
        @jax.jit
        def j_pass1(params, batch, key):
            return _pass1_render(params, batch, key, mcfg, rcfg, fcfg,
                                 mesh)

        @jax.jit
        def j_style(clip_p, vgg_p, td, tf, nf, tdist, rgb, target_rgb,
                    key):
            return _style_grad(clip_p, vgg_p, TextBank(td, tf, nf, tdist),
                               rgb, target_rgb, key, scfg, fcfg)

        # donate params/opt_state so the split path matches the monolithic
        # step's memory profile — split mode exists precisely because
        # full-size is HBM-tight (ray/grad buffers are not donatable:
        # no same-shape outputs to alias them into)
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def j_pass2(params, opt_state, rays_o, rays_d, rgb_grad, key):
            return _pass2_update(params, opt_state, rays_o, rays_d,
                                 rgb_grad, key, mcfg, rcfg, fcfg,
                                 optimizer, mesh)

        def step(params, opt_state, batch, key):
            k_r1, k_style, k_r2 = jax.random.split(key, 3)
            rgb, rays_o, rays_d = j_pass1(params, batch, k_r1)
            loss_style, parts, rgb_grad = j_style(
                clip_params, vgg_params, bank.text_direction,
                bank.target_feats, bank.neg_feats, bank.text_distance,
                rgb, batch["rgb"], k_style)
            params, opt_state, eik_avg = j_pass2(
                params, opt_state, rays_o, rays_d, rgb_grad, k_r2)
            losses = dict(parts)
            losses["style_total"] = loss_style
            losses["eikonal_avg"] = eik_avg
            losses["total"] = loss_style + eik_avg
            return params, opt_state, losses

        return step

    def _fn(params, opt_state, batch, key, clip_p, vgg_p, td, tf, nf,
            tdist):
        return finetune_step(params, opt_state, batch, key, clip_p, vgg_p,
                             TextBank(td, tf, nf, tdist), mcfg=mcfg,
                             rcfg=rcfg, scfg=scfg, fcfg=fcfg,
                             optimizer=optimizer, mesh=mesh)

    jitted = jax.jit(_fn, donate_argnums=(0, 1))

    def step(params, opt_state, batch, key):
        return jitted(params, opt_state, batch, key, clip_params,
                      vgg_params, bank.text_direction, bank.target_feats,
                      bank.neg_feats, bank.text_distance)

    return step
