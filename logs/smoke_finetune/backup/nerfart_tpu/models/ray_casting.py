"""Surface rendering via ray casting (reference models/ray_casting.py).

Root finding (dense probe + secant refinement, DVR-style,
ray_casting.py:11-160) and sphere tracing (ray_casting.py:163-184), both
as fixed-iteration fully-masked jit programs: the reference's boolean-mask
scatter updates become jnp.where selects over all rays (uniform work, no
dynamic shapes).
"""
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any


def run_secant_method(sdf_fn, f_low, f_high, d_low, d_high, rays_o, rays_d,
                      n_secant_steps: int, logit_tau: float = 0.0):
    """Secant root refinement (reference ray_casting.py:11-30), vectorized
    over all rays with masked low/high updates."""
    d_pred = -f_low * (d_high - d_low) / (f_high - f_low) + d_low
    for _ in range(n_secant_steps):
        p_mid = rays_o + d_pred[..., None] * rays_d
        f_mid = jax.lax.stop_gradient(sdf_fn(p_mid)) - logit_tau
        ind_low = f_mid < 0
        d_low = jnp.where(ind_low, d_pred, d_low)
        f_low = jnp.where(ind_low, f_mid, f_low)
        d_high = jnp.where(ind_low, d_high, d_pred)
        f_high = jnp.where(ind_low, f_high, f_mid)
        d_pred = -f_low * (d_high - d_low) / (f_high - f_low) + d_low
    return d_pred


def root_finding_surface_points(
    sdf_fn: Callable, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
    near=0.0, far=6.0, N_steps: int = 256, logit_tau: float = 0.0,
    N_secant_steps: int = 8, fill_inf: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense linspace probe -> first +to- sign change -> secant
    (reference ray_casting.py:35-160).

    Returns (d_pred [..., N], pt_pred [..., N, 3], mask hit,
    mask_sign_change)."""
    prefix = rays_o.shape[:-1]
    t = jnp.linspace(0.0, 1.0, N_steps, dtype=rays_o.dtype)
    near = jnp.broadcast_to(jnp.asarray(near, rays_o.dtype), prefix)
    far = jnp.broadcast_to(jnp.asarray(far, rays_o.dtype), prefix)
    d_proposal = near[..., None] * (1 - t) + far[..., None] * t
    p_proposal = (rays_o[..., None, :]
                  + d_proposal[..., :, None] * rays_d[..., None, :])
    val = jax.lax.stop_gradient(sdf_fn(p_proposal)) - logit_tau

    mask_0_not_occupied = val[..., 0] > 0
    sign_matrix = jnp.concatenate(
        [jnp.sign(val[..., :-1] * val[..., 1:]),
         jnp.ones((*prefix, 1), val.dtype)], axis=-1)
    cost_matrix = sign_matrix * jnp.arange(N_steps, 0, -1, dtype=val.dtype)
    values = jnp.min(cost_matrix, axis=-1)
    indices = jnp.argmin(cost_matrix, axis=-1)
    mask_sign_change = values < 0
    mask_pos_to_neg = jnp.take_along_axis(
        val, indices[..., None], axis=-1)[..., 0] > 0
    mask = mask_sign_change & mask_pos_to_neg & mask_0_not_occupied

    d_high = jnp.take_along_axis(d_proposal, indices[..., None], -1)[..., 0]
    f_high = jnp.take_along_axis(val, indices[..., None], -1)[..., 0]
    idx1 = jnp.clip(indices + 1, a_max=N_steps - 1)
    d_low = jnp.take_along_axis(d_proposal, idx1[..., None], -1)[..., 0]
    f_low = jnp.take_along_axis(val, idx1[..., None], -1)[..., 0]

    d_pred = run_secant_method(sdf_fn, f_low, f_high, d_low, d_high,
                               rays_o, rays_d, N_secant_steps, logit_tau)

    pt_pred = jnp.where(mask[..., None],
                        rays_o + d_pred[..., None] * rays_d,
                        jnp.ones_like(rays_o))
    d_out = jnp.where(mask, d_pred, jnp.inf if fill_inf else far)
    d_out = jnp.where(mask_0_not_occupied, d_out, 0.0)
    return d_out, pt_pred, mask, mask_sign_change


def sphere_tracing_surface_points(
    sdf_fn: Callable, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
    near=0.0, far=6.0, N_iters: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration sphere tracing (reference ray_casting.py:163-184)."""
    d_preds = jnp.full(rays_o.shape[:-1], near, rays_o.dtype)
    mask = jnp.ones(rays_o.shape[:-1], bool)

    def body(_, carry):
        d_preds, mask = carry
        pts = rays_o + rays_d * d_preds[..., None]
        surface_val = jax.lax.stop_gradient(sdf_fn(pts))
        d_preds = jnp.where(mask, d_preds + surface_val, d_preds)
        mask = mask & (d_preds <= far) & (d_preds >= 0)
        return d_preds, mask

    d_preds, mask = jax.lax.fori_loop(0, N_iters, body, (d_preds, mask))
    pts = rays_o + rays_d * d_preds[..., None]
    return d_preds, pts, mask


def surface_render(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   model_forward: Callable, sdf_fn: Callable,
                   calc_normal: bool = True,
                   ray_casting_algo: str = "sphere_tracing",
                   near=0.0, far=6.0,
                   rays_chunk: Optional[int] = None,
                   **ray_casting_cfgs) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Surface rendering (reference ray_casting.py:187-263).

    model_forward(pts, view_dirs) -> (color, sdf, nablas);
    sdf_fn(pts) -> sdf. Returns (colors, depths, extras)."""
    prefix = rays_o.shape[:-1]
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def render_block(ro, rd):
        if ray_casting_algo == "root_finding":
            d_pred, pt_pred, mask, _ = root_finding_surface_points(
                sdf_fn, ro, rd, near=near, far=far, **ray_casting_cfgs)
        elif ray_casting_algo == "sphere_tracing":
            d_pred, pt_pred, mask = sphere_tracing_surface_points(
                sdf_fn, ro, rd, near=near, far=far, **ray_casting_cfgs)
        else:
            raise NotImplementedError(ray_casting_algo)
        color, _, nablas = model_forward(pt_pred, rd)
        color = jnp.where(mask[..., None], color, 0.0)
        return {"color": jax.lax.stop_gradient(color),
                "depth": jax.lax.stop_gradient(d_pred),
                "nablas": jax.lax.stop_gradient(nablas),
                "mask": mask}

    M = rays_o.shape[0]
    if rays_chunk is None or M <= rays_chunk:
        ret = render_block(rays_o, rays_d)
    else:
        n_blocks = -(-M // rays_chunk)
        pad = n_blocks * rays_chunk - M
        ro = jnp.concatenate(
            [rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))]).reshape(
                n_blocks, rays_chunk, 3)
        rd = jnp.concatenate(
            [rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))]).reshape(
                n_blocks, rays_chunk, 3)
        ret = jax.lax.map(lambda ab: render_block(ab[0], ab[1]), (ro, rd))
        ret = jax.tree_util.tree_map(
            lambda x: x.reshape(n_blocks * rays_chunk, *x.shape[2:])[:M], ret)

    ret = jax.tree_util.tree_map(
        lambda x: x.reshape(*prefix, *x.shape[1:]), ret)
    extras = {"implicit_nablas": ret["nablas"], "mask_surface": ret["mask"]}
    if calc_normal:
        n = ret["nablas"]
        normals = n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(min=1e-12)
        extras["normals_surface"] = jnp.where(
            ret["mask"][..., None], normals, 0.0)
    return ret["color"], ret["depth"], extras
