"""NeuS framework: logistic-CDF alpha SDF volume rendering.

TPU-first redesign of the reference (reference models/frameworks/neus.py).
Same structural choices as models/volsdf.py: one jitted megabatch render,
`lax.map` block chunking, fixed-shape upsampling (the reference's
`official_solution` 4-iteration loop, neus.py:275-303, already has static
shapes). Parameters: {'ln_s', 'implicit_surface', 'radiance_net'
[, 'nerf_outside']}.
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models import base as nets
from nerfart_tpu.ops import compositing, neus_math, rays as ray_ops

Params = Any


@dataclasses.dataclass(frozen=True)
class NeuSCfg:
    """Model hyperparameters (reference neus.py:80-109, get_model :693-750)."""
    variance_init: float = 0.05
    speed_factor: float = 1.0
    obj_bounding_radius: float = 1.0
    use_outside_nerf: bool = False
    surface: nets.ImplicitSurfaceCfg = nets.ImplicitSurfaceCfg()
    radiance: nets.RadianceNetCfg = nets.RadianceNetCfg()


def init_neus(key: jax.Array, cfg: NeuSCfg) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "ln_s": jnp.asarray(
            [-np.log(cfg.variance_init) / cfg.speed_factor], jnp.float32),
        "implicit_surface": nets.init_implicit_surface(k1, cfg.surface),
        "radiance_net": nets.init_radiance_net(k2, cfg.radiance),
    }
    if cfg.use_outside_nerf:
        params["nerf_outside"] = nets.init_nerf(
            k3, nets.NeRFCfg(input_ch=4, multires=10, multires_view=4,
                             use_view_dirs=True))
    return params


def forward_s(params: Params, cfg: NeuSCfg) -> jnp.ndarray:
    """s = exp(ln_s * speed_factor) (neus.py:116-117)."""
    return jnp.exp(params["ln_s"][0] * cfg.speed_factor)


def forward(params: Params, x: jnp.ndarray, view_dirs: jnp.ndarray,
            cfg: NeuSCfg):
    """(radiances, sdf, nablas) (neus.py:120-123)."""
    sdf, nablas, h = nets.implicit_surface_with_nablas(
        params["implicit_surface"], x, cfg.surface)
    radiances = nets.radiance_net_fwd(
        params["radiance_net"], x, view_dirs, nablas, h, cfg.radiance)
    return radiances, sdf, nablas


def forward_radiance(params: Params, x: jnp.ndarray, view_dirs: jnp.ndarray,
                     cfg: NeuSCfg) -> jnp.ndarray:
    """Radiance at x (normals from the SDF gradient) (neus.py:111-114)."""
    _, nablas, h = nets.implicit_surface_with_nablas(
        params["implicit_surface"], x, cfg.surface)
    return nets.radiance_net_fwd(
        params["radiance_net"], x, view_dirs, nablas, h, cfg.radiance)


@dataclasses.dataclass(frozen=True)
class NeuSRenderCfg:
    """Render algorithm config (reference volume_render kwargs, neus.py:142-177)."""
    obj_bounding_radius: float = 1.0
    use_view_dirs: bool = True
    white_bkgd: bool = False
    calc_normal: bool = False
    detailed_output: bool = True
    perturb: bool = False
    near_bypass: Optional[float] = None
    far_bypass: Optional[float] = None
    fixed_s_recp: float = 1.0 / 64.0
    N_samples: int = 64
    N_importance: int = 64
    N_outside: int = 0
    upsample_algo: str = "official_solution"
    N_nograd_samples: int = 2048
    N_upsample_iters: int = 4
    rays_chunk: Optional[int] = None
    sampler_dtype: str = "float32"
    # dtype for the final SDF/nablas/radiance pass (see models/volsdf.py
    # VolSDFRenderCfg.render_dtype); the alpha/cdf math stays f32.
    render_dtype: str = "float32"
    # rematerialize each ray block in the backward pass (jax.checkpoint):
    # residuals live only for the block being differentiated, so training
    # memory scales with rays_chunk instead of the full batch. TPU-native
    # replacement for the reference's memory-driven chunk-size tuning
    # ("for 3090Ti", neus.py:523).
    remat: bool = False


def _render_block(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  key: jax.Array, mcfg: NeuSCfg, rcfg: NeuSRenderCfg
                  ) -> Dict[str, jnp.ndarray]:
    near, far = ray_ops.near_far_from_sphere(
        rays_o, rays_d, r=rcfg.obj_bounding_radius)
    if rcfg.near_bypass is not None:
        near = jnp.full_like(near, rcfg.near_bypass)
    if rcfg.far_bypass is not None:
        far = jnp.full_like(far, rcfg.far_bypass)

    view_dirs = rays_d if rcfg.use_view_dirs else None
    k_up, k_out = jax.random.split(key)

    _t = jnp.linspace(0.0, 1.0, rcfg.N_samples, dtype=rays_o.dtype)
    d_coarse = near * (1 - _t) + far * _t

    sampler_dtype = jnp.dtype(rcfg.sampler_dtype)

    if sampler_dtype != rays_o.dtype:
        # cast the weights too, or promotion lifts every activation
        # back to f32 after layer 1 (see models/volsdf.py sdf_fn)
        surf_s = jax.tree_util.tree_map(
            lambda a: a.astype(sampler_dtype),
            params["implicit_surface"])
    else:
        surf_s = params["implicit_surface"]

    def sdf_fn(pts):
        if sampler_dtype != pts.dtype:
            pts = pts.astype(sampler_dtype)
        sdf = nets.implicit_surface_fwd(
            surf_s, pts, mcfg.surface, return_h=False)
        return sdf.astype(rays_o.dtype)

    # ---------- upsampling (neus.py:240-305)
    if rcfg.upsample_algo == "official_solution":
        d_all = neus_math.neus_upsample(
            sdf_fn, d_coarse, rays_o, rays_d,
            N_importance=rcfg.N_importance,
            N_upsample_iters=rcfg.N_upsample_iters,
            perturb=rcfg.perturb, key=k_up)
    elif rcfg.upsample_algo == "direct_use":
        pts_coarse = (rays_o[..., None, :]
                      + d_coarse[..., :, None] * rays_d[..., None, :])
        sdf_coarse = sdf_fn(pts_coarse)
        *_, w_coarse = neus_math.sdf_to_w(sdf_coarse, 1.0 / rcfg.fixed_s_recp)
        from nerfart_tpu.ops.sampling import sample_pdf
        d_fine = sample_pdf(d_coarse, w_coarse, rcfg.N_importance,
                            det=not rcfg.perturb, key=k_up)
        d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
    elif rcfg.upsample_algo == "direct_more":
        _t = jnp.linspace(0.0, 1.0, rcfg.N_nograd_samples, dtype=rays_o.dtype)
        _d = near * (1 - _t) + far * _t
        _pts = rays_o[..., None, :] + _d[..., :, None] * rays_d[..., None, :]
        _sdf = sdf_fn(_pts)
        *_, _w = neus_math.sdf_to_w(_sdf, 1.0 / rcfg.fixed_s_recp)
        from nerfart_tpu.ops.sampling import sample_pdf
        d_fine = sample_pdf(_d, _w, rcfg.N_importance,
                            det=not rcfg.perturb, key=k_up)
        d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
    else:
        raise NotImplementedError(rcfg.upsample_algo)

    # ---------- query: SDF+nablas at section ends, radiance at midpoints
    # (neus.py:307-324)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]
    d_mid = 0.5 * (d_all[..., 1:] + d_all[..., :-1])
    pts_mid = rays_o[..., None, :] + rays_d[..., None, :] * d_mid[..., :, None]

    render_dtype = jnp.dtype(rcfg.render_dtype)
    if render_dtype != rays_o.dtype:
        # bf16-resident final pass (see models/volsdf.py _render_block):
        # cast params once, feed bf16 points, cast outputs back; the
        # sigmoid-CDF alpha math below stays f32.
        params_r = jax.tree_util.tree_map(
            lambda a: a.astype(render_dtype), params)
        pts_f = pts.astype(render_dtype)
        pts_mid_f = pts_mid.astype(render_dtype)
    else:
        params_r, pts_f, pts_mid_f = params, pts, pts_mid

    sdf, nablas, _ = nets.implicit_surface_with_nablas(
        params_r["implicit_surface"], pts_f, mcfg.surface)
    sdf = sdf.astype(rays_o.dtype)
    nablas = nablas.astype(rays_o.dtype)
    cdf, opacity_alpha = neus_math.sdf_to_alpha(sdf, forward_s(params, mcfg))
    vmid = (jnp.broadcast_to(view_dirs[..., None, :], pts_mid_f.shape)
            .astype(render_dtype)
            if rcfg.use_view_dirs else None)
    radiances = forward_radiance(params_r, pts_mid_f, vmid,
                                 mcfg).astype(rays_o.dtype)

    # ---------- outside NeRF++ (neus.py:329-368)
    if rcfg.N_outside > 0:
        _t = jnp.linspace(0.0, 1.0, rcfg.N_outside + 2,
                          dtype=rays_o.dtype)[1:-1]
        d_vals_out = far / jnp.flip(_t, axis=-1)
        if rcfg.perturb:
            mids = 0.5 * (d_vals_out[..., 1:] + d_vals_out[..., :-1])
            upper = jnp.concatenate([mids, d_vals_out[..., -1:]], axis=-1)
            lower = jnp.concatenate([d_vals_out[..., :1], mids], axis=-1)
            t_rand = jax.random.uniform(k_out, upper.shape,
                                        dtype=d_vals_out.dtype)
            d_vals_out = lower + (upper - lower) * t_rand
        d_vals_out = jnp.concatenate([d_mid, d_vals_out], axis=-1)
        pts_out = (rays_o[..., None, :]
                   + rays_d[..., None, :] * d_vals_out[..., :, None])
        r = jnp.linalg.norm(pts_out, axis=-1, keepdims=True)
        x_out = jnp.concatenate([pts_out / r, 1.0 / r], axis=-1)
        views_out = (jnp.broadcast_to(view_dirs[..., None, :],
                                      pts_out.shape)
                     if rcfg.use_view_dirs else None)
        sigma_out, radiance_out = nets.nerf_fwd(
            params["nerf_outside"], x_out, views_out,
            nets.NeRFCfg(input_ch=4, multires=10, multires_view=4,
                         use_view_dirs=True))
        dists = d_vals_out[..., 1:] - d_vals_out[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
        alpha_out = 1 - jnp.exp(-jax.nn.softplus(sigma_out) * dists)

        N_pts_1 = d_mid.shape[-1]
        mask_inside = (jnp.linalg.norm(pts_mid, axis=-1)
                       <= rcfg.obj_bounding_radius)
        alpha_in = (opacity_alpha * mask_inside
                    + alpha_out[..., :N_pts_1] * (~mask_inside))
        opacity_alpha = jnp.concatenate(
            [alpha_in, alpha_out[..., N_pts_1:]], axis=-1)
        radiance_in = (radiances * mask_inside[..., None]
                       + radiance_out[..., :N_pts_1, :]
                       * (~mask_inside)[..., None])
        radiances = jnp.concatenate(
            [radiance_in, radiance_out[..., N_pts_1:, :]], axis=-2)
        d_final = d_vals_out
    else:
        d_final = d_mid

    # ---------- integration (neus.py:372-382)
    visibility_weights = compositing.alpha_to_w(opacity_alpha)
    rgb_map = jnp.sum(visibility_weights[..., None] * radiances, axis=-2)
    depth_map = jnp.sum(
        visibility_weights
        / (visibility_weights.sum(-1, keepdims=True) + 1e-10) * d_final,
        axis=-1)
    acc_map = jnp.sum(visibility_weights, axis=-1)
    if rcfg.white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {
        "rgb": rgb_map,
        "depth_volume": depth_map,
        "mask_volume": acc_map,
    }
    if rcfg.calc_normal:
        ret["normals_volume"] = compositing.weighted_normal_map(
            nablas, visibility_weights)
    if rcfg.detailed_output:
        ret["implicit_nablas"] = nablas
        ret["implicit_surface"] = sdf
        ret["radiance"] = radiances
        ret["alpha"] = opacity_alpha
        ret["cdf"] = cdf
        ret["visibility_weights"] = visibility_weights
        ret["d_final"] = d_final
        if rcfg.N_outside > 0:
            ret["sigma_out"] = sigma_out
            ret["radiance_out"] = radiance_out
    return ret


def volume_render(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  mcfg: NeuSCfg, rcfg: NeuSRenderCfg,
                  key: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Volume-render rays (reference neus.py:142-424). Pure, jit-friendly."""
    if key is None:
        key = jax.random.PRNGKey(0)
    prefix = rays_o.shape[:-1]
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    M = rays_o.shape[0]

    block_fn = _render_block
    if rcfg.remat:
        block_fn = jax.checkpoint(_render_block, static_argnums=(4, 5))

    chunk = rcfg.rays_chunk
    if chunk is None or M <= chunk:
        ret = block_fn(params, rays_o, rays_d, key, mcfg, rcfg)
    else:
        n_blocks = -(-M // chunk)
        pad = n_blocks * chunk - M
        ro = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
        rd = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        ro = ro.reshape(n_blocks, chunk, 3)
        rd = rd.reshape(n_blocks, chunk, 3)
        keys = jax.random.split(key, n_blocks)
        ret = jax.lax.map(
            lambda args: block_fn(params, args[0], args[1], args[2],
                                  mcfg, rcfg),
            (ro, rd, keys))
        ret = jax.tree_util.tree_map(
            lambda x: x.reshape(n_blocks * chunk, *x.shape[2:])[:M], ret)

    ret = jax.tree_util.tree_map(
        lambda x: x.reshape(*prefix, *x.shape[1:]), ret)
    return ret["rgb"], ret["depth_volume"], ret


def model_cfg_from_config(args) -> NeuSCfg:
    """NeuSCfg from a reference-format config dict (neus.py:693-730)."""
    model = args["model"]
    surface = model.get("surface", {})
    radiance = model.get("radiance", {})
    use_siren = bool(model.get("use_siren", False))
    w_geo = int(model.get("W_geometry_feature", 256))
    scfg = nets.ImplicitSurfaceCfg(
        W=int(surface.get("W", 256)),
        D=int(surface.get("D", 8)),
        skips=tuple(surface.get("skips", [4])),
        W_geo_feat=w_geo,
        radius_init=float(surface.get("radius_init", 1.0)),
        obj_bounding_size=float(model["obj_bounding_radius"]),
        geometric_init=bool(surface.get("geometric_init", True)),
        embed_multires=int(surface.get("embed_multires", 6)),
        use_siren=bool(surface.get("use_siren", use_siren)),
    )
    rcfg = nets.RadianceNetCfg(
        D=int(radiance.get("D", 4)),
        W=int(radiance.get("W", 256)),
        skips=tuple(radiance.get("skips", [])),
        W_geo_feat=w_geo if w_geo > 0 else scfg.W,
        embed_multires=int(radiance.get("embed_multires", -1)),
        embed_multires_view=int(radiance.get("embed_multires_view", -1)),
        use_view_dirs=bool(radiance.get("use_view_dirs", True)),
        use_siren=bool(radiance.get("use_siren", use_siren)),
    )
    return NeuSCfg(
        variance_init=float(model.get("variance_init", 0.05)),
        speed_factor=float(args["training"].get("speed_factor", 1.0)),
        obj_bounding_radius=float(model["obj_bounding_radius"]),
        use_outside_nerf=not bool(args["training"].get("with_mask", True)),
        surface=scfg,
        radiance=rcfg,
    )
