"""UNISURF framework: occupancy-based surface/volume hybrid rendering.

TPU-first redesign of the reference (reference models/frameworks/
unisurf.py): root finding locates the surface per ray, samples are drawn
both in an interval around the root (shrinking over training via the
`interval` argument) and in the free space before it, and occupancy is
composited directly as alpha. The reference's dispatch disables UNISURF
(frameworks/__init__.py:3 raises) although the framework exists; here it
is fully wired.
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import ray_casting
from nerfart_tpu.ops import compositing, rays as ray_ops

Params = Any


@dataclasses.dataclass(frozen=True)
class UNISURFCfg:
    surface: nets.ImplicitSurfaceCfg = nets.ImplicitSurfaceCfg()
    radiance: nets.RadianceNetCfg = nets.RadianceNetCfg()


def init_unisurf(key: jax.Array, cfg: UNISURFCfg) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "implicit_surface": nets.init_implicit_surface(k1, cfg.surface),
        "radiance_net": nets.init_radiance_net(k2, cfg.radiance),
    }


def get_surface_from_opacity(opacity: Union[float, np.ndarray],
                             eps: float = 1e-4):
    """occupancy -> logits, DVR sign convention (unisurf.py:40-51)."""
    opacity = np.clip(opacity, eps, 1 - eps)
    return -np.log(opacity / (1 - opacity))


def get_opacity_from_surface(imp_surface: jnp.ndarray) -> jnp.ndarray:
    """logits -> occupancy (unisurf.py:53-62)."""
    odds = jnp.exp(-imp_surface)
    return odds / (1 + odds)


def forward(params: Params, x: jnp.ndarray, view_dirs: jnp.ndarray,
            cfg: UNISURFCfg):
    """(radiances, occ_logits, nablas); normals normalized before feeding
    the radiance net since OccNet nablas have no unit-norm guarantee
    (unisurf.py:34-38). Deliberate deviation: the reference's
    `F.normalize(nablas)` uses torch's default dim=1, normalizing across
    the netchunk point axis (a chunk-size-dependent accident); here
    normals are unit-normalized per point, as intended."""
    occ, nablas, h = nets.implicit_surface_with_nablas(
        params["implicit_surface"], x, cfg.surface)
    normals = nablas / jnp.linalg.norm(nablas, axis=-1,
                                       keepdims=True).clip(min=1e-12)
    radiances = nets.radiance_net_fwd(
        params["radiance_net"], x, view_dirs, normals, h, cfg.radiance)
    return radiances, occ, nablas


@dataclasses.dataclass(frozen=True)
class UNISURFRenderCfg:
    logit_tau: float = 0.0
    radius_of_interest: float = 4.0
    use_view_dirs: bool = True
    method: str = "secant"
    white_bkgd: bool = False
    calc_normal: bool = False
    detailed_output: bool = True
    perturb: bool = False
    near_bypass: Optional[float] = None
    far_bypass: Optional[float] = None
    interval: float = 1.0
    too_close_threshold: float = 0.1
    N_query: int = 64
    N_freespace: int = 32
    rays_chunk: Optional[int] = None


def _render_block(params: Params, rays_o, rays_d, key, interval,
                  mcfg: UNISURFCfg, rcfg: UNISURFRenderCfg
                  ) -> Dict[str, jnp.ndarray]:
    near, far = ray_ops.near_far_from_sphere(
        rays_o, rays_d, r=rcfg.radius_of_interest, keepdim=False)
    if rcfg.near_bypass is not None:
        near = jnp.full_like(near, rcfg.near_bypass)
    if rcfg.far_bypass is not None:
        far = jnp.full_like(far, rcfg.far_bypass)
    d_threshold = near + (far - near) * rcfg.too_close_threshold

    def sdf_fn(pts):
        return nets.implicit_surface_fwd(
            params["implicit_surface"], pts, mcfg.surface, return_h=False)

    # root finding (unisurf.py:142-145); only 'secant' exists, as in the
    # reference's actually-used path
    d_pred, pt_pred, mask, mask_sign_change = \
        ray_casting.root_finding_surface_points(
            sdf_fn, rays_o, rays_d, near=near, far=far,
            logit_tau=rcfg.logit_tau, fill_inf=False)

    d_pred = jnp.maximum(jnp.minimum(d_pred, far), near)
    d_upper = jnp.minimum(d_pred + interval, far)
    d_lower = jnp.maximum(d_pred - interval, near)

    k1, k2 = jax.random.split(key)
    # stratified sampling in the interval (unisurf.py:156-169)
    if rcfg.perturb:
        t = jnp.linspace(0.0, 1.0, rcfg.N_query + 1, dtype=rays_o.dtype)
        d_si = d_lower[..., None] * (1 - t) + d_upper[..., None] * t
        lo, hi = d_si[..., :-1], d_si[..., 1:]
        d_samples_interval = lo + (hi - lo) * jax.random.uniform(
            k1, lo.shape, dtype=lo.dtype)
    else:
        t = jnp.linspace(0.0, 1.0, rcfg.N_query, dtype=rays_o.dtype)
        d_samples_interval = d_lower[..., None] * (1 - t) \
            + d_upper[..., None] * t

    # free-space sampling before the surface (unisurf.py:171-198)
    d_lower_fs = jnp.maximum(d_lower, d_threshold)
    d_lower_fs = jnp.where(mask_sign_change, d_lower_fs, far)
    d_lower_fs = jnp.where(d_lower_fs < 1e-10, far, d_lower_fs)
    if rcfg.perturb:
        t = jnp.linspace(0.0, 1.0, rcfg.N_freespace + 1, dtype=rays_o.dtype)
        d_sf = near[..., None] * (1 - t) + d_lower_fs[..., None] * t
        lo, hi = d_sf[..., :-1], d_sf[..., 1:]
        d_samples_freespace = lo + (hi - lo) * jax.random.uniform(
            k2, lo.shape, dtype=lo.dtype)
    else:
        t = jnp.linspace(0.0, 1.0, rcfg.N_freespace, dtype=rays_o.dtype)
        d_samples_freespace = near[..., None] * (1 - t) \
            + d_lower_fs[..., None] * t

    d_all = jnp.sort(jnp.concatenate(
        [d_samples_freespace, d_samples_interval], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]
    vexp = (jnp.broadcast_to(rays_d[..., None, :], pts.shape)
            if rcfg.use_view_dirs else None)
    radiances, logits, nablas = forward(params, pts, vexp, mcfg)

    # occupancy-as-alpha compositing (unisurf.py:218-237)
    opacity_alpha = get_opacity_from_surface(logits)
    visibility_weights = compositing.alpha_to_w(opacity_alpha)
    rgb_map = jnp.sum(visibility_weights[..., None] * radiances, axis=-2)
    depth_map = jnp.sum(
        visibility_weights
        / (visibility_weights.sum(-1, keepdims=True) + 1e-10) * d_all, -1)
    acc_map = jnp.sum(visibility_weights, -1)
    if rcfg.white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {"rgb": rgb_map, "depth_volume": depth_map, "mask_volume": acc_map}
    if rcfg.calc_normal:
        ret["normals_volume"] = compositing.weighted_normal_map(
            nablas, visibility_weights)
    if rcfg.detailed_output:
        ret["surface_points"] = pt_pred
        ret["mask_surface"] = mask
        ret["depth_surface"] = d_pred
        ret["radiance"] = radiances
        ret["implicit_surface"] = logits
        ret["implicit_nablas"] = nablas
        ret["alpha"] = opacity_alpha
        ret["visibility_weights"] = visibility_weights
    return ret


def volume_render(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  mcfg: UNISURFCfg, rcfg: UNISURFRenderCfg,
                  key: Optional[jax.Array] = None,
                  interval: Optional[float] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Volume-render rays (reference unisurf.py:64-283). `interval` may be
    passed dynamically (it decays over training, unisurf.py:321)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if interval is None:
        interval = rcfg.interval
    prefix = rays_o.shape[:-1]
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    M = rays_o.shape[0]

    chunk = rcfg.rays_chunk
    if chunk is None or M <= chunk:
        ret = _render_block(params, rays_o, rays_d, key, interval, mcfg, rcfg)
    else:
        n_blocks = -(-M // chunk)
        pad = n_blocks * chunk - M
        ro = jnp.concatenate([rays_o, jnp.broadcast_to(
            rays_o[-1:], (pad, 3))]).reshape(n_blocks, chunk, 3)
        rd = jnp.concatenate([rays_d, jnp.broadcast_to(
            rays_d[-1:], (pad, 3))]).reshape(n_blocks, chunk, 3)
        keys = jax.random.split(key, n_blocks)
        ret = jax.lax.map(
            lambda a: _render_block(params, a[0], a[1], a[2], interval,
                                    mcfg, rcfg), (ro, rd, keys))
        ret = jax.tree_util.tree_map(
            lambda x: x.reshape(n_blocks * chunk, *x.shape[2:])[:M], ret)

    ret = jax.tree_util.tree_map(
        lambda x: x.reshape(*prefix, *x.shape[1:]), ret)
    return ret["rgb"], ret["depth_volume"], ret


@dataclasses.dataclass(frozen=True)
class UnisurfTrainCfg:
    """UNISURF training knobs (reference unisurf.py:303-352 + config)."""
    H: int
    W: int
    N_rays: int = 2048
    w_reg: float = 0.0
    perturb_surface_pts: float = 0.01
    delta_max: float = 1.0
    delta_min: float = 0.05
    delta_beta: float = 1e-5


def unisurf_losses(params: Params, batch: Dict[str, jnp.ndarray],
                   key: jax.Array, it, mcfg: UNISURFCfg,
                   rcfg: UNISURFRenderCfg, tcfg,
                   mesh=None) -> Tuple[jnp.ndarray, Tuple]:
    """UNISURF training losses (reference unisurf.py:303-352): L1 photo +
    normal-smoothness regularization around surface points.

    With a mesh, per-ray tensors shard over the 'data' axis like the
    VolSDF/NeuS loss paths (training.py:_sample_batch_rays) — the TPU
    equivalent of the reference's DataParallel ray split."""
    from nerfart_tpu.ops.rays import get_rays

    k_rays, k_render, k_reg = jax.random.split(key, 3)
    rays_o, rays_d, select_inds = get_rays(
        batch["c2w"], batch["intrinsics"], tcfg.H, tcfg.W,
        N_rays=tcfg.N_rays, key=k_rays)
    target_rgb = jnp.take_along_axis(batch["rgb"], select_inds[..., None],
                                     axis=-2)
    if mesh is not None:
        from nerfart_tpu.parallel.mesh import shard_rays
        rays_o = shard_rays(rays_o, mesh)
        rays_d = shard_rays(rays_d, mesh)
        target_rgb = shard_rays(target_rgb, mesh)
    interval = jnp.maximum(
        tcfg.delta_max * jnp.exp(-jnp.asarray(it, jnp.float32)
                                 * tcfg.delta_beta), tcfg.delta_min)
    rgb, _, extras = volume_render(params, rays_o, rays_d, mcfg, rcfg,
                                   key=k_render, interval=interval)
    losses = {"loss_img": jnp.abs(rgb - target_rgb).mean()}
    if tcfg.w_reg > 0:
        pts = extras["surface_points"]
        _, nab_s, _ = nets.implicit_surface_with_nablas(
            params["implicit_surface"], pts, mcfg.surface)
        neigh = pts + (jax.random.uniform(k_reg, pts.shape) - 0.5) * 2. \
            * tcfg.perturb_surface_pts
        _, nab_n, _ = nets.implicit_surface_with_nablas(
            params["implicit_surface"], neigh, mcfg.surface)

        def nrm(x):
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)

        losses["loss_reg"] = tcfg.w_reg * jnp.mean(
            (nrm(nab_n) - nrm(nab_s)) ** 2)
    else:
        losses["loss_reg"] = jnp.float32(0.0)
    losses["total"] = losses["loss_img"] + losses["loss_reg"]
    aux = {"select_inds": select_inds, "interval": interval}
    return losses["total"], (losses, aux)


def model_cfg_from_config(args) -> UNISURFCfg:
    """UNISURFCfg from a reference-format config (unisurf.py:355-384)."""
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
    return UNISURFCfg(surface=scfg, radiance=rcfg)
