"""VolSDF framework: Laplace-density SDF volume rendering.

TPU-first redesign of the reference framework (reference
models/frameworks/volsdf.py):

- `volume_render` is ONE pure jit-compiled function over a megabatch of
  rays. The reference's host-side `rayschunk` loop (volsdf.py:599-610, a
  memory-scaling workaround) becomes `lax.map` over fixed-size ray blocks
  *inside* the compiled program — one dispatch, overlap managed by XLA.
- The error-bounded sampler runs as the fixed-shape unrolled algorithm in
  `ops/volsdf_math.fine_sample` (no data-dependent shapes).
- `batchify_query`/netchunk (reference utils/train_util.py:23-75) has no
  equivalent: XLA tiles the MLP matmuls itself.

Model parameters are a pytree: {'ln_beta', 'implicit_surface',
'radiance_net'[, 'nerf_outside']} matching the reference state_dict modulo
naming (see utils/torch_convert.py).
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models import base as nets
from nerfart_tpu.ops import compositing, rays as ray_ops, volsdf_math

Params = Any


@dataclasses.dataclass(frozen=True)
class VolSDFCfg:
    """Model hyperparameters (reference volsdf.py:304-335, get_model :943-994)."""
    beta_init: float = 0.1
    speed_factor: float = 1.0
    obj_bounding_radius: float = 3.0
    use_nerfplusplus: bool = False
    surface: nets.ImplicitSurfaceCfg = nets.ImplicitSurfaceCfg()
    radiance: nets.RadianceNetCfg = nets.RadianceNetCfg()

    @property
    def use_sphere_bg(self) -> bool:
        return not self.use_nerfplusplus


def init_volsdf(key: jax.Array, cfg: VolSDFCfg) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {
        "ln_beta": jnp.asarray(
            [np.log(cfg.beta_init) / cfg.speed_factor], jnp.float32),
        "implicit_surface": nets.init_implicit_surface(k1, cfg.surface),
        "radiance_net": nets.init_radiance_net(k2, cfg.radiance),
    }
    if cfg.use_nerfplusplus:
        params["nerf_outside"] = nets.init_nerf(
            k3, nets.NeRFCfg(input_ch=4, multires=10, multires_view=4,
                             use_view_dirs=True))
    return params


def forward_ab(params: Params, cfg: VolSDFCfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha, beta) = (1/beta, exp(ln_beta * speed_factor)) (volsdf.py:337-339)."""
    beta = jnp.exp(params["ln_beta"][0] * cfg.speed_factor)
    return 1.0 / beta, beta


def forward_surface(params: Params, x: jnp.ndarray, cfg: VolSDFCfg):
    """SDF with the sphere-background clamp (volsdf.py:341-347).

    Returns (sdf, h). With builtin background: sdf = min(net, R - |x|).
    """
    sdf, h = nets.implicit_surface_fwd(params["implicit_surface"], x, cfg.surface)
    if cfg.use_sphere_bg:
        sdf = jnp.minimum(sdf, cfg.obj_bounding_radius
                          - jnp.linalg.norm(x, axis=-1))
    return sdf, h


def forward_surface_with_nablas(params: Params, x: jnp.ndarray, cfg: VolSDFCfg):
    """(sdf, nablas, h) with the sphere clamp applied to sdf only — the
    nablas deliberately stay the network's (volsdf.py:349-357, the commented
    'ensure more eikonal constraints' choice)."""
    sdf, nablas, h = nets.implicit_surface_with_nablas(
        params["implicit_surface"], x, cfg.surface)
    if cfg.use_sphere_bg:
        d_bg = cfg.obj_bounding_radius - jnp.linalg.norm(x, axis=-1)
        sdf = jnp.where(d_bg < sdf, d_bg, sdf)
    return sdf, nablas, h


def forward(params: Params, x: jnp.ndarray, view_dirs: Optional[jnp.ndarray],
            cfg: VolSDFCfg, return_nablas: bool = True):
    """(radiances, sdf[, nablas]) (volsdf.py:359-370).

    Internally flattens [..., 3] batch dims to one: on TPU, rank-3
    activations ([rays, pts, W]) make XLA's layout assignment disagree
    between the tower's forward matmuls and the nablas-vjp transposed
    matmuls, inserting {0,1,2}<->{2,1,0} relayout copies that measured
    38.5% of the dense frame (PERF.md round-5 trace). Rank-2 [N, W]
    activations have a single row-major layout, so the copies vanish.
    The reshape itself is value-exact.
    """
    lead = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    if view_dirs is not None:
        view_dirs = view_dirs.reshape(-1, view_dirs.shape[-1])
    if not return_nablas and view_dirs is None:
        sdf, h = forward_surface(params, x, cfg)
        radiances = nets.radiance_net_fwd(
            params["radiance_net"], x, None, None, h, cfg.radiance)
        return radiances.reshape(*lead, -1), sdf.reshape(lead)
    sdf, nablas, h = forward_surface_with_nablas(params, x, cfg)
    radiances = nets.radiance_net_fwd(
        params["radiance_net"], x, view_dirs, nablas, h, cfg.radiance)
    return (radiances.reshape(*lead, -1), sdf.reshape(lead),
            nablas.reshape(*lead, -1))


@dataclasses.dataclass(frozen=True)
class VolSDFRenderCfg:
    """Render algorithm config (reference volume_render kwargs,
    volsdf.py:389-423). Static/hashable: becomes part of the jit cache key."""
    near: float = 0.0
    far: float = 6.0
    obj_bounding_radius: float = 3.0
    use_view_dirs: bool = True
    use_nerfplusplus: bool = False
    white_bkgd: bool = False
    calc_normal: bool = True
    require_nablas: bool = False
    detailed_output: bool = True
    perturb: bool = False
    N_samples: int = 128
    N_importance: int = 64
    N_outside: int = 32
    max_upsample_steps: int = 5
    max_bisection_steps: int = 10
    epsilon: float = 0.1
    # TPU ray-block size for lax.map chunking of big renders (replaces the
    # reference's host-side rayschunk loop). None = single block.
    rays_chunk: Optional[int] = None
    # dtype for the no-grad sampler MLP queries; bf16 doubles sampler MXU
    # throughput at negligible sample-placement error (opt-in).
    sampler_dtype: str = "float32"
    # dtype for the FINAL forward pass (SDF + radiance + vjp nablas over the
    # composited samples). f32 activations make XLA wrap every MXU matmul in
    # f32<->bf16 relayout copies (profiled at ~20% of the reference-budget
    # frame, PERF.md round 3); bf16 keeps the whole pass MXU-resident.
    # Compositing (sigma, transmittance cumsums, rgb integration) stays f32.
    # Opt-in for eval/bench; training keeps the f32 default.
    render_dtype: str = "float32"
    # beta-bisection cumsum implementation: 'exact' (jnp.cumsum),
    # 'matmul' (one-pass x @ triu(ones) on the MXU — PSNR-gated in
    # QUALITY.md r4), or 'env' (read NERFART_BISECT_CUMSUM at call time,
    # the bench children's knob). Part of the jit cache key.
    bisect_cumsum: str = "env"
    # Uniform-only dense mode: composite exactly the N_samples uniform
    # coarse points and skip the sampler entirely (no 4x-dense init SDF
    # queries, no opacity-CDF importance — N_importance is ignored).
    # Dense mode (max_upsample_steps=0) already skips the refinement
    # loop but still pays 512 init queries + a final
    # opacity_invert_cdf_sample for its 64 importance points; this mode
    # trades those for more uniform points at ~2.65 MFLOP each vs
    # ~1.06 MFLOP per init query. A quality-vs-speed trade, NOT an
    # equivalence — only legal as a bench/render default behind a PSNR
    # gate on trained checkpoints (QUALITY.md round 5).
    dense_direct: bool = False
    # rematerialize each ray block in the backward pass (jax.checkpoint):
    # residuals live only for the block being differentiated, so training
    # memory scales with rays_chunk instead of the full batch (enables
    # N_rays > 2048 on one v5e; the r2 ablation measured 23.9 GB demand
    # at N_rays 4096 without it).
    remat: bool = False


def _render_block(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  key: jax.Array, mcfg: VolSDFCfg, rcfg: VolSDFRenderCfg
                  ) -> Dict[str, jnp.ndarray]:
    """Render one block of rays [N, 3] -> dict of per-ray outputs."""
    N_rays = rays_o.shape[-2]
    nears = jnp.full((N_rays, 1), rcfg.near, rays_o.dtype)
    if rcfg.use_nerfplusplus:
        _, fars, _ = ray_ops.get_sphere_intersection(
            rays_o, rays_d, r=rcfg.obj_bounding_radius)
    else:
        fars = jnp.full((N_rays, 1), rcfg.far, rays_o.dtype)

    alpha, beta = forward_ab(params, mcfg)
    k_fine, k_out = jax.random.split(key)

    # coarse samples (volsdf.py:472-474)
    _t = jnp.linspace(0.0, 1.0, rcfg.N_samples, dtype=rays_o.dtype)
    d_coarse = nears * (1 - _t) + fars * _t

    # dense init for the sampler (volsdf.py:483-484: 4x denser init)
    _t = jnp.linspace(0.0, 1.0, rcfg.N_samples * 4, dtype=rays_o.dtype)
    d_init = nears * (1 - _t) + fars * _t

    sampler_dtype = jnp.dtype(rcfg.sampler_dtype)

    if sampler_dtype != rays_o.dtype:
        # cast the params too: with f32 weights the bf16 input promotes
        # straight back to f32 after layer 1, leaving the whole sampler
        # MLP running f32 activations (profiled: the [R, 512, 256]
        # softplus chains are VPU-bandwidth-bound, so bf16 activations
        # halve their traffic). XLA hoists the loop-invariant cast out
        # of the rays_chunk loop.
        params_s = jax.tree_util.tree_map(
            lambda a: a.astype(sampler_dtype), params)
    else:
        params_s = params

    def sdf_fn(pts):
        if sampler_dtype != pts.dtype:
            pts = pts.astype(sampler_dtype)
        sdf, _ = forward_surface(params_s, pts, mcfg)
        return sdf.astype(rays_o.dtype)

    if rcfg.dense_direct:
        # uniform-only dense: d_all is the coarse grid itself; report the
        # network beta and iter_usage=-1 for the val heat maps.
        d_fine = jnp.zeros((*d_coarse.shape[:-1], 0), d_coarse.dtype)
        beta_map = jnp.broadcast_to(
            jnp.asarray(beta, d_coarse.dtype), (*d_coarse.shape[:-1], 1))
        iter_usage = jnp.full(d_coarse.shape[:-1], -1.0, d_coarse.dtype)
    else:
        d_fine, beta_map, iter_usage = volsdf_math.fine_sample(
            sdf_fn, d_init, rays_o, rays_d,
            alpha_net=jax.lax.stop_gradient(alpha),
            beta_net=jax.lax.stop_gradient(beta),
            far=fars,
            eps=rcfg.epsilon, max_iter=rcfg.max_upsample_steps,
            max_bisection=rcfg.max_bisection_steps,
            final_N_importance=rcfg.N_importance,
            N_up=rcfg.N_samples * 4,
            perturb=rcfg.perturb, key=k_fine,
            bisect_cumsum=rcfg.bisect_cumsum)

    # coarse+fine concat ('not per paper but needed', volsdf.py:497-503)
    d_all = jnp.sort(jnp.concatenate([d_coarse, d_fine], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * d_all[..., :, None]

    # a view-dir radiance net requires view dirs (same coupling crashes in
    # the reference's concat, base.py:382); fail with a clear message
    assert rcfg.use_view_dirs or not mcfg.radiance.use_view_dirs, \
        "render use_view_dirs=False but the radiance net was built with " \
        "use_view_dirs=True"
    view_dirs = rays_d if rcfg.use_view_dirs else None
    if rcfg.use_view_dirs:
        vexp = jnp.broadcast_to(view_dirs[..., None, :], pts.shape)
    else:
        vexp = None

    render_dtype = jnp.dtype(rcfg.render_dtype)
    if render_dtype != rays_o.dtype:
        # bf16-resident final pass: cast params once (hoisted out of the
        # rays_chunk lax.map by XLA) and feed bf16 points/view-dirs, so the
        # 12-layer MLP stack and its nablas vjp never relayout to f32.
        params_r = jax.tree_util.tree_map(
            lambda a: a.astype(render_dtype), params)
        pts_f = pts.astype(render_dtype)
        vexp_f = vexp.astype(render_dtype) if vexp is not None else None
    else:
        params_r, pts_f, vexp_f = params, pts, vexp

    nablas = None
    if rcfg.require_nablas or rcfg.use_view_dirs:
        radiances, sdf, nablas = forward(params_r, pts_f, vexp_f, mcfg,
                                         return_nablas=True)
        nablas = nablas.astype(rays_o.dtype)
    else:
        radiances, sdf = forward(params_r, pts_f, None, mcfg,
                                 return_nablas=False)
    radiances = radiances.astype(rays_o.dtype)
    sdf = sdf.astype(rays_o.dtype)

    sigma = volsdf_math.sdf_to_sigma(sdf, alpha, beta)

    if rcfg.use_nerfplusplus:
        # inverse-radius background samples (volsdf.py:518-537)
        _t = jnp.linspace(0.0, 1.0, rcfg.N_outside + 2,
                          dtype=rays_o.dtype)[1:-1]
        rs = rcfg.obj_bounding_radius / jnp.flip(_t, axis=-1)
        rs = jnp.broadcast_to(rs, (*rays_o.shape[:-1], rcfg.N_outside))
        if rcfg.perturb:
            mids = 0.5 * (rs[..., 1:] + rs[..., :-1])
            upper = jnp.concatenate([mids, rs[..., -1:]], axis=-1)
            lower = jnp.concatenate([rs[..., :1], mids], axis=-1)
            t_rand = jax.random.uniform(k_out, upper.shape, dtype=rs.dtype)
            rs = lower + (upper - lower) * t_rand
        d_out = ray_ops.get_dvals_from_radius(rays_o, rays_d, rs)
        pts_out = rays_o[..., None, :] + rays_d[..., None, :] * d_out[..., :, None]
        x_out = jnp.concatenate(
            [pts_out / rs[..., None], 1.0 / rs[..., None]], axis=-1)
        v_out = (jnp.broadcast_to(view_dirs[..., None, :], pts_out.shape)
                 if rcfg.use_view_dirs else None)
        sigma_out, radiance_out = nets.nerf_fwd(
            params["nerf_outside"], x_out, v_out,
            nets.NeRFCfg(input_ch=4, multires=10, multires_view=4,
                         use_view_dirs=True))
        d_all = jnp.concatenate([d_all, d_out], axis=-1)
        sigma = jnp.concatenate([sigma, sigma_out], axis=-1)
        radiances = jnp.concatenate([radiances, radiance_out], axis=-2)

    rgb_map, depth_map, acc_map, cex = compositing.volsdf_integrate(
        d_all, sigma, radiances)
    if rcfg.white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    ret = {
        "rgb": rgb_map,
        "depth_volume": depth_map,
        "mask_volume": acc_map,
    }
    if rcfg.calc_normal and nablas is not None:
        ret["normals_volume"] = compositing.weighted_normal_map(
            nablas, cex["visibility_weights"])
    if rcfg.detailed_output:
        ret["implicit_surface"] = sdf
        if nablas is not None:
            ret["implicit_nablas"] = nablas
        ret["radiance"] = radiances
        ret["alpha"] = cex["alpha"]
        ret["p_i"] = cex["p_i"]
        ret["visibility_weights"] = cex["visibility_weights"]
        ret["d_vals"] = d_all
        ret["sigma"] = sigma
        ret["beta_map"] = beta_map
        ret["iter_usage"] = iter_usage
        if rcfg.use_nerfplusplus:
            ret["sigma_out"] = sigma_out
            ret["radiance_out"] = radiance_out
    return ret


def volume_render(params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  mcfg: VolSDFCfg, rcfg: VolSDFRenderCfg,
                  key: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Volume-render rays (reference volsdf.py:389-615).

    rays_o/rays_d: [..., N_rays, 3] (rays_d unnormalized). Returns
    (rgb [..., N, 3], depth [..., N], extras dict). Pure function — wrap in
    jax.jit with mcfg/rcfg static.
    """
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


def render_kwargs_from_config(args) -> Dict[str, Any]:
    """Build (train, test) VolSDFRenderCfg kwargs from a reference-format
    config (reference volsdf.py:977-991)."""
    train = dict(
        near=float(args["data"]["near"]),
        far=float(args["data"]["far"]),
        perturb=bool(args["model"].get("perturb", True)),
        white_bkgd=bool(args["model"].get("white_bkgd", False)),
        max_upsample_steps=int(args["model"].get("max_upsample_iter", 5)),
        use_nerfplusplus=args["model"].get("outside_scene", "builtin") == "nerf++",
        obj_bounding_radius=float(args["model"]["obj_bounding_radius"]),
        # TPU perf knobs, settable from YAML / `--model:key v` overrides
        sampler_dtype=str(args["model"].get("sampler_dtype", "float32")),
        render_dtype=str(args["model"].get("render_dtype", "float32")),
        bisect_cumsum=str(args["model"].get("bisect_cumsum", "env")),
        dense_direct=bool(args["model"].get("dense_direct", False)),
        rays_chunk=(int(args["model"]["rays_chunk"])
                    if args["model"].get("rays_chunk") else None),
    )
    # optional sampling-budget overrides (reference leaves these at the
    # volume_render defaults; mapped only when present so the shipped
    # reference configs keep exact parity)
    for k in ("N_samples", "N_importance", "N_outside",
              "max_bisection_steps", "epsilon"):
        if k in args["model"]:
            train[k] = type(VolSDFRenderCfg.__dataclass_fields__[
                k].default)(args["model"][k])
    test = dict(train)
    test["perturb"] = False
    return train, test


def model_cfg_from_config(args) -> VolSDFCfg:
    """VolSDFCfg from a reference-format config dict (volsdf.py:943-975)."""
    model = args["model"]
    surface = model.get("surface", {})
    radiance = model.get("radiance", {})
    use_siren = bool(model.get("use_siren", False))
    scfg = nets.ImplicitSurfaceCfg(
        W=int(surface.get("W", 256)),
        D=int(surface.get("D", 8)),
        skips=tuple(surface.get("skips", [4])),
        W_geo_feat=int(model.get("W_geometry_feature", 256)),
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
        W_geo_feat=int(model.get("W_geometry_feature", 256))
        if int(model.get("W_geometry_feature", 256)) > 0 else scfg.W,
        embed_multires=int(radiance.get("embed_multires", -1)),
        embed_multires_view=int(radiance.get("embed_multires_view", -1)),
        use_view_dirs=bool(radiance.get("use_view_dirs", True)),
        use_siren=bool(radiance.get("use_siren", use_siren)),
    )
    return VolSDFCfg(
        beta_init=float(args["training"].get("beta_init", 0.1)),
        speed_factor=float(args["training"].get("speed_factor", 1.0)),
        obj_bounding_radius=float(model["obj_bounding_radius"]),
        use_nerfplusplus=model.get("outside_scene", "builtin") == "nerf++",
        surface=scfg,
        radiance=rcfg,
    )
