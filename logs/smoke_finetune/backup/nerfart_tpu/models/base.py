"""Networks: ImplicitSurface (SDF), RadianceNet, background NeRF, SIREN.

Functional re-design of the reference networks (reference models/base.py):
parameters are plain pytrees (nested dicts/lists of jnp arrays) and every
forward pass is a pure function — trivially jit/grad/vmap/shard-able, and
the grad-of-grad needed by the eikonal loss (reference base.py:265-282 uses
double backward) is just `jax.vjp` composed under `jax.grad`.

Parameter layout intentionally mirrors PyTorch:
- linear weights are stored [out, in] (torch layout) so checkpoint
  conversion from the reference's .pt files is a pure renaming;
- weight-norm layers store (g [out, 1], v [out, in]) with
  w_eff = g * v / ||v||_row, matching `nn.utils.weight_norm` semantics
  (dim=0), reference base.py:226-227.

Initializations match the reference's distributions:
- geometric sphere init (SAL/IDR-style, reference base.py:207-224);
- SIREN init (w0=30, c=6, reference base.py:93-110);
- torch Linear default (kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in))).
"""
import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.ops.embedder import embed_dim, fourier_embed

Params = Any  # pytree


# --------------------------------------------------------------------------
# linear layers
# --------------------------------------------------------------------------

def effective_weight(p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Materialize the [out, in] weight of a (possibly weight-normed) layer."""
    if "v" in p:
        v = p["v"]
        return p["g"] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return p["w"]


def linear(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    w = effective_weight(p)
    return x @ w.T + p["b"]


def init_torch_linear(key: jax.Array, in_dim: int, out_dim: int) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear default init: U(±1/sqrt(fan_in)) for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def init_siren_linear(key: jax.Array, in_dim: int, out_dim: int,
                      is_first: bool, w0: float = 30.0, c: float = 6.0
                      ) -> Dict[str, jnp.ndarray]:
    """SIREN init (reference base.py:103-110); bias keeps the torch default."""
    kw, kb = jax.random.split(key)
    w_std = (1.0 / in_dim) if is_first else (math.sqrt(c / in_dim) / w0)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), minval=-w_std, maxval=w_std),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def weight_norm_wrap(p: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Reparameterize w -> (g, v) with g = ||w||_row (torch weight_norm init)."""
    w = p.pop("w")
    p["v"] = w
    p["g"] = jnp.linalg.norm(w, axis=1, keepdims=True)
    return p


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 (reference base.py:202: 'beta=100 is important')."""
    return jax.nn.softplus(100.0 * x) / 100.0


# --------------------------------------------------------------------------
# ImplicitSurface
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ImplicitSurfaceCfg:
    W: int = 256
    D: int = 8
    skips: Tuple[int, ...] = (4,)
    W_geo_feat: int = 256
    input_ch: int = 3
    radius_init: float = 1.0
    obj_bounding_size: float = 2.0
    geometric_init: bool = True
    embed_multires: int = 6
    weight_norm: bool = True
    use_siren: bool = False

    @property
    def embedded_ch(self) -> int:
        return embed_dim(self.input_ch, self.embed_multires)


def init_implicit_surface(key: jax.Array, cfg: ImplicitSurfaceCfg) -> Params:
    """Build params for the D+1-layer SDF MLP (reference base.py:176-231)."""
    input_ch = cfg.embedded_ch
    layers: List[Dict[str, jnp.ndarray]] = []
    keys = jax.random.split(key, cfg.D + 1)
    for l in range(cfg.D + 1):
        if l == cfg.D:
            out_dim = 1 + cfg.W_geo_feat if cfg.W_geo_feat > 0 else 1
        elif (l + 1) in cfg.skips:
            out_dim = cfg.W - input_ch
        else:
            out_dim = cfg.W
        in_dim = input_ch if l == 0 else cfg.W

        if l != cfg.D and cfg.use_siren:
            p = init_siren_linear(keys[l], in_dim, out_dim, is_first=(l == 0))
        else:
            p = init_torch_linear(keys[l], in_dim, out_dim)

        if cfg.geometric_init and not cfg.use_siren:
            kg = jax.random.fold_in(keys[l], 1)
            if l == cfg.D:
                w = math.sqrt(math.pi) / math.sqrt(in_dim) + \
                    0.0001 * jax.random.normal(kg, (out_dim, in_dim))
                p = {"w": w, "b": jnp.full((out_dim,), -cfg.radius_init)}
            elif cfg.embed_multires > 0 and l == 0:
                w = jnp.zeros((out_dim, in_dim))
                w = w.at[:, :3].set(
                    math.sqrt(2) / math.sqrt(out_dim)
                    * jax.random.normal(kg, (out_dim, 3)))
                p = {"w": w, "b": jnp.zeros((out_dim,))}
            elif cfg.embed_multires > 0 and l in cfg.skips:
                w = math.sqrt(2) / math.sqrt(out_dim) \
                    * jax.random.normal(kg, (out_dim, in_dim))
                # zero the octave columns; incoming is cat([h, x_embed])
                w = w.at[:, -(input_ch - 3):].set(0.0)
                p = {"w": w, "b": jnp.zeros((out_dim,))}
            else:
                w = math.sqrt(2) / math.sqrt(out_dim) \
                    * jax.random.normal(kg, (out_dim, in_dim))
                p = {"w": w, "b": jnp.zeros((out_dim,))}

        if cfg.weight_norm:
            p = weight_norm_wrap(p)
        layers.append(p)
    return {"layers": layers}


def implicit_surface_fwd(params: Params, x: jnp.ndarray, cfg: ImplicitSurfaceCfg,
                         return_h: bool = True):
    """SDF forward (reference base.py:243-263). x [..., 3] -> sdf [...], h."""
    xe = fourier_embed(x, cfg.embed_multires)
    h = xe
    for i in range(cfg.D):
        if i in cfg.skips:
            h = jnp.concatenate([h, xe], axis=-1) / math.sqrt(2)
        z = linear(params["layers"][i], h)
        h = jnp.sin(30.0 * z) if cfg.use_siren else softplus100(z)
    out = linear(params["layers"][cfg.D], h)
    if cfg.W_geo_feat > 0:
        # IDR-like: feature = tail of the output (base.py:255-257)
        sdf, h_out = out[..., 0], out[..., 1:]
    else:
        # nerf-like (W_geo_feat == -1): feature = last hidden activation
        sdf, h_out = out[..., 0], h
    return (sdf, h_out) if return_h else sdf


def implicit_surface_with_nablas(params: Params, x: jnp.ndarray,
                                 cfg: ImplicitSurfaceCfg):
    """(sdf, nabla, h) with nabla = dSDF/dx via reverse-mode (base.py:265-282).

    One vjp call per batch replaces torch's double-backward machinery; the
    returned nabla is itself differentiable, so eikonal-loss training
    (grad of grad) works under a single outer `jax.grad`.
    """
    def f(xi):
        return implicit_surface_fwd(params, xi, cfg, return_h=True)

    (sdf, h), vjp_fn = jax.vjp(f, x)
    nabla = vjp_fn((jnp.ones_like(sdf), jnp.zeros_like(h)))[0]
    return sdf, nabla, h


# --------------------------------------------------------------------------
# RadianceNet
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RadianceNetCfg:
    D: int = 4
    W: int = 256
    skips: Tuple[int, ...] = ()
    W_geo_feat: int = 256
    embed_multires: int = 6
    embed_multires_view: int = 4
    use_view_dirs: bool = True
    weight_norm: bool = True
    use_siren: bool = False

    @property
    def in_dim_0(self) -> int:
        pts = embed_dim(3, self.embed_multires)
        if self.use_view_dirs:
            return pts + embed_dim(3, self.embed_multires_view) + 3 + self.W_geo_feat
        return pts + self.W_geo_feat


def init_radiance_net(key: jax.Array, cfg: RadianceNetCfg) -> Params:
    """D+1-layer radiance MLP (reference base.py:340-370)."""
    layers: List[Dict[str, jnp.ndarray]] = []
    keys = jax.random.split(key, cfg.D + 1)
    for l in range(cfg.D + 1):
        out_dim = 3 if l == cfg.D else cfg.W
        if l == 0:
            in_dim = cfg.in_dim_0
        elif l in cfg.skips:
            in_dim = cfg.in_dim_0 + cfg.W
        else:
            in_dim = cfg.W
        if l != cfg.D and cfg.use_siren:
            p = init_siren_linear(keys[l], in_dim, out_dim, is_first=(l == 0))
        else:
            p = init_torch_linear(keys[l], in_dim, out_dim)
        if cfg.weight_norm:
            p = weight_norm_wrap(p)
        layers.append(p)
    return {"layers": layers}


def radiance_net_fwd(params: Params, x: jnp.ndarray,
                     view_dirs: Optional[jnp.ndarray],
                     normals: Optional[jnp.ndarray],
                     geometry_feature: jnp.ndarray,
                     cfg: RadianceNetCfg) -> jnp.ndarray:
    """Radiance forward (reference base.py:372-391). Returns rgb [..., 3]."""
    xe = fourier_embed(x, cfg.embed_multires)
    if cfg.use_view_dirs:
        ve = fourier_embed(view_dirs, cfg.embed_multires_view)
        radiance_input = jnp.concatenate([xe, ve, normals, geometry_feature], axis=-1)
    else:
        radiance_input = jnp.concatenate([xe, geometry_feature], axis=-1)
    h = radiance_input
    for i in range(cfg.D + 1):
        if i in cfg.skips:
            h = jnp.concatenate([h, radiance_input], axis=-1)
        z = linear(params["layers"][i], h)
        if i == cfg.D:
            h = jax.nn.sigmoid(z)
        elif cfg.use_siren:
            h = jnp.sin(30.0 * z)
        else:
            h = jax.nn.relu(z)
    return h


# --------------------------------------------------------------------------
# background NeRF (NeRF++ outside-sphere model)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NeRFCfg:
    D: int = 8
    W: int = 256
    input_ch: int = 3
    input_ch_view: int = 3
    multires: int = -1
    multires_view: int = -1
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_view_dirs: bool = False


def init_nerf(key: jax.Array, cfg: NeRFCfg) -> Params:
    """Vanilla NeRF MLP (reference base.py:395-424)."""
    input_ch = embed_dim(cfg.input_ch, cfg.multires)
    input_ch_view = embed_dim(cfg.input_ch_view, cfg.multires_view)
    keys = jax.random.split(key, cfg.D + 5)
    pts = [init_torch_linear(keys[0], input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        in_dim = cfg.W + input_ch if i in cfg.skips else cfg.W
        pts.append(init_torch_linear(keys[i + 1], in_dim, cfg.W))
    params = {
        "pts": pts,
        "views": [init_torch_linear(keys[cfg.D], input_ch_view + cfg.W, cfg.W // 2)],
    }
    if cfg.use_view_dirs:
        params["feature"] = init_torch_linear(keys[cfg.D + 1], cfg.W, cfg.W)
        params["alpha"] = init_torch_linear(keys[cfg.D + 2], cfg.W, 1)
        params["rgb"] = init_torch_linear(keys[cfg.D + 3], cfg.W // 2, 3)
    else:
        params["output"] = init_torch_linear(keys[cfg.D + 4], cfg.W, cfg.output_ch)
    return params


def nerf_fwd(params: Params, input_pts: jnp.ndarray,
             input_views: Optional[jnp.ndarray], cfg: NeRFCfg
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma [...], rgb [..., 3]) (reference base.py:426-453)."""
    pe = fourier_embed(input_pts, cfg.multires)
    h = pe
    for i, p in enumerate(params["pts"]):
        h = jax.nn.relu(linear(p, h))
        if i in cfg.skips:
            h = jnp.concatenate([pe, h], axis=-1)
    if cfg.use_view_dirs:
        ve = fourier_embed(input_views, cfg.multires_view)
        sigma = linear(params["alpha"], h)
        feature = linear(params["feature"], h)
        h = jnp.concatenate([feature, ve], axis=-1)
        for p in params["views"]:
            h = jax.nn.relu(linear(p, h))
        rgb = linear(params["rgb"], h)
    else:
        outputs = linear(params["output"], h)
        rgb, sigma = outputs[..., :3], outputs[..., 3:]
    return sigma.squeeze(-1), jax.nn.sigmoid(rgb)


# --------------------------------------------------------------------------
# ScalarField (reference base.py:456-483; unused in the main path, kept
# for capability parity)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ScalarFieldCfg:
    input_ch: int = 3
    W: int = 128
    D: int = 4
    skips: Tuple[int, ...] = ()
    init_val: float = -2.0


def init_scalar_field(key: jax.Array, cfg: ScalarFieldCfg) -> Params:
    keys = jax.random.split(key, cfg.D + 1)

    def kaiming(k, in_dim, out_dim):
        # kaiming_uniform(a=0, fan_in, relu): bound = sqrt(6 / fan_in)
        bound = math.sqrt(6.0 / in_dim)
        return {"w": jax.random.uniform(k, (out_dim, in_dim),
                                        minval=-bound, maxval=bound),
                "b": jnp.zeros((out_dim,))}

    pts = [kaiming(keys[0], cfg.input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        in_dim = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts.append(kaiming(keys[i + 1], in_dim, cfg.W))
    out = {"w": jnp.zeros((1, cfg.W)), "b": jnp.full((1,), cfg.init_val)}
    return {"pts": pts, "output": out}


def scalar_field_fwd(params: Params, x: jnp.ndarray, cfg: ScalarFieldCfg) -> jnp.ndarray:
    h = x
    for i, p in enumerate(params["pts"]):
        h = jax.nn.relu(linear(p, h))
        if i in cfg.skips:
            h = jnp.concatenate([x, h], axis=-1)
    return linear(params["output"], h).squeeze(-1)


# --------------------------------------------------------------------------
# SIREN-SDF sphere pretraining (reference base.py:284-310)
# --------------------------------------------------------------------------

def pretrain_siren_sdf(params: Params, cfg: ImplicitSurfaceCfg, key: jax.Array,
                       num_iters: int = 5000, lr: float = 1.0e-4,
                       batch_points: int = 5000, target_radius: float = 0.5,
                       obj_bounding_size: float = 3.0, log_every: int = 0):
    """Overfit the SIREN SDF to a sphere before training (base.py:284-310).

    Returns updated params. Runs as one jitted lax.scan over iterations.
    """
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, pts, sdf_gt):
        sdf_pred = implicit_surface_fwd(p, pts, cfg, return_h=False)
        return jnp.abs(sdf_pred - sdf_gt).mean()

    @jax.jit
    def step(carry, k):
        p, s = carry
        pts = jax.random.uniform(k, (batch_points, 3),
                                 minval=-obj_bounding_size,
                                 maxval=obj_bounding_size)
        sdf_gt = jnp.linalg.norm(pts, axis=-1) - target_radius
        loss, grads = jax.value_and_grad(loss_fn)(p, pts, sdf_gt)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    keys = jax.random.split(key, num_iters)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, losses


# --------------------------------------------------------------------------
# LR schedules (reference base.py:524-584)
# --------------------------------------------------------------------------

def cosine_warmup_schedule_factor(step, total_steps, warmup_steps, min_factor=0.1):
    """Warmup-cosine LR factor (reference base.py:524-535). jnp-traceable."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / warmup_steps
    cos = (jnp.cos(jnp.pi * ((step - warmup_steps) / (total_steps - warmup_steps)))
           + 1.0) * 0.5 * (1 - min_factor) + min_factor
    return jnp.where(step < warmup_steps, warm, cos)


def exponential_schedule_factor(step, total_steps, min_factor=0.1):
    """Exponential-decay LR factor (reference base.py:538-544). jnp-traceable."""
    t = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
    return jnp.exp(t * jnp.log(min_factor))


def make_schedule(scheduler_cfg: dict, base_lr: float, num_iters: int):
    """optax-compatible schedule from the reference's config section
    (reference base.py:547-584). Supported: multistep / warmupcosine /
    exponential_step."""
    stype = scheduler_cfg["type"]
    if stype == "multistep":
        milestones = list(scheduler_cfg["milestones"])
        gamma = float(scheduler_cfg.get("gamma", 0.1))

        def sched(step):
            n = sum(jnp.asarray(step) >= m for m in milestones)
            return base_lr * gamma ** n
        return sched
    if stype == "warmupcosine":
        warmup = int(scheduler_cfg["warmup_steps"])
        mf = float(scheduler_cfg.get("min_factor", 0.1))
        return lambda step: base_lr * cosine_warmup_schedule_factor(
            step, num_iters, warmup, mf)
    if stype == "exponential_step":
        mf = float(scheduler_cfg.get("min_factor", 0.1))
        return lambda step: base_lr * exponential_schedule_factor(
            step, num_iters, mf)
    raise NotImplementedError(f"scheduler type {stype!r}")
