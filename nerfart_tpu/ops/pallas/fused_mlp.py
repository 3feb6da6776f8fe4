"""Pallas TPU kernel: fused SDF-MLP forward for the sampler hot path.

The error-bounded sampler (ops/volsdf_math.fine_sample) evaluates the SDF
MLP on up to N_init + max_iter*N_up samples per ray with NO gradient — by
far the dominant FLOP share of a render (SURVEY.md §3.1 hot loop). Under
plain XLA each of the D+1 layer matmuls round-trips its [M, W] activation
through HBM; this kernel keeps the whole network resident in VMEM
(~2 MB for the standard D=8/W=256 net) and streams point tiles through
all layers back-to-back on the MXU, so HBM traffic drops to the input
points + one output row per point.

Skip connections are algebraic, not concatenations:
    cat([h, xe]) / sqrt(2) @ W  ==  (h @ W_h + xe @ W_x) / sqrt(2)
which keeps every matmul dense and layout-trivial (reference semantics:
models/base.py:243-253).

Supports f32 and bf16 compute (bf16 weights/activations, f32 accumulation
and f32 softplus) — the sampler only places samples, so bf16 is typically
quality-neutral while doubling MXU throughput.
"""
import functools
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfart_tpu.models.base import ImplicitSurfaceCfg, effective_weight


def _softplus100_f32(z):
    z = z.astype(jnp.float32)
    return jax.nn.softplus(100.0 * z) / 100.0


def prepare_weights(params: Any, cfg: ImplicitSurfaceCfg, dtype=jnp.float32):
    """Materialize weight-normed layers into [in, out] matrices, splitting
    skip layers into (W_h, W_x) pairs. Returns a flat list of arrays in the
    order the kernel consumes them."""
    embedded = cfg.embedded_ch
    flats = []
    for i, layer in enumerate(params["layers"]):
        w = effective_weight(layer).T  # [in, out]
        b = layer["b"]
        b2 = b.reshape(1, -1).astype(jnp.float32)  # 2-D for TPU tiling
        if i in cfg.skips:
            # incoming is cat([h, xe]); split rows
            flats += [w[:-embedded].astype(dtype), w[-embedded:].astype(dtype),
                      b2]
        else:
            flats += [w.astype(dtype), b2]
    return flats


def _make_kernel(cfg: ImplicitSurfaceCfg, tile_m: int, compute_dtype):
    D = cfg.D
    skips = set(cfg.skips)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(xe_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        xe = xe_ref[:].astype(compute_dtype)
        h = xe
        wi = 0
        for i in range(D + 1):
            if i in skips:
                w_h = wrefs[wi][:]
                w_x = wrefs[wi + 1][:]
                b = wrefs[wi + 2][:]
                wi += 3
                z = (jnp.dot(h, w_h, preferred_element_type=jnp.float32)
                     + jnp.dot(xe, w_x, preferred_element_type=jnp.float32))
                z = z * inv_sqrt2 + b
            else:
                w = wrefs[wi][:]
                b = wrefs[wi + 1][:]
                wi += 2
                z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < D:
                h = _softplus100_f32(z).astype(compute_dtype)
            else:
                out_ref[:] = z.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "tile_m", "compute"))
def fused_sdf_forward(weights_flat: Tuple[jnp.ndarray, ...],
                      xe: jnp.ndarray, cfg: ImplicitSurfaceCfg,
                      tile_m: int = 1024,
                      compute: str = "float32") -> jnp.ndarray:
    """xe [M, embedded_ch] (already frequency-encoded) -> raw final-layer
    output [M, out_dim] (sdf at column 0, geometry feature after).

    M is padded internally to a tile multiple.
    """
    compute_dtype = jnp.dtype(compute)
    M = xe.shape[0]
    out_dim = 1 + cfg.W_geo_feat if cfg.W_geo_feat > 0 else 1
    n_tiles = -(-M // tile_m)
    Mp = n_tiles * tile_m
    if Mp != M:
        xe = jnp.pad(xe, ((0, Mp - M), (0, 0)))

    kernel = _make_kernel(cfg, tile_m, compute_dtype)
    in_specs = [pl.BlockSpec((tile_m, xe.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    # weights/biases: full 2-D arrays, same block for every tile
    for w in weights_flat:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, out_dim), jnp.float32),
    )(xe, *weights_flat)
    return out[:M]


def fused_implicit_surface_fwd(params: Any, x: jnp.ndarray,
                               cfg: ImplicitSurfaceCfg,
                               compute: str = "float32",
                               tile_m: int = 1024):
    """Drop-in fused replacement for models.base.implicit_surface_fwd
    (forward only — use in no-grad sampler paths).

    x [..., 3] -> (sdf [...], h [..., W_geo_feat])."""
    from nerfart_tpu.ops.embedder import fourier_embed

    assert not cfg.use_siren, "fused kernel covers the softplus MLP"
    prefix = x.shape[:-1]
    xe = fourier_embed(x.reshape(-1, 3), cfg.embed_multires)
    weights = prepare_weights(params, cfg, jnp.dtype(compute))
    out = fused_sdf_forward(tuple(weights), xe, cfg, tile_m=tile_m,
                            compute=compute)
    sdf = out[..., 0].reshape(prefix)
    if cfg.W_geo_feat > 0:
        return sdf, out[..., 1:].reshape(*prefix, cfg.W_geo_feat)
    return sdf, None
