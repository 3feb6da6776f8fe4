"""NeuS math: logistic-CDF alpha and iterative importance upsampling.

Semantics follow the reference (reference models/frameworks/neus.py:29-78
and the `official_solution` upsampler neus.py:275-303). The reference's
4-iteration Python loop already has statically growing shapes, so it maps
directly to an unrolled jit-friendly loop here.
"""
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfart_tpu.ops.compositing import alpha_to_w
from nerfart_tpu.ops.sampling import sample_pdf


def cdf_Phi_s(x: jnp.ndarray, s) -> jnp.ndarray:
    """Logistic CDF Phi_s(x) = sigmoid(s*x) (neus.py:29-33)."""
    return jax.nn.sigmoid(x * s)


def sdf_to_alpha(sdf: jnp.ndarray, s) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Section-wise opacity from SDF at section endpoints (neus.py:36-43).

    sdf [..., N] -> (cdf [..., N], alpha [..., N-1]).
    """
    cdf = cdf_Phi_s(sdf, s)
    opacity_alpha = (cdf[..., :-1] - cdf[..., 1:]) / (cdf[..., :-1] + 1e-10)
    return cdf, jnp.clip(opacity_alpha, a_min=0.0)


def sdf_to_w(sdf: jnp.ndarray, s) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(cdf, alpha, visibility weights) from SDF (neus.py:46-62)."""
    cdf, opacity_alpha = sdf_to_alpha(sdf, s)
    return cdf, opacity_alpha, alpha_to_w(opacity_alpha)


def neus_upsample(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    d_coarse: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    N_importance: int = 64,
    N_upsample_iters: int = 4,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """NeuS 'official_solution' iterative upsampling (neus.py:275-303).

    Estimates section mid-point SDFs via the more conservative of the
    forward/backward slopes, converts to alpha with a doubling sharpness
    64*2^i, and importance-samples N_importance//iters new points per
    iteration. Returns sorted d_all [..., N_coarse + N_importance].
    """
    def query_sdf(d):
        pts = rays_o[..., None, :] + rays_d[..., None, :] * d[..., :, None]
        return jax.lax.stop_gradient(sdf_fn(pts))

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N_upsample_iters)

    _d = d_coarse
    _sdf = query_sdf(_d)
    for i in range(N_upsample_iters):
        prev_sdf, next_sdf = _sdf[..., :-1], _sdf[..., 1:]
        prev_z, next_z = _d[..., :-1], _d[..., 1:]
        mid_sdf = (prev_sdf + next_sdf) * 0.5
        dot_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
        prev_dot = jnp.concatenate(
            [jnp.zeros_like(dot_val[..., :1]), dot_val[..., :-1]], axis=-1)
        dot_val = jnp.minimum(prev_dot, dot_val)
        dot_val = jnp.clip(dot_val, -10.0, 0.0)

        dist = next_z - prev_z
        prev_esti = mid_sdf - dot_val * dist * 0.5
        next_esti = mid_sdf + dot_val * dist * 0.5

        prev_cdf = cdf_Phi_s(prev_esti, 64 * (2 ** i))
        next_cdf = cdf_Phi_s(next_esti, 64 * (2 ** i))
        alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
        w = alpha_to_w(alpha)
        d_fine = sample_pdf(_d, w, N_importance // N_upsample_iters,
                            det=not perturb, key=keys[i])
        sdf_fine = query_sdf(d_fine)
        _d = jnp.concatenate([_d, d_fine], axis=-1)
        _sdf = jnp.concatenate([_sdf, sdf_fine], axis=-1)
        # co-sort sdf through the sort network (TPU: last-axis gathers
        # after argsort are near-scalar; see ops/sampling.py docstring)
        _d, _sdf = jax.lax.sort((_d, _sdf), dimension=-1, num_keys=1)
    return _d
