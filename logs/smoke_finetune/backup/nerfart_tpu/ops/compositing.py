"""Volume-rendering integration (alpha compositing).

Reproduces the reference's exact shifted-cumprod conventions with the
1e-10 epsilons:
- VolSDF: tau_i = (1 - exp(-relu(sigma*delta)) + 1e-10) * cumprod(shifted p)
  (reference volsdf.py:544-561);
- NeuS/UNISURF: w = alpha * cumprod(shifted (1 - alpha + 1e-10))
  (reference neus.py:65-78).
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def alpha_to_w(alpha: jnp.ndarray) -> jnp.ndarray:
    """Visibility weights from per-section opacities (neus.py:65-78)."""
    shifted_transparency = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1)
    return alpha * jnp.cumprod(shifted_transparency, axis=-1)[..., :-1]


def volsdf_integrate(
    d_all: jnp.ndarray,
    sigma: jnp.ndarray,
    radiances: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """VolSDF ray integration (volsdf.py:539-561).

    d_all, sigma: [..., N]; radiances: [..., N, 3].
    Returns (rgb [..., 3], depth [...], acc [...],
             extras {p_i, alpha, visibility_weights} each [..., N-1]).
    """
    delta_i = d_all[..., 1:] - d_all[..., :-1]
    p_i = jnp.exp(-jax.nn.relu(sigma[..., :-1] * delta_i))
    tau_i = (1 - p_i + 1e-10) * jnp.cumprod(
        jnp.concatenate([jnp.ones_like(p_i[..., :1]), p_i], axis=-1), axis=-1
    )[..., :-1]
    rgb_map = jnp.sum(tau_i[..., None] * radiances[..., :-1, :], axis=-2)
    depth_map = jnp.sum(
        tau_i / (jnp.sum(tau_i, axis=-1, keepdims=True) + 1e-10) * d_all[..., :-1],
        axis=-1)
    acc_map = jnp.sum(tau_i, axis=-1)
    extras = {"p_i": p_i, "alpha": 1.0 - p_i, "visibility_weights": tau_i}
    return rgb_map, depth_map, acc_map, extras


def weighted_normal_map(nablas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weight-composited unit normals (volsdf.py:572-576, neus.py:391-395).

    nablas [..., N_pts, 3], weights [..., N_w]; uses min(N_pts, N_w) points.
    """
    normals = nablas / (jnp.linalg.norm(nablas, axis=-1, keepdims=True)
                        .clip(min=1e-12))
    n = min(weights.shape[-1], normals.shape[-2])
    return jnp.sum(normals[..., :n, :] * weights[..., :n, None], axis=-2)
