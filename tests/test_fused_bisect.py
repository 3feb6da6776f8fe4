"""Fused bisect kernel parity vs the unfused fine_sample path
(interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nerfart_tpu.ops import volsdf_math


def _setup():
    def sphere_sdf(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.5

    N_rays = 8
    o = jnp.zeros((N_rays, 3)).at[:, 2].set(-4.0)
    o = o.at[:, 0].set(jnp.linspace(-0.5, 0.5, N_rays))
    th = jnp.linspace(-0.3, 0.3, N_rays)
    d = jnp.stack([jnp.sin(th), 0.1 * th, jnp.cos(th)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    init_d = jnp.linspace(0, 1, 32)[None, :] * 8.0 * jnp.ones((N_rays, 1))
    return sphere_sdf, init_d, o, d


def test_fused_bisect_matches_unfused():
    sphere_sdf, init_d, o, d = _setup()
    kwargs = dict(alpha_net=10.0, beta_net=0.1, far=8.0, eps=0.1,
                  max_iter=2, max_bisection=4, final_N_importance=8,
                  N_up=32, perturb=False)
    ref = volsdf_math.fine_sample(sphere_sdf, init_d, o, d, **kwargs)
    with pltpu.force_tpu_interpret_mode():
        fused = volsdf_math.fine_sample(sphere_sdf, init_d, o, d,
                                        fused_bisect=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(fused[2]), np.asarray(ref[2]))
    conv = np.asarray(ref[2]) >= 0
    np.testing.assert_allclose(np.asarray(fused[0])[conv],
                               np.asarray(ref[0])[conv], atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused[1]), np.asarray(ref[1]),
                               atol=1e-4)
