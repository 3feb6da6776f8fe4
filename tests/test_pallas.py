"""Fused Pallas SDF-MLP kernel vs the plain XLA forward (interpreter mode
on CPU; the same kernel compiles with Mosaic on real TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.models import base as nets
from nerfart_tpu.ops.pallas import fused_mlp


@pytest.fixture(scope="module")
def net():
    cfg = nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                  embed_multires=6)
    params = nets.init_implicit_surface(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_fused_matches_reference_forward(net, monkeypatch):
    cfg, params = net
    x = jax.random.normal(jax.random.PRNGKey(1), (300, 3))
    sdf_ref, h_ref = nets.implicit_surface_fwd(params, x, cfg)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        sdf, h = fused_mlp.fused_implicit_surface_fwd(
            params, x, cfg, tile_m=128)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-4)


def test_fused_bf16_close(net):
    cfg, params = net
    x = jax.random.normal(jax.random.PRNGKey(2), (128, 3))
    sdf_ref = nets.implicit_surface_fwd(params, x, cfg, return_h=False)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        sdf, _ = fused_mlp.fused_implicit_surface_fwd(
            params, x, cfg, compute="bfloat16", tile_m=128)
    # bf16 matmuls: loose agreement is the contract (sampler-only use)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf_ref),
                               atol=0.05)
