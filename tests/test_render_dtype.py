"""render_dtype=bfloat16 (the bf16-resident final forward pass) must track
the f32 render closely and return f32 outputs (compositing stays f32)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import volsdf as volsdf_fw


def _rays(n=24, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    rays_o = jnp.zeros((n, 3)).at[:, 2].set(-2.0)
    d = jax.random.normal(k1, (n, 3)) * 0.1
    rays_d = d.at[:, 2].set(1.0)
    return rays_o, rays_d


def test_volsdf_render_dtype_bf16_close_to_f32():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(1), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, use_view_dirs=True,
        calc_normal=True, require_nablas=True, detailed_output=False,
        perturb=False, N_samples=16, N_importance=8,
        max_upsample_steps=1, max_bisection_steps=3, epsilon=0.1)
    rcfg_bf16 = dataclasses.replace(rcfg, render_dtype="bfloat16")
    rays_o, rays_d = _rays()

    rgb32, depth32, ex32 = volsdf_fw.volume_render(params, rays_o, rays_d,
                                                   mcfg, rcfg)
    rgb16, depth16, ex16 = volsdf_fw.volume_render(params, rays_o, rays_d,
                                                   mcfg, rcfg_bf16)
    assert rgb16.dtype == jnp.float32
    assert ex16["normals_volume"].dtype == jnp.float32
    np.testing.assert_allclose(rgb16, rgb32, atol=3e-2)
    np.testing.assert_allclose(depth16, depth32, atol=0.15)


def test_bisect_cumsum_matmul_matches_exact():
    from nerfart_tpu.ops import volsdf_math as vm
    x = jax.random.uniform(jax.random.PRNGKey(0), (7, 33)) * 0.1
    # HIGHEST precision makes the tight tolerance principled on TPU too
    # (default-precision TPU matmul rounds inputs to bf16, ~2e-3 relative;
    # ADVICE r4); the loose default-precision check below bounds that case
    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(vm._cumsum_matmul(x),
                                   jnp.cumsum(x, axis=-1), rtol=2e-3,
                                   atol=1e-5)
    np.testing.assert_allclose(vm._cumsum_matmul(x),
                               jnp.cumsum(x, axis=-1), rtol=1e-2, atol=1e-4)
    # bound chains computed with the matmul cumsum stay within bf16-pass
    # rounding of the exact ones
    sdf = jax.random.normal(jax.random.PRNGKey(1), (7, 33))
    d = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (7, 33)) * 6,
                 axis=-1)
    pre = vm._bound_pre(d, sdf)
    _, rt_a = vm._sigma_Rt(sdf, pre[1], pre[0], 10.0, 0.1)
    _, rt_b = vm._sigma_Rt(sdf, pre[1], pre[0], 10.0, 0.1,
                           cumsum=vm._cumsum_matmul)
    np.testing.assert_allclose(rt_b, rt_a, rtol=5e-3, atol=1e-4)
    b_a = vm._bounds_from(pre[0], pre[2], rt_a, 10.0, 0.1)
    b_b = vm._bounds_from(pre[0], pre[2], rt_b, 10.0, 0.1,
                          cumsum=vm._cumsum_matmul)
    np.testing.assert_allclose(b_b, b_a, rtol=2e-2, atol=1e-4)


def test_neus_render_dtype_bf16_close_to_f32():
    mcfg = neus_fw.NeuSCfg(
        variance_init=0.05, speed_factor=10.0, obj_bounding_radius=1.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1,
                                     embed_multires_view=4,
                                     use_view_dirs=True))
    params = neus_fw.init_neus(jax.random.PRNGKey(2), mcfg)
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, use_view_dirs=True, calc_normal=True,
        detailed_output=False, perturb=False, N_samples=16, N_importance=8,
        upsample_algo="official_solution", N_upsample_iters=2)
    rcfg_bf16 = dataclasses.replace(rcfg, render_dtype="bfloat16")
    rays_o, rays_d = _rays(seed=3)

    rgb32, depth32, _ = neus_fw.volume_render(params, rays_o, rays_d,
                                              mcfg, rcfg)
    rgb16, depth16, ex16 = neus_fw.volume_render(params, rays_o, rays_d,
                                                 mcfg, rcfg_bf16)
    assert rgb16.dtype == jnp.float32
    assert ex16["normals_volume"].dtype == jnp.float32
    np.testing.assert_allclose(rgb16, rgb32, atol=3e-2)
    np.testing.assert_allclose(depth16, depth32, atol=0.15)


def test_bisect_cumsum_mode_resolution(monkeypatch):
    """bisect_cumsum is call-time-configurable (ADVICE r4: the env var was
    captured at import): explicit modes win; 'env'/None read the env var
    when the jit trace happens, and VolSDFRenderCfg carries the knob."""
    from nerfart_tpu.ops import volsdf_math as vm

    assert vm._resolve_bisect_cumsum("matmul") is vm._cumsum_matmul
    assert vm._resolve_bisect_cumsum("exact") is jnp.cumsum
    monkeypatch.delenv("NERFART_BISECT_CUMSUM", raising=False)
    assert vm._resolve_bisect_cumsum(None) is jnp.cumsum
    assert vm._resolve_bisect_cumsum("env") is jnp.cumsum
    monkeypatch.setenv("NERFART_BISECT_CUMSUM", "matmul")
    assert vm._resolve_bisect_cumsum(None) is vm._cumsum_matmul
    with pytest.raises(ValueError):
        vm._resolve_bisect_cumsum("bogus")

    from nerfart_tpu.models import volsdf as volsdf_fw
    assert volsdf_fw.VolSDFRenderCfg().bisect_cumsum == "env"
