"""Wavefront two-stage rendering must equal the single full-budget render."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.models.wavefront import wavefront_render


def test_wavefront_equals_full_render():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(7), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, calc_normal=True,
        require_nablas=True, detailed_output=True, perturb=False,
        N_samples=16, N_importance=8, max_upsample_steps=3,
        max_bisection_steps=4, epsilon=0.05)

    N = 24
    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-2.5)
    rays_o = rays_o.at[:, 0].set(jnp.linspace(-0.8, 0.8, N))
    th = jnp.linspace(-0.5, 0.5, N)
    rays_d = jnp.stack([jnp.sin(th), 0.1 * th, jnp.cos(th)], axis=-1)

    rgb_f, depth_f, ex_f = volsdf_fw.volume_render(
        params, rays_o, rays_d, mcfg, rcfg)
    rgb_w, depth_w, ex_w = wavefront_render(
        params, rays_o, rays_d, mcfg, rcfg, stage1_steps=1, min_bucket=8)

    usage = np.asarray(ex_f["iter_usage"])
    # the scene must exercise both converged and unconverged rays for this
    # test to mean anything
    assert (usage >= 0).any()

    np.testing.assert_allclose(np.asarray(rgb_w), np.asarray(rgb_f),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_w), np.asarray(depth_f),
                               atol=1e-3)
    np.testing.assert_array_equal(ex_w["iter_usage"], usage)
    np.testing.assert_allclose(ex_w["beta_map"],
                               np.asarray(ex_f["beta_map"]), atol=1e-5)
