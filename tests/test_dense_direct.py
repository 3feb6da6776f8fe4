"""dense_direct (uniform-only dense mode: composite the N_samples coarse
grid, skip the sampler) must render bit-equal to the general path given
the same effective sample set (max_upsample_steps=0, N_importance=0 —
where fine_sample contributes zero importance columns)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import volsdf as V
from nerfart_tpu.ops.rays import get_rays


def _small_cfg():
    return V.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(
            W=64, D=4, skips=(2,), W_geo_feat=64, embed_multires=6,
            obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(
            D=2, W=64, skips=(), W_geo_feat=64, embed_multires=-1,
            embed_multires_view=-1, use_view_dirs=True))


def test_dense_direct_matches_importance_free_path():
    mcfg = _small_cfg()
    params = V.init_volsdf(jax.random.PRNGKey(3), mcfg)
    H = W = 16
    c2w = jnp.eye(4).at[2, 3].set(-2.5)
    intr = (jnp.eye(4).at[0, 0].set(30.0).at[1, 1].set(30.0)
            .at[0, 2].set(W / 2).at[1, 2].set(H / 2))
    ro, rd, _ = get_rays(c2w[None], intr[None], H, W, N_rays=-1)
    base = dict(near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=48,
                N_importance=0, max_upsample_steps=0, epsilon=0.1,
                calc_normal=True, require_nablas=True, detailed_output=True,
                rays_chunk=128)
    r_general = V.VolSDFRenderCfg(**base, dense_direct=False)
    r_direct = V.VolSDFRenderCfg(**base, dense_direct=True)
    render = jax.jit(V.volume_render, static_argnames=("mcfg", "rcfg"))

    rgb0, d0, ex0 = render(params, ro, rd, mcfg=mcfg, rcfg=r_general)
    rgb1, d1, ex1 = render(params, ro, rd, mcfg=mcfg, rcfg=r_direct)
    np.testing.assert_array_equal(np.asarray(ex0["d_vals"]),
                                  np.asarray(ex1["d_vals"]))
    np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(ex0["mask_volume"]),
                                  np.asarray(ex1["mask_volume"]))
    assert ex1["iter_usage"].shape == ex0["iter_usage"].shape
    assert ex1["beta_map"].shape == ex0["beta_map"].shape
