"""Multi-device rendering: rays sharded over the mesh must reproduce the
single-device render bit-for-bit (per-ray compute has no cross-ray
dependencies, so the partitioned program inserts no collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.parallel.mesh import make_mesh, replicate


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_render_matches_single_device():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(3), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=8,
        N_importance=4, max_upsample_steps=1, max_bisection_steps=2,
        detailed_output=False, calc_normal=False, require_nablas=False,
        perturb=False)

    N = 64  # divisible by the device count
    rays_o = jnp.zeros((N, 3)).at[:, 2].set(-2.5)
    rays_o = rays_o.at[:, 0].set(jnp.linspace(-0.5, 0.5, N))
    th = jnp.linspace(-0.3, 0.3, N)
    rays_d = jnp.stack([jnp.sin(th), 0.05 * th, jnp.cos(th)], axis=-1)

    render = jax.jit(volsdf_fw.volume_render,
                     static_argnames=("mcfg", "rcfg"))
    rgb_single, depth_single, _ = render(params, rays_o, rays_d,
                                         mcfg=mcfg, rcfg=rcfg)

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data", None))
    params_r = replicate(params, mesh)
    ro_s = jax.device_put(rays_o, sharding)
    rd_s = jax.device_put(rays_d, sharding)
    rgb_sharded, depth_sharded, _ = render(params_r, ro_s, rd_s,
                                           mcfg=mcfg, rcfg=rcfg)
    # output stays sharded over the ray axis
    assert len(rgb_sharded.sharding.device_set) == len(jax.devices())

    np.testing.assert_allclose(np.asarray(rgb_sharded),
                               np.asarray(rgb_single), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_sharded),
                               np.asarray(depth_single), atol=1e-5)
