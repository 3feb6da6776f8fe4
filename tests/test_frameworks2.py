"""Second parity batch: NeRF++ background paths, alternate NeuS upsample
algorithms, surface rendering, quaternion cameras."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import ray_casting as rc
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.ops import rays as ray_ops
from nerfart_tpu.utils import torch_convert as conv


def _sd(g):
    return {k[len("param::"):]: v for k, v in g.items()
            if k.startswith("param::")}


def test_volsdf_nerfpp_parity(golden):
    g = golden("volsdf_nerfpp")
    params = conv.model_params_from_torch(_sd(g), "volsdf")
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        use_nerfplusplus=True,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, use_view_dirs=True,
        use_nerfplusplus=True, calc_normal=True, require_nablas=True,
        detailed_output=True, perturb=False, N_samples=16, N_importance=8,
        N_outside=8, max_upsample_steps=1, max_bisection_steps=3,
        epsilon=0.1)
    rgb, depth, extras = volsdf_fw.volume_render(
        params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
        mcfg, rcfg)
    np.testing.assert_allclose(rgb, g["rgb"], atol=5e-3)
    np.testing.assert_allclose(depth, g["depth"], atol=5e-2)
    np.testing.assert_allclose(extras["sigma_out"], g["sigma_out"],
                               atol=1e-3)
    np.testing.assert_allclose(extras["mask_volume"], g["mask_volume"],
                               atol=5e-3)


def test_neus_nerfpp_parity(golden):
    g = golden("neus_nerfpp")
    params = conv.model_params_from_torch(_sd(g), "neus")
    mcfg = neus_fw.NeuSCfg(
        variance_init=0.05, speed_factor=10.0, obj_bounding_radius=1.0,
        use_outside_nerf=True,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=4,
                                     use_view_dirs=True))
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, use_view_dirs=True, calc_normal=False,
        detailed_output=True, perturb=False, N_samples=16, N_importance=8,
        N_outside=8, upsample_algo="official_solution", N_upsample_iters=2)
    rgb, depth, extras = neus_fw.volume_render(
        params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
        mcfg, rcfg)
    np.testing.assert_allclose(rgb, g["rgb"], atol=5e-3)
    np.testing.assert_allclose(depth, g["depth"], rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(extras["mask_volume"], g["mask_volume"],
                               atol=5e-3)


@pytest.mark.parametrize("algo", ["direct_use", "direct_more"])
def test_neus_alt_upsample_parity(golden, algo):
    g = golden(f"neus_{algo}")
    params = conv.model_params_from_torch(_sd(g), "neus")
    mcfg = neus_fw.NeuSCfg(
        variance_init=0.05, speed_factor=10.0, obj_bounding_radius=1.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=4,
                                     use_view_dirs=True))
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, use_view_dirs=True, calc_normal=False,
        detailed_output=True, perturb=False, N_samples=16, N_importance=8,
        N_outside=0, upsample_algo=algo, N_nograd_samples=128)
    rgb, depth, extras = neus_fw.volume_render(
        params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
        mcfg, rcfg)
    np.testing.assert_allclose(rgb, g["rgb"], atol=5e-3)
    np.testing.assert_allclose(extras["mask_volume"], g["mask_volume"],
                               atol=5e-3)


@pytest.mark.parametrize("algo", ["sphere_tracing", "root_finding"])
def test_surface_render_parity(golden, algo):
    g = golden(f"surface_{algo}")
    params = conv.model_params_from_torch(_sd(g), "volsdf")
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))

    def sdf_fn(pts):
        return nets.implicit_surface_fwd(params["implicit_surface"], pts,
                                         mcfg.surface, return_h=False)

    def model_forward(pts, view_dirs):
        return volsdf_fw.forward(params, pts, view_dirs, mcfg)

    color, depth, extras = rc.surface_render(
        params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
        model_forward, sdf_fn, calc_normal=True, ray_casting_algo=algo,
        near=0.0, far=6.0)
    ref_mask = g["mask"].astype(bool)
    got_mask = np.asarray(extras["mask_surface"])
    # the masks should agree except possibly at grazing rays
    assert (got_mask == ref_mask).mean() > 0.85
    both = got_mask & ref_mask
    np.testing.assert_allclose(np.asarray(color)[both], g["color"][both],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(depth)[both], g["depth"][both],
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(extras["normals_surface"])[both],
                               g["normals"][both], atol=2e-2)


def test_quaternion_c2w_matches_matrix():
    """The quaternion path must generate the same rays as the matrix path.
    (No reference golden: the reference's quat_to_rot crashes on any real
    input shape, rend_util.py:77.)"""
    th = 0.4
    q = jnp.asarray([np.cos(th / 2), 0.0, np.sin(th / 2), 0.0])
    t = jnp.asarray([0.2, -0.1, -3.0])
    c2w7 = jnp.concatenate([q, t])[None]
    R = ray_ops.quat_to_rot(q[None])[0]
    c2w = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)[None]
    intr = (jnp.eye(4).at[0, 0].set(100.0).at[1, 1].set(110.0)
            .at[0, 2].set(10.0).at[1, 2].set(8.0))[None]
    ro1, rd1, _ = ray_ops.get_rays(c2w7, intr, 16, 20, N_rays=-1)
    ro2, rd2, _ = ray_ops.get_rays(c2w, intr, 16, 20, N_rays=-1)
    np.testing.assert_allclose(ro1, ro2, atol=1e-6)
    np.testing.assert_allclose(rd1, rd2, atol=1e-6)
    # and rot_to_quat inverts quat_to_rot
    q2 = ray_ops.rot_to_quat(R[None])[0]
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-6)
