"""End-to-end renderer parity: full VolSDF / NeuS volume_render against the
reference run on identical (converted) weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import volsdf as volsdf_fw
from nerfart_tpu.utils import torch_convert as conv


def _sd(g):
    return {k[len("param::"):]: v for k, v in g.items()
            if k.startswith("param::")}


def test_volsdf_volume_render_parity(golden):
    g = golden("volsdf_render")
    params = conv.model_params_from_torch(_sd(g), "volsdf")
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        use_nerfplusplus=False,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, use_view_dirs=True,
        white_bkgd=False, calc_normal=True, require_nablas=True,
        detailed_output=True, perturb=False, N_samples=32, N_importance=16,
        max_upsample_steps=2, max_bisection_steps=5, epsilon=0.1)

    rgb, depth, extras = jax.jit(
        volsdf_fw.volume_render,
        static_argnames=("mcfg", "rcfg"))(
            params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
            mcfg=mcfg, rcfg=rcfg)

    conv_mask = g["iter_usage"] >= 0
    np.testing.assert_array_equal(np.asarray(extras["iter_usage"]),
                                  g["iter_usage"])
    # tight parity on converged rays; unconverged rays are at the bisection
    # decision boundary (see test_ops.test_fine_sample_parity)
    np.testing.assert_allclose(np.asarray(rgb)[conv_mask], g["rgb"][conv_mask],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(depth)[conv_mask],
                               g["depth"][conv_mask], atol=2e-2)
    np.testing.assert_allclose(np.asarray(extras["mask_volume"])[conv_mask],
                               g["mask_volume"][conv_mask], atol=2e-3)
    np.testing.assert_allclose(np.asarray(extras["beta_map"])[conv_mask],
                               g["beta_map"][conv_mask], atol=1e-5)
    np.testing.assert_allclose(np.asarray(extras["normals_volume"])[conv_mask],
                               g["normals"][conv_mask], atol=5e-3)
    # even unconverged rays should be visually close
    np.testing.assert_allclose(np.asarray(rgb), g["rgb"], atol=0.05)


def test_neus_volume_render_parity(golden):
    g = golden("neus_render")
    params = conv.model_params_from_torch(_sd(g), "neus")
    mcfg = neus_fw.NeuSCfg(
        variance_init=0.05, speed_factor=10.0, obj_bounding_radius=1.0,
        use_outside_nerf=False,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=4,
                                     use_view_dirs=True))
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, use_view_dirs=True, white_bkgd=False,
        calc_normal=True, detailed_output=True, perturb=False,
        N_samples=24, N_importance=16, N_outside=0,
        upsample_algo="official_solution", N_upsample_iters=4)

    rgb, depth, extras = jax.jit(
        neus_fw.volume_render,
        static_argnames=("mcfg", "rcfg"))(
            params, jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
            mcfg=mcfg, rcfg=rcfg)

    np.testing.assert_allclose(rgb, g["rgb"], atol=2e-3)
    np.testing.assert_allclose(depth, g["depth"], atol=2e-2)
    np.testing.assert_allclose(extras["mask_volume"], g["mask_volume"],
                               atol=2e-3)
    # Individual sample positions are chaotic: the iterative importance
    # sampler inverts a CDF, and a one-ulp difference near a bin edge moves
    # a sample to the neighboring interval. The integrated outputs above are
    # the tight contract; positions only need coarse agreement.
    np.testing.assert_allclose(extras["d_final"], g["d_final"], atol=0.15)
    np.testing.assert_allclose(extras["alpha"], g["alpha"], atol=1e-2)
    np.testing.assert_allclose(extras["normals_volume"], g["normals"],
                               atol=5e-3)


def test_volsdf_rays_chunk_equivalence(golden):
    """lax.map block chunking must not change results (it replaces the
    reference's host rayschunk loop, volsdf.py:599-610)."""
    g = golden("volsdf_render")
    params = conv.model_params_from_torch(_sd(g), "volsdf")
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                        embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    base_kwargs = dict(
        near=0.0, far=6.0, obj_bounding_radius=3.0, use_view_dirs=True,
        calc_normal=False, require_nablas=False, detailed_output=False,
        perturb=False, N_samples=16, N_importance=8,
        max_upsample_steps=1, max_bisection_steps=3, epsilon=0.1)
    r1 = volsdf_fw.VolSDFRenderCfg(**base_kwargs, rays_chunk=None)
    r2 = volsdf_fw.VolSDFRenderCfg(**base_kwargs, rays_chunk=3)
    ro, rd = jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"])
    rgb1, d1, _ = volsdf_fw.volume_render(params, ro, rd, mcfg, r1)
    rgb2, d2, _ = volsdf_fw.volume_render(params, ro, rd, mcfg, r2)
    np.testing.assert_allclose(rgb1, rgb2, atol=1e-5)
    np.testing.assert_allclose(d1, d2, atol=1e-5)
