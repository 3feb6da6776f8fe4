"""Scan-over-remat training: chunking the ray batch inside the jitted
step with jax.checkpoint on each block must reproduce the plain
(single-block, no-remat) step's losses and parameter updates.

This is the TPU-native replacement for the reference's memory-driven
chunk-size tuning (reference volsdf.py:720, neus.py:523 "for 3090Ti"):
training HBM scales with the block size instead of N_rays, with the
backward pass rematerializing one block at a time.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfart_tpu import training
from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import volsdf as volsdf_fw
import pytest

pytestmark = pytest.mark.slow


def _batch(H, W, key):
    c2w = jnp.eye(4).at[2, 3].set(-2.5)[None]
    intr = (jnp.eye(4).at[0, 0].set(20.0).at[1, 1].set(20.0)
            .at[0, 2].set(W / 2).at[1, 2].set(H / 2))[None]
    rgb = jax.random.uniform(key, (1, H * W, 3))
    return {"c2w": c2w, "intrinsics": intr, "rgb": rgb,
            "object_mask": rgb[..., 0] > 0.2}


def _run_steps(fw, mcfg, params, rcfg, tcfg, n=2):
    optimizer = optax.adam(5e-4)
    step = training.make_train_step(fw, mcfg, rcfg, tcfg, optimizer,
                                    donate=False)
    opt_state = optimizer.init(params)
    batch = _batch(tcfg.H, tcfg.W, jax.random.PRNGKey(5))
    losses_all = []
    for i in range(n):
        params, opt_state, losses, _, _ = step(
            params, opt_state, batch, jax.random.PRNGKey(100 + i))
        losses_all.append(losses)
    return params, losses_all


def _assert_close(a, b, rtol, what):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol,
                                   atol=1e-6, err_msg=what)


def test_volsdf_remat_chunked_step_matches_plain():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(7), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=8,
        N_importance=4, max_upsample_steps=1, max_bisection_steps=2,
        calc_normal=False, require_nablas=True, detailed_output=True)
    tcfg = training.TrainCfg(H=16, W=16, N_rays=64, w_eikonal=0.1,
                             obj_bounding_radius=3.0)

    p_plain, l_plain = _run_steps("volsdf", mcfg, params, rcfg, tcfg)
    # remat WITHOUT chunking must be exactly the same computation
    rcfg_r = dataclasses.replace(rcfg, remat=True)
    p_r, l_r = _run_steps("volsdf", mcfg, params, rcfg_r, tcfg)
    _assert_close(l_plain, l_r, 1e-6, "remat-only losses")
    _assert_close(p_plain, p_r, 1e-5, "remat-only params")


def test_neus_remat_chunked_step_matches_plain():
    mcfg = neus_fw.NeuSCfg(
        speed_factor=10.0, obj_bounding_radius=1.0, variance_init=0.05,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1,
                                     embed_multires_view=2,
                                     use_view_dirs=True))
    params = neus_fw.init_neus(jax.random.PRNGKey(3), mcfg)
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, N_samples=8, N_importance=4,
        N_upsample_iters=2, calc_normal=False, detailed_output=True)
    tcfg = training.TrainCfg(H=16, W=16, N_rays=64, w_eikonal=0.1,
                             with_mask=True, w_mask=0.1,
                             obj_bounding_radius=1.0)

    p_plain, l_plain = _run_steps("neus", mcfg, params, rcfg, tcfg)
    rcfg_r = dataclasses.replace(rcfg, remat=True)
    p_r, l_r = _run_steps("neus", mcfg, params, rcfg_r, tcfg)
    _assert_close(l_plain, l_r, 1e-6, "remat-only losses")
    _assert_close(p_plain, p_r, 1e-5, "remat-only params")

    # chunked + remat: same per-ray math, but the block RNG split differs
    # from the single-block draw, so check shapes/finiteness + that the
    # loss magnitude is in family rather than bit parity.
    rcfg_c = dataclasses.replace(rcfg, remat=True, rays_chunk=16)
    p_c, l_c = _run_steps("neus", mcfg, params, rcfg_c, tcfg)
    for l in l_c:
        assert np.isfinite(float(l["total"]))
    assert abs(float(l_c[0]["total"]) - float(l_plain[0]["total"])) \
        < 0.5 * max(1.0, abs(float(l_plain[0]["total"])))


def test_volsdf_chunked_remat_deterministic_perturb_parity():
    """With perturb=False the chunked+remat step is RNG-independent in the
    renderer, so it must match the plain step exactly (the only RNG left
    is ray selection + eikonal points, which are block-independent)."""
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(7), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=8,
        N_importance=4, max_upsample_steps=1, max_bisection_steps=2,
        perturb=False, calc_normal=False, require_nablas=True,
        detailed_output=True)
    tcfg = training.TrainCfg(H=16, W=16, N_rays=64, w_eikonal=0.1,
                             obj_bounding_radius=3.0)

    p_plain, l_plain = _run_steps("volsdf", mcfg, params, rcfg, tcfg)
    rcfg_c = dataclasses.replace(rcfg, remat=True, rays_chunk=16)
    p_c, l_c = _run_steps("volsdf", mcfg, params, rcfg_c, tcfg)
    _assert_close(l_plain, l_c, 1e-5, "chunked remat losses (perturb off)")
    _assert_close(p_plain, p_c, 1e-4, "chunked remat params (perturb off)")
