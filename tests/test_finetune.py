"""End-to-end stylization fine-tune step on tiny models: the two-pass
gradient-cached step must run, produce finite losses, and update only the
intended modules."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import nerfart_tpu.criteria.losses as L
import nerfart_tpu.models.clip.model as cm
from nerfart_tpu import finetune as ft
from nerfart_tpu.criteria.style import StyleCfg
from nerfart_tpu.models import base as nets
from nerfart_tpu.models import vgg as vgg_mod
from nerfart_tpu.models import volsdf as volsdf_fw
from tests.test_criteria import TINY_CLIP

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_setup():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(0), mcfg)
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=8,
        N_importance=4, max_upsample_steps=1, max_bisection_steps=2,
        detailed_output=False, calc_normal=False)
    clip_params = cm.init_clip_params(jax.random.PRNGKey(1), TINY_CLIP)
    vgg_params = vgg_mod.init_vgg16_params(jax.random.PRNGKey(2))
    T, D = 3, TINY_CLIP.embed_dim
    bank = L.TextBank(
        text_direction=jnp.ones((1, D)) / np.sqrt(D),
        target_feats=jax.random.normal(jax.random.PRNGKey(3), (T, D)),
        neg_feats=jax.random.normal(jax.random.PRNGKey(4), (4, T, D)))
    return mcfg, params, rcfg, clip_params, vgg_params, bank


def _run_step(tiny_setup, fix_module):
    mcfg, params, rcfg, clip_params, vgg_params, bank = tiny_setup
    H, W = 18, 12
    scfg = StyleCfg(patch=L.PatchNCECfg(target_h=340, target_w=240,
                                        pad_lr=10, pad_tb=10,
                                        n_patches=1, is_full_res=False),
                    clip_cfg=TINY_CLIP)
    fcfg = ft.FinetuneCfg(H=H, W=W, framework="volsdf", use_eikonal=True,
                          render_chunk=None, grad_chunk=72,
                          fix_module=fix_module)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    batch = {
        "c2w": jnp.eye(4).at[2, 3].set(-2.5)[None],
        "intrinsics": (jnp.eye(4).at[0, 0].set(15.).at[1, 1].set(15.)
                       .at[0, 2].set(W / 2).at[1, 2].set(H / 2))[None],
        "rgb": jax.random.uniform(jax.random.PRNGKey(9), (1, H * W, 3)),
    }

    new_params, new_opt, losses = ft.finetune_step(
        params, opt_state, batch, jax.random.PRNGKey(5),
        clip_params, vgg_params, bank, mcfg, rcfg, scfg, fcfg, optimizer)
    return params, new_params, losses


def test_finetune_step_runs(tiny_setup):
    params, new_params, losses = _run_step(tiny_setup, fix_module=None)
    for k, v in losses.items():
        assert np.isfinite(float(np.asarray(v))), k
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(new_params),
        jax.tree_util.tree_leaves(params)))
    assert delta > 0


def test_finetune_fix_module(tiny_setup):
    """NeuS-style frozen radiance net: its params must not move
    (reference FIX_MODULE, neus.py:28,456)."""
    params, new_params, _ = _run_step(tiny_setup, fix_module="radiance_net")
    rad_delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(new_params["radiance_net"]),
        jax.tree_util.tree_leaves(params["radiance_net"])))
    assert rad_delta == 0.0
    surf_delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(new_params["implicit_surface"]),
        jax.tree_util.tree_leaves(params["implicit_surface"])))
    assert surf_delta > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_finetune_step_sharded_matches_single(tiny_setup):
    """The mesh-sharded stylization step must reproduce the single-device
    step (grads all-reduce over the data axis)."""
    from nerfart_tpu.parallel.mesh import make_mesh, replicate

    mcfg, params, rcfg, clip_params, vgg_params, bank = tiny_setup
    H, W = 18, 12
    scfg = StyleCfg(patch=L.PatchNCECfg(target_h=340, target_w=240,
                                        pad_lr=10, pad_tb=10,
                                        n_patches=1, is_full_res=False),
                    clip_cfg=TINY_CLIP)
    fcfg = ft.FinetuneCfg(H=H, W=W, framework="volsdf", use_eikonal=True,
                          render_chunk=None, grad_chunk=72, fix_module=None)
    optimizer = optax.adam(1e-3)
    batch = {
        "c2w": jnp.eye(4).at[2, 3].set(-2.5)[None],
        "intrinsics": (jnp.eye(4).at[0, 0].set(15.).at[1, 1].set(15.)
                       .at[0, 2].set(W / 2).at[1, 2].set(H / 2))[None],
        "rgb": jax.random.uniform(jax.random.PRNGKey(9), (1, H * W, 3)),
    }
    key = jax.random.PRNGKey(5)

    p1, _, l1 = ft.finetune_step(
        params, optimizer.init(params), batch, key, clip_params, vgg_params,
        bank, mcfg, rcfg, scfg, fcfg, optimizer)

    mesh = make_mesh(8)
    p8, _, l8 = ft.finetune_step(
        replicate(params, mesh), optimizer.init(replicate(params, mesh)),
        batch, key, clip_params, vgg_params,
        bank, mcfg, rcfg, scfg, fcfg, optimizer, mesh=mesh)

    np.testing.assert_allclose(float(l8["total"]), float(l1["total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_split_programs_match_monolith(tiny_setup):
    """fcfg.split_programs compiles three programs instead of one; the
    math and RNG stream are identical, so results must match exactly."""
    mcfg, params, rcfg, clip_params, vgg_params, bank = tiny_setup
    H, W = 18, 12
    scfg = StyleCfg(patch=L.PatchNCECfg(target_h=340, target_w=240,
                                        pad_lr=10, pad_tb=10,
                                        n_patches=1, is_full_res=False),
                    clip_cfg=TINY_CLIP)
    optimizer = optax.adam(1e-3)
    batch = {
        "c2w": jnp.eye(4).at[2, 3].set(-2.5)[None],
        "intrinsics": (jnp.eye(4).at[0, 0].set(15.).at[1, 1].set(15.)
                       .at[0, 2].set(W / 2).at[1, 2].set(H / 2))[None],
        "rgb": jax.random.uniform(jax.random.PRNGKey(9), (1, H * W, 3)),
    }
    outs = {}
    for split in (False, True):
        fcfg = ft.FinetuneCfg(H=H, W=W, framework="volsdf",
                              use_eikonal=True, render_chunk=None,
                              grad_chunk=72, split_programs=split)
        step = ft.make_finetune_step(clip_params, vgg_params, bank, mcfg,
                                     rcfg, scfg, fcfg, optimizer)
        p = jax.tree_util.tree_map(jnp.array, params)
        outs[split] = step(p, optimizer.init(p), batch,
                           jax.random.PRNGKey(5))
    p_mono, _, l_mono = outs[False]
    p_split, _, l_split = outs[True]
    for k in l_mono:
        np.testing.assert_allclose(np.asarray(l_mono[k]),
                                   np.asarray(l_split[k]), rtol=2e-5,
                                   atol=2e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(p_mono),
                    jax.tree_util.tree_leaves(p_split)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
