"""Reconstruction train-step tests: VolSDF / NeuS / UNISURF steps run,
losses decrease on an overfit-one-image sanity run, and masks behave."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfart_tpu import training
from nerfart_tpu.models import base as nets
from nerfart_tpu.models import neus as neus_fw
from nerfart_tpu.models import unisurf as uni_fw
from nerfart_tpu.models import volsdf as volsdf_fw


def _tiny_volsdf():
    mcfg = volsdf_fw.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1, embed_multires_view=-1,
                                     use_view_dirs=True))
    rcfg = volsdf_fw.VolSDFRenderCfg(
        near=0.0, far=6.0, obj_bounding_radius=3.0, N_samples=8,
        N_importance=4, max_upsample_steps=1, max_bisection_steps=2,
        detailed_output=True, require_nablas=True, calc_normal=False,
        perturb=True)
    return mcfg, rcfg


def _batch(H, W, key, with_mask=False):
    batch = {
        "c2w": jnp.eye(4).at[2, 3].set(-2.5)[None],
        "intrinsics": (jnp.eye(4).at[0, 0].set(15.).at[1, 1].set(15.)
                       .at[0, 2].set(W / 2).at[1, 2].set(H / 2))[None],
        "rgb": jax.random.uniform(key, (1, H * W, 3)) * 0.2 + 0.4,
    }
    if with_mask:
        batch["object_mask"] = jnp.ones((1, H * W), bool)
    return batch


def test_volsdf_train_losses_decrease():
    mcfg, rcfg = _tiny_volsdf()
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(0), mcfg)
    H = W = 12
    tcfg = training.TrainCfg(H=H, W=W, N_rays=64, w_eikonal=0.1,
                             obj_bounding_radius=3.0)
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)
    step = training.make_train_step("volsdf", mcfg, rcfg, tcfg, optimizer,
                                    donate=False)
    batch = _batch(H, W, jax.random.PRNGKey(1))
    first = last = None
    for it in range(12):
        params, opt_state, losses, aux, gn = step(
            params, opt_state, batch, jax.random.fold_in(
                jax.random.PRNGKey(2), it))
        total = float(np.asarray(losses["total"]))
        assert np.isfinite(total)
        first = total if first is None else first
        last = total
    assert last < first, (first, last)


def test_neus_train_step_with_mask():
    mcfg = neus_fw.NeuSCfg(
        variance_init=0.05, speed_factor=10.0, obj_bounding_radius=1.0,
        surface=nets.ImplicitSurfaceCfg(W=32, D=2, skips=(), W_geo_feat=16,
                                        embed_multires=2, radius_init=0.5,
                                        obj_bounding_size=1.0),
        radiance=nets.RadianceNetCfg(D=1, W=32, skips=(), W_geo_feat=16,
                                     embed_multires=-1, embed_multires_view=2,
                                     use_view_dirs=True))
    rcfg = neus_fw.NeuSRenderCfg(
        obj_bounding_radius=1.0, N_samples=8, N_importance=8,
        N_upsample_iters=2, detailed_output=True, perturb=True)
    params = neus_fw.init_neus(jax.random.PRNGKey(0), mcfg)
    H = W = 10
    tcfg = training.TrainCfg(H=H, W=W, N_rays=32, w_eikonal=0.1,
                             with_mask=True, w_mask=0.1,
                             obj_bounding_radius=1.0)
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)
    step = training.make_train_step("neus", mcfg, rcfg, tcfg, optimizer,
                                    donate=False)
    batch = _batch(H, W, jax.random.PRNGKey(1), with_mask=True)
    batch["c2w"] = jnp.eye(4).at[2, 3].set(-0.8)[None]
    params, opt_state, losses, aux, gn = step(
        params, opt_state, batch, jax.random.PRNGKey(3))
    assert {"loss_img", "loss_eikonal", "loss_mask", "total"} <= set(losses)
    assert all(np.isfinite(float(np.asarray(v))) for v in losses.values())


def test_unisurf_render_and_loss():
    args = {"model": {"obj_bounding_radius": 3.0, "W_geometry_feature": 16,
                      "surface": {"W": 32, "D": 2, "skips": [],
                                  "embed_multires": 2},
                      "radiance": {"W": 32, "D": 1, "skips": [],
                                   "embed_multires": -1,
                                   "embed_multires_view": -1,
                                   "use_view_dirs": True}}}
    mcfg = uni_fw.model_cfg_from_config(args)
    params = uni_fw.init_unisurf(jax.random.PRNGKey(0), mcfg)
    rcfg = uni_fw.UNISURFRenderCfg(
        logit_tau=float(uni_fw.get_surface_from_opacity(0.5)),
        radius_of_interest=3.0, N_query=8, N_freespace=4, perturb=True)
    H = W = 8
    tcfg = uni_fw.UnisurfTrainCfg(H=H, W=W, N_rays=16, w_reg=0.1,
                                  perturb_surface_pts=0.01)
    batch = _batch(H, W, jax.random.PRNGKey(1))

    total, (losses, aux) = uni_fw.unisurf_losses(
        params, batch, jax.random.PRNGKey(2), 10, mcfg, rcfg, tcfg)
    assert np.isfinite(float(np.asarray(total)))
    grads = jax.grad(lambda p: uni_fw.unisurf_losses(
        p, batch, jax.random.PRNGKey(2), 10, mcfg, rcfg, tcfg)[0])(params)
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))


def test_ray_casting_sphere():
    """Root finding + sphere tracing locate an analytic sphere surface."""
    from nerfart_tpu.models import ray_casting as rc

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 1.0

    rays_o = jnp.zeros((5, 3)).at[:, 2].set(-3.0)
    th = jnp.linspace(-0.25, 0.25, 5)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros_like(th), jnp.cos(th)], -1)

    # far=6.1: with far=6.0 the center ray hits sdf==0 exactly on a probe
    # sample, where sign(v*v)==0 defeats the sign-change test — a degenerate
    # case shared with the reference (ray_casting.py:93-102)
    d, pts, mask, _ = rc.root_finding_surface_points(
        sdf_fn, rays_o, rays_d, near=0.0, far=6.1, N_steps=64)
    assert bool(mask.all())
    np.testing.assert_allclose(jnp.linalg.norm(pts, axis=-1), 1.0, atol=1e-3)

    d2, pts2, mask2 = rc.sphere_tracing_surface_points(
        sdf_fn, rays_o, rays_d, near=0.0, far=6.1)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(pts2, axis=-1))[np.asarray(mask2)],
        1.0, atol=1e-3)


def test_per_module_lr_dict():
    """training.lr as {module: lr} builds per-group Adam with a shared
    schedule factor (reference base.py:486-521 + LambdaLR semantics)."""
    mcfg, rcfg = _tiny_volsdf()
    params = volsdf_fw.init_volsdf(jax.random.PRNGKey(0), mcfg)
    H = W = 12
    tcfg = training.TrainCfg(H=H, W=W, N_rays=32, w_eikonal=0.1,
                             obj_bounding_radius=3.0)
    args = {"training": {
        "lr": {"default": 5e-3, "radiance_net": 0.0, "ln_beta": 1e-2},
        "scheduler": {"type": "exponential_step", "min_factor": 0.1},
    }}
    optimizer, schedule = training.make_optimizer(args, num_iters=100)
    np.testing.assert_allclose(float(schedule(0)), 5e-3, rtol=1e-6)
    opt_state = optimizer.init(params)
    step = training.make_train_step("volsdf", mcfg, rcfg, tcfg, optimizer,
                                    donate=False)
    batch = _batch(H, W, jax.random.PRNGKey(1))
    p0 = jax.tree_util.tree_map(jnp.array, params)
    params, opt_state, losses, _, _ = step(params, opt_state, batch,
                                           jax.random.PRNGKey(2))
    assert np.isfinite(float(np.asarray(losses["total"])))
    # lr=0 group is frozen; others move
    for a, b in zip(jax.tree_util.tree_leaves(p0["radiance_net"]),
                    jax.tree_util.tree_leaves(params["radiance_net"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(params["ln_beta"] - p0["ln_beta"]).sum()) > 0
    d_surf = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(p0["implicit_surface"]),
        jax.tree_util.tree_leaves(params["implicit_surface"])))
    assert d_surf > 0

    # unknown key raises like the reference (base.py:509)
    bad = {"training": {
        "lr": {"default": 1e-3, "not_a_module": 1e-4},
        "scheduler": {"type": "exponential_step", "min_factor": 0.1},
    }}
    opt_bad, _ = training.make_optimizer(bad, num_iters=10)
    with pytest.raises(RuntimeError, match="wrong lr key"):
        opt_bad.init(params)

    # a missing 'default' entry raises (reference base.py:491 pops it)
    with pytest.raises(KeyError):
        training.make_optimizer({"training": {
            "lr": {"radiance_net": 1e-4},
            "scheduler": {"type": "exponential_step", "min_factor": 0.1},
        }}, num_iters=10)
