"""Network parity tests: converted reference weights must reproduce
reference forward outputs and analytic gradients (nablas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfart_tpu.models import base as nets
from nerfart_tpu.utils import torch_convert as conv


def _params_from_golden(g, fromfn, **kw):
    sd = {k[len("param::"):]: v for k, v in g.items() if k.startswith("param::")}
    return fromfn(sd, **kw), sd


def test_implicit_surface_parity(golden):
    g = golden("implicit_surface")
    params, _ = _params_from_golden(g, conv.implicit_surface_from_torch)
    cfg = nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                  embed_multires=6)
    x = jnp.asarray(g["x"])
    sdf, h = nets.implicit_surface_fwd(params, x, cfg)
    np.testing.assert_allclose(sdf, g["sdf"], atol=1e-5)
    np.testing.assert_allclose(h, g["h"], atol=1e-5)

    sdf2, nablas, h2 = nets.implicit_surface_with_nablas(params, x, cfg)
    np.testing.assert_allclose(sdf2, g["sdf"], atol=1e-5)
    np.testing.assert_allclose(nablas, g["nablas"], atol=1e-4)


def test_implicit_surface_grad_of_grad(golden):
    """Eikonal-style grad-of-grad must be computable (base.py:265-282)."""
    g = golden("implicit_surface")
    params, _ = _params_from_golden(g, conv.implicit_surface_from_torch)
    cfg = nets.ImplicitSurfaceCfg(W=64, D=4, skips=(2,), W_geo_feat=32,
                                  embed_multires=6)
    x = jnp.asarray(g["x"])

    def eikonal(p):
        _, nablas, _ = nets.implicit_surface_with_nablas(p, x, cfg)
        n = jnp.linalg.norm(nablas, axis=-1)
        return ((n - 1.0) ** 2).mean()

    grads = jax.grad(eikonal)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_radiance_net_parity(golden):
    g = golden("radiance_net")
    params, _ = _params_from_golden(g, conv.radiance_net_from_torch)
    cfg = nets.RadianceNetCfg(D=2, W=64, skips=(), W_geo_feat=32,
                              embed_multires=-1, embed_multires_view=4)
    rgb = nets.radiance_net_fwd(params, jnp.asarray(g["x"]),
                                jnp.asarray(g["vd"]), jnp.asarray(g["nrm"]),
                                jnp.asarray(g["feat"]), cfg)
    np.testing.assert_allclose(rgb, g["rgb"], atol=1e-5)


def test_nerf_bg_parity(golden):
    g = golden("nerf_bg")
    params, _ = _params_from_golden(g, conv.nerf_from_torch,
                                    use_view_dirs=True)
    cfg = nets.NeRFCfg(D=4, W=64, input_ch=4, input_ch_view=3,
                       multires=10, multires_view=4, use_view_dirs=True)
    sigma, rgb = nets.nerf_fwd(params, jnp.asarray(g["x"]),
                               jnp.asarray(g["vd"]), cfg)
    np.testing.assert_allclose(sigma, g["sigma"], atol=1e-5)
    np.testing.assert_allclose(rgb, g["rgb"], atol=1e-5)


def test_roundtrip_torch_layout(golden, tmp_path):
    g = golden("volsdf_render")
    sd = {k[len("param::"):]: v for k, v in g.items() if k.startswith("param::")}
    sd = {k: v for k, v in sd.items()
          if "obj_bounding_size" not in k and "is_pretrained" not in k}
    params = conv.model_params_from_torch(sd, "volsdf")
    back = conv.model_params_to_torch(params, "volsdf")
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(back[k].reshape(sd[k].shape), sd[k],
                                   atol=1e-7)
    # full .pt save/load roundtrip through torch serialization
    pytest.importorskip("torch")
    path = str(tmp_path / "export.pt")
    conv.save_torch_pt(params, path, "volsdf", global_step=5)
    params2 = conv.load_torch_pt(path, "volsdf")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), atol=1e-7)


def test_geometric_init_sphere():
    """Fresh geometric init must produce an approximate sphere SDF of the
    requested radius (the 'initial sphere' property, base.py:201-224)."""
    cfg = nets.ImplicitSurfaceCfg(W=256, D=8, skips=(4,), W_geo_feat=256,
                                  radius_init=1.0, embed_multires=6)
    params = nets.init_implicit_surface(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    # The reference's own init has per-point spread up to ~0.7 at r=2
    # (measured on torch): check the mean radius behavior, not per-point.
    for r in [0.5, 1.0, 2.0]:
        sdf = np.asarray(nets.implicit_surface_fwd(
            params, pts * r, cfg, return_h=False))
        assert abs(sdf.mean() - (r - 1.0)) < 0.25, (r, sdf.mean())
        assert np.abs(sdf - (r - 1.0)).max() < 0.8


def test_siren_pretrain_converges():
    cfg = nets.ImplicitSurfaceCfg(W=64, D=4, skips=(), W_geo_feat=32,
                                  use_siren=True, geometric_init=True,
                                  weight_norm=False, embed_multires=-1)
    params = nets.init_implicit_surface(jax.random.PRNGKey(0), cfg)
    params, losses = nets.pretrain_siren_sdf(
        params, cfg, jax.random.PRNGKey(1), num_iters=200, lr=1e-4,
        batch_points=512, target_radius=0.5, obj_bounding_size=1.5)
    assert float(losses[-10:].mean()) < float(losses[:10].mean())
