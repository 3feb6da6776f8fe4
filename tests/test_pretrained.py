"""The shipped demo checkpoint renders a recognizable reconstruction."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "pretrained",
                    "demo_volsdf_cpu.npz")
DATA = os.path.join(os.path.dirname(__file__), "..", "data",
                    "fangzhou_nature")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.isdir(DATA)),
    reason="pretrained checkpoint or dataset unavailable")]


def test_demo_checkpoint_renders_scene():
    from nerfart_tpu.data import get_data
    from nerfart_tpu.frameworks import get_model
    from nerfart_tpu.ops.rays import get_rays
    from nerfart_tpu.utils.checkpoints import load_checkpoint
    from nerfart_tpu.utils.config import load_yaml

    args = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "demo_volsdf_cpu.yaml"))
    args["data"]["downscale"] = 16  # render small for test speed
    ds = get_data(args)
    bundle = get_model(args)
    params = jax.tree_util.tree_map(
        jnp.asarray, load_checkpoint(CKPT)["model"])

    _, s, gt = ds[0]
    rcfg = bundle.make_render_cfg(test=True, rays_chunk=2048)
    ro, rd, _ = get_rays(jnp.asarray(s["c2w"])[None],
                         jnp.asarray(s["intrinsics"])[None],
                         ds.H, ds.W, N_rays=-1)
    rgb, _, extras = jax.jit(
        bundle.volume_render, static_argnames=("mcfg", "rcfg"))(
            params, ro, rd, mcfg=bundle.mcfg, rcfg=rcfg)
    pred = np.asarray(rgb).reshape(-1, 3)
    mse = ((pred - gt["rgb"]) ** 2).mean()
    psnr = -10 * np.log10(mse)
    # trained to ~23 dB at downscale 8; at downscale 16 expect >= 18 dB
    assert psnr > 18.0, psnr
    # trained scene converges at the first sampler iteration
    usage = np.asarray(extras["iter_usage"])
    assert (usage == 0).mean() > 0.99


NEUS_CKPT = os.path.join(os.path.dirname(__file__), "..", "pretrained",
                         "demo_neus_cpu.npz")


@pytest.mark.skipif(not (os.path.exists(NEUS_CKPT) and os.path.isdir(DATA)),
                    reason="NeuS demo checkpoint or dataset unavailable")
def test_neus_demo_checkpoint_loads_and_renders():
    """The NeuS demo checkpoint (a short pipeline-demo run, not converged)
    loads and renders something better than a constant image."""
    from nerfart_tpu.data import get_data
    from nerfart_tpu.frameworks import get_model
    from nerfart_tpu.ops.rays import get_rays
    from nerfart_tpu.utils.checkpoints import load_checkpoint
    from nerfart_tpu.utils.config import load_yaml

    args = load_yaml(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "demo_neus_cpu.yaml"))
    args["data"]["downscale"] = 16
    ds = get_data(args)
    bundle = get_model(args)
    params = jax.tree_util.tree_map(
        jnp.asarray, load_checkpoint(NEUS_CKPT)["model"])

    _, s, gt = ds[0]
    rcfg = bundle.make_render_cfg(test=True, rays_chunk=2048)
    ro, rd, _ = get_rays(jnp.asarray(s["c2w"])[None],
                         jnp.asarray(s["intrinsics"])[None],
                         ds.H, ds.W, N_rays=-1)
    rgb, _, _ = jax.jit(
        bundle.volume_render, static_argnames=("mcfg", "rcfg"))(
            params, ro, rd, mcfg=bundle.mcfg, rcfg=rcfg)
    pred = np.asarray(rgb).reshape(-1, 3)
    assert np.isfinite(pred).all()
    mse = ((pred - gt["rgb"]) ** 2).mean()
    psnr = -10 * np.log10(mse)
    assert psnr > 10.0, psnr  # measured 11.5 dB after the 2k-iter demo run
