"""Unit tests for the analytic MFU/FLOPs accounting (ops/flops.py).

The reference never reports utilization (its perf metric is wall-clock for
the 90-view render, reference README.md:65); these tests pin the TPU-side
accounting that bench.py reports as `mfu`.
"""
import numpy as np

from nerfart_tpu.ops import flops as F


def _lin(n_in, n_out):
    # weight-norm layout: v is the rank-2 kernel, g/b are rank-1
    return {"v": np.zeros((n_in, n_out), np.float32),
            "g": np.zeros((n_out,), np.float32),
            "b": np.zeros((n_out,), np.float32)}


def test_matmul_flops_per_point_counts_only_rank2():
    tree = {"layers": {"0#": _lin(3, 8), "1#": _lin(8, 4)}}
    # 2*(3*8) + 2*(8*4) = 48 + 64 = 112; g/b vectors excluded
    assert F.matmul_flops_per_point(tree) == 112


class _RCfg:
    N_samples = 128
    N_importance = 64


def test_volsdf_render_flops_per_ray():
    params = {"implicit_surface": {"l": _lin(4, 4)},   # 32 F/pt
              "radiance_net": {"l": _lin(2, 2)}}       # 8 F/pt
    sdf_f, rad_f = 32, 8
    rcfg = _RCfg()
    # dense mode: 512 init pts * sdf + 192 final pts * (2*sdf + rad)
    dense = F.volsdf_render_flops_per_ray(params, rcfg, 0)
    assert dense == 512 * sdf_f + 192 * (2 * sdf_f + rad_f)
    # each executed upsample iteration adds 512 more sampler queries
    full = F.volsdf_render_flops_per_ray(params, rcfg, 6)
    assert full == dense + 6 * 512 * sdf_f
    # without the nablas vjp pass the final-forward sdf term halves
    no_nab = F.volsdf_render_flops_per_ray(params, rcfg, 0,
                                           require_nablas=False)
    assert no_nab == 512 * sdf_f + 192 * (1 * sdf_f + rad_f)


def test_neus_render_flops_per_ray():
    params = {"implicit_surface": {"l": _lin(4, 4)},
              "radiance_net": {"l": _lin(2, 2)}}
    rcfg = _RCfg()
    rcfg.N_samples, rcfg.N_importance = 64, 64
    got = F.neus_render_flops_per_ray(params, rcfg)
    assert got == 128 * 32 + 128 * (2 * 32 + 8)


def test_mfu_full_size_model_sane():
    """MFU on the real model shapes lands in (0, 1) for the measured
    round-3 throughputs — the accounting can't claim super-peak."""
    import jax
    from nerfart_tpu.models import base as nets
    from nerfart_tpu.models import volsdf as V
    mcfg = V.VolSDFCfg(
        beta_init=0.1, speed_factor=10.0, obj_bounding_radius=3.0,
        surface=nets.ImplicitSurfaceCfg(W=256, D=8, skips=(4,),
                                        W_geo_feat=256, embed_multires=6,
                                        obj_bounding_size=3.0),
        radiance=nets.RadianceNetCfg(D=4, W=256, skips=(),
                                     W_geo_feat=256, embed_multires=-1,
                                     embed_multires_view=-1,
                                     use_view_dirs=True))
    params = V.init_volsdf(jax.random.PRNGKey(0), mcfg)
    rcfg = V.VolSDFRenderCfg(N_samples=128, N_importance=64)
    fpr = F.volsdf_render_flops_per_ray(params, rcfg, 0)
    # SDF net ~8 layers of 256x256 -> ~1e6 F/pt; 896 points -> O(1e9) F/ray
    assert 1e8 < fpr < 1e10
    m = F.mfu(23_000, fpr)  # round-3 dense headline
    assert 0.0 < m < 1.0
