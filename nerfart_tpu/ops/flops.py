"""Analytic model-FLOPs accounting for MFU reporting.

"Model FLOPs" = matmul multiply-adds of the MLP towers only (2*in*out per
point per kernel), the standard MFU numerator; elementwise work (positional
encoding, Laplace-CDF chains, sorts, compositing) is excluded, so the
reported MFU is a *lower* bound on achieved utilization. The denominator is
the chip's bf16 peak (v5e: 394 TFLOP/s).

The reference never reports utilization at all (its de-facto perf metric is
wall-clock for the 90-view render, reference README.md:65); this module is
the TPU-side accounting VERDICT r3 asked for.
"""
from typing import Any

import jax

V5E_PEAK_FLOPS = 394e12  # bf16 peak of one TPU v5e chip


def matmul_flops_per_point(params_subtree: Any) -> int:
    """2*in*out summed over every rank-2 kernel in the subtree: the matmul
    FLOPs one point costs in a forward pass (weight-norm g/b vectors and
    other rank-1 leaves are elementwise, excluded)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params_subtree):
        if getattr(leaf, "ndim", 0) == 2:
            total += 2 * int(leaf.shape[0]) * int(leaf.shape[1])
    return total


def volsdf_render_flops_per_ray(params: Any, rcfg,
                                executed_upsample_iters: int,
                                require_nablas: bool = True) -> float:
    """Exact executed model FLOPs per ray for one VolSDF render program.

    Point counts mirror models/volsdf.py `_render_block`:
      - sampler: N_samples*4 dense-init SDF queries, plus N_samples*4 per
        executed upsample iteration (ops/volsdf_math.fine_sample; each
        unrolled iteration queries N_up new points).
      - final forward: (N_samples coarse + N_importance fine) points through
        the SDF net (+1x for the nablas vjp cotangent pass — one extra
        matmul chain of equal cost, models/base.py:178-190) and the
        radiance net.

    `executed_upsample_iters` must be the number of iterations the program
    actually ran (deterministic for dense mode = 0 and for the eps->0
    stress case = max_upsample_steps; data-dependent otherwise because
    fully-converged chunks skip iterations via lax.cond).
    """
    sdf_f = matmul_flops_per_point(params["implicit_surface"])
    rad_f = matmul_flops_per_point(params["radiance_net"])
    n_up = rcfg.N_samples * 4
    sampler_pts = n_up * (1 + executed_upsample_iters)
    final_pts = rcfg.N_samples + rcfg.N_importance
    nabla_factor = 2.0 if require_nablas else 1.0
    return (sampler_pts * sdf_f
            + final_pts * (nabla_factor * sdf_f + rad_f))


def neus_render_flops_per_ray(params: Any, rcfg) -> float:
    """Executed model FLOPs per ray for one NeuS render program
    (models/neus.py `_render_block`, official_solution upsampler:
    N_samples coarse SDF queries + N_importance total across the upsample
    iterations — ops/neus_math.neus_upsample — then the final forward over
    all N_samples + N_importance points with nablas and radiance)."""
    sdf_f = matmul_flops_per_point(params["implicit_surface"])
    rad_f = matmul_flops_per_point(params["radiance_net"])
    sampler_pts = rcfg.N_samples + rcfg.N_importance
    final_pts = rcfg.N_samples + rcfg.N_importance
    return sampler_pts * sdf_f + final_pts * (2.0 * sdf_f + rad_f)


def mfu(rays_per_sec: float, flops_per_ray: float,
        peak: float = V5E_PEAK_FLOPS) -> float:
    return rays_per_sec * flops_per_ray / peak
