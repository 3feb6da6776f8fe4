"""Pallas TPU kernel: fused error-bound evaluation + beta bisection.

Each iteration of the VolSDF error-bounded sampler evaluates the opacity
error bound 12x over the same (d_vals, sdf) arrays: once for the
convergence check with the network's beta, `max_bisection` (10) times
inside the beta+ bisection, and once more for the upsampling bounds
(reference volsdf.py:240-282; ops/volsdf_math.fine_sample). Under XLA each
evaluation round-trips [R, N] arrays through HBM (cumsum alone is ~log N
full passes), making this phase bandwidth-bound.

This kernel loads a row-tile of (d_vals, sdf) into VMEM ONCE, precomputes
the shared interval quantities (delta, d*, delta^2), and runs all 12
evaluations — including the sequential bisection — entirely on-chip.
Outputs: the convergence-check max bound, the bisected beta, and the
final clipped bounds for the next upsample.

Cumulative sums run as log2(N) lane-roll+add passes in VMEM
(`_cumsum_lanes`), since arrays never leave the core.

STATUS: experimental, default OFF (`VolSDFRenderCfg.fused_bisect=False`).
Verified correct in interpreter mode (tests/test_fused_bisect.py) and
compiles+runs on the v5e in ~5 s, but repeated invocations destabilized
the axon-tunneled device in round-1 testing; needs on-metal debugging
before becoming the default.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last (lane) axis, in-register."""
    n = x.shape[-1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=len(x.shape) - 1)
        x = x + jnp.where(ids >= shift, rolled, 0.0)
        shift *= 2
    return x


def make_fused_bisect(N: int, max_bisection: int, eps: float,
                      tile_r: int = 64):
    """Build the kernel for a static sample count N.

    Call signature of the returned function:
      (d_vals [R, N], sdf [R, N], beta_hi [R, 1],
       alpha_net [1,1], beta_net [1,1])
      -> (net_bounds_max [R, 1], beta_out [R, 1], bounds [R, N-1])
    """
    def kernel(d_ref, sdf_ref, bhi_ref, anet_ref, bnet_ref,
               nbm_ref, beta_ref, bounds_ref):
        d = d_ref[:]
        sdf = sdf_ref[:]
        sdf_abs = jnp.abs(sdf)
        delta = d[:, 1:] - d[:, :-1]                       # [T, N-1]
        d_star = jnp.maximum(
            0.5 * (sdf_abs[:, :-1] + sdf_abs[:, 1:] - delta), 0.0)
        dsq = delta * delta

        def bound(alpha, beta, need_bounds=False):
            # sigma at sample points (first N-1 used for R_t)
            e = 0.5 * jnp.exp(-sdf_abs / beta)
            psi = jnp.where(sdf >= 0, e, 1 - e)
            sigma = alpha * psi                            # [T, N]
            seg = sigma[:, :-1] * delta                    # [T, N-1]
            cs = _cumsum_lanes(seg)
            # R_t at interval starts: exclusive cumsum = cs shifted right
            ids = jax.lax.broadcasted_iota(jnp.int32, cs.shape, 1)
            R_t = jnp.where(ids >= 1, pltpu.roll(cs, 1, axis=1), 0.0)
            errors = (alpha / (4.0 * beta)) * dsq * jnp.exp(-d_star / beta)
            errors_t = _cumsum_lanes(errors)
            b = jnp.exp(-R_t) * (jnp.exp(errors_t) - 1.0)
            b = jnp.where(jnp.isnan(b), jnp.inf, b)
            if need_bounds:
                return b
            return jnp.max(b, axis=-1, keepdims=True)      # [T, 1]

        alpha_net = anet_ref[0, 0]
        beta_net = bnet_ref[0, 0]
        nbm_ref[:] = bound(alpha_net, beta_net)

        # rolled loop: keeps the Mosaic program small (a fully unrolled
        # 10-step bisection of log-N cumsum passes explodes compile time)
        def bisect_step(_, carry):
            beta_left, beta_right = carry
            beta_tmp = 0.5 * (beta_left + beta_right)
            btm = bound(1.0 / beta_tmp, beta_tmp)
            le = btm <= eps
            return (jnp.where(le, beta_left, beta_tmp),
                    jnp.where(le, beta_tmp, beta_right))

        beta_right0 = bhi_ref[:]
        beta_left0 = jnp.full_like(beta_right0, beta_net)
        _, beta_right = jax.lax.fori_loop(
            0, max_bisection, bisect_step, (beta_left0, beta_right0))
        beta_ref[:] = beta_right
        final_b = jnp.clip(
            bound(1.0 / beta_right, beta_right, need_bounds=True), 0.0, 1e5)
        # the bounds block is padded to N lanes (dead last column) so every
        # VMEM block in the kernel keeps a 128-aligned lane dimension when
        # N is a multiple of 128 (sample counts 640 + 512k are) — guide
        # pitfall #2; the caller slices the pad off
        bounds_ref[:] = jnp.concatenate(
            [final_b, jnp.zeros_like(final_b[:, :1])], axis=1)

    @jax.jit
    def run(d_vals, sdf, beta_hi, alpha_net, beta_net):
        R = d_vals.shape[0]
        n_tiles = -(-R // tile_r)
        Rp = n_tiles * tile_r
        if Rp != R:
            pad = ((0, Rp - R), (0, 0))
            d_vals = jnp.pad(d_vals, pad, constant_values=1.0)
            sdf = jnp.pad(sdf, pad, constant_values=1.0)
            beta_hi = jnp.pad(beta_hi, pad, constant_values=1.0)
        anet = jnp.asarray(alpha_net, jnp.float32).reshape(1, 1)
        bnet = jnp.asarray(beta_net, jnp.float32).reshape(1, 1)

        nbm, beta_out, bounds = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tile_r, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Rp, N), jnp.float32),
            ),
        )(d_vals, sdf, beta_hi, anet, bnet)
        return nbm[:R, 0], beta_out[:R], bounds[:R, :N - 1]

    return run


@functools.lru_cache(maxsize=32)
def get_fused_bisect(N: int, max_bisection: int, eps: float,
                     tile_r: int = 64):
    return make_fused_bisect(N, max_bisection, eps, tile_r)
