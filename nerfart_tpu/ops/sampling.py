"""Inverse-CDF sampling along rays.

`sample_pdf` / `sample_cdf` match the reference's searchsorted-based
hierarchical sampling (reference utils/rend_util.py:256-327), including the
`denom < eps -> 1` guard and the zero-prepended CDF. Randomness is an
explicit PRNG key.

TPU note: the CDF inversion is a masked compare-and-reduce, NOT
searchsorted + take_along_axis. Profiled on v5e, XLA lowers last-axis
gathers to an effectively scalar loop (~1.6 GB/s; 5.4 ms for a
[1080, 514] take from [1080, 512]), and `jnp.searchsorted`'s default
binary search issues log2(N) such gathers — together they were 58% of
the whole reference-budget render. Because both `bins` and `cdf` are
sorted, the four gathered values can instead be computed as masked
min/max reductions over a broadcast compare ([R, M, N] fused on the
VPU, nothing materialized), which is >10x faster here.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def _invert_cdf(bins: jnp.ndarray, cdf: jnp.ndarray, u: jnp.ndarray, eps: float) -> jnp.ndarray:
    # cdf: [..., M] (already zero-prepended so M == bins.shape[-1]);
    # both bins and cdf MUST be nondecreasing along the last axis.
    # For inds = searchsorted(cdf, u) (side='left'), below = inds-1
    # clipped to 0 and above = inds clipped to M-1:
    #   x[below] = max(x[j] where cdf[j] < u, else x[0])   (x sorted)
    #   x[above] = min(x[j] where cdf[j] >= u, else x[-1])
    mask = cdf[..., None, :] < u[..., :, None]          # [..., M_u, M]
    lo_cdf, lo_bins = cdf[..., :1], bins[..., :1]
    hi_cdf, hi_bins = cdf[..., -1:], bins[..., -1:]
    cdf_g0 = jnp.max(jnp.where(mask, cdf[..., None, :], lo_cdf[..., None, :]), axis=-1)
    bins_g0 = jnp.max(jnp.where(mask, bins[..., None, :], lo_bins[..., None, :]), axis=-1)
    cdf_g1 = jnp.min(jnp.where(mask, hi_cdf[..., None, :], cdf[..., None, :]), axis=-1)
    bins_g1 = jnp.min(jnp.where(mask, hi_bins[..., None, :], bins[..., None, :]), axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def merge_sorted(d_a: jnp.ndarray, d_b: jnp.ndarray, *payloads):
    """Merge two per-row-sorted arrays [..., n] and [..., m] into sorted
    [..., n+m], carrying (a_payload, b_payload) pairs along.

    TPU note: replaces concat+argsort (an O(n log^2 n) bitonic network)
    with two vectorized binary searches + one permutation gather — the
    dominant cost of the iterative upsamplers' per-iteration re-sort.

    payloads: pairs (pa [..., n], pb [..., m]) merged with the keys.
    Returns (merged_d, *merged_payloads).
    """
    n = d_a.shape[-1]
    m = d_b.shape[-1]
    flat_a = d_a.reshape(-1, n)
    flat_b = d_b.reshape(-1, m)
    # position of a_i in the merged row: i + #(b < a_i); ties put a first
    pos_a = jnp.arange(n) + jax.vmap(
        lambda b, a: jnp.searchsorted(b, a, side="left"))(flat_b, flat_a)
    pos_b = jnp.arange(m) + jax.vmap(
        lambda a, b: jnp.searchsorted(a, b, side="right"))(flat_a, flat_b)
    rows = flat_a.shape[0]
    row_ids = jnp.arange(rows)[:, None]
    perm = (jnp.zeros((rows, n + m), jnp.int32)
            .at[row_ids, pos_a].set(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (rows, n)))
            .at[row_ids, pos_b].set(
                n + jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32),
                                     (rows, m))))

    def apply(a, b):
        cat = jnp.concatenate(
            [a.reshape(-1, n), b.reshape(-1, m)], axis=-1)
        out = jnp.take_along_axis(cat, perm, axis=-1)
        return out.reshape(*d_a.shape[:-1], n + m)

    outs = [apply(d_a, d_b)]
    assert len(payloads) % 2 == 0
    for i in range(0, len(payloads), 2):
        outs.append(apply(payloads[i], payloads[i + 1]))
    return tuple(outs) if len(outs) > 1 else outs[0]


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Hierarchical importance sampling (rend_util.py:256-293).

    bins: [..., M]; weights: [..., M-1] -> samples [..., N_importance].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, N_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], N_importance))
    else:
        assert key is not None, "sample_pdf with det=False needs a PRNG key"
        u = jax.random.uniform(key, (*cdf.shape[:-1], N_importance), dtype=cdf.dtype)
    return _invert_cdf(bins, jax.lax.stop_gradient(cdf), u, eps)


def sample_cdf(
    bins: jnp.ndarray,
    cdf: jnp.ndarray,
    N_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-sample a given (unnormalized, possibly <1) CDF (rend_util.py:295-327).

    bins: [..., M]; cdf: [..., M-1] -> samples [..., N_importance].
    """
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    if det:
        u = jnp.linspace(0.0, 1.0, N_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], N_importance))
    else:
        assert key is not None, "sample_cdf with det=False needs a PRNG key"
        u = jax.random.uniform(key, (*cdf.shape[:-1], N_importance), dtype=cdf.dtype)
    return _invert_cdf(bins, jax.lax.stop_gradient(cdf), u, eps)
