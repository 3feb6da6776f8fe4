"""NeRF-style frequency positional encoding.

Semantics match the reference `Embedder` (reference models/base.py:14-81):
log-sampled bands 2^0 .. 2^(multires-1), `include_input=True`, and output
ordering `[x, sin(x*f_0), cos(x*f_0), sin(x*f_1), cos(x*f_1), ...]` — the
inner loop over (sin, cos) per frequency matters for checkpoint parity of
downstream layers' input columns.

TPU note: the embedding is computed as one broadcasted multiply + sin/cos,
fused by XLA into the consumer matmul's producer; no gather, no loop.
"""
import functools

import jax.numpy as jnp


def embed_dim(input_dim: int, multires: int, include_input: bool = True) -> int:
    """Output dim of `fourier_embed`. multires < 0 means identity."""
    if multires < 0:
        return input_dim
    out = input_dim if include_input else 0
    return out + input_dim * multires * 2


@functools.partial(jnp.vectorize, signature="(d)->(e)", excluded=(1, 2))
def _fourier_embed_vec(x, multires, include_input):  # pragma: no cover - thin wrapper
    return _fourier_embed_impl(x, multires, include_input)


def _fourier_embed_impl(x, multires, include_input):
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    # [..., F, d]
    xb = x[..., None, :] * freqs[:, None]
    # interleave per-frequency: sin(f_i * x), cos(f_i * x)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # [..., F, 2, d] -> [..., F*2*d] with order (f0 sin, f0 cos, f1 sin, ...)
    enc = jnp.stack([sin, cos], axis=-2).reshape(*x.shape[:-1], -1)
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc


def fourier_embed(x: jnp.ndarray, multires: int, include_input: bool = True) -> jnp.ndarray:
    """Frequency-encode `x` [..., d] -> [..., embed_dim(d, multires)].

    multires < 0 returns `x` unchanged (reference base.py:67-69 returns
    nn.Identity for multires < 0).
    """
    if multires < 0:
        return x
    return _fourier_embed_impl(x, multires, include_input)
