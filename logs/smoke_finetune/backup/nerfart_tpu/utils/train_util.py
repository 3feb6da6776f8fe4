"""Training utilities (reference utils/train_util.py).

`batchify_query` exists for API familiarity when querying networks over
huge point sets outside a renderer (e.g. ad-hoc analysis): it chunks the
batch dim with `lax.map` inside one jit program. Inside the renderers it is
unnecessary — XLA tiles the matmuls (SURVEY.md §2.6 P4).
"""
from typing import Any, Callable

import jax
import jax.numpy as jnp


def batchify_query(query_fn: Callable, *args: jnp.ndarray,
                   chunk: int = 2 ** 20, dim_batchify: int = 0) -> Any:
    """Apply query_fn over `args` in fixed-size chunks along dim_batchify
    (reference train_util.py:23-75). Returns stacked outputs (tuple-safe).
    """
    moved = [jnp.moveaxis(a, dim_batchify, 0) for a in args]
    N = moved[0].shape[0]
    if N <= chunk:
        out = query_fn(*args)
        return out
    n_blocks = -(-N // chunk)
    pad = n_blocks * chunk - N

    def prep(a):
        a = jnp.concatenate(
            [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0)
        return a.reshape(n_blocks, chunk, *a.shape[1:])

    blocks = [prep(a) for a in moved]

    def apply_block(xs):
        unmoved = [jnp.moveaxis(x, 0, dim_batchify) if dim_batchify else x
                   for x in xs]
        return query_fn(*unmoved)

    out = jax.lax.map(apply_block, tuple(blocks))

    def fix(o):
        # lax.map stacks blocks at axis 0; the block outputs carry their
        # batch dim at dim_batchify
        o = jnp.moveaxis(o, dim_batchify + 1, 1)
        o = o.reshape(n_blocks * chunk, *o.shape[2:])[:N]
        return jnp.moveaxis(o, 0, dim_batchify) if dim_batchify else o

    return jax.tree_util.tree_map(fix, out)


def calc_grad_norm(norm_type: float = 2.0, **grads: Any):
    """Per-module and total gradient norms (reference train_util.py:5-15)."""
    norms = {}
    total = 0.0
    for name, g in grads.items():
        leaves = jax.tree_util.tree_leaves(g)
        n = sum(jnp.sum(jnp.abs(l) ** norm_type) for l in leaves)
        norms[name] = n ** (1.0 / norm_type)
        total = total + n
    norms["total"] = total ** (1.0 / norm_type)
    return norms


def count_trainable_parameters(params: Any) -> int:
    """(reference train_util.py:18-20)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
