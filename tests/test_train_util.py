import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.utils.train_util import (batchify_query, calc_grad_norm,
                                          count_trainable_parameters)


def test_batchify_query_matches_direct():
    def fn(x, y):
        return x * 2 + y.sum(-1, keepdims=True), x[..., :1]

    x = jax.random.normal(jax.random.PRNGKey(0), (37, 5))
    y = jax.random.normal(jax.random.PRNGKey(1), (37, 3))
    direct = fn(x, y)
    chunked = batchify_query(fn, x, y, chunk=8)
    np.testing.assert_allclose(chunked[0], direct[0], rtol=1e-6)
    np.testing.assert_allclose(chunked[1], direct[1], rtol=1e-6)


def test_batchify_query_dim1():
    def fn(x):
        return jnp.cumsum(x, axis=0)  # depends on non-batch dim only

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 19, 2))
    direct = fn(x)
    chunked = batchify_query(fn, x, chunk=5, dim_batchify=1)
    np.testing.assert_allclose(chunked, direct, rtol=1e-6)


def test_grad_norm_and_count():
    params = {"a": jnp.ones((3, 4)), "b": [jnp.ones(2), jnp.full(5, 2.0)]}
    assert count_trainable_parameters(params) == 12 + 2 + 5
    norms = calc_grad_norm(mod=params)
    expect = np.sqrt(12 * 1 + 2 * 1 + 5 * 4.0)
    np.testing.assert_allclose(float(norms["total"]), expect, rtol=1e-6)
