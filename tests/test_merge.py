"""merge_sorted must exactly reproduce concat+sort for sorted inputs."""
import jax
import jax.numpy as jnp
import numpy as np

from nerfart_tpu.ops.sampling import merge_sorted


def test_merge_sorted_matches_sort():
    key = jax.random.PRNGKey(0)
    a = jnp.sort(jax.random.uniform(key, (7, 33)), axis=-1)
    b = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (7, 12)), axis=-1)
    pa = a * 2.0
    pb = b * 2.0
    merged, payload = merge_sorted(a, b, pa, pb)
    ref = np.sort(np.concatenate([np.asarray(a), np.asarray(b)], -1), -1)
    np.testing.assert_allclose(np.asarray(merged), ref, atol=0)
    # payload rides with its key
    np.testing.assert_allclose(np.asarray(payload),
                               np.asarray(merged) * 2.0, rtol=1e-6)


def test_merge_sorted_with_ties():
    a = jnp.asarray([[0.0, 1.0, 1.0, 2.0]])
    b = jnp.asarray([[1.0, 2.0, 3.0]])
    merged = merge_sorted(a, b)
    np.testing.assert_allclose(np.asarray(merged)[0],
                               [0.0, 1.0, 1.0, 1.0, 2.0, 2.0, 3.0])


def test_merge_sorted_nd_prefix():
    a = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 9)), -1)
    b = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 5)), -1)
    merged = merge_sorted(a, b)
    assert merged.shape == (2, 3, 14)
    ref = np.sort(np.concatenate([np.asarray(a), np.asarray(b)], -1), -1)
    np.testing.assert_allclose(np.asarray(merged), ref)
