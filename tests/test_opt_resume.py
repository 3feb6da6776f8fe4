"""Optimizer-state checkpoint roundtrip: Adam moments must survive the
npz save -> load -> tree_unflatten path train.py uses, so resumed training
continues identically."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfart_tpu.utils.checkpoints import CheckpointIO
import pytest

pytestmark = pytest.mark.slow


def test_adam_state_roundtrip(tmp_path):
    params = {"w": jnp.ones((4, 3)), "layers": [{"b": jnp.zeros(5)}]}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    # advance a few steps so moments are non-trivial
    def loss(p):
        return (p["w"] ** 2).sum() + (p["layers"][0]["b"] ** 2).sum()

    for _ in range(3):
        g = jax.grad(loss)(params)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)

    io = CheckpointIO(str(tmp_path))
    io.register_modules(model=lambda: params, optimizer=lambda: opt_state)
    io.save("latest.npz", global_step=3)

    blob = io.load_file("latest.npz")
    # rebuild exactly as train.py does (train.py opt_state restore)
    params2 = jax.tree_util.tree_map(jnp.asarray, blob["model"])
    restored = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(optimizer.init(params2)),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(jnp.asarray, blob["optimizer"])))

    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # one more step from both: identical updates
    g = jax.grad(loss)(params)
    u1, _ = optimizer.update(g, opt_state, params)
    u2, _ = optimizer.update(g, restored, params2)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
