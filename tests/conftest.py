"""Test configuration: force an 8-device virtual CPU mesh.

Must run before `import jax` anywhere, which pytest guarantees by importing
conftest first. This is the JAX "fake backend" for multi-device testing
without a TPU (the reference had no analog; its DDP paths were only ever
testable on real hardware, cf. SURVEY.md §4).
"""
import os

# FORCE cpu: the ambient environment sets JAX_PLATFORMS=axon (the tunneled
# TPU), which must never be used by the test suite (single shared chip,
# and eager dispatch over the tunnel is pathologically slow).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

import jax

# Belt and braces: if jax was imported before this conftest (pytest plugin
# autoload), it already captured JAX_PLATFORMS=axon from the ambient env at
# import time — override via config, which wins as long as no backend has
# been initialized yet.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch-f32 golden data; XLA's reduced default
# matmul precision would dominate the tolerance budget.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA CPU compiles dominate test wall-clock on
# small machines; cache them across pytest runs.
_cache = pathlib.Path(__file__).parent / ".jax_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Load a golden .npz recorded from the reference implementation."""
    def _load(name):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden data {name}.npz not generated")
        return dict(np.load(path, allow_pickle=True))
    return _load
