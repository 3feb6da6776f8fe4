"""Platform-selection hardening.

Observed on the axon-tunneled TPU environment: with the remote PJRT server
unreachable, a process with `JAX_PLATFORMS=cpu` in its environment STILL
hangs at first backend use (the plugin handshakes during discovery), while
`jax.config.update("jax_platforms", ...)` short-circuits before the plugin
runs. Call `apply_env_platform()` before any jax usage in every entry
point so an explicit CPU request can never be wedged by the tunnel.
"""
import os


def apply_env_platform():
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass
    # every TPU entry point shares the persistent executable cache: over
    # the tunneled backend a full-frame render program costs minutes to
    # compile, and cross-process reuse (train CLI warms the bench, etc.)
    # is the difference between a driver bench that measures and one that
    # dies compiling (BENCH_r04's reference_budget_error).
    if plats != "cpu" and not os.environ.get("NERFART_NO_COMPILE_CACHE"):
        enable_compile_cache()


def enable_compile_cache(cache_dir=None):
    """Persistent XLA executable cache (same policy as bench.py): over the
    tunneled backend, compilation dominates cold-start (minutes for a
    full-frame render program); a warm on-disk cache skips it. No-op if
    the backend doesn't serialize executables."""
    import jax
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.join(repo, ".jax_cache_tpu"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
