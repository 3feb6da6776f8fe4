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
