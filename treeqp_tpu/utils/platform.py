"""Platform selection helpers.

This build environment's sitecustomize force-registers a remote TPU ("axon")
PJRT backend and pins ``jax_platforms`` to it; setting the ``JAX_PLATFORMS``
env var has no effect. Use these helpers to select the backend explicitly.
On the remote-TPU backend every eager op / host transfer is an RPC over a
tunnel — keep everything under jit and minimize host transfers there.
"""

import jax

__all__ = ["use_cpu", "use_default_accelerator"]


def use_cpu(virtual_devices: int | None = None):
    """Force the local CPU backend (optionally with N virtual devices)."""
    import os

    if virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}")
    jax.config.update("jax_platforms", "cpu")


def use_default_accelerator():
    """Use the environment's default backend (the TPU when available)."""
    jax.config.update("jax_platforms", None)
