"""Test configuration: force a LOCAL CPU backend with 8 virtual devices so
tests are fast and multi-chip sharding tests run without TPU hardware (the
driver separately dry-runs the multi-chip path; see __graft_entry__.py).

NOTE: this environment force-registers a tunneled TPU PJRT plugin via a
sitecustomize on PYTHONPATH and sets JAX_PLATFORMS=axon; both must be
overridden explicitly (env setdefault is not enough) or every op dispatches
over the tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by the sitecustomize, in which case the env var
# is too late — set the config knob directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", f"tests must run on CPU, got {jax.devices()}"
