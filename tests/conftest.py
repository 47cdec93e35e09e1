"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (SURVEY.md §4 implication (e)).

Note: this environment force-selects the experimental 'axon' TPU platform
via env; `jax.config.update` (not the env var) reliably overrides it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
