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

# Persistent compile cache: repeated runs of the slow e2e tests skip the
# XLA CPU compile (the dominant cost on a 1-core CI box). Keyed by host
# CPU features: CPU-backend entries are AOT machine code and blobs from
# a different host SIGILL / spray feature-mismatch errors (VERDICT r2
# weak #6); keyed by raw CPUID (btcdet_tpu/utils/hostkey.py): the
# firecracker cpuinfo template is host-invariant, CPUID is not.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from btcdet_tpu.utils.hostkey import host_cache_tag  # noqa: E402

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache", host_cache_tag())
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: model-scale e2e tests (minutes of XLA CPU compile each; "
        "excluded from the smoke suite: pytest -m 'not slow')",
    )
