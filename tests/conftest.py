"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device virtualization (the same SPMD partitioner as real
TPUs), mirroring the reference's mock-fabric/meta-device distributed test
strategy (reference tests/test_generate_tp.py:14-103).

NOTE: the environment force-registers the 'axon' TPU platform and overrides
JAX_PLATFORMS, so the env var alone is not enough — we also set the platform
programmatically after importing jax.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (tiny models,
# many jitted programs over the 8-device mesh), so warm reruns — the common
# case for local dev and the CI driver retry loop — skip most of it. The
# cache dir is gitignored; cold CI runs simply repopulate it.
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).parent.parent / ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
