"""Test configuration: force CPU backend with a virtual 8-device mesh.

Multi-chip hardware is not available in CI; sharding tests run against
``--xla_force_host_platform_device_count=8`` (the analog of the reference's
single-machine multi-robot simulation via namespaced rosbag replay,
reference ``launch/test_distributed_loop.launch:34-58``).

Note: the environment's sitecustomize imports jax and registers the axon TPU
backend before pytest starts, so the JAX_PLATFORMS env var is already baked
into jax.config — we must override via jax.config.update instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA CPU compiles dominate suite time on this box
jax.config.update("jax_compilation_cache_dir", "/tmp/scl_slam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import numpy as _np
import pytest as _pytest


@_pytest.fixture(scope="session")
def mesh8():
    """8-device mesh; fails loudly if the virtual-device flag didn't take."""
    from jax.sharding import Mesh

    devs = _np.array(jax.devices()[:8])
    assert len(devs) == 8, "tests require the 8-device CPU mesh (see conftest)"
    return Mesh(devs, ("shard",))
