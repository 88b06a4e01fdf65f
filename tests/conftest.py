"""Test config: force a REAL 8-virtual-device CPU backend.

Environment trap on this machine (documented in
.claude/skills/verify/SKILL.md): ``PYTHONPATH=/root/.axon_site`` loads a
sitecustomize registering the axon TPU plugin, which rewrites platform
selection — with it active, the ``JAX_PLATFORMS=cpu`` *env var* still hands
you the tunneled TPU chip, and tests would run over the tunnel: slow,
single-device, TPU bf16 default matmul precision.

The in-process escape: set ``XLA_FLAGS`` before any backend is created and
override platform selection through ``jax.config`` (which the hook honors,
unlike the env var). Opt out — to deliberately run the suite against the
real TPU — with ``IVT_TEST_ON_TPU=1``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("IVT_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
