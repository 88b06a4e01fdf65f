"""Test config: force a REAL 8-virtual-device CPU backend.

Two environment traps on this machine (documented in
.claude/skills/verify/SKILL.md):

1. ``PYTHONPATH=/root/.axon_site`` loads a sitecustomize that registers the
   axon TPU plugin and REWRITES platform selection — with it active,
   ``JAX_PLATFORMS=cpu`` still hands you the tunneled TPU chip, and
   ``--xla_force_host_platform_device_count`` is ignored. Tests would then
   run over the TPU tunnel: slow, single-device, and with TPU bf16 default
   matmul precision.
2. The sitecustomize only activates when ``PALLAS_AXON_POOL_IPS`` is set.

Since the hook runs at interpreter start (before conftest), we re-exec
pytest once with the axon trigger cleared and the standard JAX
fake-multi-device env (SURVEY.md §4d). Opt out (to deliberately test on the
TPU) with ``IVT_TEST_ON_TPU=1``.
"""

import os
import sys

_WANT = {
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
}


def _axon_active() -> bool:
    return "axon" in sys.modules and os.environ.get("PALLAS_AXON_POOL_IPS")


if (
    _axon_active()
    and os.environ.get("IVT_TEST_ON_TPU") != "1"
    and os.environ.get("_IVT_REEXECED") != "1"
):
    env = dict(os.environ)
    env.update(_WANT)
    env["_IVT_REEXECED"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
