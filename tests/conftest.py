"""Test configuration: run everything on an 8-device virtual CPU mesh.

The environment may pre-register a remote TPU PJRT plugin (sitecustomize)
and force jax_platforms to it; tests must run locally on CPU, so we both set
the env vars and override the jax config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize's plugin registration updates jax_platforms at interpreter
# start (after which env vars are ignored); force it back before first use.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native perfmodel libraries once if missing (fresh checkouts).
_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
if not os.path.exists(os.path.join(_CSRC, "libtileopt.so")):
    import subprocess
    subprocess.run(["make", "-C", _CSRC], check=False, capture_output=True)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
