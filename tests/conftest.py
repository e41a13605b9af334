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


# ---------------------------------------------------------------------------
# Test tiers (see tests/run_all.py). torchdep files import torch or
# transformers (which itself loads torch): torch's OpenMP/LLVM runtime in
# the same process as XLA:CPU compilation produced segfaults deep in
# backend_compile_and_load (r3: full suite died at ~test 270; r4: isolated
# repro in test_stacked after test_bpe had pulled torch in), so they run
# in their own pytest process.
# ---------------------------------------------------------------------------
TORCHDEP_FILES = {
    "test_bpe.py",              # transformers GPT2Tokenizer parity
    "test_cnn_models.py",
    "test_olive_whole_model_oracle.py",
    "test_harness.py",
    "test_hf_parity.py",
    "test_inception.py",
    "test_ovp.py",
    "test_reference_oracle.py",
    "test_tokenization.py",     # transformers BertTokenizer parity
    "test_transformer_lm.py",
    "test_whole_model_oracle.py",
}

# Fast, wide-coverage files for the <5-min default iteration gate.
QUICK_FILES = {
    "test_affine.py", "test_bitcodec.py", "test_codebooks.py",
    "test_fake_quant.py", "test_snap.py", "test_graph_ir.py",
    "test_loopnest.py", "test_perfmodel.py", "test_attention_kernel.py",
    "test_sampling.py", "test_recipes.py", "test_print_result.py",
    "test_outlier_mode.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in TORCHDEP_FILES:
            item.add_marker(pytest.mark.torchdep)
        if base in QUICK_FILES:
            item.add_marker(pytest.mark.quick)


def pytest_sessionfinish(session, exitstatus):
    # Guard: if this session selected no torchdep test yet torch ended up
    # loaded, a new transitive import has leaked torch into the JAX tier.
    # run_all.py greps for this line and fails the run.
    import sys as _sys
    sel = getattr(session, "items", [])
    if sel and not any(i.get_closest_marker("torchdep") for i in sel) \
            and "torch" in _sys.modules:
        print("\nTORCH-LEAK-GUARD: torch was imported during a JAX-tier "
              "run; move the importing test into TORCHDEP_FILES "
              "(tests/conftest.py)", flush=True)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
