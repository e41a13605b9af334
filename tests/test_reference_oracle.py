"""Numerical parity against the REFERENCE IMPLEMENTATION itself.

Imports the reference's torch quantizer (read-only, from /root/reference)
with its CUDA kernel replaced by an exact pure-torch shim of the
documented semantics (linear scan over the ascending grid with `<=`
comparison — ties snap to the larger value, quant_kernel.cu:29-36), runs
its real calibration + fake-quant on random tensors, and asserts our JAX
pipeline produces the same grids, alphas, chosen types, and quantized
outputs. This is the strongest parity evidence available without GPUs or
datasets: the two implementations share no code, only behavior.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/ant_quantization/antquant"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

torch = pytest.importorskip("torch")

import jax                                                 # noqa: E402
import jax.numpy as jnp                                    # noqa: E402

from ant_quantization_tpu.calibrate.search import (apply_quant,  # noqa: E402
                                                   calibrate)
from ant_quantization_tpu.calibrate.spec import SiteConfig  # noqa: E402
from ant_quantization_tpu.numerics import codebooks as cb   # noqa: E402


def _install_shim():
    """Pure-torch quant_cuda.quant with the kernel's exact tie rule."""
    if "quant_cuda" in sys.modules:
        return
    mod = types.ModuleType("quant_cuda")

    def quant(x_flat, grid):
        d = (x_flat[:, None] - grid[None, :]).abs()
        g = grid.shape[0]
        # scan updates on `<=`: the LAST index attaining the min wins
        idx = g - 1 - torch.argmin(d.flip(1), dim=1)
        return grid[idx].clone(), idx.to(torch.int32)

    mod.quant = quant
    sys.modules["quant_cuda"] = mod


@pytest.fixture(scope="module")
def refmod(tmp_path_factory):
    _install_shim()
    sys.path.insert(0, REF)
    import torch.distributed as dist
    if not dist.is_initialized():
        f = tmp_path_factory.mktemp("pg") / "store"
        dist.init_process_group("gloo", init_method=f"file://{f}",
                                rank=0, world_size=1)
    import quant_modules
    return quant_modules


def _ref_quantizer(refmod, mode, bit, is_input=False, w=(75, 150),
                   a=(75, 150)):
    args = types.SimpleNamespace(w_low=w[0], w_up=w[1], a_low=a[0],
                                 a_up=a[1], percent=100, search=False)
    q = refmod.TensorQuantizer(mode=mode, bit=bit,
                               is_signed=not is_input,
                               is_enable=True, is_input=is_input,
                               args=args)
    q.enable_quantization("oracle")
    return q


def _site(mode, bit, is_input, w=(75, 150), a=(75, 150)):
    return SiteConfig(bit=bit, is_input=is_input,
                      is_signed=not is_input, mode=mode, family="ant",
                      w_low=w[0], w_up=w[1], a_low=a[0], a_up=a[1])


@pytest.mark.parametrize("mode,bit", [
    ("int", 4), ("pot", 4), ("flint", 4), ("float", 4),
    ("int", 6), ("flint", 6), ("apot", 4),
])
def test_codebooks_match_reference(refmod, mode, bit):
    q = _ref_quantizer(refmod, mode, bit)
    q.is_signed = True
    fn = {"int": q.int_value, "pot": q.pot_value, "flint": q.flint_value,
          "float": q.float_value, "apot": q.apot_value}[mode]
    want = np.sort(fn().numpy())
    ours = np.sort(np.asarray(cb.ant_grid(mode, bit, True)))
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ["ant-int-pot-flint",
                                  "ant-int-pot-float-flint", "int",
                                  "flint"])
def test_weight_calibration_matches_reference(refmod, mode):
    rng = np.random.default_rng(0)
    w_ref = rng.normal(size=(6, 48)).astype(np.float32)   # (C, K) torch
    q = _ref_quantizer(refmod, mode, 4)
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = _site(mode, 4, is_input=False)
    state = calibrate(jnp.asarray(w_ref.T), cfg)          # (K, C) ours
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T

    np.testing.assert_allclose(
        np.asarray(state.alpha).ravel(),
        q.alpha.detach().numpy().ravel(), rtol=1e-5, atol=1e-6)
    if mode.startswith("ant-"):
        chosen = cfg.candidate_modes[int(state.mode_idx)]
        assert chosen == q.mode
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_activation_calibration_matches_reference(refmod):
    rng = np.random.default_rng(1)
    x = np.abs(rng.normal(size=(4, 32)).astype(np.float32))  # unsigned
    q = _ref_quantizer(refmod, "ant-int-pot-flint", 4, is_input=True)
    got_ref = q.tensor_forward(torch.from_numpy(x)).detach().numpy()

    cfg = _site("ant-int-pot-flint", 4, is_input=True)
    state = calibrate(jnp.asarray(x), cfg)
    got = np.asarray(apply_quant(jnp.asarray(x), state, cfg))

    np.testing.assert_allclose(float(state.alpha),
                               float(q.alpha), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_8bit_forces_int_like_reference(refmod):
    rng = np.random.default_rng(2)
    w_ref = rng.normal(size=(4, 24)).astype(np.float32)
    q = _ref_quantizer(refmod, "ant-int-pot-flint", 8)
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()
    assert q.mode == "int"                      # bit > 6 forces int

    cfg = _site("ant-int-pot-flint", 8, is_input=False)
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# OliVe (olive_quantization/antquant): OVP + 3-sigma + abfloat outliers
# ---------------------------------------------------------------------------

OREF = "/root/reference/olive_quantization/antquant"


@pytest.fixture(scope="module")
def olivemod(refmod):
    """Load the olive fork under a distinct module name (both forks call
    themselves quant_modules)."""
    import importlib.util
    sys.path.insert(0, OREF)
    spec = importlib.util.spec_from_file_location(
        "olive_quant_modules", os.path.join(OREF, "quant_modules.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["olive_quant_modules"] = mod
    spec.loader.exec_module(mod)
    return mod


def _olive_quantizer(olivemod, mode, bit, is_input=False,
                     no_outlier=False):
    args = types.SimpleNamespace(w_low=75, w_up=250, a_low=75, a_up=250,
                                 percent=100, search=False,
                                 no_outlier=no_outlier)
    q = olivemod.TensorQuantizer(mode=mode, bit=bit,
                                 is_signed=not is_input,
                                 is_enable=True, is_input=is_input,
                                 args=args)
    q.enable_quantization("olive_oracle")
    return q


def _olive_site(mode, bit, is_input, no_outlier=False):
    return SiteConfig(bit=bit, is_input=is_input, is_signed=not is_input,
                      mode=mode, family="olive", w_low=75, w_up=250,
                      a_low=75, a_up=250, scan_step=2,
                      no_outlier=no_outlier, pair_axis=0)


@pytest.mark.parametrize("mode,bit", [("int", 4), ("flint", 4)])
def test_olive_codebooks_match_reference(olivemod, mode, bit):
    q = _olive_quantizer(olivemod, mode, bit)
    q.is_signed = True
    fn = {"int": q.int_value, "flint": q.flint_value}[mode]
    want = np.sort(fn().numpy())
    ours = np.sort(np.asarray(cb.olive_grid(mode, bit, True)))
    np.testing.assert_allclose(ours, want, rtol=1e-6, atol=1e-7)
    # abfloat outlier grid
    want_o = np.sort(q.outlier_value().numpy())
    ours_o = np.sort(np.asarray(cb.olive_outlier_values(bit, True)))
    np.testing.assert_allclose(ours_o, want_o, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ["ant-int-flint", "int", "flint"])
def test_olive_weight_ovp_matches_reference(olivemod, mode):
    rng = np.random.default_rng(3)
    # heavy-tailed weights so outliers + victims actually occur
    w_ref = (rng.normal(size=(6, 48)) ** 3).astype(np.float32)
    q = _olive_quantizer(olivemod, mode, 4)
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = _olive_site(mode, 4, is_input=False)
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T

    np.testing.assert_allclose(
        np.asarray(state.alpha).ravel(),
        q.alpha.detach().numpy().ravel(), rtol=1e-5, atol=1e-6)
    if mode.startswith("ant-"):
        chosen = cfg.candidate_modes[int(state.mode_idx)]
        assert chosen == q.mode
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_olive_activation_matches_reference(olivemod):
    rng = np.random.default_rng(4)
    x = (rng.normal(size=(4, 32)) ** 3).astype(np.float32)
    q = _olive_quantizer(olivemod, "ant-int-flint", 4, is_input=True)
    got_ref = q.tensor_forward(torch.from_numpy(x)).detach().numpy()

    cfg = _olive_site("ant-int-flint", 4, is_input=True)
    state = calibrate(jnp.asarray(x), cfg)
    got = np.asarray(apply_quant(jnp.asarray(x), state, cfg))
    np.testing.assert_allclose(float(state.alpha), float(q.alpha),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_olive_no_outlier_matches_reference(olivemod):
    rng = np.random.default_rng(5)
    w_ref = rng.normal(size=(4, 24)).astype(np.float32)
    q = _olive_quantizer(olivemod, "ant-int-flint", 4, no_outlier=True)
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = _olive_site("ant-int-flint", 4, is_input=False, no_outlier=True)
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_gobo_outlier_mode_matches_reference(refmod):
    """GOBO-style 'outlier' baseline: int4 below the percentile threshold,
    16-bit affine above it (quant_modules.py:417-465)."""
    rng = np.random.default_rng(6)
    w_ref = (rng.normal(size=(6, 40)) ** 3).astype(np.float32)
    q = _ref_quantizer(refmod, "outlier", 4)
    q.percent = 0.99
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = SiteConfig(bit=4, is_input=False, is_signed=True,
                     mode="outlier", family="ant", percent=0.99)
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["float1", "float2", "float3", "float4"])
def test_float_exponent_variants_match_reference(refmod, mode):
    """float1..4: the duplicated-float_value quirk — searched with
    exp_bit=1 but finalized at the stated width (quant_modules.py:504-509
    vs :377-402). Non-adaptive direct modes here."""
    rng = np.random.default_rng(7)
    w_ref = rng.normal(size=(4, 32)).astype(np.float32)
    q = _ref_quantizer(refmod, mode, 6)
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = _site(mode, 6, is_input=False)
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T
    np.testing.assert_allclose(
        np.asarray(state.alpha).ravel(),
        q.alpha.detach().numpy().ravel(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,bit", [("ant-int-pot-flint", 6),
                                      ("ant-int-pot-float-flint", 6)])
def test_weight_calibration_6bit_matches_reference(refmod, mode, bit):
    """The PTQ6 configuration (Table V): 64-entry grids, adaptive type."""
    rng = np.random.default_rng(8)
    w_ref = rng.normal(size=(4, 40)).astype(np.float32)
    q = _ref_quantizer(refmod, mode, bit, w=(100, 150))
    got_ref = q.tensor_forward(torch.from_numpy(w_ref)).detach().numpy()

    cfg = _site(mode, bit, is_input=False, w=(100, 150))
    state = calibrate(jnp.asarray(w_ref.T), cfg)
    got = np.asarray(apply_quant(jnp.asarray(w_ref.T), state, cfg)).T
    chosen = cfg.candidate_modes[int(state.mode_idx)]
    assert chosen == q.mode
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-5)


def test_set_8_bit_layer_n_matches_reference(refmod, tmp_path):
    """Promotion policy oracle: same MSEs -> the same sites get 8-bit
    (MSE-ranked pairs + always-promoted last two, quant_model.py:89-149)."""
    # stub the modules quant_model pulls in that need GPUs/torchvision
    import types as _t
    if "torchvision" not in sys.modules:
        tv = _t.ModuleType("torchvision")
        tvm = _t.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_quant_model", os.path.join(REF, "quant_model.py"))
    qm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qm)

    import torch.nn as nn
    mses = [0.5, 0.1, 3.0, 0.2, 0.05, 0.9, 2.0, 0.4]   # per quantizer

    class Site(nn.Module):
        def __init__(self, mw, mi):
            super().__init__()
            self.quant_weight = _ref_quantizer(refmod, "int", 4)
            self.quant_input = _ref_quantizer(refmod, "int", 4,
                                              is_input=True)
            self.quant_weight.mse = torch.tensor(mw)
            self.quant_input.mse = torch.tensor(mi)

    model = nn.Sequential(*[Site(mses[2 * i], mses[2 * i + 1])
                            for i in range(4)])
    qm.set_8_bit_layer_n(model, 3)
    ref_bits = [int(s.quant_weight.bit.item()) for s in model]

    # ours: synthetic quant tree with the same per-site MSE pairs
    from ant_quantization_tpu.calibrate.promote import (quant_sites,
                                                        set_8_bit_layer_n)
    from ant_quantization_tpu.calibrate.spec import placeholder_state

    def qs(mse):
        return placeholder_state(None).replace(
            mse=jnp.asarray(mse, jnp.float32),
            bit=jnp.asarray(4, jnp.int32))

    tree = {f"h_{i}": {"weight_q": qs(mses[2 * i]),
                       "input_q": qs(mses[2 * i + 1])}
            for i in range(4)}
    out = set_8_bit_layer_n(tree, 3)
    our_bits = [int(site["weight_q"].bit)
                for _, site in quant_sites(out)]
    assert our_bits == ref_bits, (our_bits, ref_bits)
    # with n=3 and the last-2 rule, exactly 3 sites are promoted and the
    # promoted non-tail site is the highest-MSE pair (pair 1: 3.0+0.2)
    assert our_bits == [4, 8, 8, 8]


def test_two_batch_calibration_freezes_after_first(refmod):
    """Feed two different batches through the calibration flow: the
    reference's ``has_inited_quant_para`` short-circuit means all state
    comes from batch 1 and batch 2 changes nothing (olive
    quant_modules.py:261, ant :468-470). Our ``calibrate_on_batches``
    must land on the identical state."""
    rng = np.random.default_rng(7)
    a = np.abs(rng.normal(size=(4, 32)).astype(np.float32))
    b = np.abs(rng.normal(size=(4, 32)).astype(np.float32)) * 3.0

    q = _ref_quantizer(refmod, "ant-int-pot-flint", 4, is_input=True)
    q.tensor_forward(torch.from_numpy(a))     # calibrates
    q.tensor_forward(torch.from_numpy(b))     # frozen: must be a no-op
    ref_alpha = float(q.alpha)
    assert int(q.has_inited_quant_para) == 1

    import flax.linen as nn

    from ant_quantization_tpu.harness.evaluate import calibrate_on_batches
    from ant_quantization_tpu.nn.config import QuantConfig
    from ant_quantization_tpu.nn.layers import QuantDense

    class One(nn.Module):
        qcfg: QuantConfig

        @nn.compact
        def __call__(self, x):
            return QuantDense(8, self.qcfg, name="fc")(x)

    qcfg = QuantConfig(mode="ant-int-pot-flint", wbit=4, abit=4)
    m = One(qcfg)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(a))
    variables = {"params": v["params"]}     # no quant: fresh calibration
    quant = calibrate_on_batches(m, variables,
                                 [(jnp.asarray(a),), (jnp.asarray(b),)])
    st = quant["fc"]["input_q"]
    np.testing.assert_allclose(float(st.alpha), ref_alpha,
                               rtol=1e-5, atol=1e-6)
    # and batch-1-only calibration gives the same state (freeze proof)
    quant1 = calibrate_on_batches(m, variables, [(jnp.asarray(a),)])
    st1 = quant1["fc"]["input_q"]
    np.testing.assert_allclose(np.asarray(st.alpha), np.asarray(st1.alpha))
    np.testing.assert_array_equal(np.asarray(st.grid),
                                  np.asarray(st1.grid))
    # the explicit opt-in divergence: last batch wins
    quant2 = calibrate_on_batches(m, variables,
                                  [(jnp.asarray(a),), (jnp.asarray(b),)],
                                  recalibrate_each=True)
    assert float(quant2["fc"]["input_q"].alpha) != ref_alpha
