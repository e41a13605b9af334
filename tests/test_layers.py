"""Quantized flax layers: two-phase calibration protocol, promotion."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.calibrate.promote import (promoted_site_paths,
                                                    quant_sites,
                                                    set_8_bit_layer_n)
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.nn.layers import (QuantConv, QuantDense,
                                            QuantMultiHeadAttention)


class MLP(nn.Module):
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x):
        x = QuantDense(32, self.qcfg, name="fc1")(x)
        x = nn.relu(x)
        x = QuantDense(32, self.qcfg, name="fc2")(x)
        x = nn.relu(x)
        x = QuantDense(32, self.qcfg, name="fc3")(x)
        x = nn.relu(x)
        x = QuantDense(10, self.qcfg, name="head")(x)
        return x


def _setup(qcfg=None, seed=0):
    qcfg = qcfg or QuantConfig()
    m = MLP(qcfg)
    x = jax.random.normal(jax.random.PRNGKey(seed), (16, 64))
    variables = m.init(jax.random.PRNGKey(1), x)
    return m, x, variables


def test_calibrate_then_eval(rng):
    m, x, variables = _setup()
    y0, upd = m.apply(variables, x, mutable=["quant"])
    quant = upd["quant"]
    sites = quant_sites(quant)
    assert len(sites) == 4
    assert [p[-1] for p, _ in sites] == ["fc1", "fc2", "fc3", "head"]
    for _, st in sites:
        assert bool(st["weight_q"].initialized)
        assert int(st["weight_q"].bit) == 4
        assert bool(st["weight_q"].is_signed)
        # post-ReLU inputs (fc2..): unsigned; first input is gaussian: signed
    # frozen forward reproduces the calibration forward exactly
    y1 = m.apply({"params": variables["params"], "quant": quant}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_quantization_changes_but_approximates_output(rng):
    m, x, variables = _setup()
    _, upd = m.apply(variables, x, mutable=["quant"])
    y_q = m.apply({"params": variables["params"], "quant": upd["quant"]}, x)
    m_fp = MLP(QuantConfig(enabled=False))
    y_fp = m_fp.apply(variables, x)
    err = float(jnp.abs(y_q - y_fp).mean() / (jnp.abs(y_fp).mean() + 1e-9))
    assert 0.0 < err < 0.5, f"relative error {err}"


def test_promotion_n(rng):
    m, x, variables = _setup()
    _, upd = m.apply(variables, x, mutable=["quant"])
    quant = set_8_bit_layer_n(upd["quant"], 3)
    # last 2 sites always promoted + top-1 by MSE of the first two
    promoted = promoted_site_paths(quant)
    names = [p[-1] for p in promoted]
    assert "fc3" in names and "head" in names and len(names) == 3
    # recalibration pass: promoted sites come back 8-bit initialized
    _, upd2 = m.apply({"params": variables["params"], "quant": quant}, x,
                      mutable=["quant"])
    sites = quant_sites(upd2["quant"])
    for path, st in sites:
        assert bool(st["weight_q"].initialized)
        want = 8 if path[-1] in names else 4
        assert int(st["weight_q"].bit) == want, path
        assert int(st["input_q"].bit) == want, path
    # 8-bit promoted layers use int (mode_idx 0)
    for path, st in sites:
        if path[-1] in names:
            assert int(st["weight_q"].mode_idx) == 0


def test_promotion_reduces_error(rng):
    m, x, variables = _setup()
    _, upd = m.apply(variables, x, mutable=["quant"])
    y4 = m.apply({"params": variables["params"], "quant": upd["quant"]}, x)
    quant = set_8_bit_layer_n(upd["quant"], 4)  # promote everything
    _, upd2 = m.apply({"params": variables["params"], "quant": quant}, x,
                      mutable=["quant"])
    y8 = m.apply({"params": variables["params"], "quant": upd2["quant"]}, x)
    y_fp = MLP(QuantConfig(enabled=False)).apply(variables, x)
    e4 = float(jnp.abs(y4 - y_fp).mean())
    e8 = float(jnp.abs(y8 - y_fp).mean())
    assert e8 < e4


def test_conv_and_mha_layers(rng):
    qcfg = QuantConfig()

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, tokens):
            h = QuantConv(8, (3, 3), qcfg, name="conv")(x)
            t = QuantMultiHeadAttention(4, qcfg, name="attn")(tokens)
            return h.mean(), t.mean()

    net = Net()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    tok = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    variables = net.init(jax.random.PRNGKey(2), x, tok)
    (a, b), upd = net.apply(variables, x, tok, mutable=["quant"])
    assert np.isfinite(float(a)) and np.isfinite(float(b))
    sites = quant_sites(upd["quant"])
    # conv + in_proj + out_proj
    assert len(sites) == 3
    # conv weight per-channel over 8 output channels
    conv_site = [st for p, st in sites if p[-1] == "conv"][0]
    assert conv_site["weight_q"].alpha.shape == (8,)


def test_olive_family_layers(rng):
    qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                       w_up=250, a_up=250)
    m, x, variables = _setup(qcfg)
    _, upd = m.apply(variables, x, mutable=["quant"])
    y = m.apply({"params": variables["params"], "quant": upd["quant"]}, x)
    assert np.all(np.isfinite(np.asarray(y)))
    for _, st in quant_sites(upd["quant"]):
        # outlier grid present (nonzero)
        assert float(jnp.abs(st["weight_q"].outliers).max()) > 32


def test_disabled_passthrough(rng):
    m, x, variables = _setup(QuantConfig(enabled=False))
    y, upd = m.apply(variables, x, mutable=["quant"])
    y_fp = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_fp), rtol=1e-6)
