"""Exact OliVe OVP serving: sign-offset int8 weight encoding + dual-dot
reconstruction, end-to-end engine parity with the fake-quant model.

The abfloat outlier grid reaches 12x the normal grid's max (olive
quant_modules.py:156-179), so OVP-quantized weights are not int8 codebook
values; kernels/qmatmul.py encodes them as one int8 byte per element
(normals at unit u, outliers offset past +-64 at unit 16u) and the matmul
reconstructs exactly with two int8 MXU dots from the single stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.kernels.qmatmul import (OVP_OFFSET, OVP_SHIFT,
                                                  ovp_clip,
                                                  ovp_decode_values,
                                                  ovp_unit,
                                                  quantize_weights_ovp_i8)
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.fake_quant import olive_fake_quant


@pytest.mark.parametrize("mode", ["int", "flint"])
def test_ovp_unit_exact_for_olive_grids(mode):
    g = cb.olive_grid(mode, 4, True)
    o = cb.olive_outlier_values(4, True)
    u, exact = ovp_unit(g, o)
    assert exact
    assert np.allclose(g / u, np.round(g / u))
    assert np.max(np.abs(g / u)) <= OVP_OFFSET
    m = (np.abs(o) / u - OVP_OFFSET) / OVP_SHIFT
    assert np.allclose(m, np.round(m))
    assert m.min() >= 1 and m.max() <= 127 - OVP_OFFSET


@pytest.mark.parametrize("mode", ["int", "flint"])
def test_encode_decode_equals_fake_quant(mode):
    """decode(encode(w)) * oscale == olive_fake_quant(w) EXACTLY (same
    snap, same victims, same values)."""
    rng = np.random.default_rng(0)
    K, N = 16, 8
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 2)
    grid = jnp.asarray(cb.olive_grid(mode, 4, True))
    out = jnp.asarray(cb.olive_outlier_values(4, True))
    alpha = jnp.asarray(rng.uniform(1.0, 3.0, (N,)).astype(np.float32))

    want = olive_fake_quant(w, grid, out, alpha, channel_axis=-1,
                            pair_axis=0)
    w_enc, oscale = quantize_weights_ovp_i8(w, grid, out, alpha,
                                            pair_axis=0)
    got = ovp_decode_values(w_enc).astype(jnp.float32) * oscale[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # outliers must actually be exercised: decoded magnitudes past the
    # normal grid's max prove outlier encodings survived the roundtrip
    q = np.asarray(ovp_decode_values(w_enc)).astype(np.float64)
    gmax = float(np.max(np.abs(np.asarray(grid))))
    u = float(oscale[0] / (np.asarray(alpha)[0] / np.max(np.asarray(grid))))
    assert (np.abs(q) * u > gmax + 1e-6).any(), \
        "test data produced no outliers — increase the input scale"


def test_decode_formula():
    """v = 16*c - 15*clip(c): normals pass through, outliers expand to
    sign*(64 + 16*m)."""
    c = jnp.asarray(np.array([[0, 5, -64, 64, 70, -127, 127, -3]],
                             np.int8))
    v = np.asarray(ovp_decode_values(c))
    np.testing.assert_array_equal(
        v[0], [0, 5, -64, 64, 64 + 16 * 6, -(64 + 16 * 63),
               64 + 16 * 63, -3])
    cl = np.asarray(ovp_clip(c), dtype=np.int32)
    np.testing.assert_array_equal(
        np.asarray(v), 16 * np.asarray(c, np.int32) - 15 * cl)


def _olive_model(no_outlier=False):
    from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                            TransformerLM)
    from ant_quantization_tpu.nn.config import QuantConfig
    cfg = LMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                       no_outlier=no_outlier,
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 12)))
    variables = model.init(jax.random.PRNGKey(1), ids)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    return cfg, model, ids, variables["params"], upd["quant"]


def test_engine_w4_ovp_weights_match_fake_quant_model():
    """Full OliVe config (weight + activation outliers): the serving
    engine's OVP-encoded weights + exact activation OVP reproduce the
    fake-quant model's logits."""
    from ant_quantization_tpu.serve import engine as eng
    cfg, model, ids, params, quant = _olive_model()
    # confirm the calibration actually produced outlier states
    has_out = any(
        bool(np.any(np.asarray(st.outliers)))
        for st in jax.tree_util.tree_leaves(
            quant, is_leaf=lambda x: hasattr(x, "outliers"))
        if hasattr(st, "outliers"))
    assert has_out, "olive calibration produced no outlier grids"
    want = model.apply({"params": params, "quant": quant}, ids)

    ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                            kv_int8=False, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, params, quant)
    assert any("ovp" in ep["layers"][s] for s in ("qkv", "out", "fc_in",
                                                  "fc_out"))
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_stacked_kernel_ovp_dual_dot():
    """The stacked Pallas kernel's in-register OVP dual dot (interpret
    mode) == snap + decoded-values matmul."""
    from ant_quantization_tpu.kernels.stacked import stacked_quant_matmul
    from ant_quantization_tpu.ops.snap import snap
    L, K, N, M = 3, 16, 16, 4
    rng = np.random.default_rng(5)
    # encoded bytes spanning normals and outliers
    w = jnp.asarray(rng.choice(
        np.array([-127, -70, -64, -8, -2, 0, 2, 8, 64, 70, 127]),
        size=(L, K, N)).astype(np.int8))
    a_vals = np.linspace(-56, 56, 16).round()
    a_q = jnp.asarray(np.tile(a_vals, (L, 1)), jnp.float32)
    a_scale = jnp.full((L, 1), 0.1, jnp.float32)
    scales = jnp.asarray(rng.uniform(1e-3, 2e-3, (L, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, K)) * 3, jnp.float32)
    for l in range(L):
        got = stacked_quant_matmul(
            jnp.asarray(l), x, w.reshape(L * K, N), scales, a_q,
            a_scale, None, mode="i8", n_layers=L, ovp=True,
            interpret=True)
        xq, _ = snap(x / a_scale[l], a_q[l])
        vals = ovp_decode_values(w[l]).astype(np.float32)
        want = (np.asarray(xq) @ vals) * np.asarray(scales)[l][None, :]
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-4)


def test_aovp_stacked_kernel_matches_unfused_math():
    """stacked_quant_matmul_aovp (interpret) == OVP activation fake-quant
    + decoded-weight matmul, with and without OVP weights."""
    from ant_quantization_tpu.kernels.stacked import (
        stacked_quant_matmul_aovp)
    from ant_quantization_tpu.ops.fake_quant import olive_fake_quant
    from ant_quantization_tpu.kernels.qmatmul import (ovp_unit,
                                                      ovp_decode_values)
    from ant_quantization_tpu.serve.engine import _aovp_encode_tables

    L, K, N, M = 2, 32, 16, 4
    rng = np.random.default_rng(9)
    a_grid = cb.olive_grid("flint", 4, True).astype(np.float32)
    a_out = cb.olive_outlier_values(4, True).astype(np.float32)
    u_a, exact = ovp_unit(a_grid, a_out)
    assert exact
    tbl = _aovp_encode_tables(a_grid, a_out, u_a)
    mids = jnp.tile(tbl["aovp_mids"][None], (L, 1))
    ties = jnp.tile(tbl["aovp_ties"][None], (L, 1))
    enc = jnp.tile(tbl["aovp_enc"][None], (L, 1))
    alpha = np.float32(2.5)
    prescale = jnp.full((L,), alpha / a_grid.max(), jnp.float32)

    x = jnp.asarray(rng.normal(size=(M, K)) * 3, jnp.float32)
    for w_ovp in (False, True):
        if w_ovp:
            w = jnp.asarray(rng.choice(
                np.array([-127, -70, -64, -8, 0, 8, 64, 70, 127]),
                size=(L, K, N)).astype(np.int8))
            wv = np.stack([np.asarray(ovp_decode_values(w[i]))
                           for i in range(L)]).astype(np.float32)
        else:
            w = jnp.asarray(rng.integers(-64, 65, (L, K, N)), jnp.int8)
            wv = np.asarray(w, np.float32)
        oscale = jnp.asarray(rng.uniform(1e-3, 2e-3, (L, N)), jnp.float32)
        scales = (prescale * np.float32(u_a))[:, None] * oscale
        for l in range(L):
            got = stacked_quant_matmul_aovp(
                jnp.asarray(l), x, w.reshape(L * K, N), scales, prescale,
                mids, ties, enc, n_layers=L, w_ovp=w_ovp, interpret=True)
            # reference: OVP fake-quant of x (pair axis -1), then matmul
            # against decoded weights, in f32
            from ant_quantization_tpu.serve.engine import (
                quantize_activation_ovp)
            xq = quantize_activation_ovp(
                x, jnp.asarray(a_grid), jnp.asarray(a_out),
                jnp.asarray(alpha))
            want = (np.asarray(xq) @ wv[l]) * np.asarray(oscale)[l][None]
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=2e-5, atol=2e-4)


def test_engine_full_olive_stacked_decode_matches_unfused():
    """Decode through the aovp stacked kernel == the unfused engine on
    the full OliVe config (weight + activation outliers)."""
    import dataclasses
    from ant_quantization_tpu.serve import engine as eng
    cfg, model, ids, params, quant = _olive_model()
    base = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                            kv_int8=True, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(base, params, quant)
    assert any("aovp_enc" in ep["layers"][s]
               for s in ("qkv", "out", "fc_in", "fc_out"))
    kv0 = eng.init_cache(base, 2)
    logits, kv0 = eng.forward(
        dataclasses.replace(base, stacked_kernel=False), ep, ids, kv0, 0)
    tok = jnp.argmax(logits[:, -1:], axis=-1)

    kv_a = eng.init_cache(base, 2)
    _, kv_a = eng.forward(
        dataclasses.replace(base, stacked_kernel=False), ep, ids, kv_a, 0)
    l_unfused, _ = eng.forward(
        dataclasses.replace(base, stacked_kernel=False), ep, tok, kv0, 12)
    l_stacked, _ = eng.forward(base, ep, tok, kv_a, 12)
    np.testing.assert_allclose(np.asarray(l_stacked),
                               np.asarray(l_unfused),
                               rtol=2e-4, atol=2e-4)


def test_act_outliers_stored_for_all_weight_modes():
    """r4 review: the act-outlier scan must not be gated on
    weight_mode='w4' — bf16-weight serving with quantized activations
    still needs the OVP fake-quant path."""
    from ant_quantization_tpu.serve import engine as eng
    cfg, model, ids, params, quant = _olive_model()
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", act_bits=4,
                            kv_int8=False, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, params, quant)
    assert all("a_out" in ep["layers"][s]
               for s in ("qkv", "out", "fc_in", "fc_out"))
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    assert np.isfinite(np.asarray(got)).all()
