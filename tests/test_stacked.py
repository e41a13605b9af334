"""Stacked-layer fused kernel (kernels/stacked.py): numerics vs the
unfused engine path and the plain-jnp oracle, in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.kernels.qmatmul import (int8_codebook, pack_w4,
                                                  quantize_weights_w4_i8)
from ant_quantization_tpu.kernels.stacked import stacked_quant_matmul
from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                        TransformerLM)
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.snap import snap
from ant_quantization_tpu.serve import engine as eng


def _mk_stack(mode, L=3, K=64, N=32, seed=0):
    rng = np.random.default_rng(seed)
    wgrid = np.asarray(cb.ant_grid("flint", 4, True))[:16]
    agrid = np.asarray(cb.ant_grid("flint", 4, False))[:16]
    aq16, a_unit, _ = int8_codebook(agrid)
    a_alpha = 2.5
    a_scale = a_alpha / float(np.max(np.abs(agrid))) * a_unit

    w2d_rows, scales, q16s = [], [], []
    w_f32 = []     # dequantized weights (oracle)
    for l in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32) * (0.5 + 0.2 * l)
        alpha = np.abs(rng.normal(size=(N,)) * 0.8 + 1.0).astype(np.float32)
        w_i8, oscale = quantize_weights_w4_i8(
            jnp.asarray(w), jnp.asarray(wgrid), jnp.asarray(alpha))
        w_f32.append(np.asarray(w_i8, np.float32) * np.asarray(oscale))
        if mode == "i8":
            w2d_rows.append(np.asarray(w_i8))
        else:
            scale = alpha / float(np.max(np.abs(wgrid)))
            codes = snap(jnp.asarray(w) / scale[None, :],
                         jnp.asarray(wgrid, jnp.float32))[1]
            w2d_rows.append(np.asarray(pack_w4(codes)))
        q16v, unit, _ = int8_codebook(wgrid)
        q16s.append(q16v.astype(np.int32))
        scales.append(np.asarray(oscale) * a_scale)
    w2d = jnp.asarray(np.concatenate(w2d_rows, axis=0))
    return dict(
        w2d=w2d,
        scales=jnp.asarray(np.stack(scales)),
        a_q=jnp.broadcast_to(jnp.asarray(aq16, jnp.float32), (L, 16)),
        a_scale=jnp.full((L, 1), a_scale, jnp.float32),
        q16=jnp.asarray(np.stack(q16s)),
        w_f32=w_f32, a_qv=aq16, a_scale_f=a_scale)


@pytest.mark.parametrize("mode", ["i8", "p4"])
@pytest.mark.parametrize("M", [1, 4, 9, 300])
def test_stacked_matches_oracle(mode, M):
    L, K, N = 3, 64, 32
    st = _mk_stack(mode, L, K, N)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(M, K)).astype(np.float32)

    # oracle: snap x onto the int8-domain act codebook, int matmul
    aq = np.sort(st["a_qv"].astype(np.float64))
    xs = x / st["a_scale_f"]
    idx = np.zeros(x.shape, np.int64)
    mids = (aq[1:] + aq[:-1]) / 2
    for m in mids:
        idx += (xs >= m)
    xq = aq[idx]
    for l in range(L):
        want = (xq @ (st["w_f32"][l] / st["scales"][l][None, :]
                      * st["a_scale_f"] ** 0)) \
            * np.asarray(st["scales"][l])[None, :]
        # the kernel computes (xq_int8 @ w_i8) * scales; equivalently
        # xq * a-units times dequant columns — build directly:
        got = np.asarray(stacked_quant_matmul(
            jnp.asarray(l), jnp.asarray(x), st["w2d"], st["scales"],
            st["a_q"], st["a_scale"], st["q16"], mode=mode, n_layers=L,
            interpret=True))
        assert got.shape == (M, N)
        # oracle via integer arithmetic:
        if mode == "i8":
            w_rows = np.asarray(st["w2d"], np.int64).reshape(L, K, N)[l]
        else:
            packed = np.asarray(st["w2d"], np.uint8).reshape(L, K // 2, N)[l]
            q16 = np.asarray(st["q16"][l], np.int64)
            lo = q16[(packed & 0xF).astype(np.int64)]
            hi = q16[(packed >> 4).astype(np.int64)]
            w_rows = np.concatenate([lo, hi], axis=0)
        acc = xq.astype(np.int64) @ w_rows
        want = acc.astype(np.float64) * np.asarray(st["scales"][l])[None, :]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("weight_mode,wmode", [
    ("w4", "flint"), ("w4pack", "flint"),
    ("w4", "int"),           # asymmetric grid: alpha/max (signed) scale
    ("w4pack", "int"),       # affine fast-path decode (one subtract)
])
def test_engine_stacked_equals_unfused(weight_mode, wmode):
    """Full engine decode with the stacked kernel == the unfused path."""
    vocab, L, D = 48, 2, 32
    cfg = LMConfig(vocab_size=vocab, d_model=D, n_layers=L, n_heads=4,
                   d_ff=2 * D, max_seq=32, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    model = TransformerLM(cfg, QuantConfig(mode=wmode, wbit=4, abit=4))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, vocab, (2, 6)))
    v = model.init(jax.random.PRNGKey(0), ids)
    _, upd = model.apply({"params": v["params"]}, ids, mutable=["quant"])
    quant = upd["quant"]

    def run(stacked):
        ecfg = eng.EngineConfig(lm=cfg, weight_mode=weight_mode,
                                act_bits=4, kv_int8=True, max_seq=32,
                                dtype=jnp.float32, interpret=True,
                                stacked_kernel=stacked)
        ep = eng.build_engine_params(ecfg, v["params"], quant)
        kv = eng.init_cache(ecfg, 2)
        logits, kv = eng.forward(ecfg, ep, ids, kv,
                                 jnp.zeros((2,), jnp.int32))
        # decode step (T=1): this is the stacked-kernel path
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        logits2, _ = eng.forward(ecfg, ep, tok, kv,
                                 jnp.full((2,), 6, jnp.int32))
        return np.asarray(logits2)

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ovp", [False, True])
def test_prefill_kernel_matches_decode_path(ovp):
    """M > 256 routes mode='i8' through the M-blocked prefill kernel
    (_i8_prefill_kernel: per-row int8 code scratch, snap once per
    element); results must be bit-identical to the single-block decode
    kernel on every row — plain and OVP-encoded weights."""
    rng = np.random.default_rng(0)
    L, M, K, N, G = 2, 300, 256, 384, 16
    aq = np.sort(rng.integers(-120, 120, (L, G))).astype(np.float32)
    w = rng.integers(-100, 100, (L, K, N)).astype(np.int8)
    x = rng.normal(size=(M, K)).astype(np.float32) * 3
    a_scale = rng.uniform(0.5, 2, (L, 1)).astype(np.float32)
    scales = rng.uniform(0.5, 2, (L, N)).astype(np.float32)
    w2d = jnp.asarray(w.reshape(L * K, N))
    for l in range(L):
        big = np.asarray(stacked_quant_matmul(
            jnp.int32(l), jnp.asarray(x), w2d, jnp.asarray(scales),
            jnp.asarray(aq), jnp.asarray(a_scale), None, mode="i8",
            n_layers=L, ovp=ovp, interpret=True))
        for i in range(0, M, 128):          # decode path, row blocks
            small = np.asarray(stacked_quant_matmul(
                jnp.int32(l), jnp.asarray(x[i:i + 128]), w2d,
                jnp.asarray(scales), jnp.asarray(aq),
                jnp.asarray(a_scale), None, mode="i8", n_layers=L,
                ovp=ovp, interpret=True))
            np.testing.assert_array_equal(big[i:i + 128], small)
