"""Tensor-parallel engine (serve/sharded.py) vs the single-device engine
on the virtual 8-device CPU mesh: identical logits modulo reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                        TransformerLM)
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.parallel.mesh import make_mesh
from ant_quantization_tpu.serve import engine as eng
from ant_quantization_tpu.serve import sharded as sh


def _cfg(fused=True, positions="learned", activation="gelu_new"):
    return LMConfig(vocab_size=96, d_model=64, n_layers=2, n_heads=4,
                    d_ff=128, max_seq=32, positions=positions,
                    activation=activation, fused_qkv=fused)


def _setup(cfg, qcfg=None, weight_mode="bf16", act_bits=0, kv_int8=False):
    model = TransformerLM(cfg, qcfg or QuantConfig(enabled=False))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 8)))
    variables = model.init(jax.random.PRNGKey(1), ids)
    quant = None
    if weight_mode != "bf16" or act_bits:
        _, upd = model.apply(variables, ids, mutable=["quant"])
        quant = upd["quant"]
    ecfg = eng.EngineConfig(lm=cfg, weight_mode=weight_mode,
                            act_bits=act_bits, kv_int8=kv_int8, max_seq=16,
                            dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"], quant)
    return ecfg, ep, ids


def _run_pair(ecfg, ep, ids, dp, tp):
    # single-device reference
    kv0 = eng.init_cache(ecfg, ids.shape[0])
    want, _ = eng.forward(ecfg, ep, ids, kv0,
                          jnp.zeros((ids.shape[0],), jnp.int32))

    mesh = make_mesh((dp, tp), devices=jax.devices("cpu")[:dp * tp])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(ecfg, ids.shape[0]), mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    got, kv = fwd(eps, ids, kv, jnp.zeros((ids.shape[0],), jnp.int32))
    return np.asarray(got), np.asarray(want), kv


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (2, 4)])
def test_bf16_tp_matches_single(dp, tp):
    ecfg, ep, ids = _setup(_cfg())
    got, want, _ = _run_pair(ecfg, ep, ids, dp, tp)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_split_qkv_opt_style_tp():
    ecfg, ep, ids = _setup(_cfg(fused=False, positions="learned_offset2",
                                activation="relu"))
    got, want, _ = _run_pair(ecfg, ep, ids, 2, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_alibi_tp_local_slopes():
    ecfg, ep, ids = _setup(_cfg(positions="alibi", activation="gelu"))
    got, want, _ = _run_pair(ecfg, ep, ids, 1, 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_w4a4_int8kv_tp_matches_single():
    """The full quantized serving config, tensor-parallel: packed int8
    weights + A4 snap + INT8 KV shards per device."""
    cfg = _cfg()
    qcfg = QuantConfig(mode="flint", family="ant",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    ecfg, ep, ids = _setup(cfg, qcfg, weight_mode="w4", act_bits=4,
                           kv_int8=True)
    got, want, kv = _run_pair(ecfg, ep, ids, 2, 2)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    # the cache was actually written (int8 codes non-zero somewhere)
    assert int(jnp.abs(kv.k.astype(jnp.int32)).sum()) > 0


def test_tp_decode_step():
    """One prefill + one decode step under TP keeps positions straight."""
    ecfg, ep, ids = _setup(_cfg(), kv_int8=True)
    mesh = make_mesh((2, 2), devices=jax.devices("cpu")[:4])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    B = ids.shape[0]
    kv = sh.shard_cache(eng.init_cache(ecfg, B), mesh)
    logits, kv = fwd(eps, ids, kv, jnp.zeros((B,), jnp.int32))
    tok = jnp.argmax(logits[:, -1:], axis=-1)
    logits2, kv = fwd(eps, tok, kv, jnp.full((B,), ids.shape[1], jnp.int32))

    kv0 = eng.init_cache(ecfg, B)
    l0, kv0 = eng.forward(ecfg, ep, ids, kv0, 0)
    t0 = jnp.argmax(l0[:, -1:], axis=-1)
    l2, kv0 = eng.forward(ecfg, ep, t0, kv0, ids.shape[1])
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(l2),
                               rtol=2e-2, atol=2e-2)


def test_continuous_batching_over_tp_mesh():
    """ContinuousBatcher composes with the sharded forward (tp-only mesh:
    batch axis replicated so slot slicing stays local)."""
    from ant_quantization_tpu.serve.scheduler import (ContinuousBatcher,
                                                      Request)
    ecfg, ep, ids = _setup(_cfg(), kv_int8=True)
    mesh = make_mesh((1, 4), devices=jax.devices("cpu")[:4])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(ecfg, 2), mesh)
    cb = ContinuousBatcher(tcfg, eps, batch_slots=2, prefill_buckets=(8,),
                           forward_fn=fwd, kv=kv)
    cb.submit(Request(prompt=[1, 2, 3], max_new_tokens=4))
    cb.submit(Request(prompt=[4, 5], max_new_tokens=3))
    done = cb.run()
    assert len(done) == 2
    assert sorted(len(c.tokens) for c in done) == [3, 4]


def test_tp_nonzero_biases_counted_once():
    """Regression: under TP the row-parallel bias was once added per
    shard AND after the psum (tp+1 times) — invisible with zero biases."""
    from tests.test_engine import _randomize_biases
    cfg = _cfg()
    model = TransformerLM(cfg, QuantConfig(enabled=False))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 8)))
    variables = _randomize_biases(model.init(jax.random.PRNGKey(1), ids))
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", act_bits=0,
                            kv_int8=False, max_seq=16, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    got, want, _ = _run_pair(ecfg, ep, ids, 1, 4)
    base = model.apply(variables, ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(want, np.asarray(base), rtol=2e-3,
                               atol=2e-3)


def test_w4pack_tp_matches_single():
    """Split-K packed weights under TP: row shards are re-packed per
    shard (regression for straddled byte rows)."""
    cfg = _cfg()
    qcfg = QuantConfig(mode="flint", family="ant",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    ecfg, ep, ids = _setup(cfg, qcfg, weight_mode="w4pack", act_bits=0)
    got, want, _ = _run_pair(ecfg, ep, ids, 1, 4)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_int8_lm_head_tp_matches_single():
    """lm_head_int8 engine params (wte_i8 + per-row scale, replicated)
    shard and run under TP; logits match the single-device int8-head run."""
    import dataclasses
    cfg = _cfg(fused=False, positions="learned_offset2", activation="relu")
    model = TransformerLM(cfg, QuantConfig(enabled=False))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 8)))
    variables = model.init(jax.random.PRNGKey(1), ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=16, dtype=jnp.float32, interpret=True,
                            lm_head_int8=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    assert "wte_i8" in ep["top"]
    got, want, _ = _run_pair(ecfg, ep, ids, 2, 2)
    # TP reduction order perturbs x in the last ulp, which can flip int8
    # rounding at code boundaries — per-logit error stays within ~one
    # code step here; the decoded token must not change
    np.testing.assert_allclose(got, want, atol=0.06, rtol=0)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


# ---------------------------------------------------------------------------
# Sequence-parallel prefill with quantized collective matmuls (r4)
# ---------------------------------------------------------------------------

def _setup_prefill(T=64, fused=True, olive=False):
    cfg = LMConfig(vocab_size=96, d_model=64, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=96, positions="learned",
                   activation="gelu_new", fused_qkv=fused)
    if olive:
        # 3-sigma calibration on gaussian weights/activations guarantees
        # real OVP outliers at every site
        qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                           w_low=100, w_up=101, a_low=100, a_up=101)
    else:
        qcfg = QuantConfig(mode="flint", family="ant",
                           w_low=100, w_up=101, a_low=100, a_up=101)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, T)))
    variables = model.init(jax.random.PRNGKey(1), ids)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                            kv_int8=True, max_seq=96, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"], upd["quant"])
    if olive:
        sites = ("qkv", "out", "fc_in", "fc_out") if fused else (
            "q", "k", "v", "out", "fc_in", "fc_out")
        assert any("ovp" in ep["layers"][s] for s in sites)
        assert any("aovp_enc" in ep["layers"][s] for s in sites)
    return ecfg, ep, ids


@pytest.mark.parametrize("fused,olive", [(True, False), (False, False),
                                         (True, True), (False, True)])
def test_sp_prefill_matches_single(fused, olive):
    """Prefill at M=128 > stacked_max_m takes the sequence-parallel path
    (quantized AG/RS rings): logits must match the single-device engine.
    olive=True runs the FULL OliVe flagship config — OVP weights and OVP
    activations — through the dual/quad-dot ring forms (r5: the sp gate
    previously excluded OVP sites)."""
    ecfg, ep, ids = _setup_prefill(fused=fused, olive=olive)
    got, want, _ = _run_pair(ecfg, ep, ids, 1, 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("olive", [False, True])
def test_sp_prefill_hlo_uses_rings_not_allreduce(olive):
    """The sp prefill's compiled HLO must contain collective-permutes
    (the rings) and NO all-reduce: the psums are gone, replaced by the
    overlapped quantized collectives — for the full-OliVe OVP config
    too."""
    ecfg, ep, ids = _setup_prefill(olive=olive)
    mesh = make_mesh((1, 4), devices=jax.devices("cpu")[:4])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(ecfg, ids.shape[0]), mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    txt = jax.jit(fwd).lower(
        eps, ids, kv, jnp.zeros((ids.shape[0],), jnp.int32)
    ).compile().as_text()
    assert "collective-permute" in txt
    n_ar = txt.count(" all-reduce(")
    assert n_ar == 0, f"sp prefill should have no all-reduce, found {n_ar}"


def test_decode_hlo_two_psums_per_layer():
    """Megatron invariant locked at the HLO level (VERDICT r3 #7): the
    TP decode step contains exactly 2 all-reduces in the layer-scan body
    (attn out + fc_out row-parallel psums) — a regression that adds a
    gather/reduce per layer fails here, not in CPU-mesh timing noise."""
    ecfg, ep, ids = _setup_prefill(T=8)      # M=16 <= stacked_max_m
    mesh = make_mesh((1, 4), devices=jax.devices("cpu")[:4])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(ecfg, ids.shape[0]), mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    tok = jnp.ones((2, 1), jnp.int32)
    txt = jax.jit(fwd).lower(
        eps, tok, kv, jnp.full((2,), 8, jnp.int32)
    ).compile().as_text()
    n_ar = txt.count(" all-reduce(")
    # the lax.scan body appears once in the HLO: 2 all-reduces total
    assert n_ar == 2, f"expected 2 all-reduces (scan body), found {n_ar}"


def test_w4_ovp_tp_matches_single():
    """OliVe outlier (OVP) serving under TP: the sign-offset encoded
    weights shard column/row-wise like plain int8 values; logits match
    the single-device engine."""
    cfg = _cfg(fused=True)
    qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    ecfg, ep, ids = _setup(cfg, qcfg, weight_mode="w4", act_bits=4,
                           kv_int8=True)
    assert any("ovp" in ep["layers"][s]
               for s in ("qkv", "out", "fc_in", "fc_out"))
    got, want, _ = _run_pair(ecfg, ep, ids, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sp_prefill_last_index_matches_single():
    """Serving prefill under sequence parallelism: forward(last_index)
    all-gathers the (M, D) hidden rows instead of (M, V) logits and runs
    the head only at the selected positions — logits must equal the
    single-device full forward's rows there."""
    ecfg, ep, ids = _setup_prefill(fused=True, olive=False)
    B, T = ids.shape
    kv0 = eng.init_cache(ecfg, B)
    want, _ = eng.forward(ecfg, ep, ids, kv0,
                          jnp.zeros((B,), jnp.int32))
    li = jnp.asarray([T - 1, T // 2], jnp.int32)

    mesh = make_mesh((1, 4), devices=jax.devices("cpu")[:4])
    tcfg = sh.tp_engine_config(ecfg, mesh)
    eps = sh.shard_engine_params(ep, tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(ecfg, B), mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)
    got, _ = fwd(eps, ids, kv, jnp.zeros((B,), jnp.int32), li)
    assert got.shape == (B, 1, ecfg.lm.vocab_size)
    want_rows = np.stack([np.asarray(want)[0, T - 1],
                          np.asarray(want)[1, T // 2]])[:, None]
    np.testing.assert_allclose(np.asarray(got), want_rows,
                               rtol=2e-4, atol=2e-4)
