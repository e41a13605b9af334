"""Serving engine vs the model-zoo forward: bf16 baseline parity, packed-W4
parity with fake-quant, INT8 KV-cache decode."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                        TransformerLM)
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.serve import engine as eng


def _tiny(fused=True, positions="learned", activation="gelu_new",
          embed_ln=False):
    return LMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                    d_ff=128, max_seq=64, positions=positions,
                    activation=activation, fused_qkv=fused,
                    embed_ln=embed_ln)


def _setup(cfg, qcfg=None, seed=0):
    qcfg = qcfg or QuantConfig(enabled=False)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(np.random.default_rng(seed).integers(
        0, cfg.vocab_size, (2, 12)))
    variables = model.init(jax.random.PRNGKey(1), ids)
    return model, ids, variables


def test_engine_bf16_matches_model():
    cfg = _tiny()
    model, ids, variables = _setup(cfg)
    want = model.apply(variables, ids)

    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    kv = eng.init_cache(ecfg, 2)
    got, kv = eng.forward(ecfg, ep, ids, kv, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_engine_split_qkv_opt_style():
    cfg = _tiny(fused=False, positions="learned_offset2", activation="relu")
    model, ids, variables = _setup(cfg)
    want = model.apply(variables, ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_engine_alibi_bloom_style():
    cfg = _tiny(positions="alibi", activation="gelu", embed_ln=True)
    model, ids, variables = _setup(cfg)
    want = model.apply(variables, ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_engine_w4_matches_fake_quant_model():
    """Packed-W4 engine logits == fake-quant model logits (weights only)."""
    cfg = _tiny()
    qcfg = QuantConfig(mode="flint", family="ant", quantize_input=False,
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model, ids, variables = _setup(cfg, qcfg)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    want = model.apply({"params": variables["params"],
                        "quant": upd["quant"]}, ids)

    ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=0,
                            kv_int8=False, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"], upd["quant"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_engine_decode_matches_prefill():
    cfg = _tiny()
    model, ids, variables = _setup(cfg)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])

    kv = eng.init_cache(ecfg, 2)
    full, _ = eng.forward(ecfg, ep, ids, kv, 0)

    kv = eng.init_cache(ecfg, 2)
    logits = None
    for t in range(ids.shape[1]):
        logits, kv = eng.forward(ecfg, ep, ids[:, t:t + 1], kv, t)
    # int8 KV adds quantization noise; logits should still track closely
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.asarray(full[:, -1]), rtol=0.1, atol=0.15)


def test_engine_int8_kv_noise_is_small():
    cfg = _tiny()
    model, ids, variables = _setup(cfg)
    want = model.apply(variables, ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    rel = float(jnp.abs(got - want).mean() / jnp.abs(want).mean())
    assert rel < 0.05, rel


def test_engine_w4a4_int8_matmul_matches_fake_quant_model():
    """W4 + A4 engine (int8 x int8 MXU path) == fake-quant model logits."""
    cfg = _tiny()
    qcfg = QuantConfig(mode="flint", family="ant",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model, ids, variables = _setup(cfg, qcfg)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    want = model.apply({"params": variables["params"],
                        "quant": upd["quant"]}, ids)

    ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                            kv_int8=False, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"], upd["quant"])
    # the int8 path must actually be engaged (flint grids are int8-exact)
    assert "a_q" in jax.tree_util.tree_map(lambda x: x, ep["layers"]["qkv"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def _randomize_biases(variables, seed=7):
    """Flax init gives all-zero biases, which masked a double-bias bug;
    perturb every bias so bias handling is actually exercised."""
    import jax.tree_util as jtu
    rng = np.random.default_rng(seed)

    def bump(path, leaf):
        if path[-1].key == "bias":
            return leaf + jnp.asarray(
                rng.normal(size=leaf.shape) * 0.1, leaf.dtype)
        return leaf
    return jtu.tree_map_with_path(bump, variables)


def test_engine_nonzero_biases_match_model():
    """Regression: _site_matmul once added the bias twice (invisible with
    flax's zero-init biases)."""
    cfg = _tiny()
    model, ids, variables = _setup(cfg)
    variables = _randomize_biases(variables)
    want = model.apply(variables, ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_engine_int8_lm_head_logit_parity():
    """W8A8 tied lm_head + int8 embedding: logits track the bf16 engine to
    sub-percent error and agree on the argmax token."""
    cfg = _tiny(fused=False, positions="learned_offset2", activation="relu")
    model, ids, variables = _setup(cfg)
    base = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                            max_seq=32, dtype=jnp.float32, interpret=True)
    q = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=False,
                         max_seq=32, dtype=jnp.float32, interpret=True,
                         lm_head_int8=True)
    ep_b = eng.build_engine_params(base, variables["params"])
    ep_q = eng.build_engine_params(q, variables["params"])
    assert "wte_i8" in ep_q["top"] and "wte" not in ep_q["top"]
    want, _ = eng.forward(base, ep_b, ids, eng.init_cache(base, 2), 0)
    got, _ = eng.forward(q, ep_q, ids, eng.init_cache(q, 2), 0)
    w, g = np.asarray(want), np.asarray(got)
    # logits are O(1); int8 rounding on both weight rows and activations
    scale = np.maximum(np.abs(w).max(), 1.0)
    assert np.max(np.abs(w - g)) / scale < 0.03, np.max(np.abs(w - g))
    np.testing.assert_array_equal(w.argmax(-1), g.argmax(-1))


def test_quantize_lm_head_roundtrip():
    rng = np.random.default_rng(0)
    wte = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32)) * 0.05
    top = eng.quantize_lm_head(wte)
    deq = (np.asarray(top["wte_i8"], np.float32)
           * np.asarray(top["wte_scale"])[:, None])
    err = np.abs(deq - np.asarray(wte)).max(axis=1)
    rowmax = np.abs(np.asarray(wte)).max(axis=1)
    assert (err <= rowmax / 127.0 * 0.51 + 1e-8).all()
    assert top["wte_i8"].dtype == jnp.int8


def test_engine_folded_kv_matches_flat():
    """Lane-folded int8 KV storage (kernels/kv_cache.py, head_dim 32 ->
    fold 4) must produce logits identical to a flat-layout cache through
    prefill + several decode steps — storage layout only, same codes."""
    from ant_quantization_tpu.kernels.kv_cache import QuantKV, init_kv
    cfg = LMConfig(vocab_size=128, d_model=128, n_layers=2, n_heads=4,
                   d_ff=256, max_seq=64, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    model, ids, variables = _setup(cfg)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                            max_seq=64, dtype=jnp.float32, interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])

    kv_f = eng.init_cache(ecfg, 2)                 # folded (f = 4)
    assert kv_f.k.shape[-1] == 128 and kv_f.k.shape[-2] == 16
    flat = init_kv(2, 64, cfg.n_heads, cfg.head_dim, fold=1)
    kv_1 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (cfg.n_layers,) + x.shape),
        flat)

    outs = []
    for kv in (kv_f, kv_1):
        lg, kv = eng.forward(ecfg, ep, ids, kv, 0)
        toks = [np.asarray(lg[:, -1:])]
        tok = jnp.argmax(lg[:, -1:], axis=-1)
        for i in range(4):
            lg, kv = eng.forward(ecfg, ep, tok, kv, ids.shape[1] + i)
            toks.append(np.asarray(lg))
            tok = jnp.argmax(lg[:, -1:], axis=-1)
        outs.append(np.concatenate([t.reshape(2, -1) for t in toks], 1))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_engine_last_index_matches_full():
    """forward(last_index=...) returns exactly the full forward's logits
    rows at those positions (LN/head are per-position, so slice-then-
    compute == compute-then-slice), with an identical KV cache — for the
    f32 and the int8 lm_head (whose per-token scale makes each row
    independent of the other positions in the call)."""
    cfg = _tiny()
    model, ids, variables = _setup(cfg)
    for head_int8 in (False, True):
        ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                                max_seq=32, dtype=jnp.float32,
                                lm_head_int8=head_int8, interpret=True)
        ep = eng.build_engine_params(ecfg, variables["params"])
        full, kv_a = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
        li = jnp.asarray([ids.shape[1] - 1, 5])      # per-sequence index
        got, kv_b = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0,
                                last_index=li)
        assert got.shape == (2, 1, cfg.vocab_size)
        want = np.stack([np.asarray(full)[0, ids.shape[1] - 1],
                         np.asarray(full)[1, 5]])[:, None]
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(kv_a),
                        jax.tree_util.tree_leaves(kv_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_stacked_prefill_matches_xla_path():
    """Prefill-size M (> stacked_max_m) routes the int8-exact sites
    through the M-blocked stacked kernel (in-kernel snap,
    kernels/stacked.py:_i8_prefill_kernel); logits must equal the plain
    XLA path (stacked_prefill=False) exactly — same snap, same int8
    dots — and track the fake-quant model."""
    cfg = LMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=96, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    qcfg = QuantConfig(mode="flint", family="ant",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 40)))                      # M = 80 > 64
    variables = model.init(jax.random.PRNGKey(1), ids)
    _, upd = model.apply(variables, ids, mutable=["quant"])
    want = model.apply({"params": variables["params"],
                        "quant": upd["quant"]}, ids)

    outs = {}
    for pref in (False, True):
        ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                                kv_int8=False, max_seq=96,
                                dtype=jnp.float32, interpret=True,
                                stacked_prefill=pref)
        ep = eng.build_engine_params(ecfg, variables["params"],
                                     upd["quant"])
        stk = eng._prepare_stacked(ecfg, ep, 80)
        assert (stk is not None) == pref
        got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
        outs[pref] = np.asarray(got)
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(outs[True], np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_engine_stacked_prefill_mixed_sites_fall_back_per_site():
    """stacked_prefill with MIXED sites: one site without an int8-exact
    activation grid is excluded from the stacked prep and runs the
    plain XLA path, which reads the weight stacks from the scan xs — a
    regression test for the lay_xs pruning dropping 'w_i8' from
    fallback sites (trace-time KeyError). Logits must equal
    stacked_prefill=False on the same params."""
    cfg = LMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=96, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    qcfg = QuantConfig(mode="flint", family="ant",
                       w_low=100, w_up=101, a_low=100, a_up=101)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, (2, 40)))                      # M = 80 > 64
    variables = model.init(jax.random.PRNGKey(1), ids)
    _, upd = model.apply(variables, ids, mutable=["quant"])

    outs = {}
    for pref in (False, True):
        ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                                kv_int8=False, max_seq=96,
                                dtype=jnp.float32, interpret=True,
                                stacked_prefill=pref)
        ep = eng.build_engine_params(ecfg, variables["params"],
                                     upd["quant"])
        # force fc_out onto the generic XLA activation path (as if its
        # grid were not int8-exact); the a_grid/a_alpha fallback stays
        assert "a_grid" in ep["layers"]["fc_out"]
        del ep["layers"]["fc_out"]["a_q"]
        del ep["layers"]["fc_out"]["a_scale"]
        if pref:
            stk = eng._prepare_stacked(ecfg, ep, 80)
            assert stk is not None and "fc_out" not in stk
            assert "qkv" in stk and "fc_in" in stk
        got, _ = eng.forward(ecfg, ep, ids, eng.init_cache(ecfg, 2), 0)
        outs[pref] = np.asarray(got)
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-6, atol=1e-6)


def test_kernel_attention_chunked_matches_single_call():
    """Long-context prefill chunks the queries through the fused int8-KV
    kernel (each chunk attends the full cache at its own pos0 offset);
    any chunk size must give exactly the single-call result — causal
    mask across chunk boundaries and ALiBi included, folded (head_dim
    32 -> f=4) cache."""
    from ant_quantization_tpu.kernels.kv_cache import (QuantKV, append_kv,
                                                       init_kv)
    from ant_quantization_tpu.serve.engine import (EngineConfig,
                                                   _kernel_attention_chunked)
    B, H, T, D, S = 2, 4, 12, 32, 16
    rng = np.random.default_rng(0)
    cfg = eng.EngineConfig(lm=_tiny(), weight_mode="bf16", kv_int8=True,
                           max_seq=S, dtype=jnp.float32, interpret=True)
    kv1 = append_kv(init_kv(B, S, H, D),
                    jnp.asarray(rng.normal(size=(B, T, H, D)),
                                jnp.float32),
                    jnp.asarray(rng.normal(size=(B, T, H, D)),
                                jnp.float32), 0)
    kv = QuantKV(*[jnp.broadcast_to(x[None], (2,) + x.shape)
                   for x in kv1])                      # L=2 stacked
    qh = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
    pos0 = jnp.zeros((B,), jnp.int32)
    alibi = jnp.asarray([0.5, 0.25, 0.125, 0.0625], jnp.float32)
    for al in (None, alibi):
        single = _kernel_attention_chunked(cfg, jnp.int32(1), qh, kv,
                                           pos0, al, T)
        for tc in (3, 5, 8):
            chunked = _kernel_attention_chunked(cfg, jnp.int32(1), qh,
                                                kv, pos0, al, tc)
            np.testing.assert_allclose(np.asarray(chunked),
                                       np.asarray(single),
                                       rtol=1e-6, atol=1e-6)
