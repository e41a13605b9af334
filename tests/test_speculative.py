"""Speculative decoding (serve/speculative.py): greedy draft-and-verify
must emit a stream bit-identical to decoding the target engine alone."""

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                        TransformerLM)
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.serve import engine as eng
from ant_quantization_tpu.serve.speculative import SpeculativeDecoder


def _mk(vocab, n_layers, d_model, seed, max_seq=64, lm_head_int8=False):
    cfg = LMConfig(vocab_size=vocab, d_model=d_model, n_layers=n_layers,
                   n_heads=4, d_ff=2 * d_model, max_seq=max_seq,
                   positions="learned", activation="gelu_new",
                   fused_qkv=True)
    model = TransformerLM(cfg, QuantConfig(enabled=False))
    ids = jnp.asarray(np.random.default_rng(seed).integers(
        0, vocab, (2, 8)))
    variables = model.init(jax.random.PRNGKey(seed), ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                            max_seq=max_seq, dtype=jnp.float32,
                            interpret=True, lm_head_int8=lm_head_int8)
    ep = eng.build_engine_params(ecfg, variables["params"])
    return ecfg, ep


def _greedy_reference(ecfg, ep, prompt_ids, n):
    """Plain one-token-at-a-time greedy decode of the target engine."""
    B, T = prompt_ids.shape
    kv = eng.init_cache(ecfg, B)
    logits, kv = eng.forward(ecfg, ep, jnp.asarray(prompt_ids), kv,
                             jnp.zeros((B,), jnp.int32))
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    out = [np.asarray(tok)[:, 0]]
    pos = T
    for _ in range(n - 1):
        logits, kv = eng.forward(ecfg, ep, tok, kv,
                                 jnp.full((B,), pos, jnp.int32))
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        out.append(np.asarray(tok)[:, 0])
        pos += 1
    return np.stack(out, axis=1)    # (B, n)


def test_speculative_matches_target_greedy():
    vocab = 64
    tcfg, tep = _mk(vocab, n_layers=2, d_model=32, seed=0)
    dcfg, dep = _mk(vocab, n_layers=1, d_model=16, seed=1)
    prompt = np.random.default_rng(2).integers(0, vocab, (2, 6))
    n = 12
    want = _greedy_reference(tcfg, tep, prompt, n)
    spec = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3)
    got = spec.generate(prompt, n)
    assert [len(g) for g in got] == [n, n]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_speculative_accepts_everything_when_draft_is_target():
    """Draft == target: every proposal must be accepted (k per round)."""
    vocab = 64
    tcfg, tep = _mk(vocab, n_layers=2, d_model=32, seed=0)
    prompt = np.random.default_rng(3).integers(0, vocab, (2, 4))
    spec = SpeculativeDecoder(tcfg, tep, tcfg, tep, k=3)
    got = spec.generate(prompt, 10)
    want = _greedy_reference(tcfg, tep, prompt, 10)
    np.testing.assert_array_equal(np.asarray(got), want)
    # all drafts accepted in every round: k accepted per (round, sequence)
    assert spec.accepted_hist, "no rounds ran"
    assert all(a == 3 * 2 for a in spec.accepted_hist), spec.accepted_hist


def test_speculative_lossless_with_lm_head_int8():
    """lm_head_int8 targets quantize logits activations with a *per-token*
    absmax scale (serve/engine.py:_lm_logits), so the k+1-token verify
    forward and the 1-token decode forward produce identical logits per
    token — speculative decoding stays bit-identical to target-alone."""
    vocab = 64
    tcfg, tep = _mk(vocab, n_layers=2, d_model=32, seed=0,
                    lm_head_int8=True)
    dcfg, dep = _mk(vocab, n_layers=1, d_model=16, seed=1)
    prompt = np.random.default_rng(5).integers(0, vocab, (2, 6))
    n = 12
    want = _greedy_reference(tcfg, tep, prompt, n)
    spec = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3)
    got = spec.generate(prompt, n)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_speculative_eos_truncation():
    vocab = 64
    tcfg, tep = _mk(vocab, n_layers=2, d_model=32, seed=0)
    dcfg, dep = _mk(vocab, n_layers=1, d_model=16, seed=1)
    prompt = np.random.default_rng(2).integers(0, vocab, (2, 6))
    want = _greedy_reference(tcfg, tep, prompt, 12)
    # pick a sequence + eos whose FIRST occurrence is mid-stream
    b, j = next((b, j) for b in range(2) for j in range(1, 12)
                if want[b, j] not in want[b, :j])
    eos = int(want[b, j])
    spec = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3)
    got = spec.generate(prompt, 12, eos_id=eos)
    assert got[b] == list(want[b, :j + 1])      # cut right after the eos
    other = 1 - b
    if eos in list(want[other]):
        assert got[other][-1] == eos
    else:
        assert got[other] == list(want[other])


def test_speculative_rounds_per_dispatch_invariant():
    """The in-graph multi-round scan (SpeculativeDecoder.rounds) must
    emit exactly the stream of round-per-dispatch stepping — greedy and
    sampled (the scan folds the ABSOLUTE round index into the root key,
    matching the host loop's _next_key counter)."""
    from ant_quantization_tpu.serve.sampling import SamplingConfig
    vocab = 64
    tcfg, tep = _mk(vocab, n_layers=2, d_model=32, seed=0)
    dcfg, dep = _mk(vocab, n_layers=1, d_model=16, seed=1)
    prompt = np.random.default_rng(7).integers(0, vocab, (2, 5))
    for scfg in (None, SamplingConfig(temperature=0.9, top_k=8)):
        outs = []
        for rpd in (1, 3):
            spec = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3,
                                      sampling=scfg, seed=11)
            outs.append(spec.generate(prompt, 10,
                                      rounds_per_dispatch=rpd))
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[1]))
