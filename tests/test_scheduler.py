"""Continuous batching: slot reuse, bucketed prefill, and equivalence with
independent single-request generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.models.transformer_lm import LMConfig
from ant_quantization_tpu.serve import engine as eng
from ant_quantization_tpu.serve.scheduler import (Completion,
                                                  ContinuousBatcher, Request)

LM = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4, d_ff=64,
              max_seq=96, positions="learned", activation="gelu_new",
              fused_qkv=True)


def _engine_params(cfg, key):
    """Random bf16 engine params (weight_mode=bf16 keeps the test exact)."""
    c = cfg.lm
    ks = jax.random.split(key, 8)
    L = c.n_layers

    def site(k, K, N):
        return {"kernel": jax.random.normal(k, (L, K, N), jnp.float32)
                * (1.0 / np.sqrt(K)),
                "bias": jnp.zeros((L, N), jnp.float32)}

    ln = lambda: {"scale": jnp.ones((L, c.d_model)),
                  "bias": jnp.zeros((L, c.d_model))}
    layers = {
        "qkv": site(ks[0], c.d_model, 3 * c.d_model),
        "out": site(ks[1], c.d_model, c.d_model),
        "fc_in": site(ks[2], c.d_model, c.d_ff),
        "fc_out": site(ks[3], c.d_ff, c.d_model),
        "ln_1": ln(), "ln_2": ln(),
    }
    top = {"wte": jax.random.normal(ks[6], (c.vocab_size, c.d_model)) * 0.5,
           "wpe": jax.random.normal(ks[7], (c.max_seq + 2, c.d_model)) * 0.1,
           "ln_f": {"scale": jnp.ones((c.d_model,)),
                    "bias": jnp.zeros((c.d_model,))}}
    return {"layers": layers, "top": top}


def _reference_generate(cfg, ep, prompt, n_new):
    """Naive single-request generation: one slot, no padding buckets."""
    kv = eng.init_cache(cfg, 1)
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
    logits, kv = eng.forward(cfg, ep, ids, kv, 0)
    tok = int(jnp.argmax(logits[0, len(prompt) - 1]))
    out = [tok]
    pos = len(prompt)
    for _ in range(n_new - 1):
        logits, kv = eng.forward(cfg, ep,
                                 jnp.asarray([[out[-1]]], jnp.int32), kv, pos)
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = eng.EngineConfig(lm=LM, weight_mode="bf16", act_bits=0,
                           kv_int8=False, max_seq=LM.max_seq,
                           dtype=jnp.float32)
    ep = _engine_params(cfg, jax.random.PRNGKey(0))
    return cfg, ep


def test_matches_independent_generation(setup):
    cfg, ep = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 64, n).tolist() for n in (5, 11, 3, 17, 8)]
    n_new = 6

    refs = [_reference_generate(cfg, ep, p, n_new) for p in prompts]

    cb = ContinuousBatcher(cfg, ep, batch_slots=2, prefill_buckets=(8, 32),
                           pad_id=0)
    ids = [cb.submit(Request(prompt=p, max_new_tokens=n_new))
           for p in prompts]
    done = cb.run()
    assert len(done) == len(prompts)
    by_id = {c.id: c for c in done}
    for rid, ref, p in zip(ids, refs, prompts):
        got = by_id[rid]
        assert got.tokens == ref, (p, got.tokens, ref)
        assert got.finish_reason == "length"


def test_eos_frees_slot_early(setup):
    cfg, ep = setup
    # find what token the model emits first for a probe prompt, then use it
    # as the eos id so the request finishes after 1 token
    probe = [5, 9, 2]
    first = _reference_generate(cfg, ep, probe, 1)[0]
    cb = ContinuousBatcher(cfg, ep, batch_slots=1, prefill_buckets=(8,))
    rid = cb.submit(Request(prompt=probe, max_new_tokens=10, eos_id=first))
    rid2 = cb.submit(Request(prompt=[7, 7], max_new_tokens=2))
    done = cb.run()
    by_id = {c.id: c for c in done}
    assert by_id[rid].finish_reason == "eos"
    assert len(by_id[rid].tokens) == 1
    assert len(by_id[rid2].tokens) == 2  # queued request got the slot


def test_int8_cache_path_runs(setup):
    cfg, ep = setup
    qcfg = eng.EngineConfig(lm=LM, weight_mode="bf16", act_bits=0,
                            kv_int8=True, max_seq=LM.max_seq,
                            dtype=jnp.float32)
    cb = ContinuousBatcher(qcfg, ep, batch_slots=2, prefill_buckets=(8,))
    cb.submit(Request(prompt=[1, 2, 3], max_new_tokens=4))
    done = cb.run()
    assert len(done) == 1 and len(done[0].tokens) == 4


def test_chunked_ticks_match_per_tick(setup):
    """step_chunk / run(ticks_per_dispatch=N) must complete every request
    with the same greedy tokens as per-tick stepping, across mid-chunk
    completions, slot refills, and an eos stop."""
    cfg, ep = setup
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 64, n).tolist() for n in (5, 11, 3, 9, 7, 4)]
    lens = [6, 3, 9, 5, 7, 2]

    def run(tpd):
        cb = ContinuousBatcher(cfg, ep, batch_slots=2,
                               prefill_buckets=(8, 16), pad_id=0)
        ids = [cb.submit(Request(prompt=p, max_new_tokens=n))
               for p, n in zip(prompts, lens)]
        done = cb.run(ticks_per_dispatch=tpd)
        return ids, {c.id: c.tokens for c in done}

    ids1, per_tick = run(1)
    ids4, chunked = run(4)
    assert ids1 == ids4 and set(per_tick) == set(chunked)
    for rid in ids1:
        assert per_tick[rid] == chunked[rid], rid

    # eos mid-stream still truncates identically
    ref = _reference_generate(cfg, ep, prompts[0], 8)
    eos = ref[3]
    cb = ContinuousBatcher(cfg, ep, batch_slots=1, prefill_buckets=(8,))
    cb.submit(Request(prompt=prompts[0], max_new_tokens=8, eos_id=eos))
    done = cb.run(ticks_per_dispatch=4)
    assert done[0].finish_reason == "eos"
    assert done[0].tokens == ref[:ref.index(eos) + 1]


def test_legacy_forward_fn_without_last_index(setup):
    """A custom forward_fn with the old 4-arg signature (no last_index)
    must still work: the batcher detects the missing kwarg and slices
    the full logits at the last real prompt position itself, producing
    the same tokens as the default path."""
    cfg, ep = setup
    prompt, n_new = [3, 1, 4, 1, 5], 6

    legacy = lambda ep_, ids_, kv_, pos0_: eng.forward(
        cfg, ep_, ids_, kv_, pos0_)
    out = {}
    for fwd in (None, legacy):
        cb = ContinuousBatcher(cfg, ep, batch_slots=1,
                               prefill_buckets=(8,), forward_fn=fwd)
        cb.submit(Request(prompt=prompt, max_new_tokens=n_new))
        done = cb.run()
        out[fwd is None] = done[0].tokens
    assert out[True] == out[False] == _reference_generate(
        cfg, ep, prompt, n_new)
