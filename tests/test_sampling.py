"""Sampling stack (serve/sampling.py) + scheduler/speculative wiring:
temperature / top-k / top-p filtering vs a numpy oracle, greedy
equivalences, and the losslessness of speculative rejection sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ant_quantization_tpu.serve.sampling import (SamplingConfig,
                                                 filter_logits,
                                                 filtered_log_probs,
                                                 sample)


def _np_filter(logits, temperature, top_k, top_p):
    """Numpy oracle for filter_logits."""
    x = logits.astype(np.float64) / temperature
    V = x.shape[-1]
    if top_k and top_k < V:
        kth = np.sort(x, axis=-1)[..., -top_k][..., None]
        x = np.where(x < kth, -np.inf, x)
    if top_p < 1.0:
        order = np.argsort(-x, axis=-1)
        xs = np.take_along_axis(x, order, axis=-1)
        p = np.exp(xs - xs.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        cum = np.cumsum(p, axis=-1)
        keep = (cum - p) < top_p
        n_keep = keep.sum(-1, keepdims=True)
        thresh = np.take_along_axis(xs, n_keep - 1, axis=-1)
        x = np.where(x < thresh, -np.inf, x)
    return x


@pytest.mark.parametrize("top_k,top_p", [(0, 1.0), (3, 1.0), (0, 0.8),
                                         (5, 0.6), (1, 1.0)])
def test_filter_matches_numpy_oracle(top_k, top_p):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 16)).astype(np.float32) * 3
    cfg = SamplingConfig(temperature=0.7, top_k=top_k, top_p=top_p)
    got = np.asarray(filter_logits(jnp.asarray(logits), cfg))
    want = _np_filter(logits, 0.7, top_k, top_p)
    # same support and same values on the support
    mask_got = got > -1e29
    mask_want = np.isfinite(want)
    np.testing.assert_array_equal(mask_got, mask_want)
    np.testing.assert_allclose(got[mask_got], want[mask_want], rtol=1e-5)


def test_temperature_zero_is_argmax():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    cfg = SamplingConfig()           # default greedy
    got = sample(logits, cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.argmax(np.asarray(logits), -1))


def test_top_k1_equals_greedy_at_any_temperature():
    """T=1 top-k=1: the filtered distribution is a point mass on the
    argmax, so sampling == greedy for every key."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(6, 24)).astype(np.float32))
    cfg = SamplingConfig(temperature=1.0, top_k=1)
    for seed in range(5):
        got = sample(logits, cfg, jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.argmax(np.asarray(logits), -1))


def test_sampled_distribution_matches_softmax():
    """Empirical sampling frequencies converge to the filtered softmax."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0, -8.0]], jnp.float32)
    cfg = SamplingConfig(temperature=1.0)
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    draws = jax.vmap(lambda k: sample(logits, cfg, k))(keys)
    counts = np.bincount(np.asarray(draws).ravel(), minlength=5) / 4000
    want = np.asarray(jax.nn.softmax(logits[0]))
    assert np.abs(counts - want).sum() < 0.06, (counts, want)


def test_top_p_support():
    logits = jnp.asarray([[0.0, 0.0, -20.0, -20.0]], jnp.float32)
    cfg = SamplingConfig(temperature=1.0, top_p=0.9)
    lp = np.asarray(filtered_log_probs(logits, cfg))[0]
    # the two -20 tokens fall outside the 0.9 nucleus
    assert lp[2] < -20 and lp[3] < -20
    np.testing.assert_allclose(np.exp(lp[:2]), [0.5, 0.5], atol=1e-5)


# ---------------------------------------------------------------------------
# engine-level: scheduler + speculative
# ---------------------------------------------------------------------------

from ant_quantization_tpu.models.transformer_lm import (LMConfig,   # noqa
                                                        TransformerLM)
from ant_quantization_tpu.nn.config import QuantConfig              # noqa
from ant_quantization_tpu.serve import engine as eng                # noqa
from ant_quantization_tpu.serve.scheduler import (ContinuousBatcher,  # noqa
                                                  Request)
from ant_quantization_tpu.serve.speculative import SpeculativeDecoder  # noqa


def _mk(vocab, n_layers, d_model, seed, max_seq=64):
    cfg = LMConfig(vocab_size=vocab, d_model=d_model, n_layers=n_layers,
                   n_heads=4, d_ff=2 * d_model, max_seq=max_seq,
                   positions="learned", activation="gelu_new",
                   fused_qkv=True)
    model = TransformerLM(cfg, QuantConfig(enabled=False))
    ids = jnp.asarray(np.random.default_rng(seed).integers(0, vocab, (2, 8)))
    variables = model.init(jax.random.PRNGKey(seed), ids)
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="bf16", kv_int8=True,
                            max_seq=max_seq, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, variables["params"])
    return ecfg, ep


def test_scheduler_sampling_topk1_equals_greedy():
    vocab = 32
    ecfg, ep = _mk(vocab, 2, 32, seed=0)
    prompts = [[1, 2, 3], [4, 5], [6]]

    def run(sampling):
        cb = ContinuousBatcher(ecfg, ep, batch_slots=2,
                               prefill_buckets=(8,), sampling=sampling)
        for p in prompts:
            cb.submit(Request(prompt=p, max_new_tokens=5))
        done = cb.run()
        return {c.id: c.tokens for c in done}

    greedy = run(None)
    topk1 = run(SamplingConfig(temperature=1.0, top_k=1))
    assert greedy == topk1


def test_scheduler_sampling_varies_with_seed():
    vocab = 32
    ecfg, ep = _mk(vocab, 2, 32, seed=0)

    def run(seed):
        cb = ContinuousBatcher(ecfg, ep, batch_slots=1,
                               prefill_buckets=(8,),
                               sampling=SamplingConfig(temperature=2.0),
                               seed=seed)
        cb.submit(Request(prompt=[1, 2, 3], max_new_tokens=8))
        return cb.run()[0].tokens

    outs = {tuple(run(s)) for s in range(4)}
    assert len(outs) > 1, "temperature=2 should vary across seeds"
    # reproducible per seed
    assert run(1) == run(1)


def test_speculative_rejection_sampling_topk1_equals_greedy():
    vocab = 64
    tcfg, tep = _mk(vocab, 2, 32, seed=0)
    dcfg, dep = _mk(vocab, 1, 16, seed=1)
    prompt = np.random.default_rng(2).integers(0, vocab, (2, 6))
    greedy = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3).generate(
        prompt, 10)
    topk1 = SpeculativeDecoder(
        tcfg, tep, dcfg, dep, k=3,
        sampling=SamplingConfig(temperature=1.0, top_k=1)).generate(
            prompt, 10)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))


def test_speculative_rejection_sampling_is_lossless():
    """The first token emitted by a rejection-sampling round must follow
    the *target's* filtered distribution exactly, whatever the draft:
    compare empirical frequencies against the target's exact p_0."""
    vocab = 16
    tcfg, tep = _mk(vocab, 2, 32, seed=0)
    dcfg, dep = _mk(vocab, 1, 16, seed=7)     # unrelated draft
    scfg = SamplingConfig(temperature=1.5)
    spec = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=3, sampling=scfg)

    B = 32
    prompt = np.tile(np.asarray([[3, 1, 4]]), (B, 1))
    last = jnp.full((B, 1), 2, jnp.int32)

    # exact target distribution after [prompt, last]
    kv = eng.init_cache(tcfg, B)
    _, kv0 = eng.forward(tcfg, tep, jnp.asarray(prompt), kv,
                         jnp.zeros((B,), jnp.int32))
    lt, _ = eng.forward(tcfg, tep, last, kv0,
                        jnp.full((B,), 3, jnp.int32))
    from ant_quantization_tpu.serve.sampling import filtered_log_probs
    p0 = np.exp(np.asarray(filtered_log_probs(lt[:, -1], scfg)))[0]

    kv_d = eng.init_cache(dcfg, B)
    _, kv_d0 = eng.forward(dcfg, dep, jnp.asarray(prompt), kv_d,
                           jnp.zeros((B,), jnp.int32))
    pos = jnp.full((B,), 3, jnp.int32)
    counts = np.zeros(vocab)
    R = 20
    for r in range(R):
        key = jax.random.PRNGKey(100 + r)
        _, _, toks, n_out, _, _ = spec._sampled_step(
            tep, dep, kv0, kv_d0, last, pos, key)
        first = np.asarray(toks)[:, 0]
        counts += np.bincount(first, minlength=vocab)
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - p0).sum()
    assert tv < 0.12, (tv, freq, p0)
