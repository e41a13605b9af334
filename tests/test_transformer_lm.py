"""TransformerLM parity vs HuggingFace torch implementations (tiny random
configs, no downloads) and KV-cache decode consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ant_quantization_tpu.models import import_hf
from ant_quantization_tpu.models.transformer_lm import (LMConfig,
                                                        TransformerLM,
                                                        init_kv_caches)
from ant_quantization_tpu.nn.config import QuantConfig

FP = QuantConfig(enabled=False)

torch = pytest.importorskip("torch")


def _run_parity(torch_model, cfg, importer, input_ids, rtol=2e-4, atol=2e-4):
    torch_model.eval()
    with torch.no_grad():
        want = torch_model(torch.tensor(input_ids)).logits.numpy()
    sd = import_hf.torch_state_dict_to_numpy(torch_model)
    params = importer(sd, cfg)
    model = TransformerLM(cfg, FP)
    got = model.apply({"params": params}, jnp.asarray(input_ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)
    return model, params


def test_gpt2_parity(rng):
    from transformers import GPT2Config, GPT2LMHeadModel
    hf = GPT2LMHeadModel(GPT2Config(
        n_layer=2, n_head=4, n_embd=32, n_positions=64, vocab_size=128,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0))
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    ids = rng.integers(0, 128, size=(2, 10))
    _run_parity(hf, cfg, import_hf.import_gpt2, ids)


def test_opt_parity(rng):
    from transformers import OPTConfig, OPTForCausalLM
    hf = OPTForCausalLM(OPTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=64, max_position_embeddings=64, vocab_size=128,
        activation_function="relu", do_layer_norm_before=True, dropout=0.0,
        word_embed_proj_dim=32))
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=64, max_seq=64, positions="learned_offset2",
                   activation="relu", fused_qkv=False)
    ids = rng.integers(0, 128, size=(2, 10))
    _run_parity(hf, cfg, import_hf.import_opt, ids)


def test_bloom_parity(rng):
    from transformers import BloomConfig, BloomForCausalLM
    hf = BloomForCausalLM(BloomConfig(
        hidden_size=32, n_layer=2, n_head=4, vocab_size=128,
        hidden_dropout=0.0, attention_dropout=0.0))
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="alibi",
                   activation="gelu", fused_qkv=True, embed_ln=True)
    ids = rng.integers(0, 128, size=(2, 10))
    _run_parity(hf, cfg, import_hf.import_bloom, ids)


def test_decode_with_cache_matches_prefill(rng):
    cfg = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                   d_ff=64, max_seq=32, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    model = TransformerLM(cfg, FP)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 8)))
    variables = model.init(jax.random.PRNGKey(0), ids)
    params = variables["params"]

    full = model.apply({"params": params}, ids)

    caches = init_kv_caches(cfg, 2, 16)
    logits = None
    for t in range(8):
        step = ids[:, t:t + 1]
        logits, caches = model.apply({"params": params}, step,
                                     kv_caches=caches, cache_index=t)
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.asarray(full[:, -1]), rtol=2e-5, atol=2e-5)


def test_alibi_slopes_match_hf():
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor
    from ant_quantization_tpu.models.transformer_lm import alibi_slopes
    for h in (4, 8, 16, 32, 6, 12):
        mask = torch.ones(1, 5)
        alibi = build_alibi_tensor(mask, h, torch.float32)  # (h, 1, 5)
        hf_slopes = alibi[:, 0, 1].numpy()  # slope * position 1
        np.testing.assert_allclose(alibi_slopes(h), hf_slopes, rtol=1e-6)


def test_quantized_lm_runs(rng):
    cfg = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                   d_ff=64, max_seq=32)
    qcfg = QuantConfig(mode="ant-int-flint", family="olive",
                       w_up=250, a_up=250)
    model = TransformerLM(cfg, qcfg)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 8)))
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits, upd = model.apply(variables, ids, mutable=["quant"])
    assert np.all(np.isfinite(np.asarray(logits)))
    out = model.apply({"params": variables["params"],
                       "quant": upd["quant"]}, ids)
    assert out.shape == (2, 8, 64)
