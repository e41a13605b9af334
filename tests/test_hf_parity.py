"""Numerical parity of the flax model zoo against HuggingFace torch
reference implementations at tiny configs (quantization disabled).

This is the strongest correctness check available offline: random torch
weights -> importer -> our forward must match HF's forward to float32
tolerance. Covers the exact architectures the reference evaluates
(olive run_clm.py: GPT-2/OPT/BLOOM; olive bert: BERT/BART).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ant_quantization_tpu.models import bart as bart_mod
from ant_quantization_tpu.models import bert as bert_mod
from ant_quantization_tpu.models import import_hf
from ant_quantization_tpu.models.transformer_lm import LMConfig, TransformerLM
from ant_quantization_tpu.nn.config import FP32

TOL = dict(rtol=2e-4, atol=2e-4)


def _sd(model):
    return import_hf.torch_state_dict_to_numpy(model)


def _ids(rng, vocab, shape):
    return rng.integers(3, vocab, shape).astype(np.int32)


def test_gpt2_parity(rng):
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="learned",
                   activation="gelu_new", fused_qkv=True)
    params = import_hf.import_gpt2(_sd(hf), cfg)
    ids = _ids(rng, 128, (2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    got = TransformerLM(cfg, FP32).apply({"params": params},
                                         jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_opt_parity(rng):
    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=64,
        dropout=0.0, do_layer_norm_before=True, word_embed_proj_dim=32)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="learned_offset2",
                   activation="relu", fused_qkv=False)
    params = import_hf.import_opt(_sd(hf), cfg)
    ids = _ids(rng, 128, (2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    got = TransformerLM(cfg, FP32).apply({"params": params},
                                         jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_bloom_parity(rng):
    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0)
    hf = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=128, max_seq=64, positions="alibi",
                   activation="gelu", fused_qkv=True, embed_ln=True)
    params = import_hf.import_bloom(_sd(hf), cfg)
    ids = _ids(rng, 128, (2, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    got = TransformerLM(cfg, FP32).apply({"params": params},
                                         jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_bert_parity(rng):
    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_labels=3)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()
    cfg = bert_mod.BertConfig(vocab_size=128, d_model=32, n_layers=2,
                              n_heads=4, d_ff=64, max_seq=64, num_labels=3)
    params = bert_mod.import_hf_bert(_sd(hf), cfg)
    ids = _ids(rng, 128, (2, 12))
    am = np.ones_like(ids)
    am[:, -3:] = 0
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(am)).logits.numpy()
    got = bert_mod.BertForSequenceClassification(cfg, FP32).apply(
        {"params": params}, jnp.asarray(ids), None, jnp.asarray(am))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_bart_parity(rng):
    hf_cfg = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, num_labels=3, eos_token_id=2,
        pad_token_id=1, classifier_dropout=0.0)
    hf = transformers.BartForSequenceClassification(hf_cfg).eval()
    cfg = bart_mod.BartConfig(vocab_size=128, d_model=32, enc_layers=2,
                              dec_layers=2, n_heads=4, d_ff=64, max_seq=64,
                              num_labels=3)
    params = bart_mod.import_hf_bart(_sd(hf), cfg)
    ids = _ids(rng, 120, (2, 12))
    ids[:, -1] = 2  # eos-terminated rows (HF requires eos for pooling)
    am = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(am)).logits.numpy()
    got = bart_mod.BartForSequenceClassification(cfg, FP32).apply(
        {"params": params}, jnp.asarray(ids), None, jnp.asarray(am))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)
