"""Quantized BART encoder-decoder + task heads.

The OliVe harnesses evaluate BART-base on GLUE and SQuAD
(olive_quantization/bert/README.md:10-22) through HF's
BartForSequenceClassification / BartForQuestionAnswering; quantization
enters by the Linear swap (olive quant_model.py:12-52) — every attention
projection and FFN linear becomes a QuantDense, embeddings/LayerNorms stay
full precision, the lm_head (not used by these heads) is skipped.

Architecture follows HF BART: post-LN, learned positions with offset 2,
gelu, shared input/output embeddings, classification head on the final
decoder state at the last EOS position.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantDense


@dataclasses.dataclass(frozen=True)
class BartConfig:
    vocab_size: int = 50265
    d_model: int = 768
    enc_layers: int = 6
    dec_layers: int = 6
    n_heads: int = 12
    d_ff: int = 3072
    max_seq: int = 1024
    ln_eps: float = 1e-5
    num_labels: int = 2
    eos_token_id: int = 2
    pad_token_id: int = 1
    decoder_start_token_id: int = 2


def bart_base_config(**kw) -> BartConfig:
    return BartConfig(**kw)


def bart_large_config(**kw) -> BartConfig:
    return BartConfig(d_model=1024, enc_layers=12, dec_layers=12,
                      n_heads=16, d_ff=4096, **kw)


class BartAttention(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, kv=None, mask=None):
        c = self.cfg
        h, hd = c.n_heads, c.d_model // c.n_heads
        kv = x if kv is None else kv
        q = QuantDense(c.d_model, self.qcfg, name="q_proj")(x) * (hd ** -0.5)
        k = QuantDense(c.d_model, self.qcfg, name="k_proj")(kv)
        v = QuantDense(c.d_model, self.qcfg, name="v_proj")(kv)
        B, T = x.shape[0], x.shape[1]
        S = kv.shape[1]
        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, S, h, hd)
        v = v.reshape(B, S, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, c.d_model)
        return QuantDense(c.d_model, self.qcfg, name="out_proj")(out)


class BartEncoderLayer(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        a = BartAttention(c, self.qcfg, name="self_attn")(x, mask=mask)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="self_attn_ln")(x + a)
        h = QuantDense(c.d_ff, self.qcfg, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = QuantDense(c.d_model, self.qcfg, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.ln_eps, name="final_ln")(x + h)


class BartDecoderLayer(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, enc, self_mask, cross_mask):
        c = self.cfg
        a = BartAttention(c, self.qcfg, name="self_attn")(x, mask=self_mask)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="self_attn_ln")(x + a)
        a = BartAttention(c, self.qcfg, name="encoder_attn")(
            x, kv=enc, mask=cross_mask)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="encoder_attn_ln")(x + a)
        h = QuantDense(c.d_ff, self.qcfg, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = QuantDense(c.d_model, self.qcfg, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.ln_eps, name="final_ln")(x + h)


def _additive_mask(attention_mask, dtype=jnp.float32):
    if attention_mask is None:
        return None
    m = (1.0 - attention_mask[:, None, None, :].astype(dtype))
    return m * jnp.finfo(dtype).min


class BartModel(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 decoder_input_ids=None):
        c = self.cfg
        if decoder_input_ids is None:
            # HF BartModel default: shift_tokens_right(input_ids) with the
            # decoder_start_token (= eos for BART) in front
            decoder_input_ids = jnp.concatenate(
                [jnp.full((input_ids.shape[0], 1), c.decoder_start_token_id,
                          input_ids.dtype), input_ids[:, :-1]], axis=1)
        embed = nn.Embed(c.vocab_size, c.d_model, name="shared")

        B, T = input_ids.shape
        # BART's learned positions use a +2 offset (like OPT)
        x = embed(input_ids)
        x = x + nn.Embed(c.max_seq + 2, c.d_model, name="encoder_pos")(
            jnp.arange(T) + 2)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="encoder_embed_ln")(x)
        enc_mask = _additive_mask(attention_mask)
        for i in range(c.enc_layers):
            x = BartEncoderLayer(c, self.qcfg, name=f"enc_{i}")(x, enc_mask)
        enc = x

        Td = decoder_input_ids.shape[1]
        y = embed(decoder_input_ids)
        y = y + nn.Embed(c.max_seq + 2, c.d_model, name="decoder_pos")(
            jnp.arange(Td) + 2)
        y = nn.LayerNorm(epsilon=c.ln_eps, name="decoder_embed_ln")(y)
        # decoder self-attention: causal only (HF passes no
        # decoder_attention_mask on the classification/QA paths)
        self_mask = jnp.where(
            jnp.tril(jnp.ones((Td, Td), bool))[None, None],
            0.0, jnp.finfo(jnp.float32).min)
        for i in range(c.dec_layers):
            y = BartDecoderLayer(c, self.qcfg, name=f"dec_{i}")(
                y, enc, self_mask, enc_mask)
        return y, enc


class BartClassificationHead(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x):
        x = QuantDense(self.cfg.d_model, self.qcfg, name="dense")(x)
        x = jnp.tanh(x)
        return QuantDense(self.cfg.num_labels, self.qcfg,
                          name="out_proj")(x)


class BartForSequenceClassification(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        # token_type_ids accepted for harness-API uniformity; BART has none
        dec, _ = BartModel(self.cfg, self.qcfg, name="model")(
            input_ids, attention_mask)
        # HF pools the decoder state at the LAST eos token of each row
        is_eos = (input_ids == self.cfg.eos_token_id)
        # index of last eos (rows are eos-terminated in GLUE encoding)
        idx = jnp.where(is_eos, jnp.arange(input_ids.shape[1])[None, :],
                        -1).max(axis=1)
        idx = jnp.maximum(idx, 0)
        pooled = jnp.take_along_axis(dec, idx[:, None, None], axis=1)[:, 0]
        return BartClassificationHead(self.cfg, self.qcfg,
                                      name="classification_head")(pooled)


class BartForQuestionAnswering(nn.Module):
    cfg: BartConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        # token_type_ids accepted for harness-API uniformity; BART has none
        dec, _ = BartModel(self.cfg, self.qcfg, name="model")(
            input_ids, attention_mask)
        logits = QuantDense(2, self.qcfg, name="qa_outputs")(dec)
        return logits[..., 0], logits[..., 1]


# ---------------------------------------------------------------------------
# HF import
# ---------------------------------------------------------------------------

def import_hf_bart(sd: Mapping[str, np.ndarray], cfg: BartConfig,
                   head: str = "classification") -> dict:
    def g(key):
        for pfx in ("", "model."):
            if pfx + key in sd:
                return sd[pfx + key]
        raise KeyError(key)

    def ln(key):
        return {"scale": g(f"{key}.weight"), "bias": g(f"{key}.bias")}

    def lin(key):
        p = {"kernel": g(f"{key}.weight").T}
        if f"{key}.bias" in sd or f"model.{key}.bias" in sd:
            p["bias"] = g(f"{key}.bias")
        return p

    def attn(key):
        return {f: lin(f"{key}.{f}")
                for f in ("q_proj", "k_proj", "v_proj", "out_proj")}

    model = {
        "shared": {"embedding": g("shared.weight")},
        "encoder_pos": {"embedding": g("encoder.embed_positions.weight")},
        "decoder_pos": {"embedding": g("decoder.embed_positions.weight")},
        "encoder_embed_ln": ln("encoder.layernorm_embedding"),
        "decoder_embed_ln": ln("decoder.layernorm_embedding"),
    }
    for i in range(cfg.enc_layers):
        b = f"encoder.layers.{i}"
        model[f"enc_{i}"] = {
            "self_attn": attn(f"{b}.self_attn"),
            "self_attn_ln": ln(f"{b}.self_attn_layer_norm"),
            "fc1": lin(f"{b}.fc1"),
            "fc2": lin(f"{b}.fc2"),
            "final_ln": ln(f"{b}.final_layer_norm"),
        }
    for i in range(cfg.dec_layers):
        b = f"decoder.layers.{i}"
        model[f"dec_{i}"] = {
            "self_attn": attn(f"{b}.self_attn"),
            "self_attn_ln": ln(f"{b}.self_attn_layer_norm"),
            "encoder_attn": attn(f"{b}.encoder_attn"),
            "encoder_attn_ln": ln(f"{b}.encoder_attn_layer_norm"),
            "fc1": lin(f"{b}.fc1"),
            "fc2": lin(f"{b}.fc2"),
            "final_ln": ln(f"{b}.final_layer_norm"),
        }
    params = {"model": model}
    if head == "classification" and "classification_head.dense.weight" in sd:
        params["classification_head"] = {
            "dense": {"kernel": sd["classification_head.dense.weight"].T,
                      "bias": sd["classification_head.dense.bias"]},
            "out_proj": {
                "kernel": sd["classification_head.out_proj.weight"].T,
                "bias": sd["classification_head.out_proj.bias"]},
        }
    if head == "qa" and "qa_outputs.weight" in sd:
        params["qa_outputs"] = {"kernel": sd["qa_outputs.weight"].T,
                                "bias": sd["qa_outputs.bias"]}
    return params
