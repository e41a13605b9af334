"""Quantized BERT encoder + task heads (GLUE classification, SQuAD QA).

Covers both reference harnesses:
- ANT's vendored NVIDIA BERT (ant_quantization/BERT/modeling.py) where
  quantization enters purely by swapping every nn.Linear
  (run_glue.py:537-546) — embeddings and LayerNorm stay full precision.
- OliVe's HF BERT GLUE/SQuAD flows (olive bert/run_glue.py, run_qa.py).

Architecture is standard HF BertModel (post-LN encoder), so weights import
directly from any HF bert-base/large checkpoint.
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
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_seq: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12
    num_labels: int = 2


def bert_base_config(**kw):
    return BertConfig(**kw)


def bert_large_config(**kw):
    return BertConfig(d_model=1024, n_layers=24, n_heads=16, d_ff=4096, **kw)


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h, hd = c.n_heads, c.d_model // c.n_heads
        q = QuantDense(c.d_model, self.qcfg, name="query")(x)
        k = QuantDense(c.d_model, self.qcfg, name="key")(x)
        v = QuantDense(c.d_model, self.qcfg, name="value")(x)
        B, T = x.shape[0], x.shape[1]
        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, T, h, hd)
        v = v.reshape(B, T, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            scores = scores + mask  # additive mask (0 / -inf style)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, c.d_model)
        return QuantDense(c.d_model, self.qcfg, name="output")(out)


class BertLayer(nn.Module):
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        a = BertSelfAttention(c, self.qcfg, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="attention_ln")(x + a)
        h = QuantDense(c.d_ff, self.qcfg, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = QuantDense(c.d_model, self.qcfg, name="output")(h)
        return nn.LayerNorm(epsilon=c.ln_eps, name="output_ln")(x + h)


class BertModel(nn.Module):
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        c = self.cfg
        B, T = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = nn.Embed(c.vocab_size, c.d_model, name="word_embeddings")(
            input_ids)
        x = x + nn.Embed(c.max_seq, c.d_model, name="position_embeddings")(
            jnp.arange(T))
        x = x + nn.Embed(c.type_vocab_size, c.d_model,
                         name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.ln_eps, name="embeddings_ln")(x)

        mask = None
        if attention_mask is not None:
            mask = (1.0 - attention_mask[:, None, None, :].astype(x.dtype))
            mask = mask * jnp.finfo(x.dtype).min

        for i in range(c.n_layers):
            x = BertLayer(c, self.qcfg, name=f"layer_{i}")(x, mask)
        return x

    # sequence output; pooling lives in the task heads


class BertPooler(nn.Module):
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, seq):
        # HF pooler is an nn.Linear -> quantized by the reference's swap
        x = QuantDense(self.cfg.d_model, self.qcfg, name="dense")(seq[:, 0])
        return jnp.tanh(x)


class BertForSequenceClassification(nn.Module):
    """GLUE head (reference: BERT/modeling.py:987, olive run_glue.py)."""
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        seq = BertModel(self.cfg, self.qcfg, name="bert")(
            input_ids, token_type_ids, attention_mask)
        pooled = BertPooler(self.cfg, self.qcfg, name="pooler")(seq)
        return QuantDense(self.cfg.num_labels, self.qcfg,
                          name="classifier")(pooled)


class BertForQuestionAnswering(nn.Module):
    """SQuAD head (olive bert/run_qa.py): start/end logits."""
    cfg: BertConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None):
        seq = BertModel(self.cfg, self.qcfg, name="bert")(
            input_ids, token_type_ids, attention_mask)
        logits = QuantDense(2, self.qcfg, name="qa_outputs")(seq)
        return logits[..., 0], logits[..., 1]


# ---------------------------------------------------------------------------
# HF checkpoint import
# ---------------------------------------------------------------------------

def import_hf_bert(sd: Mapping[str, np.ndarray], cfg: BertConfig,
                   head: str = "classification") -> dict:
    """HF BertForSequenceClassification / BertForQuestionAnswering
    state_dict -> params. Also accepts bare BertModel checkpoints
    (prefix-insensitive)."""
    def g(key):
        for pfx in ("", "bert."):
            if pfx + key in sd:
                return sd[pfx + key]
        raise KeyError(key)

    def ln(key):
        return {"scale": g(f"{key}.weight"), "bias": g(f"{key}.bias")}

    def lin(key):
        return {"kernel": g(f"{key}.weight").T, "bias": g(f"{key}.bias")}

    bert = {
        "word_embeddings": {
            "embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")},
        "token_type_embeddings": {
            "embedding": g("embeddings.token_type_embeddings.weight")},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.n_layers):
        b = f"encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "attention": {
                "query": lin(f"{b}.attention.self.query"),
                "key": lin(f"{b}.attention.self.key"),
                "value": lin(f"{b}.attention.self.value"),
                "output": lin(f"{b}.attention.output.dense"),
            },
            "attention_ln": ln(f"{b}.attention.output.LayerNorm"),
            "intermediate": lin(f"{b}.intermediate.dense"),
            "output": lin(f"{b}.output.dense"),
            "output_ln": ln(f"{b}.output.LayerNorm"),
        }
    params = {"bert": bert}
    if "bert.pooler.dense.weight" in sd or "pooler.dense.weight" in sd:
        params["pooler"] = {"dense": lin("pooler.dense")}
    if head == "classification" and "classifier.weight" in sd:
        params["classifier"] = {"kernel": sd["classifier.weight"].T,
                                "bias": sd["classifier.bias"]}
    if head == "qa" and "qa_outputs.weight" in sd:
        params["qa_outputs"] = {"kernel": sd["qa_outputs.weight"].T,
                                "bias": sd["qa_outputs.bias"]}
    return params
