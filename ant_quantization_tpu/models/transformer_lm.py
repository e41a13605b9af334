"""Decoder-only transformer LM family: GPT-2, OPT, BLOOM.

One parameterized implementation covers the three families the reference's
OliVe CLM harness evaluates (olive_quantization/llm/run_clm.py:469-477 loads
them via AutoModelForCausalLM); architectural differences are config knobs:

  GPT-2  learned positions, fused qkv, gelu_new, pre-LN
  OPT    learned positions with offset 2, split qkv, relu, pre-LN
  BLOOM  ALiBi, fused qkv, gelu_tanh, embedding LayerNorm, pre-LN

Quantization enters exactly where the reference's quantize_model swap does
(olive quant_model.py:12-52): every Linear / GPT-2 Conv1D becomes a
QuantDense; the lm_head is *not* quantized (quant_model.py:50 skips it) and
embeddings are untouched.

The forward supports both full-sequence prefill and single-step decode with
an explicit functional KV cache (serve/ owns the INT8 cache variant).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantDense

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    max_seq: int = 1024
    positions: str = "learned"        # learned | learned_offset2 | alibi
    activation: str = "gelu_new"      # gelu_new | gelu | relu
    fused_qkv: bool = True
    embed_ln: bool = False            # BLOOM word-embedding LayerNorm
    ln_eps: float = 1e-5
    tie_word_embeddings: bool = True
    # GPT-2's matmul sites are pytorch_utils.Conv1D, which the reference
    # quantizes per-channel over the weight's dim 0 — its (in, out)
    # storage makes that the INPUT dim — with OVP pairs along the out
    # axis (olive quant_modules.py:358-387, set_param does not reshape
    # alpha per OUT). True = reproduce those axes at every site (gpt2
    # preset — all its matmuls are Conv1D); False = Linear semantics
    # everywhere (per-out, pairs along in: OPT/BLOOM); a tuple of site
    # names ("qkv", "q", "k", "v", "out", "fc_in", "fc_out") marks a
    # subset (models mixing Conv1D attention with Linear MLPs).
    conv1d_sites: Any = False
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# Family presets for the reference's evaluated checkpoints
# (olive llm/scripts/run_all.sh: gpt2-xl, facebook/opt-6.7b, bigscience/bloom-7b1)
def gpt2_config(size: str = "xl", **kw) -> LMConfig:
    dims = {"small": (768, 12, 12), "medium": (1024, 24, 16),
            "large": (1280, 36, 20), "xl": (1600, 48, 25)}
    d, l, h = dims[size]
    return LMConfig(vocab_size=50257, d_model=d, n_layers=l, n_heads=h,
                    d_ff=4 * d, max_seq=1024, positions="learned",
                    activation="gelu_new", fused_qkv=True,
                    conv1d_sites=True, **kw)


def opt_config(size: str = "6.7b", **kw) -> LMConfig:
    dims = {"125m": (768, 12, 12, 3072), "1.3b": (2048, 24, 32, 8192),
            "6.7b": (4096, 32, 32, 16384), "13b": (5120, 40, 40, 20480)}
    d, l, h, ff = dims[size]
    return LMConfig(vocab_size=50272, d_model=d, n_layers=l, n_heads=h,
                    d_ff=ff, max_seq=2048, positions="learned_offset2",
                    activation="relu", fused_qkv=False, **kw)


def bloom_config(size: str = "7b1", **kw) -> LMConfig:
    dims = {"560m": (1024, 24, 16), "1b7": (2048, 24, 16),
            "3b": (2560, 30, 32), "7b1": (4096, 30, 32)}
    d, l, h = dims[size]
    return LMConfig(vocab_size=250880, d_model=d, n_layers=l, n_heads=h,
                    d_ff=4 * d, max_seq=2048, positions="alibi",
                    activation="gelu", fused_qkv=True, embed_ln=True, **kw)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi per-head slopes (BLOOM's build_alibi_tensor semantics)."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(np.log2(n) - 3)))
        return start * (start ** np.arange(n))

    if np.log2(n_heads).is_integer():
        return pow2_slopes(n_heads)
    closest = 2 ** int(np.floor(np.log2(n_heads)))
    base = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.concatenate([base, extra])


ALL_SITES = ("qkv", "q", "k", "v", "out", "fc_in", "fc_out")


def conv1d_site_names(c: LMConfig) -> frozenset:
    """Normalized set of sites with Conv1D quantizer semantics."""
    if c.conv1d_sites is True:
        return frozenset(ALL_SITES)
    if not c.conv1d_sites:
        return frozenset()
    return frozenset(c.conv1d_sites)


def _qdense(c: LMConfig, qcfg: QuantConfig, features: int, name: str):
    """QuantDense with the site's reference quantizer axes (see
    LMConfig.conv1d_sites)."""
    ca, pa = (0, 1) if name in conv1d_site_names(c) else (-1, 0)
    return QuantDense(features, qcfg, dtype=c.dtype, name=name,
                      channel_axis=ca, pair_axis=pa)


def _activation(name: str):
    if name == "gelu_new":
        return lambda x: 0.5 * x * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    if name == "gelu":
        # HF bloom uses the tanh approximation as well
        return lambda x: 0.5 * x * (1.0 + jnp.tanh(
            np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3.0))))
    if name == "relu":
        return nn.relu
    raise ValueError(name)


class SelfAttention(nn.Module):
    cfg: LMConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, *, mask, alibi_bias=None, kv_cache=None,
                 cache_index=None):
        c = self.cfg
        h, hd = c.n_heads, c.head_dim
        if c.fused_qkv:
            qkv = _qdense(c, self.qcfg, 3 * c.d_model, "qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _qdense(c, self.qcfg, c.d_model, "q")(x)
            k = _qdense(c, self.qcfg, c.d_model, "k")(x)
            v = _qdense(c, self.qcfg, c.d_model, "v")(x)

        B, T = x.shape[0], x.shape[1]
        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, T, h, hd)
        v = v.reshape(B, T, h, hd)

        new_cache = None
        if kv_cache is not None:
            ck, cv = kv_cache  # (B, S, h, hd)
            k = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                             (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                             (0, cache_index, 0, 0))
            new_cache = (k, v)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(q.dtype))
        scores = scores / np.sqrt(hd).astype(np.float32)
        if alibi_bias is not None:
            scores = scores + alibi_bias
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(mask, scores, neg)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(attn.dtype))
        out = out.reshape(B, T, c.d_model)
        out = _qdense(c, self.qcfg, c.d_model, "out")(out)
        return out, new_cache


class Block(nn.Module):
    cfg: LMConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, *, mask, alibi_bias=None, kv_cache=None,
                 cache_index=None):
        c = self.cfg
        act = _activation(c.activation)
        h = nn.LayerNorm(epsilon=c.ln_eps, name="ln_1")(x)
        a, new_cache = SelfAttention(c, self.qcfg, name="attn")(
            h, mask=mask, alibi_bias=alibi_bias, kv_cache=kv_cache,
            cache_index=cache_index)
        x = x + a
        h = nn.LayerNorm(epsilon=c.ln_eps, name="ln_2")(x)
        h = _qdense(c, self.qcfg, c.d_ff, "fc_in")(h)
        h = act(h)
        h = _qdense(c, self.qcfg, c.d_model, "fc_out")(h)
        return x + h, new_cache


class TransformerLM(nn.Module):
    cfg: LMConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, input_ids, *, kv_caches=None, cache_index=None):
        """input_ids (B, T) -> logits (B, T, V).

        Prefill: kv_caches=None, causal attention over T.
        Decode:  kv_caches = per-layer (k, v) of shape (B, S, h, hd),
                 cache_index = current fill position (scalar); T is the new
                 chunk length (typically 1). Returns (logits, new_caches).
        """
        c = self.cfg
        B, T = input_ids.shape
        x = nn.Embed(c.vocab_size, c.d_model, name="wte",
                     dtype=c.dtype)(input_ids)

        if cache_index is None:
            pos0 = 0
            kv_len = T
        else:
            pos0 = cache_index
            kv_len = kv_caches[0][0].shape[1]

        positions = pos0 + jnp.arange(T)
        if c.positions == "learned":
            x = x + nn.Embed(c.max_seq, c.d_model, name="wpe",
                             dtype=c.dtype)(positions)
        elif c.positions == "learned_offset2":
            # OPT's OPTLearnedPositionalEmbedding adds 2 to every index
            x = x + nn.Embed(c.max_seq + 2, c.d_model, name="wpe",
                             dtype=c.dtype)(positions + 2)
        elif c.positions == "alibi":
            pass
        else:
            raise ValueError(c.positions)

        if c.embed_ln:
            x = nn.LayerNorm(epsilon=c.ln_eps, name="embed_ln")(x)

        # attention mask: query position pos0+q attends key positions <= it
        q_pos = pos0 + jnp.arange(T)[:, None]
        k_pos = jnp.arange(kv_len)[None, :]
        mask = (k_pos <= q_pos)[None, None]  # (1, 1, T, kv_len)

        alibi_bias = None
        if c.positions == "alibi":
            slopes = jnp.asarray(alibi_slopes(c.n_heads), x.dtype)
            # bias = slope * (k_pos - q_pos) for k<=q (masked elsewhere)
            rel = (k_pos - q_pos).astype(x.dtype)
            alibi_bias = slopes[None, :, None, None] * rel[None, None]

        new_caches = [] if kv_caches is not None else None
        for i in range(c.n_layers):
            kv = kv_caches[i] if kv_caches is not None else None
            x, nc = Block(c, self.qcfg, name=f"h_{i}")(
                x, mask=mask, alibi_bias=alibi_bias, kv_cache=kv,
                cache_index=cache_index)
            if new_caches is not None:
                new_caches.append(nc)

        x = nn.LayerNorm(epsilon=c.ln_eps, name="ln_f")(x)

        # lm_head: never quantized (olive quant_model.py:50)
        if c.tie_word_embeddings:
            wte = self.variables["params"]["wte"]["embedding"]
            logits = x @ wte.T.astype(x.dtype)
        else:
            logits = nn.Dense(c.vocab_size, use_bias=False, name="lm_head",
                              dtype=c.dtype)(x)
        if new_caches is not None:
            return logits, new_caches
        return logits


def init_kv_caches(cfg: LMConfig, batch: int, max_len: int,
                   dtype=jnp.float32):
    """Fresh per-layer (k, v) buffers for decode."""
    shape = (batch, max_len, cfg.n_heads, cfg.head_dim)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.n_layers)]
