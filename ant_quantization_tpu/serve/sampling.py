"""Token sampling for the serving engine: temperature / top-k / top-p.

Beyond-reference serving capability (the reference never decodes — its
LLM path is HF Trainer eval, olive llm/run_clm.py); this is the standard
sampling stack a serving engine needs, written jit-first:

- all filtering is by *value threshold* computed from sorted logits — no
  scatter of a permutation back through the vocab (TPU gathers/scatters
  route through the scalar core; a broadcast compare against one
  threshold is a VPU op).
- ``temperature == 0`` is exact greedy (argmax), byte-identical to the
  pre-sampling scheduler behavior.
- ``filtered_log_probs`` exposes the *exact* filtered+renormalized
  distribution so speculative decoding can do lossless rejection
  sampling against it (serve/speculative.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["SamplingConfig", "filter_logits", "filtered_log_probs",
           "sample"]

_NEG = -1e30   # large-negative fill for masked logits (finite: keeps
               # softmax well-defined even if everything else masks out)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling parameters (trace-time constants).

    temperature: 0.0 => greedy argmax.
    top_k: keep the k highest-probability tokens (0 = disabled).
    top_p: keep the smallest prefix of the sorted distribution with
        cumulative probability >= top_p (1.0 = disabled).

    Note on order: we follow the HF convention — temperature first, then
    top-k, then top-p — so published sampling recipes transfer directly.
    """
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0


def filter_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Temperature-scale then top-k/top-p filter; masked entries get a
    large negative value. Shape-preserving over (..., V)."""
    if cfg.is_greedy:
        return logits
    x = logits.astype(jnp.float32) / jnp.float32(cfg.temperature)
    V = x.shape[-1]
    if cfg.top_k and cfg.top_k < V:
        kth = jax.lax.top_k(x, cfg.top_k)[0][..., -1:]
        x = jnp.where(x < kth, _NEG, x)
    if cfg.top_p < 1.0:
        # smallest prefix of the descending-sorted distribution whose
        # cumulative probability reaches top_p; the threshold is the last
        # kept *logit value*, applied as a broadcast compare (no scatter)
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep position i iff the cumulative mass *before* i is < top_p
        keep = (cum - probs) < cfg.top_p
        n_keep = jnp.sum(keep, axis=-1, keepdims=True)     # >= 1
        thresh = jnp.take_along_axis(sorted_x, n_keep - 1, axis=-1)
        x = jnp.where(x < thresh, _NEG, x)
    return x


def filtered_log_probs(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """log of the exact sampling distribution (filtered + renormalized)."""
    return jax.nn.log_softmax(filter_logits(logits, cfg), axis=-1)


def sample(logits: jax.Array, cfg: SamplingConfig,
           key: jax.Array) -> jax.Array:
    """Draw token ids from (..., V) logits; greedy when temperature==0."""
    if cfg.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filter_logits(logits, cfg), axis=-1).astype(jnp.int32)
