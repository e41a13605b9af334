"""Speculative decoding over the quantized serving engine.

Beyond-reference serving capability (the reference's LLM path is HF
Trainer eval, olive llm/run_clm.py — no decoding loop at all): a small
draft engine proposes ``k`` greedy tokens, the target engine scores all
k+1 positions in ONE forward (T = k+1 stays on the fused INT8-KV decode
attention path, engine._attention's T <= 16 branch), and the longest
prefix of draft tokens matching the target's greedy choices is accepted,
plus the target's correction token. Greedy-to-greedy this is *lossless*:
the emitted stream is bit-identical to decoding the target alone
(tests/test_speculative.py asserts exact equality), while each target
forward now amortizes its weight streaming over up to k+1 tokens — on a
HBM-bound W4 engine that is the difference between one weight read per
token and one per accepted run.

Cache discipline: both engines write K/V rows for speculative positions
that may be rejected. That is safe for the same reason the continuous-
batching scheduler's padded prefill is (serve/scheduler.py): the causal
mask admits only rows <= the query position, and every later decode at
position p overwrites row p before attending it — rejected rows are
always overwritten before they become visible.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import engine as eng
from .sampling import SamplingConfig, filtered_log_probs, sample

__all__ = ["SpeculativeDecoder"]


class SpeculativeDecoder:
    """Draft-and-verify decoding: draft engine + target engine.

    Both engines must share the vocabulary; ``k`` is the speculation
    depth (k + 1 <= 16 keeps verification on the fused decode kernel).

    With ``sampling`` set (temperature > 0) the verify step runs
    *speculative rejection sampling* (Leviathan et al.'s scheme): draft
    token x_i ~ q_i is accepted with probability min(1, p_i(x_i) /
    q_i(x_i)); the first rejection resamples from the residual
    normalize(max(p_i - q_i, 0)); if all k drafts are accepted one bonus
    token is drawn from p_k. The emitted stream is distributed *exactly*
    as sampling the target alone (lossless), whatever the draft is.
    q/p are the engines' filtered+renormalized sampling distributions
    (serve/sampling.py:filtered_log_probs), so temperature/top-k/top-p
    all compose with speculation.
    """

    def __init__(self, target_cfg: eng.EngineConfig, target_ep: Dict,
                 draft_cfg: eng.EngineConfig, draft_ep: Dict, k: int = 4,
                 sampling: Optional[SamplingConfig] = None,
                 seed: int = 0):
        assert 1 <= k <= 15, "k+1 must stay on the decode attention path"
        assert target_cfg.lm.vocab_size == draft_cfg.lm.vocab_size
        self.tcfg, self.tep = target_cfg, target_ep
        self.dcfg, self.dep = draft_cfg, draft_ep
        self.k = k
        self.sampling = sampling or SamplingConfig()
        self._root_key = jax.random.PRNGKey(seed)
        self._round = 0
        scfg = self.sampling

        @jax.jit
        def prefill(tep, dep, kv_t, kv_d, ids, key):
            zero = jnp.zeros((ids.shape[0],), jnp.int32)
            # only the last prompt position's logits are sampled — the
            # target skips the full-T lm_head (the draft's logits are
            # unused and DCE'd either way)
            lt, kv_t = eng.forward(target_cfg, tep, ids, kv_t, zero,
                                   last_index=ids.shape[1] - 1)
            _, kv_d = eng.forward(draft_cfg, dep, ids, kv_d, zero)
            last = sample(lt[:, -1:], scfg, key)
            return kv_t, kv_d, last

        def step(tep, dep, kv_t, kv_d, last, pos):
            """One speculation round.

            last (B, 1): newest emitted token, K/V not yet cached.
            pos  (B,):   its cache row.
            Returns (kv_t, kv_d, out (B, k+1), n_out (B,), last', pos').
            """
            B = last.shape[0]

            def body(carry, i):
                tok, kv_d_ = carry
                ld, kv_d_ = eng.forward(draft_cfg, dep, tok, kv_d_, pos + i)
                nxt = jnp.argmax(ld[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, kv_d_), nxt[:, 0]

            # k+1 draft steps: k proposals + caching the k-th proposal's
            # K/V (its output token is discarded)
            (_, kv_d), drafts = jax.lax.scan(body, (last, kv_d),
                                             jnp.arange(self.k + 1))
            drafts = drafts.T[:, :self.k]                     # (B, k)
            ids = jnp.concatenate([last, drafts], axis=1)     # (B, k+1)
            lt, kv_t = eng.forward(target_cfg, tep, ids, kv_t, pos)
            tgt = jnp.argmax(lt, axis=-1).astype(jnp.int32)   # (B, k+1)
            match = (drafts == tgt[:, :self.k]).astype(jnp.int32)
            m = jnp.cumprod(match, axis=1).sum(axis=1)        # (B,) accepted
            # emitted stream: drafts[:m] then the correction token tgt[m]
            # (positions past m are don't-cares, truncated by n_out)
            idx = jnp.arange(self.k + 1)[None, :]
            corr = tgt[jnp.arange(B), m][:, None]
            out = jnp.where(idx < m[:, None],
                            jnp.pad(drafts, ((0, 0), (0, 1))), corr)
            n_out = m + 1
            last2 = tgt[jnp.arange(B), m][:, None]
            return kv_t, kv_d, out, n_out, last2, pos + n_out

        def sampled_step(tep, dep, kv_t, kv_d, last, pos, key):
            """One rejection-sampling speculation round (lossless sampled
            decoding). Same cache discipline as ``step``."""
            B = last.shape[0]
            k = self.k
            kd, ka, kr = jax.random.split(key, 3)

            def body(carry, i):
                tok, kv_d_ = carry
                ld, kv_d_ = eng.forward(draft_cfg, dep, tok, kv_d_, pos + i)
                logq = filtered_log_probs(ld[:, -1], scfg)      # (B, V)
                nxt = jax.random.categorical(
                    jax.random.fold_in(kd, i), logq)[:, None].astype(
                        jnp.int32)
                return (nxt, kv_d_), (nxt[:, 0], logq)

            # k+1 draft steps (the k-th only caches its K/V)
            (_, kv_d), (drafts_t, logq_t) = jax.lax.scan(
                body, (last, kv_d), jnp.arange(k + 1))
            drafts = drafts_t.T[:, :k]                           # (B, k)
            logq = jnp.swapaxes(logq_t, 0, 1)[:, :k]             # (B, k, V)
            ids = jnp.concatenate([last, drafts], axis=1)        # (B, k+1)
            lt, kv_t = eng.forward(target_cfg, tep, ids, kv_t, pos)
            logp = filtered_log_probs(lt, scfg)                  # (B,k+1,V)

            # accept x_i with prob min(1, p_i(x_i)/q_i(x_i))
            bidx = jnp.arange(B)[:, None]
            iidx = jnp.arange(k)[None, :]
            lp_x = logp[:, :k][bidx, iidx, drafts]               # (B, k)
            lq_x = logq[bidx, iidx, drafts]                      # (B, k)
            u = jax.random.uniform(ka, (B, k), minval=1e-20)
            accept = (jnp.log(u) < (lp_x - lq_x)).astype(jnp.int32)
            m = jnp.cumprod(accept, axis=1).sum(axis=1)          # (B,)

            # correction at position m: residual max(p_m - q_m, 0)
            # (q_k := 0 for the all-accepted bonus draw, so residual = p_k)
            q_pad = jnp.concatenate(
                [jnp.exp(logq), jnp.zeros_like(logq[:, :1])], axis=1)
            p_m = jnp.exp(logp[jnp.arange(B), m])                # (B, V)
            q_m = q_pad[jnp.arange(B), m]                        # (B, V)
            resid = jnp.maximum(p_m - q_m, 0.0)
            rs = jnp.sum(resid, axis=-1, keepdims=True)
            # p == q exactly -> zero residual; rejection then had
            # probability 0 up to float error, fall back to p_m
            resid = jnp.where(rs > 0, resid / jnp.maximum(rs, 1e-30), p_m)
            corr = jax.random.categorical(
                kr, jnp.log(jnp.maximum(resid, 1e-30)))[:, None].astype(
                    jnp.int32)                                   # (B, 1)

            idx = jnp.arange(k + 1)[None, :]
            out = jnp.where(idx < m[:, None],
                            jnp.pad(drafts, ((0, 0), (0, 1))), corr)
            n_out = m + 1
            return kv_t, kv_d, out, n_out, corr, pos + n_out

        def rounds(tep, dep, kv_t, kv_d, last, pos, key, round0, n_rounds):
            """``n_rounds`` speculation rounds inside ONE compiled
            program (lax.scan over the round body). A host-driven round
            loop pays one device-dispatch round trip per k-or-fewer
            accepted tokens — on a remote backend that RTT (~26 ms here)
            dwarfs the 12 ms verify step. Scanning the rounds in-graph
            amortizes dispatch over ``n_rounds`` rounds; the emitted
            stream is identical to single-round stepping (the scan body
            IS the single-round step; sampled rounds fold the ABSOLUTE
            round index ``round0 + i`` into the root key exactly like
            the host loop's _next_key folds its round counter, so the
            sampled stream is bit-identical to single-round stepping).

            Returns (kv_t, kv_d, toks (R, B, k+1), n_out (R, B), last,
            pos). Caller guarantees pos + n_rounds*(k+1) < max_seq."""
            def body(carry, i):
                kv_t, kv_d, last, pos = carry
                if scfg.is_greedy:
                    kv_t, kv_d, out, n, last, pos = step(
                        tep, dep, kv_t, kv_d, last, pos)
                else:
                    kv_t, kv_d, out, n, last, pos = sampled_step(
                        tep, dep, kv_t, kv_d, last, pos,
                        jax.random.fold_in(key, i))
                return (kv_t, kv_d, last, pos), (out, n)
            (kv_t, kv_d, last, pos), (outs, ns) = jax.lax.scan(
                body, (kv_t, kv_d, last, pos),
                round0 + jnp.arange(n_rounds))
            return kv_t, kv_d, outs, ns, last, pos

        self._prefill = prefill
        self._step = jax.jit(step)
        self._sampled_step = jax.jit(sampled_step)
        self._rounds = jax.jit(rounds, static_argnums=8)

    def _next_key(self):
        key = jax.random.fold_in(self._root_key, self._round)
        self._round += 1
        return key

    def generate(self, prompt_ids: np.ndarray, max_new_tokens: int,
                 eos_id: Optional[int] = None,
                 rounds_per_dispatch: int = 8) -> List[List[int]]:
        """Decode ``max_new_tokens`` per sequence; returns the emitted
        token lists (identical to target-only decoding — exactly for
        greedy, in distribution for sampling).

        ``rounds_per_dispatch`` speculation rounds run inside one
        compiled program per host dispatch (see ``rounds``); 1 recovers
        the round-per-dispatch host loop. The emitted stream does not
        depend on the chunking."""
        B, T = prompt_ids.shape
        kv_t = eng.init_cache(self.tcfg, B)
        kv_d = eng.init_cache(self.dcfg, B)
        kv_t, kv_d, last = self._prefill(self.tep, self.dep, kv_t, kv_d,
                                         jnp.asarray(prompt_ids),
                                         self._next_key())
        out: List[List[int]] = [[int(np.asarray(last)[b, 0])]
                                for b in range(B)]
        pos = jnp.full((B,), T, jnp.int32)
        limit = min(self.tcfg.max_seq, self.dcfg.max_seq)
        self.accepted_hist: List[int] = []
        while (any(len(o) < max_new_tokens for o in out)
               and int(np.asarray(pos).max()) + self.k + 1 < limit):
            # rounds this dispatch: the full chunk, or single rounds for
            # the tail / near the cache limit. ONLY these two variants —
            # ``n_rounds`` is a static arg, so every distinct r is a
            # separate compile; capping r by the remaining-token count
            # was measured to recompile per tail length and cost more
            # than it saved
            pmax = int(np.asarray(pos).max())
            need = max(max_new_tokens - len(o) for o in out)
            fits = (limit - 1 - pmax) // (self.k + 1)
            r = rounds_per_dispatch if (
                need >= rounds_per_dispatch
                and fits >= rounds_per_dispatch) else 1
            kv_t, kv_d, toks, n_out, last, pos = self._rounds(
                self.tep, self.dep, kv_t, kv_d, last, pos,
                self._root_key, self._round, r)
            self._round += r
            toks, n = np.asarray(toks), np.asarray(n_out)   # (r,B,k+1),(r,B)
            for j in range(r):
                self.accepted_hist.append(int(n[j].sum() - B))
                for b in range(B):
                    if len(out[b]) >= max_new_tokens:
                        continue
                    if eos_id is not None and eos_id in out[b]:
                        continue
                    out[b].extend(int(t) for t in toks[j, b, :n[j, b]])
        for b in range(B):
            o = out[b][:max_new_tokens]
            if eos_id is not None and eos_id in o:
                o = o[:o.index(eos_id) + 1]
            out[b] = o
        return out
