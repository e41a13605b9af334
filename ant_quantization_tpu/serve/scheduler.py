"""Continuous batching scheduler for the quantized serving engine.

The reference serves LLM eval through HF Trainer on fixed batches
(olive llm/run_clm.py) — no serving loop at all. The TPU-native engine
serves a *request stream*: a fixed pool of B slots over one shared
(L, B, S, ...) INT8 KV cache; finished sequences release their slot to the
next queued request immediately (continuous batching), so chip utilization
does not drop to the longest request in a batch.

TPU-shaped design decisions:
- Static shapes everywhere: prompts are padded to power-of-2 length
  buckets, so each (bucket, B) program compiles once. A prefill computes
  the padded tail too and simply never writes it (writes are masked by
  position arithmetic at slot granularity).
- One jitted decode step advances ALL slots each tick with a (B,) position
  vector (engine.forward supports per-slot positions); free slots compute
  garbage that is ignored on the host — cheaper than re-compiling for
  every active-set size.
- Prefill runs batch-1 against a sliced view of the cache for its slot and
  scatters the updated slice back — the other slots' cache rows are
  untouched, so prefill and decode interleave correctly.

The host-side loop (submit/poll) is plain Python; all tensor work is in
the two jitted functions.
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import engine as eng
from .sampling import SamplingConfig, sample

__all__ = ["Request", "Completion", "ContinuousBatcher"]


@dataclasses.dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 32
    eos_id: Optional[int] = None
    id: Optional[int] = None


@dataclasses.dataclass
class Completion:
    id: int
    prompt: List[int]
    tokens: List[int]          # generated ids (excluding prompt)
    finish_reason: str         # "eos" | "length"


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt of {n} tokens exceeds largest bucket "
                     f"{buckets[-1]}")


class ContinuousBatcher:
    """Slot-based continuous batching over the quantized engine."""

    def __init__(self, cfg: eng.EngineConfig, ep: Dict, batch_slots: int,
                 prefill_buckets: Tuple[int, ...] = (32, 128, 512),
                 pad_id: int = 0,
                 forward_fn: Optional[Callable] = None,
                 kv: Optional[Tuple] = None,
                 sampling: Optional[SamplingConfig] = None,
                 seed: int = 0):
        """``forward_fn(ep, ids, kv, pos0) -> (logits, kv)`` defaults to
        the single-device engine; pass serve.sharded.make_sharded_forward's
        result (plus its sharded ``ep``/``kv``) to batch over a TP mesh.

        ``sampling`` (temperature/top-k/top-p, serve/sampling.py) applies
        to every slot; the default (or temperature=0) is exact greedy.
        Sampling is reproducible: one key per tick, folded in from
        (seed, tick counter) and shared across slots; per-slot draws stay
        independent because the batched categorical shapes its noise per
        row."""
        self.cfg = cfg
        self.ep = ep
        self.B = batch_slots
        self.buckets = tuple(sorted(prefill_buckets))
        self.pad_id = pad_id
        self.sampling = sampling or SamplingConfig()
        self._root_key = jax.random.PRNGKey(seed)
        self._tick = 0
        scfg = self.sampling
        fwd = forward_fn or (
            lambda ep_, ids_, kv_, pos0_, last_index=None:
            eng.forward(cfg, ep_, ids_, kv_, pos0_,
                        last_index=last_index))
        # prefill only needs the last real prompt position's logits;
        # forward_fns with an EXPLICIT ``last_index`` parameter (the
        # default above and make_sharded_forward's) skip the
        # padded-bucket lm_head. A **kwargs catch-all does NOT qualify:
        # a wrapper that swallows the kwarg would silently sample the
        # padded tail instead of prompt_len - 1.
        import inspect
        try:
            sig = inspect.signature(forward_fn or fwd)
            _fwd_last = "last_index" in sig.parameters
        except (TypeError, ValueError):
            _fwd_last = False

        self.kv = kv if kv is not None else eng.init_cache(cfg, batch_slots)
        self.lengths = np.zeros(batch_slots, np.int64)   # fill depth
        self.slot_req: List[Optional[Request]] = [None] * batch_slots
        self.slot_tokens: List[List[int]] = [[] for _ in range(batch_slots)]
        self.last_token = np.zeros((batch_slots, 1), np.int32)
        self.queue: List[Request] = []
        self.done: List[Completion] = []
        self._ids = itertools.count()

        # ---- jitted cores --------------------------------------------
        @partial(jax.jit, static_argnames=("prompt_len",), donate_argnums=(1,))
        def prefill_slot(ep, kv, ids_1xTb, slot, prompt_len, key):
            """Prefill one slot: slice out its cache row (batch dim = axis 1
            of the (L, B, ...) leaves), run a batch-1 forward from position
            0, scatter the row back. Returns (kv, next_token)."""
            take = lambda leaf: jax.lax.dynamic_slice_in_dim(leaf, slot, 1,
                                                             axis=1)
            put = lambda leaf, upd: jax.lax.dynamic_update_slice_in_dim(
                leaf, upd, slot, axis=1)
            kv_row = jax.tree_util.tree_map(take, kv)
            if _fwd_last:
                # the head runs only at the true last prompt position
                # (logits (1, 1, V)) — the padded bucket tail never
                # reaches the vocab matmul
                logits, kv_row = fwd(ep, ids_1xTb, kv_row,
                                     jnp.zeros((1,), jnp.int32),
                                     last_index=prompt_len - 1)
            else:
                logits, kv_row = fwd(ep, ids_1xTb, kv_row,
                                     jnp.zeros((1,), jnp.int32))
                logits = logits[:, prompt_len - 1:prompt_len]
            kv = jax.tree_util.tree_map(put, kv, kv_row)
            nxt = sample(logits[:, -1], scfg, key)
            return kv, nxt

        @partial(jax.jit, donate_argnums=(1,))
        def decode_all(ep, kv, tokens_Bx1, lengths_B, key):
            logits, kv = fwd(ep, tokens_Bx1, kv, lengths_B)
            nxt = sample(logits[:, -1], scfg, key)
            return kv, nxt

        root_key = self._root_key

        @partial(jax.jit, static_argnums=(5,), donate_argnums=(1,))
        def decode_chunk(ep, kv, tokens_Bx1, lengths_B, tick0, n_ticks):
            """``n_ticks`` decode ticks in ONE compiled program (lax.scan
            over the tick body) — the dispatch-amortization companion to
            SpeculativeDecoder.rounds. Slots that finish mid-chunk keep
            decoding garbage until the chunk ends (the host discards
            those tokens and refills the slot at the chunk boundary);
            their cache rows are clamped to the last row, which only the
            free slot itself could read. Sampling folds the ABSOLUTE
            tick index into the root key, matching the per-tick path's
            _next_key counter."""
            def body(carry, i):
                kv, tok, lens = carry
                logits, kv = fwd(ep, tok, kv,
                                 jnp.minimum(lens, cfg.max_seq - 1))
                nxt = sample(logits[:, -1], scfg,
                             jax.random.fold_in(root_key, tick0 + i))
                return (kv, nxt.reshape(-1, 1).astype(jnp.int32),
                        lens + 1), nxt
            (kv, tok, _), toks = jax.lax.scan(
                body, (kv, tokens_Bx1, lengths_B), jnp.arange(n_ticks))
            return kv, toks                                # (n_ticks, B)

        self._prefill = prefill_slot
        self._decode = decode_all
        self._decode_chunk = decode_chunk

    # ---- public API ----------------------------------------------------

    def submit(self, req: Request) -> int:
        if req.id is None:
            req.id = next(self._ids)
        self.queue.append(req)
        self._fill_free_slots()
        return req.id

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def step(self) -> List[Completion]:
        """One decode tick for every active slot; returns newly finished
        requests (their slots are immediately refilled from the queue)."""
        self._fill_free_slots()
        if self.n_active == 0:
            out, self.done = self.done, []
            return out
        self.kv, nxt = self._decode(self.ep, self.kv,
                                    jnp.asarray(self.last_token),
                                    jnp.asarray(self.lengths),
                                    self._next_key())
        self._apply_tick(np.asarray(nxt))
        self._fill_free_slots()
        out, self.done = self.done, []
        return out

    def step_chunk(self, n_ticks: int) -> List[Completion]:
        """``n_ticks`` decode ticks in one dispatch (see decode_chunk).
        Tradeoff vs per-tick stepping: slots finishing mid-chunk are only
        refilled at the chunk boundary (up to n_ticks-1 wasted slot-
        ticks), in exchange for one host/device round trip per chunk —
        the right trade whenever dispatch latency is comparable to a
        decode step (remote backends; short models). Greedy completions
        are identical to per-tick stepping; sampled completions use the
        same absolute-tick keys but refill timing can shift which key a
        newly admitted request's ticks land on (inherent to continuous-
        batching schedules)."""
        self._fill_free_slots()
        if self.n_active == 0 or n_ticks <= 1:
            return self.step()
        self.kv, toks = self._decode_chunk(
            self.ep, self.kv, jnp.asarray(self.last_token),
            jnp.asarray(self.lengths), np.int32(self._tick),
            int(n_ticks))
        self._tick += n_ticks
        toks = np.asarray(toks)                        # (n_ticks, B)
        for j in range(n_ticks):
            self._apply_tick(toks[j])
        self._fill_free_slots()
        out, self.done = self.done, []
        return out

    def run(self, max_steps: int = 10_000,
            ticks_per_dispatch: int = 1) -> List[Completion]:
        """Drain queue + active slots to completion. ``max_steps`` counts
        dispatches (each of ``ticks_per_dispatch`` decode ticks)."""
        finished: List[Completion] = []
        for _ in range(max_steps):
            finished.extend(self.step_chunk(ticks_per_dispatch)
                            if ticks_per_dispatch > 1 else self.step())
            if self.n_active == 0 and not self.queue:
                break
        return finished

    # ---- internals ------------------------------------------------------

    def _next_key(self):
        key = jax.random.fold_in(self._root_key, self._tick)
        self._tick += 1
        return key

    def _apply_tick(self, nxt: np.ndarray) -> None:
        """Fold one tick's sampled tokens (B,) into the slot state; slots
        without an active request ignore their (garbage) token."""
        for b in range(self.B):
            req = self.slot_req[b]
            if req is None:
                continue
            tok = int(nxt[b])
            self.slot_tokens[b].append(tok)
            self.lengths[b] += 1
            self.last_token[b, 0] = tok
            hit_eos = req.eos_id is not None and tok == req.eos_id
            full = (len(self.slot_tokens[b]) >= req.max_new_tokens
                    or self.lengths[b] + 1 >= self.cfg.max_seq)
            if hit_eos or full:
                self.done.append(Completion(
                    id=req.id, prompt=req.prompt,
                    tokens=self.slot_tokens[b],
                    finish_reason="eos" if hit_eos else "length"))
                self.slot_req[b] = None
                self.slot_tokens[b] = []

    def _fill_free_slots(self):
        for b in range(self.B):
            if self.slot_req[b] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            T = len(req.prompt)
            assert T >= 1
            Tb = _bucket(T, self.buckets)
            ids = np.full((1, Tb), self.pad_id, np.int32)
            ids[0, :T] = req.prompt
            self.kv, nxt = self._prefill(self.ep, self.kv,
                                         jnp.asarray(ids),
                                         jnp.asarray(b), T,
                                         self._next_key())
            tok = int(np.asarray(nxt)[0])
            self.slot_req[b] = req
            self.slot_tokens[b] = [tok]
            self.lengths[b] = T
            self.last_token[b, 0] = tok
            # the pad tail [T, Tb) wrote stale K/V, but the causal mask
            # admits only k_pos <= q_pos, and every decode at position p
            # overwrites row p before attending it — stale rows are always
            # overwritten before they become visible
            if req.eos_id is not None and tok == req.eos_id:
                self.done.append(Completion(id=req.id, prompt=req.prompt,
                                            tokens=[tok],
                                            finish_reason="eos"))
                self.slot_req[b] = None
                self.slot_tokens[b] = []
