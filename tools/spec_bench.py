"""Speculative decoding benchmark on the real chip (PERF.md r4 row).

Without trained weights a random-weight draft accepts ~nothing, so the
meaningful measurements are the speculative MECHANICS, end-to-end on the
TPU:

  t_plain   one full-depth target decode step (T=1)
  t_verify  one target verify step over T=k+1 positions (the amortized
            weight read — near t_plain on an HBM-bound engine)
  t_draft   one draft decode step
  e2e       a real SpeculativeDecoder.generate run (random 6L draft, so
            accept ~ 0: the measured WORST case incl. host loop)

and the modeled net curve  tok/s(a) = (1 + a*k) / (k*t_draft + t_verify)
with its break-even accept rate vs plain decode. On the remote (axon)
backend the host-driven speculative loop pays the ~26 ms dispatch RTT
per round, which a local TPU-VM runtime does not; e2e is reported raw
with that caveat.

Usage: PYTHONPATH=. python tools/spec_bench.py [--layers 32 --k 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--draft-layers", type=int, default=6)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=24)
    args = ap.parse_args(argv)

    os.environ.setdefault("BENCH_LAYERS", str(args.layers))
    os.environ.setdefault("BENCH_BATCH", str(args.batch))
    os.environ.setdefault("BENCH_PREFILL", str(args.prefill))
    import bench
    from ant_quantization_tpu.serve import engine as eng
    from ant_quantization_tpu.serve.speculative import SpeculativeDecoder

    def mkcfg(n_layers):
        return eng.EngineConfig(
            lm=bench._lm(n_layers), weight_mode="w4", act_bits=4,
            kv_int8=True, max_seq=bench.MAX_SEQ, lm_head_int8=True)

    tcfg, dcfg = mkcfg(args.layers), mkcfg(args.draft_layers)
    tep = bench._rand_engine_params(tcfg, jax.random.PRNGKey(0))
    dep = bench._rand_engine_params(dcfg, jax.random.PRNGKey(1))
    B, T0 = args.batch, args.prefill
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, T0), 0,
                             tcfg.lm.vocab_size)

    def step_time(cfg, ep, T, reps=48):
        """One decode/verify step of width T, measured via an in-graph
        loop at a FIXED position (no cache growth effects)."""
        kv = eng.init_cache(cfg, B)
        logits, kv = jax.jit(lambda e, i, k: eng.forward(cfg, e, i, k, 0)
                             )(ep, ids, kv)
        tok = jnp.argmax(logits[:, -T:], axis=-1)

        @jax.jit
        def loop(ep, tok, kv):
            def body(carry, _):
                tok, kv = carry
                lg, kv = eng.forward(cfg, ep, tok, kv, T0)
                return (jnp.argmax(lg, axis=-1), kv), ()
            return jax.lax.scan(body, (tok, kv), None, length=reps)[0]
        (tok, kv) = loop(ep, tok, kv)
        np.asarray(tok)
        t0 = time.perf_counter()
        (tok, kv) = loop(ep, tok, kv)
        np.asarray(tok)
        dt = (time.perf_counter() - t0) / reps
        del kv
        return dt

    t_plain = step_time(tcfg, tep, 1)
    t_verify = step_time(tcfg, tep, args.k + 1)
    t_draft = step_time(dcfg, dep, 1)

    # end-to-end generate (random draft: accept ~ 0, worst case), at
    # round-per-dispatch (pays the host/dispatch RTT every round) and
    # with the in-graph multi-round scan (8 rounds per dispatch)
    e2e = {}
    for rpd in (1, 8):
        sd = SpeculativeDecoder(tcfg, tep, dcfg, dep, k=args.k)
        # warm must emit enough tokens to compile BOTH round variants
        # (the rpd-round chunk needs `need >= rpd` to trigger)
        sd.generate(np.asarray(ids[:, :8]), rpd + 2,
                    rounds_per_dispatch=rpd)        # compile warm
        t0 = time.perf_counter()
        out = sd.generate(np.asarray(ids), args.rounds,
                          rounds_per_dispatch=rpd)
        dt = time.perf_counter() - t0
        n_tok = sum(len(o) for o in out)
        e2e[rpd] = (n_tok / dt,
                    (np.mean(sd.accepted_hist) / args.k)
                    if sd.accepted_hist else 0.0)
    (r1_tok_s, acc), (r8_tok_s, _) = e2e[1], e2e[8]

    k = args.k
    round_cost = k * t_draft + t_verify
    model = {f"a={a:.1f}": round(B * (1 + a * k) / round_cost, 1)
             for a in (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)}
    break_even = max(0.0, (round_cost / t_plain - 1) / k)

    print(json.dumps({
        "t_plain_ms": round(t_plain * 1e3, 2),
        "t_verify_ms": round(t_verify * 1e3, 2),
        "t_draft_ms": round(t_draft * 1e3, 2),
        "plain_tok_s": round(B / t_plain, 1),
        "modeled_spec_tok_s": model,
        "break_even_accept": round(break_even, 3),
        "e2e_random_draft": {
            "tok_s_dispatch_per_round": round(r1_tok_s, 1),
            "tok_s_8_rounds_per_dispatch": round(r8_tok_s, 1),
            "accept_rate": round(float(acc), 3),
            "note": "random draft: accept ~0 (worst case); per-round "
                    "dispatch pays the remote RTT, the in-graph "
                    "multi-round scan amortizes it"},
        "k": k, "layers": args.layers,
        "draft_layers": args.draft_layers}))


if __name__ == "__main__":
    main()
