"""Decode-throughput benchmark for any of the reference's LLM families.

Generalizes bench.py (which pins the OPT-6.7B headline geometry) to the
three decoder families the reference's OliVe CLM harness evaluates
(olive_quantization/llm/scripts/run_all.sh: gpt2-xl, facebook/opt-6.7b,
bigscience/bloom-7b1): randomized engine params at the EXACT model
geometry — fused vs split qkv, ALiBi vs learned positions, embedding
LayerNorm, true vocab size — served W4A4 + INT8 KV with the int8
lm_head, measured on the real chip. Where the bf16 dense baseline fits
the chip (gpt2-xl: ~3.2 GB) it is measured at full depth and a
vs_bf16 ratio is reported.

Usage:
    python tools/lm_bench.py --family gpt2-xl [--batch 4 --prefill 512]
    python tools/lm_bench.py --family gpt2-xl --linear-sites
        # gpt2-* defaults to the reference's per-IN-channel Conv1D
        # quantizer semantics (f32-dequant serving); --linear-sites
        # measures the TPU-native per-OUT layout (int8 stream)
    python tools/lm_bench.py --family bloom-7b1     # the PERF.md row
    python tools/lm_bench.py --family opt-6.7b      # == bench.py config
    python tools/lm_bench.py --family opt-6.7b --mode prefill
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

from ant_quantization_tpu.models.transformer_lm import (bloom_config,
                                                        gpt2_config,
                                                        opt_config)
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.serve import engine as eng

FAMILIES = {
    "gpt2-xl": lambda: gpt2_config("xl"),
    "gpt2-large": lambda: gpt2_config("large"),
    "opt-6.7b": lambda: opt_config("6.7b"),
    "opt-1.3b": lambda: opt_config("1.3b"),
    "bloom-7b1": lambda: bloom_config("7b1"),
    "bloom-3b": lambda: bloom_config("3b"),
}


def rand_engine_params(cfg: eng.EngineConfig, key):
    """Random stacked engine params at cfg.lm's exact geometry, built
    one site per jit with pinned row-major layouts (see bench.py's
    _rand_engine_params for why: exotic jit-output layouts turn the
    engine's free (L, K, N) -> (L*K, N) reshape into a multi-GB copy)."""
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    dev = jax.devices()[0]

    def pinned(fn, *args):
        shapes = jax.eval_shape(fn, *args)
        fmts = jax.tree_util.tree_map(
            lambda s: Format(Layout(tuple(range(s.ndim))),
                             SingleDeviceSharding(dev)), shapes)
        return jax.jit(fn, out_shardings=fmts)(*args)

    c = cfg.lm
    if c.fused_qkv:
        sites = {"qkv": (c.d_model, 3 * c.d_model)}
    else:
        sites = {s: (c.d_model, c.d_model) for s in ("q", "k", "v")}
    sites.update(out=(c.d_model, c.d_model),
                 fc_in=(c.d_model, c.d_ff), fc_out=(c.d_ff, c.d_model))
    from ant_quantization_tpu.models.transformer_lm import conv1d_site_names
    c1d = conv1d_site_names(c)
    wgrid = cb.ant_grid("flint", 4, True)[:16]
    agrid = cb.ant_grid("flint", 4, False)[:16]
    from ant_quantization_tpu.kernels.qmatmul import int8_codebook
    wq16, w_unit, _ = int8_codebook(wgrid)
    aq16, a_unit, _ = int8_codebook(agrid)
    a_vmax = float(np.max(agrid))
    L = c.n_layers

    keys = jax.random.split(key, len(sites) + 2)
    layers = {}
    for i, (name, (K, N)) in enumerate(sites.items()):
        entry = {"bias": jnp.zeros((L, N), jnp.float32)}
        if cfg.weight_mode == "w4":
            entry["w_i8"] = pinned(
                lambda k, K=K, N=N: jax.random.randint(
                    k, (L, K, N), -64, 64, jnp.int8), keys[i])
            if name in c1d:
                # GPT-2 Conv1D semantics: per-IN-channel weight scale —
                # served through the exact dequantized-weight fallback
                # (engine.py "kscale"), NOT the int8 stream
                entry["kscale"] = jnp.full((L, K), 2e-3 * w_unit,
                                           jnp.float32)
            else:
                entry["oscale"] = jnp.full((L, N), 2e-3 * w_unit,
                                           jnp.float32)
        else:
            entry["kernel"] = pinned(
                lambda k, K=K, N=N: (
                    jax.random.normal(k, (L, K, N), jnp.bfloat16)
                    * np.float32(1.0 / np.sqrt(K))), keys[i])
        if cfg.act_bits:
            entry["a_grid"] = jnp.broadcast_to(jnp.asarray(agrid), (L, 16))
            entry["a_alpha"] = jnp.full((L,), 3.0, jnp.float32)
            if cfg.weight_mode == "w4" and name not in c1d:
                entry["a_q"] = jnp.broadcast_to(jnp.asarray(aq16), (L, 16))
                entry["a_scale"] = jnp.full(
                    (L,), 3.0 / a_vmax * a_unit, jnp.float32)
        layers[name] = entry
    ln = lambda: {"scale": jnp.ones((L, c.d_model), jnp.float32),
                  "bias": jnp.zeros((L, c.d_model), jnp.float32)}
    layers["ln_1"], layers["ln_2"] = ln(), ln()
    top = {"ln_f": {"scale": jnp.ones((c.d_model,), jnp.float32),
                    "bias": jnp.zeros((c.d_model,), jnp.float32)}}
    if c.positions in ("learned", "learned_offset2"):
        top["wpe"] = pinned(lambda k: jax.random.normal(
            k, (cfg.max_seq + 2, c.d_model), cfg.dtype) * 0.02, keys[-1])
    if c.embed_ln:
        top["embed_ln"] = {"scale": jnp.ones((c.d_model,), jnp.float32),
                           "bias": jnp.zeros((c.d_model,), jnp.float32)}
    if cfg.lm_head_int8:
        top["wte_i8"] = pinned(lambda k: jax.random.randint(
            k, (c.vocab_size, c.d_model), -127, 128, jnp.int8), keys[-2])
        top["wte_scale"] = jnp.full((c.vocab_size,), 0.02 / 127.0,
                                    jnp.float32)
    else:
        top["wte"] = pinned(lambda k: jax.random.normal(
            k, (c.vocab_size, c.d_model), cfg.dtype) * 0.02, keys[-2])
    return {"layers": layers, "top": top}


def _sync(x):
    return np.asarray(x)     # remote-backend fence (see bench.py:_sync)


def bench_decode(cfg: eng.EngineConfig, batch, prefill, decode_steps,
                 label) -> float:
    print(f"# {label}: building params", file=sys.stderr, flush=True)
    ep = rand_engine_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, prefill), 0,
                             cfg.lm.vocab_size)
    kv = eng.init_cache(cfg, batch)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill_fn(ep, ids, kv):
        return eng.forward(cfg, ep, ids, kv, 0)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(ep, tok, kv):
        def step(carry, i):
            tok, kv = carry
            logits, kv = eng.forward(cfg, ep, tok, kv, prefill + i)
            tok = jnp.argmax(logits[:, -1:], axis=-1)
            return (tok, kv), ()
        (tok, kv), _ = jax.lax.scan(step, (tok, kv),
                                    jnp.arange(decode_steps))
        return tok, kv

    logits, kv = prefill_fn(ep, ids, kv)
    tok = jnp.argmax(logits[:, -1:], axis=-1)
    tok, kv = decode_n(ep, tok, kv)
    _sync(tok)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        tok, kv = decode_n(ep, tok, kv)
    _sync(tok)
    dt = (time.perf_counter() - t0) / reps
    tps = batch * decode_steps / dt
    print(f"# {label}: {dt / decode_steps * 1e3:.2f} ms/step, "
          f"{tps:.0f} tokens/s", file=sys.stderr, flush=True)
    return tps


# v5e TensorCore peaks (public spec): bf16 matmul 197 TFLOP/s, int8
# 394 TOP/s — the MFU denominators for the prefill benchmark.
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def matmul_flops(c, m: int, head_m: int = None) -> float:
    """FLOPs of one forward's matmul sites at M tokens (2*M*K*N each):
    attention projections + MLP + lm_head; the attention score/output
    einsums add <1% at T=512 and are excluded (so MFU is conservative).
    ``head_m``: tokens reaching the lm_head (= batch B for a serving
    prefill via forward's last_index; defaults to all M)."""
    per_layer = 2 * m * (4 * c.d_model ** 2 + 2 * c.d_model * c.d_ff)
    head = 2 * (m if head_m is None else head_m) * c.vocab_size * c.d_model
    return c.n_layers * per_layer + head


def bench_prefill(cfg: eng.EngineConfig, batch, prefill, label,
                  reps=4, windows=3, last_only=False) -> float:
    """Prefill throughput: seconds per full B x T prefill forward.

    ``reps`` prefills run inside ONE dispatch (lax.scan; the mean-logit
    carry keeps every iteration and the whole vocab live against DCE)
    so the ~26 ms remote-dispatch RTT amortizes; the median of
    ``windows`` dispatches is reported.

    ``last_only``: the SERVING prefill (forward's last_index) — the
    lm_head runs only at the last prompt position per sequence, which
    is all a generate loop samples from."""
    print(f"# {label}: building params", file=sys.stderr, flush=True)
    ep = rand_engine_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, prefill), 0,
                             cfg.lm.vocab_size)
    kv = eng.init_cache(cfg, batch)
    li = prefill - 1 if last_only else None

    @jax.jit
    def prefill_reps(ep, ids, kv):
        def body(acc, i):
            # (ids + i) % vocab: a REAL per-iteration data dependence —
            # `ids + 0*i` gets algebraically simplified to a loop
            # invariant and XLA then hoists the whole forward out of the
            # scan (measured: "165% MFU")
            ids_i = (ids + i) % cfg.lm.vocab_size
            logits, _ = eng.forward(cfg, ep, ids_i, kv, 0, last_index=li)
            return acc + logits.mean(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(reps))
        return acc

    _sync(prefill_reps(ep, ids, kv))      # compile + warm
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        _sync(prefill_reps(ep, ids, kv))
        times.append((time.perf_counter() - t0) / reps)
    dt = float(np.median(times))
    tps = batch * prefill / dt
    print(f"# {label}: {dt * 1e3:.1f} ms/prefill, {tps:.0f} tokens/s",
          file=sys.stderr, flush=True)
    return dt


def bf16_bytes(c, batch, max_seq):
    qkv = 3 * c.d_model ** 2
    per_layer = (qkv + c.d_model ** 2 + 2 * c.d_model * c.d_ff) * 2
    cache = c.n_layers * batch * c.n_heads * max_seq * c.head_dim * 2 * 2
    # bf16 prefill materializes an HLO-temp copy of the scanned weight
    # stacks (PERF.md: measured 6.93 GB at 18L OPT) -> 2x the weights
    return (2 * c.n_layers * per_layer + c.vocab_size * c.d_model * 2
            + cache + 2 * 10 ** 9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES), required=True)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--prefill", type=int, default=512)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--linear-sites", action="store_true",
                    help="serve GPT-2 families with per-OUT-channel "
                         "(Linear-layout) quantization instead of the "
                         "reference's per-IN-channel Conv1D semantics: "
                         "the TPU-native layout that keeps every site "
                         "on the int8 stream (set conv1d_sites=False "
                         "when importing to use it in production)")
    ap.add_argument("--mode", choices=("decode", "prefill"),
                    default="decode",
                    help="prefill: compute-bound side — full-forward "
                         "tokens/s and int8-MXU MFU at full depth, plus "
                         "a depth-matched bf16 comparison (VERDICT r4 "
                         "#4; PERF.md prefill section)")
    args = ap.parse_args(argv)

    lm = FAMILIES[args.family]()
    max_seq = args.prefill + args.decode + 32
    over = {"max_seq": max_seq}
    if args.linear_sites:
        over["conv1d_sites"] = False
    lm = type(lm)(**{**lm.__dict__, **over})
    qcfg = eng.EngineConfig(lm=lm, weight_mode="w4", act_bits=4,
                            kv_int8=True, max_seq=max_seq,
                            lm_head_int8=True)

    from ant_quantization_tpu.models.transformer_lm import conv1d_site_names
    layout = "conv1d(kscale,f32-dequant)" if conv1d_site_names(lm) \
        else "linear(int8-stream)"
    if args.mode == "prefill":
        m = args.batch * args.prefill
        dt_q = bench_prefill(qcfg, args.batch, args.prefill,
                             f"{args.family} W4A4 prefill {lm.n_layers}L")
        # serving prefill: the lm_head runs only at the last position
        # (what a generate loop actually dispatches before decoding)
        dt_s = bench_prefill(
            qcfg, args.batch, args.prefill,
            f"{args.family} W4A4 serve-prefill {lm.n_layers}L",
            last_only=True)
        out = {"family": args.family, "mode": "prefill",
               "site_layout": layout,
               "n_layers": lm.n_layers, "batch": args.batch,
               "prefill": args.prefill,
               "tokens_per_s": round(args.batch * args.prefill / dt_q, 1),
               "ms_per_prefill": round(dt_q * 1e3, 1),
               "int8_mfu_pct": round(
                   matmul_flops(lm, m) / dt_q / PEAK_INT8 * 100, 1),
               "serve_ms_per_prefill": round(dt_s * 1e3, 1),
               "serve_tokens_per_s": round(
                   args.batch * args.prefill / dt_s, 1),
               "serve_int8_mfu_pct": round(
                   matmul_flops(lm, m, head_m=args.batch) / dt_s
                   / PEAK_INT8 * 100, 1)}
        if not args.no_baseline:
            # depth-matched bf16 comparison at the largest depth that
            # fits (bf16 prefill doubles the weight footprint via the
            # scanned-stack HLO temp, see bf16_bytes)
            # prefill holds bigger HLO temps than decode (per-layer
            # attention scores B*H*T^2 f32, the full f32 logits, the
            # reps-scan bookkeeping): budget an extra ~3 GB beyond the
            # decode estimate (bf16 14L compiled to 17.5 G on a 15.75 G
            # chip with the plain decode estimate)
            budget = float(os.environ.get("BENCH_HBM_BUDGET", 15e9)) - 3e9
            d = lm.n_layers
            while d > 1 and bf16_bytes(
                    type(lm)(**{**lm.__dict__, "n_layers": d}),
                    args.batch, max_seq) > budget:
                d -= 1
            lm_d = type(lm)(**{**lm.__dict__, "n_layers": d})
            import gc
            gc.collect()
            dt_b = bench_prefill(
                eng.EngineConfig(lm=lm_d, weight_mode="bf16", act_bits=0,
                                 kv_int8=False, max_seq=max_seq),
                args.batch, args.prefill,
                f"{args.family} bf16 prefill {d}L")
            gc.collect()
            if d == lm.n_layers:
                dt_qd = dt_q
            else:
                dt_qd = bench_prefill(
                    eng.EngineConfig(lm=lm_d, weight_mode="w4",
                                     act_bits=4, kv_int8=True,
                                     max_seq=max_seq, lm_head_int8=True),
                    args.batch, args.prefill,
                    f"{args.family} W4A4 prefill {d}L (depth-matched)")
            out.update(
                bf16_layers=d,
                bf16_ms_per_prefill=round(dt_b * 1e3, 1),
                bf16_mfu_pct=round(
                    matmul_flops(lm_d, m) / dt_b / PEAK_BF16 * 100, 1),
                vs_bf16_depth_matched=round(dt_b / dt_qd, 2))
        print(json.dumps(out))
        return
    tps_q = bench_decode(qcfg, args.batch, args.prefill, args.decode,
                         f"{args.family} W4A4+int8KV {lm.n_layers}L "
                         f"[{layout}]")
    out = {"family": args.family, "n_layers": lm.n_layers,
           "d_model": lm.d_model, "vocab": lm.vocab_size,
           "site_layout": layout,
           "batch": args.batch, "prefill": args.prefill,
           "tokens_per_s": round(tps_q, 1),
           "ms_per_step": round(args.batch / tps_q * 1e3, 2)}

    need = bf16_bytes(lm, args.batch, max_seq)
    budget = float(os.environ.get("BENCH_HBM_BUDGET", 15e9))
    if not args.no_baseline and need <= budget:
        import gc
        gc.collect()
        bcfg = eng.EngineConfig(lm=lm, weight_mode="bf16", act_bits=0,
                                kv_int8=False, max_seq=max_seq)
        tps_b = bench_decode(bcfg, args.batch, args.prefill, args.decode,
                             f"{args.family} bf16 {lm.n_layers}L")
        out["bf16_tokens_per_s"] = round(tps_b, 1)
        out["vs_bf16"] = round(tps_q / tps_b, 2)
    elif not args.no_baseline:
        out["bf16_note"] = (f"bf16 needs ~{need / 1e9:.1f} GB > "
                            f"{budget / 1e9:.0f} GB budget; not attempted")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
