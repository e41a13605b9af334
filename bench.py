"""Headline benchmark: quantized decode throughput on one TPU chip.

Measures decode tokens/s of the FULL-DEPTH OPT-6.7B decoder stack (32
layers, exact width) served with W4 weights + A4 activation quant + INT8
KV cache (the OliVe W4A4 serving configuration of BASELINE.json) against
the bf16 dense baseline on the same hardware, and prints ONE json line:
  {"metric": ..., "value": tokens/s, "unit": "tokens/s", "vs_baseline": x}

vs_baseline = quantized tokens/s / bf16 tokens/s on identical shapes.
The bf16 baseline at full depth (~14.6 GB of weights + cache) may not fit
a single v5e chip; if it OOMs, the baseline falls back to 12 layers and
the ratio is computed against a depth-scaled baseline step time
(per-layer bf16 time x 32/12 + the measured non-layer remainder) — the
quantized number itself is always the real measured 32-layer engine.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.models.transformer_lm import LMConfig
from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.serve import engine as eng

# OPT-6.7B geometry, full depth for the quantized engine
N_LAYERS = int(os.environ.get("BENCH_LAYERS", "32"))
BASE_LAYERS = int(os.environ.get("BENCH_BASE_LAYERS", "12"))
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
PREFILL = int(os.environ.get("BENCH_PREFILL", "512"))
DECODE_STEPS = int(os.environ.get("BENCH_DECODE", "64"))
MAX_SEQ = PREFILL + DECODE_STEPS + 32


def _lm(n_layers):
    return LMConfig(vocab_size=50272, d_model=4096, n_layers=n_layers,
                    n_heads=32, d_ff=16384, max_seq=MAX_SEQ,
                    positions="learned_offset2", activation="relu",
                    fused_qkv=False)


LM = _lm(N_LAYERS)


def _rand_engine_params(cfg: eng.EngineConfig, key):
    """Random stacked engine params built directly on device (no host
    weight materialization: bf16 6.7B doesn't fit in host+device twice).

    Big weight stacks are built ONE SITE PER JIT with pinned default
    (row-major) output layouts:
    - pinned layouts: XLA may otherwise pick exotic layouts for jit-built
      int8 stacks, turning the engine's free (L, K, N) -> (L*K, N)
      reshape into a materialized multi-GB copy (OOM at 32 layers);
    - per-site jits: one whole-tree build program peaks at final-size +
      per-leaf transients and OOMs at full OPT-6.7B depth, while the
      per-site peak stays ~4 GB above the running total.
    """
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
    sites = {"q": (c.d_model, c.d_model), "k": (c.d_model, c.d_model),
             "v": (c.d_model, c.d_model), "out": (c.d_model, c.d_model),
             "fc_in": (c.d_model, c.d_ff), "fc_out": (c.d_ff, c.d_model)}
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
            # values irrelevant to perf: any int8 in codebook range
            entry["w_i8"] = pinned(
                lambda k, K=K, N=N: jax.random.randint(
                    k, (L, K, N), -64, 64, jnp.int8), keys[i])
            entry["oscale"] = jnp.full((L, N), 2e-3 * w_unit, jnp.float32)
        else:
            entry["kernel"] = pinned(
                lambda k, K=K, N=N: (
                    jax.random.normal(k, (L, K, N), jnp.bfloat16)
                    * np.float32(1.0 / np.sqrt(K))), keys[i])
        if cfg.act_bits:
            entry["a_grid"] = jnp.broadcast_to(jnp.asarray(agrid), (L, 16))
            entry["a_alpha"] = jnp.full((L,), 3.0, jnp.float32)
            if cfg.weight_mode == "w4":
                entry["a_q"] = jnp.broadcast_to(jnp.asarray(aq16), (L, 16))
                entry["a_scale"] = jnp.full(
                    (L,), 3.0 / a_vmax * a_unit, jnp.float32)
        layers[name] = entry
    ln = lambda: {"scale": jnp.ones((L, c.d_model), jnp.float32),
                  "bias": jnp.zeros((L, c.d_model), jnp.float32)}
    layers["ln_1"], layers["ln_2"] = ln(), ln()
    top = {
        "wpe": pinned(lambda k: jax.random.normal(
            k, (c.max_seq + 2, c.d_model), cfg.dtype) * 0.02, keys[-1]),
        "ln_f": {"scale": jnp.ones((c.d_model,), jnp.float32),
                 "bias": jnp.zeros((c.d_model,), jnp.float32)},
    }
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
    """Force completion by fetching to host.

    On the remote-TPU (axon) backend jax.block_until_ready returns before
    the computation finishes; a device->host copy of a value that depends
    on the whole computation is the only reliable fence.
    """
    return np.asarray(x)


def _note(msg):
    print(f"# .. {msg}", file=sys.stderr, flush=True)


def _int8_stream_bytes(c, batch, max_seq) -> float:
    """HBM bytes one decode step must stream at minimum under the W4A4 +
    int8-KV + int8-lm_head config: every weight byte once (int8 codebook
    values), the written cache region once (int8 K/V + f32 scales), the
    int8 lm_head once. Activations/temps are negligible at decode."""
    w = c.n_layers * (4 * c.d_model ** 2 + 2 * c.d_model * c.d_ff)
    head = c.vocab_size * c.d_model
    kv = 2 * c.n_layers * batch * c.n_heads * max_seq * c.head_dim
    scales = 2 * c.n_layers * batch * c.n_heads * max_seq * 4
    return float(w + head + kv + scales)


# Measured peak Pallas scalar-prefetch stream rate on this chip (PERF.md
# streaming-rate table, 32 MB/call row). The int8-stream floor =
# _int8_stream_bytes / this; the roofline %% in the metric string is
# measured-floor/measured-step, self-judging against the >=80%% target.
_STREAM_PEAK = 731e9


def _bench(cfg: eng.EngineConfig, label: str, spread_out=None) -> float:
    _note(f"{label}: building params")
    ep = _rand_engine_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, PREFILL), 0,
                             cfg.lm.vocab_size)
    kv = eng.init_cache(cfg, BATCH)
    _note(f"{label}: params + cache ready")

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(ep, ids, kv):
        return eng.forward(cfg, ep, ids, kv, 0)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(ep, tok, kv):
        def step(carry, i):
            tok, kv = carry
            logits, kv = eng.forward(cfg, ep, tok, kv, PREFILL + i)
            tok = jnp.argmax(logits[:, -1:], axis=-1)
            return (tok, kv), ()
        (tok, kv), _ = jax.lax.scan(step, (tok, kv),
                                    jnp.arange(DECODE_STEPS))
        return tok, kv

    logits, kv = prefill(ep, ids, kv)
    tok = jnp.argmax(logits[:, -1:], axis=-1)
    _note(f"{label}: prefill done")
    tok, kv = decode_n(ep, tok, kv)      # compile + warm
    _sync(tok)
    _note(f"{label}: decode warm done")

    # median of N independently-timed blocks (each block dispatches
    # `reps` windows back-to-back and fences once, so the remote-dispatch
    # RTT amortizes over reps*DECODE_STEPS steps); the spread bounds the
    # run-to-run noise the single-window r4 capture hid (VERDICT r4 #2)
    reps, blocks = 3, 5
    per_step = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(reps):
            tok, kv = decode_n(ep, tok, kv)
        _sync(tok)
        per_step.append((time.perf_counter() - t0)
                        / (reps * DECODE_STEPS))
    med = float(np.median(per_step))
    spread = (max(per_step) - min(per_step)) / med
    tps = BATCH / med
    print(f"# {label}: {med * 1e3:.2f} ms/step median of {blocks} "
          f"(spread {spread * 100:.1f}%), {tps:.0f} tokens/s",
          file=sys.stderr)
    if spread_out is not None:
        spread_out["ms_per_step"] = [round(t * 1e3, 3) for t in per_step]
        spread_out["spread_pct"] = round(spread * 100, 2)
    return tps


def main():
    from ant_quantization_tpu.utils.profiling import (maybe_trace,
                                                      profile_dir_from_env)
    # standalone bf16-baseline measurement at one depth (debug surface;
    # also how the 2x-weights HLO-temp finding above was isolated)
    if os.environ.get("BENCH_BF16_ONLY"):
        d = int(os.environ["BENCH_BF16_ONLY"])
        bcfg = eng.EngineConfig(lm=_lm(d), weight_mode="bf16",
                                act_bits=0, kv_int8=False, max_seq=MAX_SEQ)
        tps = _bench(bcfg, f"bf16 baseline {d}L (subprocess)")
        print(json.dumps({"bf16_only_layers": d,
                          "tokens_per_s": round(tps, 2)}))
        return
    qcfg = eng.EngineConfig(
        lm=LM, weight_mode="w4", act_bits=4, kv_int8=True, max_seq=MAX_SEQ,
        lm_head_int8=os.environ.get("BENCH_LM_HEAD_INT8", "1") == "1",
        stacked_kernel=os.environ.get("BENCH_STACKED", "1") == "1",
        stacked_block_n=int(os.environ.get("BENCH_BLOCK_N", "4096")),
        stacked_block_k=int(os.environ.get("BENCH_BLOCK_K", "1024")))
    qstats = {}
    with maybe_trace(profile_dir_from_env()):
        # one retry for transient remote-compile failures (observed: the
        # tunnel's compile helper can 500 sporadically; a fresh attempt
        # succeeds). Permanent errors (OOM etc.) still raise on try 2.
        try:
            tps_q = _bench(qcfg, f"W4A4+int8KV {N_LAYERS}L",
                           spread_out=qstats)
        except Exception as e:
            print(f"# quantized bench attempt 1 failed "
                  f"({type(e).__name__}); retrying once", file=sys.stderr,
                  flush=True)
            time.sleep(20)
            tps_q = _bench(qcfg, f"W4A4+int8KV {N_LAYERS}L",
                           spread_out=qstats)
    import gc
    gc.collect()        # free the quantized ep before the bf16 baseline

    def bf16_tps(n_layers):
        bcfg = eng.EngineConfig(lm=_lm(n_layers), weight_mode="bf16",
                                act_bits=0, kv_int8=False, max_seq=MAX_SEQ)
        return _bench(bcfg, f"bf16 baseline {n_layers}L")

    def bf16_bytes(n_layers):
        c = _lm(n_layers)
        per_layer = (4 * c.d_model ** 2 + 2 * c.d_model * c.d_ff) * 2
        cache = n_layers * BATCH * c.n_heads * MAX_SEQ * c.head_dim * 2 * 2
        return (n_layers * per_layer + c.vocab_size * c.d_model * 2
                + cache + 2 * 10 ** 9)     # + activations/temps margin

    # HARD RULE: never *attempt* an allocation that cannot fit — on the
    # remote backend a failed multi-GB allocation poisons the server-side
    # allocator for the rest of the session (measured: after one bf16-32L
    # OOM, a 5.7 GB build fails with zero live client arrays).
    HBM_BUDGET = float(os.environ.get("BENCH_HBM_BUDGET", 15e9))
    tps_b = None
    if bf16_bytes(N_LAYERS) <= HBM_BUDGET:
        try:
            tps_b = bf16_tps(N_LAYERS)
            base_note = f"measured bf16 {N_LAYERS}L"
        except Exception as e:
            print(f"# bf16 {N_LAYERS}L failed ({type(e).__name__}); "
                  f"depth-scaling a {BASE_LAYERS}L baseline",
                  file=sys.stderr)
    else:
        print(f"# bf16 {N_LAYERS}L needs ~{bf16_bytes(N_LAYERS)/1e9:.1f} "
              f"GB > budget; depth-scaling a {BASE_LAYERS}L baseline",
              file=sys.stderr)
    if tps_b is None:
        # IMPORTANT: run the fallback OUTSIDE the except block — the live
        # exception's traceback pins the half-built bf16 tree (gigabytes)
        # in its frame locals, which would OOM the fallback itself. The
        # remote backend also frees device buffers asynchronously, so
        # retry with a settle delay if the first fallback build races a
        # deferred free.
        def retry(fn, tries=3, delay=20):
            for t in range(tries):
                gc.collect()
                live = [x for x in jax.live_arrays()
                        if x.size * x.dtype.itemsize > 1 << 20]
                tot = sum(x.size * x.dtype.itemsize for x in live) / 1e9
                print(f"# .. live >1MB arrays: {len(live)}, {tot:.2f} GB",
                      file=sys.stderr, flush=True)
                for x in sorted(live, key=lambda a: -a.size)[:5]:
                    print(f"# ..   {x.shape} {x.dtype}", file=sys.stderr,
                          flush=True)
                try:
                    return fn()
                except Exception as e2:
                    if t == tries - 1:
                        raise
                    print(f"# .. fallback attempt {t} failed "
                          f"({type(e2).__name__}); waiting for deferred "
                          f"frees", file=sys.stderr, flush=True)
                time.sleep(delay)

        # per-layer bf16 time from THREE depths -> least-squares line,
        # extrapolated to N_LAYERS; fit quality reported in the metric
        # (VERDICT r3 #6: linearity as data, not assumption). The largest
        # depth is the biggest bf16 model that fits the HBM budget.
        # Three depths AT OR BELOW the base: the bf16 prefill program
        # materializes a full copy of the scanned layer stacks as HLO
        # temps (measured 6.93 GB at 18L — "Largest program allocations:
        # convert(ep_layers_*_kernel)"), so bf16 needs ~2x weights and
        # depths past ~12L genuinely do not fit a v5e chip regardless of
        # allocator state. Three collinear points at 6/9/12 establish
        # per-layer linearity within the measured range; the 32L
        # extrapolation is labeled as such in the metric string.
        half = max(BASE_LAYERS // 2, 1)
        mid = max((half + BASE_LAYERS) // 2, half + 1)
        depths, times = [], []
        for d in sorted({half, mid, BASE_LAYERS}):
            try:
                times.append(BATCH * DECODE_STEPS / retry(
                    lambda d=d: bf16_tps(d), tries=2))
                depths.append(d)
            except Exception as e3:
                print(f"# .. bf16 {d}L failed ({type(e3).__name__}); "
                      f"fitting without it", file=sys.stderr, flush=True)
        assert len(depths) >= 2, "need two baseline depths for the fit"
        A = np.stack([np.asarray(depths, np.float64),
                      np.ones(len(depths))], axis=1)
        (per_layer, t0_fit), res, *_ = np.linalg.lstsq(
            A, np.asarray(times), rcond=None)
        ss_tot = float(np.var(times) * len(times))
        if len(depths) > 2 and len(res) and ss_tot:
            fit_note = f"R2={1.0 - float(res[0]) / ss_tot:.5f}"
        else:
            # 2 points determine the line exactly — an R2 would be a
            # vacuous 1.0, not evidence of linearity
            fit_note = "2-point fit (third depth unavailable)"
        t_full = t0_fit + per_layer * N_LAYERS
        tps_b = BATCH * DECODE_STEPS / t_full
        base_note = (f"bf16 {N_LAYERS}L linear-fit from "
                     f"{'/'.join(str(d) for d in depths)}L measurements "
                     f"(slope {per_layer / DECODE_STEPS * 1e3:.3f} "
                     f"ms/step/layer, {fit_note})")
    floor_ms = _int8_stream_bytes(LM, BATCH, MAX_SEQ) / _STREAM_PEAK * 1e3
    step_ms = BATCH / tps_q * 1e3
    print(json.dumps({
        "metric": (f"decode tokens/s/chip, OPT-6.7B {N_LAYERS}L "
                   f"OliVe-style W4A4 + INT8 KV (bs={BATCH}, "
                   f"ctx={PREFILL}); median of 5 blocks, spread "
                   f"{qstats.get('spread_pct', 0)}%; "
                   f"{floor_ms / step_ms * 100:.1f}% of the "
                   f"{floor_ms:.1f} ms int8-stream floor (target >=80%); "
                   f"baseline: {base_note}"),
        "value": round(tps_q, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps_q / tps_b, 3),
        "ms_per_step_blocks": qstats.get("ms_per_step"),
        "roofline_pct": round(floor_ms / step_ms * 100, 1),
    }))


if __name__ == "__main__":
    main()
