"""Headline benchmark: quantized decode throughput on one TPU chip.

Measures decode tokens/s of an OPT-6.7B-width decoder stack served with
packed W4 weights + A4 activation quant + INT8 KV cache (the OliVe W4A4
serving configuration of BASELINE.json) against the bf16 dense baseline on
the same hardware, and prints ONE json line:
  {"metric": ..., "value": tokens/s, "unit": "tokens/s", "vs_baseline": x}

vs_baseline = quantized tokens/s / bf16 tokens/s (>1 means the quantized
engine is faster than the unquantized one on identical shapes).

Depth is trimmed so both variants fit HBM comfortably; the ratio is
depth-invariant (per-layer work is identical across layers).
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

# OPT-6.7B geometry (width exact, depth trimmed to fit bf16 baseline + cache)
N_LAYERS = int(os.environ.get("BENCH_LAYERS", "12"))
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
PREFILL = int(os.environ.get("BENCH_PREFILL", "512"))
DECODE_STEPS = int(os.environ.get("BENCH_DECODE", "64"))
MAX_SEQ = PREFILL + DECODE_STEPS + 32

LM = LMConfig(vocab_size=50272, d_model=4096, n_layers=N_LAYERS, n_heads=32,
              d_ff=16384, max_seq=MAX_SEQ, positions="learned_offset2",
              activation="relu", fused_qkv=False)


def _rand_engine_params(cfg: eng.EngineConfig, key):
    """Random stacked engine params built directly on device (no host
    weight materialization: bf16 6.7B doesn't fit in host+device twice).

    The whole tree is constructed inside ONE jitted function: on the
    remote-TPU backend every top-level dispatch pays a tunnel round trip
    (+ a possible remote compile), so per-site construction takes minutes
    while a single fused program takes seconds.
    """
    c = cfg.lm
    sites = {"q": (c.d_model, c.d_model), "k": (c.d_model, c.d_model),
             "v": (c.d_model, c.d_model), "out": (c.d_model, c.d_model),
             "fc_in": (c.d_model, c.d_ff), "fc_out": (c.d_ff, c.d_model)}
    wgrid = cb.ant_grid("flint", 4, True)[:16]
    agrid = cb.ant_grid("flint", 4, False)[:16]
    from ant_quantization_tpu.kernels.qmatmul import int8_codebook
    wq16, w_unit, _ = int8_codebook(wgrid)
    aq16, a_unit, _ = int8_codebook(agrid)
    a_vmax = float(np.max(np.abs(agrid)))
    L = c.n_layers

    @jax.jit
    def build(key):
        ks = jax.random.split(key, len(sites) + 2)
        layers = {}
        for i, (name, (K, N)) in enumerate(sites.items()):
            entry = {"bias": jnp.zeros((L, N), jnp.float32)}
            if cfg.weight_mode == "w4":
                # values irrelevant to perf: any int8 in codebook range
                entry["w_i8"] = jax.random.randint(
                    ks[i], (L, K, N), -64, 64, jnp.int8)
                entry["oscale"] = jnp.full(
                    (L, N), 2e-3 * w_unit, jnp.float32)
            else:
                entry["kernel"] = (
                    jax.random.normal(ks[i], (L, K, N), jnp.bfloat16)
                    * np.float32(1.0 / np.sqrt(K)))
            if cfg.act_bits:
                entry["a_grid"] = jnp.broadcast_to(
                    jnp.asarray(agrid), (L, 16))
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
            "wpe": jax.random.normal(ks[-1], (c.max_seq + 2, c.d_model),
                                     cfg.dtype) * 0.02,
            "ln_f": {"scale": jnp.ones((c.d_model,), jnp.float32),
                     "bias": jnp.zeros((c.d_model,), jnp.float32)},
        }
        if cfg.lm_head_int8:
            top["wte_i8"] = jax.random.randint(
                ks[-2], (c.vocab_size, c.d_model), -127, 128, jnp.int8)
            top["wte_scale"] = jnp.full(
                (c.vocab_size,), 0.02 / 127.0, jnp.float32)
        else:
            top["wte"] = jax.random.normal(
                ks[-2], (c.vocab_size, c.d_model), cfg.dtype) * 0.02
        return {"layers": layers, "top": top}

    return build(key)


def _sync(x):
    """Force completion by fetching to host.

    On the remote-TPU (axon) backend jax.block_until_ready returns before
    the computation finishes; a device->host copy of a value that depends
    on the whole computation is the only reliable fence.
    """
    return np.asarray(x)


def _bench(cfg: eng.EngineConfig, label: str) -> float:
    ep = _rand_engine_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, PREFILL), 0,
                             cfg.lm.vocab_size)
    kv = eng.init_cache(cfg, BATCH)

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
    tok, kv = decode_n(ep, tok, kv)      # compile + warm
    _sync(tok)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        tok, kv = decode_n(ep, tok, kv)
    _sync(tok)
    dt = (time.perf_counter() - t0) / reps
    tps = BATCH * DECODE_STEPS / dt
    print(f"# {label}: {dt / DECODE_STEPS * 1e3:.2f} ms/step, "
          f"{tps:.0f} tokens/s", file=sys.stderr)
    return tps


def main():
    from ant_quantization_tpu.utils.profiling import (maybe_trace,
                                                      profile_dir_from_env)
    qcfg = eng.EngineConfig(
        lm=LM, weight_mode="w4", act_bits=4, kv_int8=True, max_seq=MAX_SEQ,
        lm_head_int8=os.environ.get("BENCH_LM_HEAD_INT8", "1") == "1")
    bcfg = eng.EngineConfig(lm=LM, weight_mode="bf16", act_bits=0,
                            kv_int8=False, max_seq=MAX_SEQ)
    with maybe_trace(profile_dir_from_env()):
        tps_q = _bench(qcfg, "W4A4+int8KV")
    tps_b = _bench(bcfg, "bf16 baseline")
    print(json.dumps({
        "metric": (f"decode tokens/s/chip, OPT-6.7B-width {N_LAYERS}L "
                   f"OliVe-style W4A4 + INT8 KV (bs={BATCH}, "
                   f"ctx={PREFILL})"),
        "value": round(tps_q, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps_q / tps_b, 3),
    }))


if __name__ == "__main__":
    main()
