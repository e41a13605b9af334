#!/usr/bin/env python
"""Tensor-parallel serving benchmark: decode tokens/s over a (dp, tp) mesh.

The scaling companion to bench.py (BASELINE.md north star: tokens/s
measured at 1 chip and N chips). On this environment's single real chip it
serves as the TP-path validation harness (virtual CPU mesh); on a real
v5e-8 it measures ICI scaling of the W4A4 + INT8-KV engine.

  # virtual 8-device CPU mesh (validation)
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tools/tp_bench.py --dp 2 --tp 4 --layers 2 --d_model 256

  # real slice
  python tools/tp_bench.py --tp 8 --layers 32 --d_model 4096
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ant_quantization_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.models.transformer_lm import LMConfig
from ant_quantization_tpu.parallel.mesh import make_mesh
from ant_quantization_tpu.serve import engine as eng
from ant_quantization_tpu.serve import sharded as sh


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=0,
                   help="0 = all remaining devices")
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--d_model", type=int, default=4096)
    p.add_argument("--n_heads", type=int, default=32)
    p.add_argument("--d_ff", type=int, default=0, help="0 = 4*d_model")
    p.add_argument("--vocab", type=int, default=50272)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--prefill", type=int, default=128)
    p.add_argument("--decode", type=int, default=32)
    p.add_argument("--weight_mode", default="w4",
                   choices=("w4", "bf16"))
    p.add_argument("--sp", default="on", choices=("on", "off"),
                   help="sequence-parallel prefill with the quantized "
                        "collective-matmul rings (engine sp_prefill)")
    p.add_argument("--output", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    n_dev = len(jax.devices())
    tp = args.tp or (n_dev // args.dp)
    assert args.dp * tp <= n_dev, (args.dp, tp, n_dev)
    mesh = make_mesh((args.dp, tp), devices=jax.devices()[:args.dp * tp])

    max_seq = args.prefill + args.decode + 16
    lm = LMConfig(vocab_size=args.vocab, d_model=args.d_model,
                  n_layers=args.layers, n_heads=args.n_heads,
                  d_ff=args.d_ff or 4 * args.d_model, max_seq=max_seq,
                  positions="learned_offset2", activation="relu",
                  fused_qkv=False)
    cfg = eng.EngineConfig(lm=lm, weight_mode=args.weight_mode,
                           act_bits=4 if args.weight_mode == "w4" else 0,
                           kv_int8=args.weight_mode == "w4",
                           sp_prefill=args.sp == "on",
                           max_seq=max_seq)
    tcfg = sh.tp_engine_config(cfg, mesh)

    # random engine params built directly on-device (bench.py pattern)
    rng = np.random.default_rng(0)
    sites = {"q": (lm.d_model, lm.d_model), "k": (lm.d_model, lm.d_model),
             "v": (lm.d_model, lm.d_model), "out": (lm.d_model, lm.d_model),
             "fc_in": (lm.d_model, lm.d_ff), "fc_out": (lm.d_ff, lm.d_model)}
    L = lm.n_layers

    @jax.jit
    def build(key):
        ks = jax.random.split(key, len(sites) + 2)
        layers = {}
        for i, (name, (K, N)) in enumerate(sites.items()):
            entry = {"bias": jnp.zeros((L, N), jnp.float32)}
            if cfg.weight_mode == "w4":
                entry["w_i8"] = jax.random.randint(ks[i], (L, K, N),
                                                   -64, 64, jnp.int8)
                entry["oscale"] = jnp.full((L, N), 2e-3, jnp.float32)
                entry["a_q"] = jnp.broadcast_to(
                    jnp.asarray(np.linspace(-100, 100, 16), jnp.float32
                                ).astype(jnp.int8), (L, 16))
                entry["a_scale"] = jnp.full((L,), 0.03, jnp.float32)
                entry["a_grid"] = jnp.broadcast_to(
                    jnp.linspace(-3.0, 3.0, 16, dtype=jnp.float32), (L, 16))
                entry["a_alpha"] = jnp.full((L,), 3.0, jnp.float32)
            else:
                entry["kernel"] = (jax.random.normal(ks[i], (L, K, N),
                                                     jnp.bfloat16)
                                   * np.float32(1 / np.sqrt(K)))
            layers[name] = entry
        ln = lambda: {"scale": jnp.ones((L, lm.d_model), jnp.float32),
                      "bias": jnp.zeros((L, lm.d_model), jnp.float32)}
        layers["ln_1"], layers["ln_2"] = ln(), ln()
        top = {"wte": jax.random.normal(ks[-2], (lm.vocab_size, lm.d_model),
                                        jnp.bfloat16) * 0.02,
               "wpe": jax.random.normal(ks[-1], (max_seq + 2, lm.d_model),
                                        jnp.bfloat16) * 0.02,
               "ln_f": {"scale": jnp.ones((lm.d_model,), jnp.float32),
                        "bias": jnp.zeros((lm.d_model,), jnp.float32)}}
        return {"layers": layers, "top": top}

    ep = sh.shard_engine_params(build(jax.random.PRNGKey(0)), tcfg, mesh)
    kv = sh.shard_cache(eng.init_cache(cfg, args.batch), mesh)
    fwd = sh.make_sharded_forward(tcfg, mesh)

    ids = jnp.asarray(rng.integers(0, lm.vocab_size,
                                   (args.batch, args.prefill)), jnp.int32)
    pos0 = jnp.zeros((args.batch,), jnp.int32)
    logits, kv = fwd(ep, ids, kv, pos0)
    tok = jnp.argmax(logits[:, -1:], axis=-1)
    np.asarray(tok)

    # prefill timing (the sp_prefill collective-matmul surface): re-run
    # the compiled prefill on a fresh cache
    kv_p = sh.shard_cache(eng.init_cache(cfg, args.batch), mesh)
    t0 = time.perf_counter()
    logits_p, kv_p = fwd(ep, ids, kv_p, pos0)
    np.asarray(jnp.argmax(logits_p[:, -1:], axis=-1))
    prefill_ms = (time.perf_counter() - t0) * 1e3
    del kv_p
    t0 = time.perf_counter()
    for step in range(args.decode):
        logits, kv = fwd(ep, tok, kv,
                         jnp.full((args.batch,), args.prefill + step,
                                  jnp.int32))
        tok = jnp.argmax(logits[:, -1:], axis=-1)
    np.asarray(tok)
    dt = time.perf_counter() - t0
    tps = args.batch * args.decode / dt

    result = {"mesh": {"dp": args.dp, "tp": tp},
              "devices": args.dp * tp,
              "weight_mode": args.weight_mode,
              "sp_prefill": args.sp == "on",
              "prefill_ms": round(prefill_ms, 1),
              "decode_tokens_per_s": round(tps, 1),
              "ms_per_step": round(dt / args.decode * 1e3, 2)}
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
