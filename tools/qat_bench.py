#!/usr/bin/env python
"""QAT step-overhead benchmark: fake-quant training vs dense bf16/f32.

The reference's primary ANT workload is QAT (ImageNet/main.py train loop,
BERT/run_glue.py finetuning) but it never *measures* the quantization
overhead. This tool times the jitted training step of a model with ANT
fake-quant enabled against the identical dense step and reports the
overhead ratio and examples/s — the number that tells you what a QAT run
costs on this chip.

    python tools/qat_bench.py --model resnet18 --batch 64 --size 176
    python tools/qat_bench.py --model bert_base --batch 16 --seq 128
    python tools/qat_bench.py --model vit_b_16 --batch 32 --json

Steps run inside one jitted lax.scan block (the remote-TPU dispatch round
trip is ~26 ms and would poison per-step host timing).
"""

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
import optax

from ant_quantization_tpu.harness import zoo
from ant_quantization_tpu.nn.config import QuantConfig


def _sync(x):
    return np.asarray(x)


def _quant_cfg(args, enabled: bool) -> QuantConfig:
    if not enabled:
        return QuantConfig(enabled=False)
    # fast-bounds single-ratio scan by default: calibration cost is not
    # what this tool measures (the steady-state step is)
    lb, ub = (100, 101) if args.fast_calib else (args.low, args.up)
    return QuantConfig(mode=args.mode, family="ant",
                       wbit=args.wbit, abit=args.abit,
                       w_low=lb, w_up=ub, a_low=lb, a_up=ub,
                       quantize_input=not getattr(args, "weights_only",
                                                  False))


def _build(args, enabled: bool):
    """(step_fn, carry, batch) for one model family; step_fn is jitted and
    runs ``args.inner`` training steps per call via lax.scan."""
    qcfg = _quant_cfg(args, enabled)
    rng = np.random.default_rng(0)
    if args.model in zoo.IMAGE_MODELS:
        model, _, _ = zoo.get_image_model(args.model, qcfg)
        size = args.size or (299 if args.model == "inception_v3" else 224)
        images = jnp.asarray(
            rng.normal(size=(args.batch, size, size, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 1000, (args.batch,)))
        variables = model.init(jax.random.PRNGKey(0), images[:2])
        extra = {k: v for k, v in variables.items()
                 if k not in ("params", "quant")}
        if enabled:
            _, upd = model.apply(variables, images[:2], mutable=["quant"])
            quant = upd["quant"]
        else:
            quant = None
        has_bs = "batch_stats" in extra

        def loss_fn(params, quant, extra, images, labels):
            v = {"params": params, **extra}
            if quant is not None:
                v["quant"] = quant
            if has_bs:
                logits, upd = model.apply(v, images, train=True,
                                          mutable=["batch_stats"])
                new_extra = {**extra, **upd}
            else:
                logits = model.apply(v, images)
                new_extra = extra
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, new_extra

        batch = (images, labels)
    elif args.model in ("bert_base", "bert_large"):
        model, _, _ = zoo.get_bert(args.model.split("_")[1], qcfg)
        ids = jnp.asarray(rng.integers(0, 30000, (args.batch, args.seq)))
        labels = jnp.asarray(rng.integers(0, 2, (args.batch,)))
        variables = model.init(jax.random.PRNGKey(0), ids[:2])
        extra = {}
        if enabled:
            _, upd = model.apply(variables, ids[:2], mutable=["quant"])
            quant = upd["quant"]
        else:
            quant = None

        def loss_fn(params, quant, extra, ids, labels):
            v = {"params": params}
            if quant is not None:
                v["quant"] = quant
            logits = model.apply(v, ids)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, extra

        batch = (ids, labels)
    else:
        raise SystemExit(f"unknown model {args.model!r}")

    tx = optax.sgd(1e-3, momentum=0.9)
    params = variables["params"]
    opt_state = tx.init(params)

    @functools.partial(jax.jit, static_argnames=("n",))
    def steps(params, quant, extra, opt_state, batch, n):
        def body(carry, _):
            params, extra, opt_state = carry
            (loss, new_extra), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, quant, extra, *batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_extra, opt_state), loss
        (params, extra, opt_state), losses = jax.lax.scan(
            body, (params, extra, opt_state), None, length=n)
        return params, extra, opt_state, losses[-1]

    return steps, (params, quant, extra, opt_state), batch


def _time(args, enabled: bool, label: str) -> float:
    steps, (params, quant, extra, opt_state), batch = _build(args, enabled)
    params, extra, opt_state, loss = steps(params, quant, extra, opt_state,
                                           batch, args.inner)   # compile+warm
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        params, extra, opt_state, loss = steps(params, quant, extra,
                                               opt_state, batch, args.inner)
    _sync(loss)
    dt = (time.perf_counter() - t0) / (args.reps * args.inner)
    print(f"# {label}: {dt * 1e3:.2f} ms/step "
          f"({args.batch / dt:.0f} ex/s)", file=sys.stderr)
    return dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet18")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=None,
                   help="image side (default: model's eval size)")
    p.add_argument("--seq", type=int, default=128, help="BERT seq length")
    p.add_argument("--mode", default="ant-int-pot-flint")
    p.add_argument("--wbit", type=int, default=4)
    p.add_argument("--abit", type=int, default=4)
    p.add_argument("--low", type=int, default=75)
    p.add_argument("--up", type=int, default=150)
    p.add_argument("--no-fast-calib", dest="fast_calib",
                   action="store_false",
                   help="full MSE alpha scan during setup (slow, identical "
                        "steady-state step)")
    p.add_argument("--weights-only", action="store_true",
                   help="quantize weights only (disable_input_quantization"
                        " analog) - splits the overhead attribution")
    p.add_argument("--inner", type=int, default=8,
                   help="train steps per jitted scan block")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    dt_q = _time(args, True, f"{args.model} QAT ({args.mode} "
                             f"w{args.wbit}a{args.abit})")
    dt_d = _time(args, False, f"{args.model} dense")
    out = {
        "model": args.model, "batch": args.batch,
        "qat_ms_per_step": round(dt_q * 1e3, 3),
        "dense_ms_per_step": round(dt_d * 1e3, 3),
        "qat_examples_per_s": round(args.batch / dt_q, 1),
        "overhead": round(dt_q / dt_d, 3),
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"QAT overhead: {out['overhead']:.2f}x "
              f"({out['qat_ms_per_step']} ms vs {out['dense_ms_per_step']} "
              f"ms/step; {out['qat_examples_per_s']} ex/s quantized)")
    return out


if __name__ == "__main__":
    main()
