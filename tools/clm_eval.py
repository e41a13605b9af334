#!/usr/bin/env python
"""Causal-LM perplexity evaluation with OliVe/ANT quantization.

TPU-native rebuild of olive_quantization/llm/run_clm.py: load GPT-2 / OPT /
BLOOM weights, quantize every matmul site (lm_head excluded), calibrate on
the first eval batches (the reference calibrates implicitly inside the
first Trainer eval batch), then report perplexity = exp(eval_loss).

Examples:
  python tools/clm_eval.py --model /data/gpt2-xl --dataset /data/wiki.txt \
      --tokenizer /data/gpt2-xl --mode ant-int-flint --wbit 4 --abit 4
  python tools/clm_eval.py --model gpt2:small --dataset synthetic   # smoke
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ant_quantization_tpu.utils.platform import honor_platform_env

honor_platform_env()

from ant_quantization_tpu.harness import data as D
from ant_quantization_tpu.harness import evaluate as E
from ant_quantization_tpu.harness import zoo
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.utils.logging import setup_logger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="local HF model dir, or preset family[:size]")
    p.add_argument("--dataset", required=True,
                   help="text file | local HF dataset dir | hf name | "
                        "'synthetic'")
    p.add_argument("--dataset_config", default=None)
    p.add_argument("--split", default="validation")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer dir (defaults to --model)")
    p.add_argument("--block_size", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_blocks", type=int, default=0)
    # quantization args (olive run_clm.py:224-277 QuantizeArguments)
    p.add_argument("--mode", default="ant-int-flint")
    p.add_argument("--wbit", "-wb", type=int, default=4)
    p.add_argument("--abit", "-ab", type=int, default=4)
    p.add_argument("--w_low", "-wl", type=int, default=75)
    p.add_argument("--w_up", "-wu", type=int, default=250)
    p.add_argument("--a_low", "-al", type=int, default=75)
    p.add_argument("--a_up", "-au", type=int, default=250)
    p.add_argument("--no_outlier", action="store_true")
    p.add_argument("--n8", type=int, default=0,
                   help="promote N highest-MSE sites to 8-bit")
    p.add_argument("--disable_quant", action="store_true")
    p.add_argument("--calib_batches", type=int, default=1)
    p.add_argument("--output", default=None, help="json results path")
    return p.parse_args()


def load_tokens(args, log):
    if args.dataset == "synthetic":
        rng = np.random.default_rng(0)
        return rng.integers(0, 1000, 64 * args.block_size).astype(np.int32)
    tok_path = args.tokenizer or args.model
    from ant_quantization_tpu.harness.tokenization import load_tokenizer
    tokenizer = load_tokenizer(tok_path)
    if os.path.isfile(args.dataset):
        log.info("tokenizing text file %s", args.dataset)
        ds = D.TextDataset.from_text_file(args.dataset, tokenizer,
                                          args.block_size)
    else:
        log.info("loading dataset %s", args.dataset)
        ds = D.TextDataset.from_hf(args.dataset, args.dataset_config,
                                   args.split, tokenizer, args.block_size)
    return ds.blocks.reshape(-1)


def main():
    # multi-host entry (no-op unless ANT_COORDINATOR/ANT_DISTRIBUTED set;
    # see parallel/distributed.py for the pod launch line)
    from ant_quantization_tpu.parallel.distributed import (
        initialize_from_env)
    initialize_from_env()
    args = parse_args()
    log = setup_logger("clm_eval")

    qcfg = QuantConfig(mode=args.mode, wbit=args.wbit, abit=args.abit,
                       family="olive", w_low=args.w_low, w_up=args.w_up,
                       a_low=args.a_low, a_up=args.a_up,
                       no_outlier=args.no_outlier,
                       enabled=not args.disable_quant)
    log.info("building model %s (mode=%s W%dA%d ovp=%s)", args.model,
             args.mode, args.wbit, args.abit, not args.no_outlier)
    model, cfg, params = zoo.get_lm(args.model, qcfg)
    blocks = D.lm_blocks(load_tokens(args, log), args.block_size)
    if args.max_blocks:
        blocks = blocks[: args.max_blocks]
    log.info("%d eval blocks of %d tokens", len(blocks), args.block_size)

    if params is None:
        import jax
        import jax.numpy as jnp
        log.warning("no weights: random init (smoke-test mode)")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(blocks[:1]))["params"]

    variables = {"params": params}
    if not args.disable_quant:
        import jax.numpy as jnp
        calib = [(jnp.asarray(blocks[i * args.batch_size:
                                     (i + 1) * args.batch_size]),)
                 for i in range(args.calib_batches)]
        log.info("calibrating on %d batches", len(calib))
        quant = E.calibrate_on_batches(model, variables, calib, n8=args.n8,
                                       log=log.info)
        variables["quant"] = quant

    results = E.lm_perplexity(model, variables, blocks, args.batch_size,
                              log=log.info)
    results.update(model=args.model, mode=args.mode, wbit=args.wbit,
                   abit=args.abit, ovp=not args.no_outlier)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
