#!/usr/bin/env python
"""BERT GLUE evaluation / finetuning with ANT or OliVe quantization.

Rebuilds both reference GLUE harnesses:
- PTQ eval (olive bert/run_glue.py): explicit calibration pre-pass over
  train-split batches, optional 8-bit promotion, then metric eval.
- QAT finetune (ant BERT/run_glue.py): BertAdam-style warmup-linear AdamW,
  first-batch promotion, per-epoch eval.

Data: standard GLUE TSV directory (--data_dir) or jsonl; tokenizer from a
local HF dir (--tokenizer).

Example:
  python tools/glue_run.py --task sst2 --data_dir /data/glue/SST-2 \
      --weights /data/bert-base-sst2 --tokenizer /data/bert-base-uncased \
      --mode ant-int-flint --family olive --wbit 4 --abit 4 --n8 0
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
from ant_quantization_tpu.harness import train as T
from ant_quantization_tpu.harness import zoo
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.utils.logging import setup_logger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True, choices=sorted(D.GLUE_TASKS))
    p.add_argument("--data_dir", default=None,
                   help="GLUE task dir (TSV layout); omit for synthetic")
    p.add_argument("--weights", default=None,
                   help="finetuned HF checkpoint (dir or file)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--model_family", default="bert",
                   choices=("bert", "bart"))
    p.add_argument("--bert_size", default="base", choices=("base", "large"))
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    # quantization
    p.add_argument("--mode", default="ant-int-pot-flint")
    p.add_argument("--family", default="ant", choices=("ant", "olive"))
    p.add_argument("--wbit", "-wb", type=int, default=4)
    p.add_argument("--abit", "-ab", type=int, default=4)
    p.add_argument("--w_low", "-wl", type=int, default=75)
    p.add_argument("--w_up", "-wu", type=int, default=150)
    p.add_argument("--a_low", "-al", type=int, default=75)
    p.add_argument("--a_up", "-au", type=int, default=150)
    p.add_argument("--no_outlier", action="store_true")
    p.add_argument("--n8", type=int, default=0)
    p.add_argument("--layers8", "-l8", default=None,
                   help="explicit comma list of sites to promote")
    p.add_argument("--disable_quant", action="store_true")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="quantize_batch_size/bs pre-pass batches "
                        "(olive run_glue.py:539-546)")
    # finetune (QAT)
    p.add_argument("--train", action="store_true")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--warmup", type=float, default=0.1)
    p.add_argument("--output", default=None)
    return p.parse_args()


def _synthetic_batches(n, bs, seq, num_labels, vocab=30522, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {
            "input_ids": rng.integers(0, vocab, (bs, seq)).astype(np.int32),
            "token_type_ids": np.zeros((bs, seq), np.int32),
            "attention_mask": np.ones((bs, seq), np.int32),
            "labels": rng.integers(0, num_labels, bs).astype(np.int32),
        }


def _encoded_batches(args, split, tokenizer, shuffle_seed=None):
    examples = D.load_glue_split(args.data_dir, args.task, split)
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        examples = [examples[i] for i in rng.permutation(len(examples))]
    for i in range(0, len(examples), args.batch_size):
        chunk = examples[i:i + args.batch_size]
        if len(chunk) < 2:
            continue
        yield D.encode_glue_batch(tokenizer, chunk, args.max_seq_length)


def main():
    # multi-host entry (no-op unless ANT_COORDINATOR/ANT_DISTRIBUTED set;
    # see parallel/distributed.py for the pod launch line)
    from ant_quantization_tpu.parallel.distributed import (
        initialize_from_env)
    initialize_from_env()
    args = parse_args()
    log = setup_logger("glue_run")
    num_labels = D.glue_num_labels(args.task)
    regression = args.task == "stsb"

    qcfg = QuantConfig(mode=args.mode, wbit=args.wbit, abit=args.abit,
                       family=args.family, w_low=args.w_low, w_up=args.w_up,
                       a_low=args.a_low, a_up=args.a_up,
                       no_outlier=args.no_outlier,
                       enabled=not args.disable_quant)
    model, cfg, params = zoo.get_encoder_model(
        args.model_family, args.bert_size, qcfg, num_labels=num_labels,
        weights_path=args.weights)

    tokenizer = None
    if args.data_dir:
        from ant_quantization_tpu.harness.tokenization import load_tokenizer
        tokenizer = load_tokenizer(args.tokenizer or args.weights)

    def train_batches(seed=None):
        if args.data_dir:
            return _encoded_batches(args, "train", tokenizer, seed)
        return _synthetic_batches(args.calib_batches + 8, args.batch_size,
                                  args.max_seq_length, num_labels)

    def dev_batches():
        if args.data_dir:
            return _encoded_batches(args, "dev", tokenizer)
        return _synthetic_batches(4, args.batch_size, args.max_seq_length,
                                  num_labels, seed=1)

    import jax
    import jax.numpy as jnp
    if params is None:
        log.warning("no weights: random init (smoke-test mode)")
        b0 = next(iter(dev_batches()))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(b0["input_ids"]))["params"]

    def to_args(b):
        return (jnp.asarray(b["input_ids"]),
                jnp.asarray(b.get("token_type_ids",
                                  np.zeros_like(b["input_ids"]))),
                jnp.asarray(b["attention_mask"]))

    variables = {"params": params}
    if not args.disable_quant:
        calib = []
        for i, b in enumerate(train_batches()):
            if i >= args.calib_batches:
                break
            calib.append(to_args(b))
        log.info("calibrating on %d train batches", len(calib))
        quant = E.calibrate_on_batches(model, variables, calib, n8=args.n8,
                                       layer_list=args.layers8, log=log.info)
        variables["quant"] = quant

    if args.train:
        import optax
        steps_per_epoch = max(
            sum(1 for _ in train_batches()), 1)
        tx = T.bert_adam(args.lr, steps_per_epoch * args.epochs,
                         args.warmup)

        @jax.jit
        def step(params, quant, opt_state, ids, tt, am, labels):
            def loss_fn(params):
                v = {"params": params}
                if quant is not None:
                    v["quant"] = quant
                logits = model.apply(v, ids, tt, am)
                if regression:
                    return jnp.mean((logits[:, 0] - labels) ** 2)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        opt_state = tx.init(variables["params"])
        quant = variables.get("quant")
        for epoch in range(args.epochs):
            for i, b in enumerate(train_batches(seed=epoch)):
                labels = jnp.asarray(
                    b["labels"],
                    jnp.float32 if regression else jnp.int32)
                variables["params"], opt_state, loss = step(
                    variables["params"], quant, opt_state, *to_args(b),
                    labels)
                if i % 50 == 0:
                    log.info("epoch %d step %d loss %.4f", epoch, i,
                             float(loss))
            m = E.glue_eval(model, variables, dev_batches(), args.task,
                            regression)
            log.info("epoch %d: %s", epoch, m)

    results = E.glue_eval(model, variables, dev_batches(), args.task,
                          regression)
    results.update(task=args.task, mode=args.mode, family=args.family,
                   wbit=args.wbit, abit=args.abit)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
