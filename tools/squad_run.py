#!/usr/bin/env python
"""SQuAD v1.1 / v2.0 QA evaluation with OliVe quantization.

Rebuilds olive_quantization/bert/run_qa.py: calibration pre-pass over
train-split batches, eval over sliding-window features, answer extraction
via the utils_qa post-processing, EM/F1 metrics.

Example:
  python tools/squad_run.py --data /data/squad/dev-v1.1.json \
      --train_data /data/squad/train-v1.1.json \
      --weights /data/bert-base-squad --tokenizer /data/bert-base-uncased
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ant_quantization_tpu.utils.platform import honor_platform_env

honor_platform_env()

from ant_quantization_tpu.harness import evaluate as E
from ant_quantization_tpu.harness import metrics as M
from ant_quantization_tpu.harness import qa_utils as Q
from ant_quantization_tpu.harness import zoo
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.utils.logging import setup_logger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="dev json (v1.1/v2.0)")
    p.add_argument("--train_data", default=None,
                   help="train json for the calibration pre-pass "
                        "(defaults to --data)")
    p.add_argument("--weights", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--model_family", default="bert",
                   choices=("bert", "bart"))
    p.add_argument("--bert_size", default="base", choices=("base", "large"))
    p.add_argument("--version_2", action="store_true")
    p.add_argument("--max_seq_length", type=int, default=384)
    p.add_argument("--doc_stride", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_examples", type=int, default=0)
    p.add_argument("--mode", default="ant-int-flint")
    p.add_argument("--family", default="olive", choices=("ant", "olive"))
    p.add_argument("--wbit", "-wb", type=int, default=4)
    p.add_argument("--abit", "-ab", type=int, default=4)
    p.add_argument("--w_low", "-wl", type=int, default=75)
    p.add_argument("--w_up", "-wu", type=int, default=250)
    p.add_argument("--a_low", "-al", type=int, default=75)
    p.add_argument("--a_up", "-au", type=int, default=250)
    p.add_argument("--no_outlier", action="store_true")
    p.add_argument("--n8", type=int, default=0)
    p.add_argument("--disable_quant", action="store_true")
    p.add_argument("--calib_batches", type=int, default=4)
    p.add_argument("--output", default=None)
    return p.parse_args()


def main():
    # multi-host entry (no-op unless ANT_COORDINATOR/ANT_DISTRIBUTED set;
    # see parallel/distributed.py for the pod launch line)
    from ant_quantization_tpu.parallel.distributed import (
        initialize_from_env)
    initialize_from_env()
    args = parse_args()
    log = setup_logger("squad_run")
    import jax
    import jax.numpy as jnp

    qcfg = QuantConfig(mode=args.mode, wbit=args.wbit, abit=args.abit,
                       family=args.family, w_low=args.w_low, w_up=args.w_up,
                       a_low=args.a_low, a_up=args.a_up,
                       no_outlier=args.no_outlier,
                       enabled=not args.disable_quant)
    model, _, params = zoo.get_encoder_model(
        args.model_family, args.bert_size, qcfg, head="qa",
        weights_path=args.weights)

    from ant_quantization_tpu.harness.tokenization import load_tokenizer
    tokenizer = load_tokenizer(args.tokenizer or args.weights)

    examples = Q.load_squad_json(args.data)
    if args.max_examples:
        examples = examples[: args.max_examples]
    features = Q.prepare_features(examples, tokenizer, args.max_seq_length,
                                  args.doc_stride)
    log.info("%d examples -> %d features", len(examples), len(features))

    if params is None:
        log.warning("no weights: random init (smoke-test mode)")
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(features[0]["input_ids"][None]))["params"]
    variables = {"params": params}

    def feat_args(batch):
        return (jnp.asarray(np.stack([f["input_ids"] for f in batch])),
                jnp.asarray(np.stack([f["token_type_ids"] for f in batch])),
                jnp.asarray(np.stack([f["attention_mask"] for f in batch])))

    if not args.disable_quant:
        cal_ex = (Q.load_squad_json(args.train_data) if args.train_data
                  else examples)
        cal_feats = Q.prepare_features(cal_ex[:64], tokenizer,
                                       args.max_seq_length, args.doc_stride)
        calib = [feat_args(cal_feats[i:i + args.batch_size])
                 for i in range(0, min(len(cal_feats),
                                       args.calib_batches * args.batch_size),
                                args.batch_size)]
        log.info("calibrating on %d batches", len(calib))
        variables["quant"] = E.calibrate_on_batches(
            model, variables, calib, n8=args.n8, log=log.info)

    @jax.jit
    def logits_fn(variables, ids, tt, am):
        return model.apply(variables, ids, tt, am)

    start_all, end_all = [], []
    for i in range(0, len(features), args.batch_size):
        batch = features[i:i + args.batch_size]
        s, e = logits_fn(variables, *feat_args(batch))
        start_all.append(np.asarray(s))
        end_all.append(np.asarray(e))
        if (i // args.batch_size + 1) % 20 == 0:
            log.info("eval %d/%d features", i + len(batch), len(features))

    preds = Q.postprocess_predictions(
        examples, features, np.concatenate(start_all),
        np.concatenate(end_all), version_2=args.version_2)
    refs, no_ans = Q.squad_references(examples)
    results = M.squad_metrics(preds, refs,
                              no_ans if args.version_2 else ())
    results.update(mode=args.mode, wbit=args.wbit, abit=args.abit)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
