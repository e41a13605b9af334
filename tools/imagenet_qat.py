#!/usr/bin/env python
"""ImageNet QAT with ANT quantization.

Rebuilds the training path of ant_quantization/ImageNet/main.py:178-243:
SGD momentum + MultiStepLR, first-batch calibration with optional
mixed-precision promotion (set_8_bit_layer_n / -l8 list), STE training,
per-epoch top-1/top-5 eval and checkpointing (params + quant + optimizer).

Example (the resnet18_qat.sh recipe):
  python tools/imagenet_qat.py --model resnet18 --weights resnet18.pth \
      --train_dir /data/imagenet/train --val_dir /data/imagenet/val \
      --mode ant-int-pot-flint -wb 4 -ab 4 --lr 0.04 --epochs 10 \
      --milestones 4,7,9
Smoke test:  --train_dir synthetic --val_dir synthetic --epochs 1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ant_quantization_tpu.utils.platform import honor_platform_env

honor_platform_env()

from ant_quantization_tpu.harness import checkpoint as C
from ant_quantization_tpu.harness import data as D
from ant_quantization_tpu.harness import evaluate as E
from ant_quantization_tpu.harness import train as T
from ant_quantization_tpu.harness import zoo
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.utils.logging import setup_logger


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--val_dir", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.04)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--milestones", default="4,7,9",
                   help="LR decay epochs (MultiStepLR)")
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="override (needed for synthetic data)")
    # quantization
    p.add_argument("--mode", default="ant-int-pot-flint")
    p.add_argument("--wbit", "-wb", type=int, default=4)
    p.add_argument("--abit", "-ab", type=int, default=4)
    p.add_argument("--w_low", "-wl", type=int, default=75)
    p.add_argument("--w_up", "-wu", type=int, default=150)
    p.add_argument("--a_low", "-al", type=int, default=75)
    p.add_argument("--a_up", "-au", type=int, default=150)
    p.add_argument("--n8", type=int, default=0)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per step (memory saver; numerics "
                        "identical for BN-free models; BN stats become "
                        "per-microbatch when > 1)")
    p.add_argument("--layers8", "-l8", default=None)
    p.add_argument("--workers", type=int, default=16,
                   help="decode threads for the input pipeline")
    p.add_argument("--ckpt_dir", default="checkpoints/qat")
    p.add_argument("--resume", action="store_true")
    return p.parse_args()


def main():
    # multi-host entry (no-op unless ANT_COORDINATOR/ANT_DISTRIBUTED set;
    # see parallel/distributed.py for the pod launch line)
    from ant_quantization_tpu.parallel.distributed import (
        initialize_from_env)
    initialize_from_env()
    args = parse_args()
    log = setup_logger("imagenet_qat")
    import jax
    import jax.numpy as jnp

    qcfg = QuantConfig(mode=args.mode, wbit=args.wbit, abit=args.abit,
                       family="ant", w_low=args.w_low, w_up=args.w_up,
                       a_low=args.a_low, a_up=args.a_up)
    model, _, variables = zoo.get_image_model(args.model, qcfg,
                                              args.weights)
    _, crop = D.model_input_size(args.model)
    synth = args.train_dir == "synthetic"

    def train_batches(seed):
        if synth:
            return D.synthetic_image_batches(
                args.batch_size, args.steps_per_epoch or 8, crop, seed=seed)
        # uint8 pipeline: parallel host decode, on-device normalization
        return D.imagefolder_batches(args.train_dir, args.batch_size,
                                     args.model, workers=args.workers,
                                     as_uint8=True)

    def val_batches():
        if args.val_dir == "synthetic":
            return D.synthetic_image_batches(args.batch_size, 2, crop,
                                             seed=10_000)
        return D.imagefolder_batches(args.val_dir, args.batch_size,
                                     args.model, workers=args.workers,
                                     as_uint8=True)

    if variables is None:
        log.warning("no weights: random init")
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, crop, crop, 3)))
        variables = {k: v[k] for k in v if k != "quant"}
    has_bn = "batch_stats" in variables

    # first-batch calibration + promotion (main.py:190-195)
    images0, labels0 = next(iter(train_batches(0)))
    if not synth:                     # uint8 pipeline: normalize on host
        images0 = D.normalize_images(jnp.asarray(images0))
    quant = E.calibrate_on_batches(model, variables,
                                   [(jnp.asarray(images0),)], n8=args.n8,
                                   layer_list=args.layers8, log=log.info)

    if synth and not args.steps_per_epoch:
        args.steps_per_epoch = 8
    steps = args.steps_per_epoch or max(
        sum(1 for _ in train_batches(0)), 1)
    milestones = [int(m) * steps for m in args.milestones.split(",") if m]
    tx = T.sgd_multistep(args.lr, milestones, args.gamma, args.momentum,
                         args.weight_decay)
    state = T.TrainState(
        params=variables["params"], quant=quant,
        opt_state=tx.init(variables["params"]),
        extra={"batch_stats": variables["batch_stats"]} if has_bn else {})

    start_epoch = 0
    if args.resume and C.latest_step(args.ckpt_dir) is not None:
        tree = C.restore_checkpoint(args.ckpt_dir)
        state.params, state.quant = tree["params"], tree["quant"]
        state.extra = tree.get("extra", state.extra)
        start_epoch = int(tree.get("epoch", 0)) + 1
        log.info("resumed from epoch %d", start_epoch - 1)

    step_fn = T.make_classification_step(
        model, tx, has_batch_stats=has_bn, grad_accum=args.grad_accum,
        preprocess=None if synth else D.normalize_images)
    for epoch in range(start_epoch, args.epochs):
        for i, (images, labels) in enumerate(train_batches(epoch)):
            state, loss = step_fn(state, jnp.asarray(images),
                                  jnp.asarray(labels))
            if i % 50 == 0:
                log.info("epoch %d step %d loss %.4f", epoch, i,
                         float(loss))
        v = {"params": state.params, "quant": state.quant, **state.extra}
        m = T.evaluate_classification(
            model, v, val_batches(),
            preprocess=None if args.val_dir == "synthetic"
            else D.normalize_images)
        log.info("epoch %d: %s", epoch, m)
        C.save_checkpoint(args.ckpt_dir,
                          {"params": state.params, "quant": state.quant,
                           "extra": state.extra, "epoch": epoch},
                          step=epoch)

    v = {"params": state.params, "quant": state.quant, **state.extra}
    results = T.evaluate_classification(
        model, v, val_batches(),
        preprocess=None if args.val_dir == "synthetic"
        else D.normalize_images)
    log.info("Final accuracy: %s", results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
