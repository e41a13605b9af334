#!/usr/bin/env python
"""ImageNet classification eval with ANT quantization (PTQ).

Rebuilds the eval path of ant_quantization/ImageNet/main.py: build a model
from the zoo, import torchvision weights, calibrate on one batch
(ptq_init, main.py:238-243), then top-1/top-5 eval.

Example (6-bit PTQ, Table V of the paper):
  python tools/imagenet_eval.py --model resnet50 --weights resnet50.pth \
      --data_dir /data/imagenet/val --mode ant-int-pot-float-flint \
      --wbit 6 --abit 6
Smoke test without data:  --data_dir synthetic
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
    p.add_argument("--model", required=True, help=str(zoo.IMAGE_MODELS))
    p.add_argument("--weights", default=None, help=".pth/.npz state dict")
    p.add_argument("--data_dir", required=True,
                   help="ImageFolder val dir, or 'synthetic'")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--limit", type=int, default=0,
                   help="cap on eval images (0 = all)")
    # quantization (ImageNet/main.py:20-73)
    p.add_argument("--mode", default="ant-int-pot-flint")
    p.add_argument("--wbit", "-wb", type=int, default=4)
    p.add_argument("--abit", "-ab", type=int, default=4)
    p.add_argument("--w_low", "-wl", type=int, default=75)
    p.add_argument("--w_up", "-wu", type=int, default=150)
    p.add_argument("--a_low", "-al", type=int, default=75)
    p.add_argument("--a_up", "-au", type=int, default=150)
    p.add_argument("--percent", type=float, default=1.0,
                   help="GOBO outlier-mode percentile (mode=outlier)")
    p.add_argument("--n8", type=int, default=0)
    p.add_argument("--layers8", "-l8", default=None)
    p.add_argument("--disable_quant", action="store_true")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir with calibrated quant state")
    p.add_argument("--output", default=None)
    p.add_argument("--journal", default=None,
                   help="crash-resume journal path: a restarted eval "
                        "skips batches already accumulated")
    return p.parse_args()


def main():
    # multi-host entry (no-op unless ANT_COORDINATOR/ANT_DISTRIBUTED set;
    # see parallel/distributed.py for the pod launch line)
    from ant_quantization_tpu.parallel.distributed import (
        initialize_from_env)
    initialize_from_env()
    args = parse_args()
    log = setup_logger("imagenet_eval")

    qcfg = QuantConfig(mode=args.mode, wbit=args.wbit, abit=args.abit,
                       family="ant", w_low=args.w_low, w_up=args.w_up,
                       a_low=args.a_low, a_up=args.a_up,
                       percent=args.percent,
                       enabled=not args.disable_quant)
    model, _, variables = zoo.get_image_model(args.model, qcfg,
                                              args.weights)
    _, crop = D.model_input_size(args.model)

    def batches():
        if args.data_dir == "synthetic":
            return D.synthetic_image_batches(args.batch_size, 4, crop)
        return D.imagefolder_batches(args.data_dir, args.batch_size,
                                     args.model,
                                     limit=args.limit or None)

    import jax
    import jax.numpy as jnp
    if variables is None:
        log.warning("no weights: random init (smoke-test mode)")
        x0 = jnp.zeros((1, crop, crop, 3))
        v = model.init(jax.random.PRNGKey(0), x0)
        variables = {k: v[k] for k in v if k != "quant"}

    if args.resume:
        variables = C.restore_checkpoint(args.resume, template=None)
        log.info("restored checkpoint from %s", args.resume)
    elif not args.disable_quant:
        images, _ = next(iter(batches()))
        log.info("ptq_init: calibrating on one %d-image batch", len(images))
        quant = E.calibrate_on_batches(
            model, variables, [(jnp.asarray(images),)], n8=args.n8,
            layer_list=args.layers8, log=log.info)
        variables["quant"] = quant

    fp = (f"{args.model}|{args.mode}|w{args.wbit}a{args.abit}|"
          f"{args.weights or 'random'}|{args.data_dir}")
    results = T.evaluate_classification(model, variables, batches(),
                                        log_every=10, logger=log.info,
                                        journal=args.journal,
                                        journal_fingerprint=fp)
    results.update(model=args.model, mode=args.mode, wbit=args.wbit,
                   abit=args.abit)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
