"""Quantized ResNet family (torchvision architecture: resnet18/34/50/101/152).

The reference evaluates ResNet18/50 W4A4 QAT and ResNet50/152 6-bit PTQ on
ImageNet (ant_quantization/ImageNet/README.md:16-23,94-100) using
torchvision models with every nn.Conv2d/nn.Linear swapped for a quantizer
(ant quant_model.py:11-51). Here the swap is structural: QuantConv /
QuantDense at every conv/linear site; BatchNorm stays full precision (the
reference does not quantize BN).

Activations are NHWC (TPU-native); the torchvision importer transposes
OIHW -> HWIO.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantConv, QuantDense


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str                 # "basic" | "bottleneck"
    layers: Tuple[int, ...]    # blocks per stage
    num_classes: int = 1000


def resnet18_config():
    return ResNetConfig("basic", (2, 2, 2, 2))


def resnet34_config():
    return ResNetConfig("basic", (3, 4, 6, 3))


def resnet50_config():
    return ResNetConfig("bottleneck", (3, 4, 6, 3))


def resnet101_config():
    return ResNetConfig("bottleneck", (3, 4, 23, 3))


def resnet152_config():
    return ResNetConfig("bottleneck", (3, 8, 36, 3))


class BasicBlock(nn.Module):
    features: int
    qcfg: QuantConfig
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        identity = x
        out = QuantConv(self.features, (3, 3), self.qcfg,
                        strides=self.strides, padding=1, use_bias=False,
                        name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = QuantConv(self.features, (3, 3), self.qcfg, padding=1,
                        use_bias=False, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = QuantConv(self.features, (1, 1), self.qcfg,
                                 strides=self.strides, padding=0,
                                 use_bias=False, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int              # bottleneck width; output = 4x
    qcfg: QuantConfig
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        identity = x
        out = QuantConv(self.features, (1, 1), self.qcfg, padding=0,
                        use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = QuantConv(self.features, (3, 3), self.qcfg,
                        strides=self.strides, padding=1, use_bias=False,
                        name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = QuantConv(4 * self.features, (1, 1), self.qcfg, padding=0,
                        use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = QuantConv(4 * self.features, (1, 1), self.qcfg,
                                 strides=self.strides, padding=0,
                                 use_bias=False, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    cfg: ResNetConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        block_cls = BasicBlock if c.block == "basic" else Bottleneck
        expansion = 1 if c.block == "basic" else 4

        x = QuantConv(64, (7, 7), self.qcfg, strides=2, padding=3,
                      use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        width = 64
        for stage, n_blocks in enumerate(c.layers):
            for b in range(n_blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                downsample = (b == 0 and
                              (strides != 1 or
                               x.shape[-1] != width * expansion))
                x = block_cls(width, self.qcfg, strides=strides,
                              downsample=downsample,
                              name=f"layer{stage + 1}_{b}")(x, train=train)
            width *= 2

        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(c.num_classes, self.qcfg, name="fc")(x)


# ---------------------------------------------------------------------------
# torchvision state_dict import (OIHW conv -> HWIO)
# ---------------------------------------------------------------------------

def _conv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}


def _bnp(sd, key):
    return ({"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]},
            {"mean": sd[f"{key}.running_mean"],
             "var": sd[f"{key}.running_var"]})


def import_torchvision_resnet(sd: Mapping[str, np.ndarray],
                              cfg: ResNetConfig):
    """torchvision resnet state_dict -> (params, batch_stats)."""
    params, stats = {}, {}
    params["conv1"] = _conv(sd, "conv1")
    params["bn1"], stats["bn1"] = _bnp(sd, "bn1")
    n_convs = 2 if cfg.block == "basic" else 3
    for stage, n_blocks in enumerate(cfg.layers):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            p, s = {}, {}
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = _conv(sd, f"{src}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = _bnp(sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv(sd, f"{src}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _bnp(
                    sd, f"{src}.downsample.1")
            params[dst], stats[dst] = p, s
    params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return params, stats
