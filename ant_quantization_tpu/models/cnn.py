"""Quantized AlexNet and VGG16 (torchvision architectures).

The reference evaluates AlexNet/VGG16 6-bit PTQ and VGG16 W4A4 QAT
(ant_quantization/ImageNet/README.md:16-23,94-100). NHWC activations;
importers transpose torchvision OIHW convs and handle the NCHW->NHWC
flatten-order difference before the first classifier layer.
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantConv, QuantDense

# torchvision vgg16 "D" configuration: conv widths with 'M' maxpools
VGG16_LAYOUT = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M")


class VGG16(nn.Module):
    """torchvision VGG-16 ("D" config); ``with_bn`` adds BatchNorm after
    every conv — the reference's experiments run on torchvision
    ``vgg16_bn`` (quant_6bit_ptq.sh / vgg16_qat.sh)."""
    qcfg: QuantConfig
    num_classes: int = 1000
    with_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        i = 0
        for item in VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = QuantConv(item, (3, 3), self.qcfg, padding=1,
                              name=f"conv_{i}")(x)
                if self.with_bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     name=f"bn_{i}")(x)
                x = nn.relu(x)
                i += 1
        # torchvision flattens NCHW: transpose so imported fc weights apply
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(QuantDense(4096, self.qcfg, name="fc0")(x))
        x = nn.relu(QuantDense(4096, self.qcfg, name="fc1")(x))
        return QuantDense(self.num_classes, self.qcfg, name="fc2")(x)


class AlexNet(nn.Module):
    qcfg: QuantConfig
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.qcfg
        x = nn.relu(QuantConv(64, (11, 11), q, strides=4, padding=2,
                              name="conv_0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(QuantConv(192, (5, 5), q, padding=2, name="conv_1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(QuantConv(384, (3, 3), q, padding=1, name="conv_2")(x))
        x = nn.relu(QuantConv(256, (3, 3), q, padding=1, name="conv_3")(x))
        x = nn.relu(QuantConv(256, (3, 3), q, padding=1, name="conv_4")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # torchvision applies AdaptiveAvgPool2d((6,6)); at 224 input the
        # feature map is already 6x6, so this is a no-op passthrough
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(QuantDense(4096, q, name="fc0")(x))
        x = nn.relu(QuantDense(4096, q, name="fc1")(x))
        return QuantDense(self.num_classes, q, name="fc2")(x)


def _conv(sd, key):
    return {"kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{key}.bias"]}


def import_torchvision_vgg16(sd: Mapping[str, np.ndarray],
                             with_bn: bool = False):
    """vgg16 -> params; vgg16_bn -> (params, batch_stats)."""
    params, stats = {}, {}
    for my_i, tv_i in enumerate(_vgg_feature_indices(with_bn)):
        params[f"conv_{my_i}"] = _conv(sd, f"features.{tv_i}")
        if with_bn:
            key = f"features.{tv_i + 1}"
            params[f"bn_{my_i}"] = {"scale": sd[f"{key}.weight"],
                                    "bias": sd[f"{key}.bias"]}
            stats[f"bn_{my_i}"] = {"mean": sd[f"{key}.running_mean"],
                                   "var": sd[f"{key}.running_var"]}
    params["fc0"] = {"kernel": sd["classifier.0.weight"].T,
                     "bias": sd["classifier.0.bias"]}
    params["fc1"] = {"kernel": sd["classifier.3.weight"].T,
                     "bias": sd["classifier.3.bias"]}
    params["fc2"] = {"kernel": sd["classifier.6.weight"].T,
                     "bias": sd["classifier.6.bias"]}
    if with_bn:
        return params, stats
    return params


def _vgg_feature_indices(with_bn: bool = False):
    """torchvision vgg16(.features) indices of the conv layers: each conv
    is followed by ReLU (and BatchNorm in vgg16_bn); pools take a slot."""
    idx = []
    i = 0
    per_conv = 3 if with_bn else 2    # conv (+bn) + relu
    for item in VGG16_LAYOUT:
        if item == "M":
            i += 1
        else:
            idx.append(i)
            i += per_conv
    return idx


def import_torchvision_alexnet(sd: Mapping[str, np.ndarray]):
    feature_ids = (0, 3, 6, 8, 10)
    params = {}
    for my_i, tv_i in enumerate(feature_ids):
        params[f"conv_{my_i}"] = _conv(sd, f"features.{tv_i}")
    for my_i, tv_i in enumerate((1, 4, 6)):
        params[f"fc{my_i}"] = {"kernel": sd[f"classifier.{tv_i}.weight"].T,
                               "bias": sd[f"classifier.{tv_i}.bias"]}
    return params
