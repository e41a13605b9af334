"""Quantized InceptionV3 (torchvision architecture, aux_logits=False).

The reference QATs InceptionV3 at W4A4 (ant ImageNet/README.md:94-100) and
loads it via ``models.inception_v3(aux_logits=False, pretrained=True)``
(antquant/quant_utils.py:83-84). NHWC layout; every conv is a QuantConv
followed by BatchNorm (no bias, bn eps 1e-3 per torchvision) + ReLU.

Input is 299x299 (dataloader.py:145: inception crop 299).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantConv

BN_EPS = 1e-3


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    num_classes: int = 1000


def inception_v3_config(**kw) -> InceptionConfig:
    return InceptionConfig(**kw)


class ConvBN(nn.Module):
    """torchvision BasicConv2d: conv(no bias) + BN + ReLU."""
    features: int
    kernel_size: Tuple[int, int]
    qcfg: QuantConfig
    strides: int = 1
    padding: object = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = QuantConv(self.features, self.kernel_size, self.qcfg,
                      strides=self.strides, padding=pad, use_bias=False,
                      name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=BN_EPS,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _pool_same(x, window=3, stride=1):
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=((1, 1), (1, 1)), count_include_pad=True)


class InceptionA(nn.Module):
    qcfg: QuantConfig
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        q = self.qcfg
        b1 = ConvBN(64, (1, 1), q, name="branch1x1")(x, train)
        b5 = ConvBN(48, (1, 1), q, name="branch5x5_1")(x, train)
        b5 = ConvBN(64, (5, 5), q, padding=(2, 2),
                    name="branch5x5_2")(b5, train)
        b3 = ConvBN(64, (1, 1), q, name="branch3x3dbl_1")(x, train)
        b3 = ConvBN(96, (3, 3), q, padding=(1, 1),
                    name="branch3x3dbl_2")(b3, train)
        b3 = ConvBN(96, (3, 3), q, padding=(1, 1),
                    name="branch3x3dbl_3")(b3, train)
        bp = _pool_same(x)
        bp = ConvBN(self.pool_features, (1, 1), q,
                    name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train=False):
        q = self.qcfg
        b3 = ConvBN(384, (3, 3), q, strides=2, name="branch3x3")(x, train)
        bd = ConvBN(64, (1, 1), q, name="branch3x3dbl_1")(x, train)
        bd = ConvBN(96, (3, 3), q, padding=(1, 1),
                    name="branch3x3dbl_2")(bd, train)
        bd = ConvBN(96, (3, 3), q, strides=2,
                    name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    qcfg: QuantConfig
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        q = self.qcfg
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), q, name="branch1x1")(x, train)
        b7 = ConvBN(c7, (1, 1), q, name="branch7x7_1")(x, train)
        b7 = ConvBN(c7, (1, 7), q, padding=(0, 3),
                    name="branch7x7_2")(b7, train)
        b7 = ConvBN(192, (7, 1), q, padding=(3, 0),
                    name="branch7x7_3")(b7, train)
        bd = ConvBN(c7, (1, 1), q, name="branch7x7dbl_1")(x, train)
        bd = ConvBN(c7, (7, 1), q, padding=(3, 0),
                    name="branch7x7dbl_2")(bd, train)
        bd = ConvBN(c7, (1, 7), q, padding=(0, 3),
                    name="branch7x7dbl_3")(bd, train)
        bd = ConvBN(c7, (7, 1), q, padding=(3, 0),
                    name="branch7x7dbl_4")(bd, train)
        bd = ConvBN(192, (1, 7), q, padding=(0, 3),
                    name="branch7x7dbl_5")(bd, train)
        bp = _pool_same(x)
        bp = ConvBN(192, (1, 1), q, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train=False):
        q = self.qcfg
        b3 = ConvBN(192, (1, 1), q, name="branch3x3_1")(x, train)
        b3 = ConvBN(320, (3, 3), q, strides=2, name="branch3x3_2")(b3, train)
        b7 = ConvBN(192, (1, 1), q, name="branch7x7x3_1")(x, train)
        b7 = ConvBN(192, (1, 7), q, padding=(0, 3),
                    name="branch7x7x3_2")(b7, train)
        b7 = ConvBN(192, (7, 1), q, padding=(3, 0),
                    name="branch7x7x3_3")(b7, train)
        b7 = ConvBN(192, (3, 3), q, strides=2,
                    name="branch7x7x3_4")(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train=False):
        q = self.qcfg
        b1 = ConvBN(320, (1, 1), q, name="branch1x1")(x, train)
        b3 = ConvBN(384, (1, 1), q, name="branch3x3_1")(x, train)
        b3a = ConvBN(384, (1, 3), q, padding=(0, 1),
                     name="branch3x3_2a")(b3, train)
        b3b = ConvBN(384, (3, 1), q, padding=(1, 0),
                     name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), q, name="branch3x3dbl_1")(x, train)
        bd = ConvBN(384, (3, 3), q, padding=(1, 1),
                    name="branch3x3dbl_2")(bd, train)
        bda = ConvBN(384, (1, 3), q, padding=(0, 1),
                     name="branch3x3dbl_3a")(bd, train)
        bdb = ConvBN(384, (3, 1), q, padding=(1, 0),
                     name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool_same(x)
        bp = ConvBN(192, (1, 1), q, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    cfg: InceptionConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.qcfg
        x = ConvBN(32, (3, 3), q, strides=2, name="Conv2d_1a_3x3")(x, train)
        x = ConvBN(32, (3, 3), q, name="Conv2d_2a_3x3")(x, train)
        x = ConvBN(64, (3, 3), q, padding=(1, 1),
                   name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, (1, 1), q, name="Conv2d_3b_1x1")(x, train)
        x = ConvBN(192, (3, 3), q, name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(q, 32, name="Mixed_5b")(x, train)
        x = InceptionA(q, 64, name="Mixed_5c")(x, train)
        x = InceptionA(q, 64, name="Mixed_5d")(x, train)
        x = InceptionB(q, name="Mixed_6a")(x, train)
        x = InceptionC(q, 128, name="Mixed_6b")(x, train)
        x = InceptionC(q, 160, name="Mixed_6c")(x, train)
        x = InceptionC(q, 160, name="Mixed_6d")(x, train)
        x = InceptionC(q, 192, name="Mixed_6e")(x, train)
        x = InceptionD(q, name="Mixed_7a")(x, train)
        x = InceptionE(q, name="Mixed_7b")(x, train)
        x = InceptionE(q, name="Mixed_7c")(x, train)
        x = x.mean(axis=(1, 2))  # global avg pool (8x8 -> 1x1)
        from ..nn.layers import QuantDense
        return QuantDense(self.cfg.num_classes, q, name="fc")(x)


# ---------------------------------------------------------------------------
# torchvision import
# ---------------------------------------------------------------------------

def import_torchvision_inception(sd: Mapping[str, np.ndarray],
                                 cfg: InceptionConfig):
    """torchvision inception_v3 state_dict (aux_logits keys ignored) ->
    (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def convbn(dst: dict, dstats: dict, src: str):
        dst["conv"] = {"kernel": np.transpose(sd[f"{src}.conv.weight"],
                                              (2, 3, 1, 0))}
        dst["bn"] = {"scale": sd[f"{src}.bn.weight"],
                     "bias": sd[f"{src}.bn.bias"]}
        dstats["bn"] = {"mean": sd[f"{src}.bn.running_mean"],
                        "var": sd[f"{src}.bn.running_var"]}

    def block(name: str, branches: Sequence[str]):
        p, s = {}, {}
        for b in branches:
            p[b], s[b] = {}, {}
            convbn(p[b], s[b], f"{name}.{b}")
        params[name] = p
        stats[name] = s

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[stem], stats[stem] = {}, {}
        convbn(params[stem], stats[stem], stem)

    a_branches = ("branch1x1", "branch5x5_1", "branch5x5_2",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                  "branch_pool")
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        block(name, a_branches)
    block("Mixed_6a", ("branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                       "branch3x3dbl_3"))
    c_branches = ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        block(name, c_branches)
    block("Mixed_7a", ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                       "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"))
    e_branches = ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool")
    for name in ("Mixed_7b", "Mixed_7c"):
        block(name, e_branches)

    params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return params, stats
