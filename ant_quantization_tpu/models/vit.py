"""Quantized Vision Transformer (torchvision vit_b_16 architecture).

The reference quantizes torchvision's ViT by swapping nn.Conv2d (the patch
projection), every nn.Linear (MLP + head) and nn.MultiheadAttention (fused
in-projection + out-projection, Q/K/V sharing one quantized input) —
ant quant_model.py:17-28 + multihead_attention.py:214-687. Attention
matmuls stay full precision. Same structure here.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.config import QuantConfig
from ..nn.layers import QuantConv, QuantDense, QuantMultiHeadAttention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    num_classes: int = 1000

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def vit_b_16_config():
    return ViTConfig()


def vit_l_16_config():
    return ViTConfig(d_model=1024, n_layers=24, n_heads=16, d_ff=4096)


class EncoderBlock(nn.Module):
    cfg: ViTConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        h = QuantMultiHeadAttention(self.cfg.n_heads, self.qcfg,
                                    name="attn")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        h = QuantDense(self.cfg.d_ff, self.qcfg, name="mlp_1")(h)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default
        h = QuantDense(self.cfg.d_model, self.qcfg, name="mlp_2")(h)
        return x + h


class ViT(nn.Module):
    cfg: ViTConfig
    qcfg: QuantConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        # patchify: quantized conv projection (stride = kernel = patch)
        x = QuantConv(c.d_model, (c.patch_size, c.patch_size), self.qcfg,
                      strides=c.patch_size, padding=0, name="conv_proj")(x)
        B = x.shape[0]
        x = x.reshape(B, c.n_patches, c.d_model)

        cls = self.param("class_token", nn.initializers.zeros,
                         (1, 1, c.d_model))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.d_model)), x], 1)
        pos = self.param("pos_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (1, c.n_patches + 1, c.d_model))
        x = x + pos

        for i in range(c.n_layers):
            x = EncoderBlock(c, self.qcfg, name=f"encoder_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        return QuantDense(c.num_classes, self.qcfg, name="head")(x[:, 0])


def import_torchvision_vit(sd: Mapping[str, np.ndarray], cfg: ViTConfig):
    """torchvision vit_b_16 state_dict -> ViT params."""
    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    def lin(key):
        return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}

    params = {
        "conv_proj": {"kernel": np.transpose(sd["conv_proj.weight"],
                                             (2, 3, 1, 0)),
                      "bias": sd["conv_proj.bias"]},
        "class_token": sd["class_token"].reshape(1, 1, cfg.d_model),
        "pos_embedding": sd["encoder.pos_embedding"],
        "ln": ln("encoder.ln"),
        "head": lin("heads.head"),
    }
    for i in range(cfg.n_layers):
        b = f"encoder.layers.encoder_layer_{i}"
        # torchvision MLPBlock is a Sequential: linear at 0 and 3; newer
        # versions name them linear_1/linear_2 — accept both
        if f"{b}.mlp.0.weight" in sd:
            m1, m2 = f"{b}.mlp.0", f"{b}.mlp.3"
        else:
            m1, m2 = f"{b}.mlp.linear_1", f"{b}.mlp.linear_2"
        params[f"encoder_{i}"] = {
            "ln_1": ln(f"{b}.ln_1"),
            "ln_2": ln(f"{b}.ln_2"),
            "attn": {
                "in_proj": {
                    "kernel": sd[f"{b}.self_attention.in_proj_weight"].T,
                    "bias": sd[f"{b}.self_attention.in_proj_bias"]},
                "out_proj": lin(f"{b}.self_attention.out_proj"),
            },
            "mlp_1": lin(m1),
            "mlp_2": lin(m2),
        }
    return params
