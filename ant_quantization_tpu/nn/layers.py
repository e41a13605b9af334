"""Quantized flax layers — the functional analog of the reference's module
surgery (Conv2dQuantizer / LinearQuantizer / Conv1dQuantizer,
ant quant_modules.py:582-647, olive quant_modules.py:358-450).

Instead of swapping nn.Module instances post-hoc, quantization is
intercepted at the dense/conv call sites: each layer owns two calibration
states (weight + input) in the ``'quant'`` variable collection.

Two-phase protocol (replaces the reference's first-forward lazy init):
  1. calibration:  ``model.apply(vars, x, mutable=['quant'])`` — every site
     (re)calibrates from the current weight and the incoming activation
     batch, mirroring "first batch" semantics (quant_modules.py:468-470).
  2. steady state: ``model.apply(vars, x)`` — frozen states, pure fake-quant
     forward (or a real packed-kernel forward on the serving path).

Mixed-precision promotion is a pure transform over the 'quant' collection
(see calibrate/promote.py) followed by one more calibration pass.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..calibrate.search import apply_quant, calibrate_jit
from ..calibrate.spec import QuantState, SiteConfig, placeholder_state
from .config import QuantConfig

Dtype = Any


class _QuantSite:
    """Helper binding one tensor quantizer (state variable + config)."""

    def __init__(self, mdl: nn.Module, name: str, cfg: SiteConfig,
                 num_channels: Optional[int]):
        self.cfg = cfg
        # disabled sites create no state: an unquantized model applies with
        # bare imported params (no 'quant' collection at all)
        self.var = None
        if cfg.enabled:
            self.var = mdl.variable("quant", name, placeholder_state,
                                    num_channels)
        self.calibrating = mdl.is_mutable_collection("quant")

    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.cfg.enabled:
            return x
        if self.calibrating:
            st = self.var.value
            # freeze-after-first: an already-initialized state is never
            # recalibrated — the reference's has_inited_quant_para
            # short-circuit (ant quant_modules.py:468-470, olive :261).
            # Promotion (calibrate/promote.py) resets the flag, which is
            # the only sanctioned way to force recalibration.
            # Promotion is sticky: a state previously set to 8-bit stays
            # 8-bit through recalibration (bit buffer persists in the
            # reference checkpoints too).
            init = st.initialized
            # sticky adaptive type on RE-calibration (bit > 0 marks a
            # previously calibrated state): the reference overwrites
            # self.mode with the concrete chosen type at first
            # calibration, so recalibration never re-adapts — only the
            # alpha ladder re-runs (see calibrate/search.py:_search_bit)
            prev_mode = jnp.where(st.bit > 0,
                                  jnp.asarray(st.mode_idx, jnp.int32),
                                  jnp.asarray(-1, jnp.int32))
            if isinstance(init, jax.core.Tracer):
                promoted = (st.bit >= 8 if self.cfg.bit < 8
                            else jnp.asarray(False))
                new = calibrate_jit(x.astype(jnp.float32), self.cfg,
                                    promoted=promoted, prev_mode=prev_mode)
                self.var.value = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(init, a, b), st, new)
            elif not bool(init):
                promoted = (st.bit >= 8 if self.cfg.bit < 8
                            else jnp.asarray(False))
                self.var.value = calibrate_jit(x.astype(jnp.float32),
                                               self.cfg, promoted=promoted,
                                               prev_mode=prev_mode)
        q = apply_quant(x.astype(jnp.float32), self.var.value, self.cfg)
        return q.astype(x.dtype)


class QuantDense(nn.Module):
    """Quantized dense layer (LinearQuantizer, quant_modules.py:620-647).

    Weight is quantized per-output-channel signed; input per-tensor. The
    flax kernel is (in, features): per-channel axis = -1, OVP pairs along
    the reduction axis (= the reference's row-major flat order of its
    (out, in) weight).

    ``channel_axis``/``pair_axis`` override the weight-quantizer axes for
    GPT-2-heritage Conv1D sites: the reference's Conv1dQuantizer (olive
    quant_modules.py:358-387) quantizes its (in, out)-stored weight
    per-channel over dim 0 — the INPUT dim — with OVP pairs along the
    row-major flat order, i.e. the out axis. Our kernel is stored
    (in, out) exactly like Conv1D, so conv1d semantics are
    ``channel_axis=0, pair_axis=1`` (models/transformer_lm.py sets them
    via LMConfig.conv1d_sites).
    """
    features: int
    qcfg: QuantConfig
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    channel_axis: int = -1
    pair_axis: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        wsite = _QuantSite(self, "weight_q",
                           self.qcfg.weight_site(
                               channel_axis=self.channel_axis,
                               pair_axis=self.pair_axis),
                           kernel.shape[self.channel_axis])
        asite = _QuantSite(self, "input_q", self.qcfg.input_site(), None)
        qk = wsite(kernel)
        qx = asite(x)
        dtype = self.dtype or self.qcfg.compute_dtype
        y = jnp.dot(qx.astype(dtype), qk.astype(dtype),
                    preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class QuantConv(nn.Module):
    """Quantized 2-D convolution (Conv2dQuantizer, quant_modules.py:582-617).

    NHWC activations, HWIO kernel; per-channel over O (axis -1).
    """
    features: int
    kernel_size: Tuple[int, int]
    qcfg: QuantConfig
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[Tuple[int, int], ...]] = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kshape = (*self.kernel_size,
                  x.shape[-1] // self.feature_group_count, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape,
                            self.param_dtype)
        wsite = _QuantSite(self, "weight_q",
                           self.qcfg.weight_site(channel_axis=-1, pair_axis=2),
                           self.features)
        asite = _QuantSite(self, "input_q", self.qcfg.input_site(), None)
        qk = wsite(kernel)
        qx = asite(x)
        dtype = self.dtype or self.qcfg.compute_dtype
        strides = (self.strides,) * 2 if isinstance(self.strides, int) \
            else self.strides
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        y = jax.lax.conv_general_dilated(
            qx.astype(dtype), qk.astype(dtype),
            window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            preferred_element_type=dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class QuantMultiHeadAttention(nn.Module):
    """Quantized MHA matching the reference's MultiheadAttentionQuantizer
    (ant multihead_attention.py:214-687): the fused in-projection and the
    out-projection are quantized (weight per-channel, shared quantized
    input for Q/K/V); the attention matmuls stay full precision.
    """
    num_heads: int
    qcfg: QuantConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        e = x.shape[-1]
        assert e % self.num_heads == 0
        hd = e // self.num_heads
        qkv = QuantDense(3 * e, self.qcfg, dtype=self.dtype,
                         name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], e)
        return QuantDense(e, self.qcfg, dtype=self.dtype,
                          name="out_proj")(out)
