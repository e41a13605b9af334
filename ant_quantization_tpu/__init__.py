"""ant_quantization_tpu — a TPU-native quantization framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
clevercool/ANT-Quantization (ANT [MICRO'22] + OliVe [ISCA'23]): adaptive
numeric types (int / PoT / APoT / float / flint selected per-tensor by MSE
search), outlier-victim-pair 4-bit encoding, calibration, mixed 4/8-bit
promotion, quantized model zoo, serving with INT8 KV-cache and GSPMD
sharding, and an analytic accelerator performance model.
"""

__version__ = "0.1.0"
