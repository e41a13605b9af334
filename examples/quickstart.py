"""Quickstart: PTQ-quantize a decoder LM and serve it, end to end.

Runs anywhere (CPU included) in a couple of minutes with random weights;
point ``get_lm`` at a HuggingFace checkpoint directory (gpt2 / OPT /
BLOOM families, see harness/zoo.py) to serve real weights. The same
flow is what ``tools/serve_cli.py`` wraps as a CLI.

    python examples/quickstart.py

Steps:
  1. build a quantized-by-construction model (OliVe W4A4: adaptive
     int/flint numeric types + outlier-victim-pair encoding)
  2. calibrate on sample batches (MSE scale/type search, 3-sigma OVP
     thresholds; one functional pass, then frozen)
  3. lower to the serving engine (int8-value weight stacks, in-kernel
     A4 snap on the int8 MXU, INT8 KV cache, int8 lm_head)
  4. generate with the continuous-batching scheduler
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.harness.evaluate import calibrate_on_batches
from ant_quantization_tpu.models.transformer_lm import LMConfig, TransformerLM
from ant_quantization_tpu.nn.config import QuantConfig
from ant_quantization_tpu.serve import engine as eng
from ant_quantization_tpu.serve.scheduler import ContinuousBatcher, Request
from ant_quantization_tpu.serve.sampling import SamplingConfig

# ---- 1. model (a tiny GPT-style decoder; swap in zoo.get_lm for real ones)
lm = LMConfig(vocab_size=512, d_model=128, n_layers=2, n_heads=4,
              d_ff=256, max_seq=128, positions="learned",
              activation="gelu_new", fused_qkv=True)
qcfg = QuantConfig(mode="ant-int-flint", family="olive", wbit=4, abit=4)
model = TransformerLM(lm, qcfg)

rng = np.random.default_rng(0)
sample = jnp.asarray(rng.integers(0, lm.vocab_size, (4, 32)))
variables = model.init(jax.random.PRNGKey(0), sample)

# ---- 2. calibration (reference freeze semantics: statistics collected
# on the calibration batches, quantizers frozen afterwards)
quant = calibrate_on_batches(model, variables, [(sample,)], log=print)

# fake-quant forward — what accuracy evals (tools/clm_eval.py etc.) run
logits = model.apply({"params": variables["params"], "quant": quant},
                     sample)
print("fake-quant logits:", logits.shape)

# ---- 3. serving engine (real-quant: identical numerics to fake-quant,
# asserted by tests/test_ovp_serving.py + the whole-model oracles)
ecfg = eng.EngineConfig(lm=lm, weight_mode="w4", act_bits=4,
                        kv_int8=True, max_seq=128, lm_head_int8=True)
ep = eng.build_engine_params(ecfg, variables["params"], quant)
ep = jax.device_put(ep, jax.devices()[0])

# ---- 4. generate (continuous batching; sampling is reproducible)
cb = ContinuousBatcher(ecfg, ep, batch_slots=2, prefill_buckets=(32,),
                       sampling=SamplingConfig(temperature=0.0))
cb.submit(Request(prompt=list(map(int, sample[0, :8])), max_new_tokens=8))
cb.submit(Request(prompt=[7, 3, 99], max_new_tokens=8))
for c in cb.run():
    print(f"request {c.id}: {c.tokens} ({c.finish_reason})")
print("quickstart OK")
