"""WHOLE-MODEL parity against the reference implementation.

The per-tensor oracle (test_reference_oracle.py) proves each quantizer
matches; this file proves the *composition* does: the reference's own
``quantize_model`` surgery (ant quant_model.py:11-51) is run over real
multi-layer torch models (Conv2d+Linear CNN; nn.MultiheadAttention) with
the CUDA kernel shimmed, through calibration -> [promotion ->
recalibration] -> frozen forward, and the END LOGITS are compared against
our full pipeline (QuantConv/QuantDense/QuantMultiHeadAttention +
calibrate_on_batches + set_8_bit_layer_n) on identical imported weights.
This is the strongest accuracy-parity evidence available without
datasets: it catches site-wiring bugs (which quantizer feeds which
matmul, shared-input rules, promotion/recalibration interplay at model
scope) that no per-tensor test can see.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/ant_quantization/antquant"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as fnn  # noqa: E402

from ant_quantization_tpu.calibrate.promote import (  # noqa: E402
    promoted_site_paths, set_8_bit_layer_n)
from ant_quantization_tpu.harness.evaluate import (  # noqa: E402
    calibrate_on_batches)
from ant_quantization_tpu.nn.config import QuantConfig  # noqa: E402
from ant_quantization_tpu.nn.layers import (  # noqa: E402
    QuantConv, QuantDense, QuantMultiHeadAttention)

MODE = "ant-int-pot-flint"


def _install_shim():
    """Pure-torch quant_cuda.quant with the CUDA kernel's exact tie rule
    (scan updates on `<=`: last argmin wins, quant_kernel.cu:29-36)."""
    if "quant_cuda" in sys.modules:
        return
    mod = types.ModuleType("quant_cuda")

    def quant(x_flat, grid):
        d = (x_flat[:, None] - grid[None, :]).abs()
        g = grid.shape[0]
        idx = g - 1 - torch.argmin(d.flip(1), dim=1)
        return grid[idx].clone(), idx.to(torch.int32)

    mod.quant = quant
    sys.modules["quant_cuda"] = mod


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """The reference's quant_modules + quant_model + quant_args, imported
    from /root/reference with CUDA/torchvision shimmed."""
    _install_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch.distributed as dist
    if not dist.is_initialized():
        f = tmp_path_factory.mktemp("pg") / "store"
        dist.init_process_group("gloo", init_method=f"file://{f}",
                                rank=0, world_size=1)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    import importlib.util
    import quant_modules
    import quant_utils
    spec = importlib.util.spec_from_file_location(
        "ref_quant_model", os.path.join(REF, "quant_model.py"))
    qm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qm)
    args = types.SimpleNamespace(mode=MODE, wbit=4, abit=4,
                                 w_low=75, w_up=150, a_low=75, a_up=150,
                                 percent=100, search=False)
    quant_utils.quant_args.clear()
    quant_utils.quant_args.update(mode=args.mode, wbit=4, abit=4, args=args)
    return types.SimpleNamespace(qm=qm, quant_modules=quant_modules,
                                 quant_args=quant_utils.quant_args)


def _qcfg():
    return QuantConfig(mode=MODE, wbit=4, abit=4,
                       w_low=75, w_up=150, a_low=75, a_up=150)


# ---------------------------------------------------------------------------
# CNN: Conv2d x2 + Linear x2 through quantize_model + promotion
# ---------------------------------------------------------------------------

class _FlaxCNN(fnn.Module):
    qcfg: QuantConfig

    @fnn.compact
    def __call__(self, x):                      # x: (N, H, W, C)
        x = QuantConv(8, (3, 3), self.qcfg, strides=2, padding=1,
                      name="conv0")(x)
        x = fnn.relu(x)
        x = QuantConv(16, (3, 3), self.qcfg, strides=2, padding=1,
                      name="conv1")(x)
        x = fnn.relu(x)
        # torch flattens (N, C, H, W): permute so fc weights correspond
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = fnn.relu(QuantDense(32, self.qcfg, name="fc0")(x))
        return QuantDense(10, self.qcfg, name="fc1")(x)


def _torch_cnn(seed=0):
    import torch.nn as nn
    g = torch.Generator().manual_seed(seed)
    def init(t):
        return t.normal_(0, 0.5, generator=g)
    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, stride=2, padding=1), nn.ReLU(),
        nn.Conv2d(8, 16, 3, stride=2, padding=1), nn.ReLU(),
        nn.Flatten(), nn.Linear(16 * 4 * 4, 32), nn.ReLU(),
        nn.Linear(32, 10))
    with torch.no_grad():
        for p in m.parameters():
            init(p.data)
    return m


def _import_cnn_params(tm):
    mods = [m for m in tm.modules()
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Linear))]
    c0, c1, f0, f1 = mods

    def conv(m):
        return {"kernel": jnp.asarray(
                    m.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def lin(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    return {"conv0": conv(c0), "conv1": conv(c1),
            "fc0": lin(f0), "fc1": lin(f1)}


def test_cnn_quantize_model_end_logits(ref):
    rng = np.random.default_rng(0)
    x_cal = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    x_eval = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)

    tm = _torch_cnn()
    qt = ref.qm.quantize_model(tm)
    qt.eval()
    with torch.no_grad():
        qt(torch.from_numpy(x_cal))                  # calibrates
        ref_logits = qt(torch.from_numpy(x_eval)).numpy()

    model = _FlaxCNN(_qcfg())
    params = _import_cnn_params(tm)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    quant = calibrate_on_batches(model, {"params": params},
                                 [(nhwc(x_cal),)])
    got = np.asarray(model.apply({"params": params, "quant": quant},
                                 nhwc(x_eval)))

    # same per-site chosen numeric types as the reference surgery
    ref_sites = [m for m in qt.modules()
                 if type(m).__name__ in ("Conv2dQuantizer",
                                         "LinearQuantizer")]
    cfg = _qcfg().weight_site(channel_axis=-1, pair_axis=0)
    for name, rs in zip(("conv0", "conv1", "fc0", "fc1"), ref_sites):
        ours = cfg.candidate_modes[int(quant[name]["weight_q"].mode_idx)]
        assert ours == rs.quant_weight.mode, (name, ours,
                                              rs.quant_weight.mode)
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)

    # ---- promotion: set_8_bit_layer_n(3) + recalibration on batch 2 ----
    x2 = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    ref.qm.set_8_bit_layer_n(qt, 3)
    with torch.no_grad():
        qt(torch.from_numpy(x2))                     # recalibrates
        ref_logits8 = qt(torch.from_numpy(x_eval)).numpy()
    ref_bits = [int(s.quant_weight.bit.item()) for s in ref_sites]

    q8 = set_8_bit_layer_n(quant, 3)
    q8 = calibrate_on_batches(model, {"params": params, "quant": q8},
                              [(nhwc(x2),)])
    our_bits = [int(q8[n]["weight_q"].bit)
                for n in ("conv0", "conv1", "fc0", "fc1")]
    assert our_bits == ref_bits, (our_bits, ref_bits)
    assert len(promoted_site_paths(q8)) == 3
    got8 = np.asarray(model.apply({"params": params, "quant": q8},
                                  nhwc(x_eval)))
    np.testing.assert_allclose(got8, ref_logits8, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# MHA: nn.MultiheadAttention through quantize_model (shared quantized
# input for Q/K/V, FP attention matmuls, quantized out-proj input)
# ---------------------------------------------------------------------------

class _FlaxMHA(fnn.Module):
    qcfg: QuantConfig

    @fnn.compact
    def __call__(self, x):                      # (N, L, E)
        return QuantMultiHeadAttention(4, self.qcfg, name="mha")(x)


def test_mha_quantize_model_end_output(ref):
    import torch.nn as nn
    E, H, L, N = 32, 4, 6, 3
    torch.manual_seed(1)
    tm = nn.MultiheadAttention(E, H, batch_first=True)
    rng = np.random.default_rng(2)
    x_cal = rng.normal(size=(N, L, E)).astype(np.float32)
    x_eval = rng.normal(size=(N, L, E)).astype(np.float32)

    qt = ref.qm.quantize_model(tm)
    qt.eval()
    with torch.no_grad():
        qt(torch.from_numpy(x_cal), torch.from_numpy(x_cal),
           torch.from_numpy(x_cal))
        ref_out, _ = qt(torch.from_numpy(x_eval), torch.from_numpy(x_eval),
                        torch.from_numpy(x_eval))
    ref_out = ref_out.numpy()

    params = {"mha": {
        "in_proj": {"kernel": jnp.asarray(
                        tm.in_proj_weight.detach().numpy().T),
                    "bias": jnp.asarray(tm.in_proj_bias.detach().numpy())},
        "out_proj": {"kernel": jnp.asarray(
                         tm.out_proj.weight.detach().numpy().T),
                     "bias": jnp.asarray(
                         tm.out_proj.bias.detach().numpy())}}}
    model = _FlaxMHA(_qcfg())
    quant = calibrate_on_batches(model, {"params": params},
                                 [(jnp.asarray(x_cal),)])
    got = np.asarray(model.apply({"params": params, "quant": quant},
                                 jnp.asarray(x_eval)))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)
