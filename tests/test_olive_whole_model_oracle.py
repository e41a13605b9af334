"""OliVe WHOLE-MODEL parity: reference surgery -> our fake-quant -> our
serving engine, over one small transformer LM.

The per-tensor OliVe oracles (test_reference_oracle.py) prove each
quantizer matches and test_ovp_serving.py proves engine == fake-quant per
site; this file closes the MODEL-scope chain for the flagship OliVe
configuration:

  1. the reference's olive ``quantize_model`` surgery
     (olive_quantization/antquant/quant_model.py:12-52 — Linear ->
     LinearQuantizer, transformers Conv1D -> Conv1dQuantizer, lm_head
     skipped) + first-forward 3-sigma calibration + OVP forward
     (quant_modules.py:258-330) over a small torch LM with BOTH Linear
     and Conv1D sites,
  2. vs our fake-quant pipeline (TransformerLM + calibrate_on_batches)
     on identical imported weights — end logits equal,
  3. vs ``build_engine_params`` + ``eng.forward`` real-quant serving on
     the same weights and quant states — end logits equal again,
  4. plus ``set_8_bit_layer_n`` promotion + recalibration parity
     (olive quant_model.py:90-132 — note it ALSO promotes the last
     2 x 2 quantizers unconditionally; n=3 exercises the MSE-ranked pick too).

The torch model mirrors TransformerLM's architecture exactly (pre-LN
blocks, gelu_new MLP, tied lm_head): attention projections are
``pytorch_utils.Conv1D`` (GPT-2-heritage — the reference quantizes their
(in, out) weights per-IN-channel, which LMConfig.conv1d_sites
reproduces) and MLP projections are ``nn.Linear``.
"""

import os
import sys
import types

import numpy as np
import pytest

OREF = "/root/reference/olive_quantization/antquant"
pytestmark = pytest.mark.skipif(not os.path.isdir(OREF),
                                reason="reference checkout not available")

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from ant_quantization_tpu.harness.evaluate import (  # noqa: E402
    calibrate_on_batches)
from ant_quantization_tpu.nn.config import QuantConfig  # noqa: E402
from ant_quantization_tpu.models.transformer_lm import (  # noqa: E402
    LMConfig, TransformerLM)
from ant_quantization_tpu.serve import engine as eng  # noqa: E402

MODE = "ant-int-flint"     # the OliVe flagship adaptive pair
V, D, NH, FF, NL, T = 96, 32, 4, 64, 2, 8


def _install_shim():
    """Pure-torch quant_cuda.quant with the CUDA kernel's exact tie rule
    (scan updates on `<=`: last argmin wins)."""
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
def oref():
    """olive quant_modules + quant_model, loaded as an isolated module
    set (both reference forks name their modules quant_modules /
    quant_utils, so sys.modules is swapped around the exec)."""
    _install_shim()
    import importlib.util

    saved = {k: sys.modules.get(k) for k in ("quant_modules", "quant_utils")}

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        return spec, m

    try:
        spec_qm, qmod = load("quant_modules",
                             os.path.join(OREF, "quant_modules.py"))
        spec_qm.loader.exec_module(qmod)
        # quant_utils imports torchvision (unused here); shim if absent
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tvm = types.ModuleType("torchvision.models")
            tv.models = tvm
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tvm
        spec_qu, qutil = load("quant_utils",
                              os.path.join(OREF, "quant_utils.py"))
        spec_qu.loader.exec_module(qutil)
        spec_md, qmodel = load("olive_ref_quant_model",
                               os.path.join(OREF, "quant_model.py"))
        spec_md.loader.exec_module(qmodel)
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)

    args = types.SimpleNamespace(mode=MODE, wbit=4, abit=4,
                                 w_low=75, w_up=250, a_low=75, a_up=250,
                                 percent=100, search=False,
                                 no_outlier=False)
    qutil.quant_args.clear()
    qutil.quant_args.update(mode=MODE, wbit=4, abit=4, args=args)
    return types.SimpleNamespace(qm=qmodel, quant_modules=qmod,
                                 quant_args=qutil.quant_args)


def _qcfg():
    return QuantConfig(mode=MODE, wbit=4, abit=4, family="olive",
                       w_low=75, w_up=250, a_low=75, a_up=250)


def _lmcfg():
    return LMConfig(vocab_size=V, d_model=D, n_layers=NL, n_heads=NH,
                    d_ff=FF, max_seq=32, positions="learned",
                    activation="gelu_new", fused_qkv=True,
                    conv1d_sites=("qkv", "out"))


class _TorchBlock(torch.nn.Module):
    """Pre-LN block mirroring models/transformer_lm.py:Block — attention
    projections are Conv1D (GPT-2 heritage), the MLP is nn.Linear, so the
    reference surgery exercises Conv1dQuantizer AND LinearQuantizer."""

    def __init__(self):
        super().__init__()
        from transformers.pytorch_utils import Conv1D
        self.ln_1 = torch.nn.LayerNorm(D)
        self.qkv = Conv1D(3 * D, D)
        self.out = Conv1D(D, D)
        self.ln_2 = torch.nn.LayerNorm(D)
        self.fc_in = torch.nn.Linear(D, FF)
        self.fc_out = torch.nn.Linear(FF, D)

    def forward(self, x):
        B, S, _ = x.shape
        hd = D // NH
        h = self.ln_1(x)
        q, k, v = self.qkv(h).split(D, dim=2)
        q = q.view(B, S, NH, hd)
        k = k.view(B, S, NH, hd)
        v = v.view(B, S, NH, hd)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
        s = s.masked_fill(~mask, torch.finfo(s.dtype).min)
        a = torch.softmax(s, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, S, D)
        x = x + self.out(o)
        h = self.ln_2(x)
        h = self.fc_in(h)
        h = 0.5 * h * (1.0 + torch.tanh(
            np.sqrt(2.0 / np.pi) * (h + 0.044715 * torch.pow(h, 3.0))))
        x = x + self.fc_out(h)
        return x


class _TorchLM(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.wte = torch.nn.Embedding(V, D)
        self.wpe = torch.nn.Embedding(32, D)
        self.h = torch.nn.ModuleList([_TorchBlock() for _ in range(NL)])
        self.ln_f = torch.nn.LayerNorm(D)

    def forward(self, ids):
        x = self.wte(ids) + self.wpe(torch.arange(ids.shape[1]))
        for blk in self.h:
            x = blk(x)
        x = self.ln_f(x)
        return x @ self.wte.weight.T      # tied lm_head (never quantized)


def _torch_lm(seed=0):
    torch.manual_seed(seed)
    m = _TorchLM()
    with torch.no_grad():
        # heavy-ish tails so OVP outliers + victims actually occur
        for name, p in m.named_parameters():
            if p.ndim >= 2:
                p.data = p.data * 3.0
    return m


def _import_params(tm):
    """torch state -> TransformerLM param pytree (Conv1D weights are
    (in, out) already; Linear transposes)."""
    def lin(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def c1d(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    p = {"wte": {"embedding": jnp.asarray(tm.wte.weight.detach().numpy())},
         "wpe": {"embedding": jnp.asarray(tm.wpe.weight.detach().numpy())},
         "ln_f": {"scale": jnp.asarray(tm.ln_f.weight.detach().numpy()),
                  "bias": jnp.asarray(tm.ln_f.bias.detach().numpy())}}
    for i, blk in enumerate(tm.h):
        p[f"h_{i}"] = {
            "ln_1": {"scale": jnp.asarray(blk.ln_1.weight.detach().numpy()),
                     "bias": jnp.asarray(blk.ln_1.bias.detach().numpy())},
            "ln_2": {"scale": jnp.asarray(blk.ln_2.weight.detach().numpy()),
                     "bias": jnp.asarray(blk.ln_2.bias.detach().numpy())},
            "attn": {"qkv": c1d(blk.qkv), "out": c1d(blk.out)},
            "fc_in": lin(blk.fc_in), "fc_out": lin(blk.fc_out),
        }
    return p


def _ref_sites(qt, oref):
    """TensorQuantizer list in the reference's module order."""
    return [m for m in qt.modules()
            if isinstance(m, oref.quant_modules.TensorQuantizer)]


def test_olive_lm_full_chain(oref):
    rng = np.random.default_rng(0)
    ids_cal = rng.integers(0, V, (2, T))
    ids_eval = rng.integers(0, V, (2, T))

    tm = _torch_lm()
    qt = oref.qm.quantize_model(tm)
    qt.eval()
    with torch.no_grad():
        qt(torch.from_numpy(ids_cal))                   # calibrates (3-sigma
        ref_logits = qt(torch.from_numpy(ids_eval)).numpy()   # + OVP)

    # sanity: the chain must actually exercise BOTH site kinds and real
    # outliers, or the test proves less than it claims
    kinds = {type(m).__name__ for m in qt.modules()}
    assert {"Conv1dQuantizer", "LinearQuantizer"} <= kinds, kinds

    # ---- leg 2: our fake-quant pipeline on identical weights ----
    cfg, qcfg = _lmcfg(), _qcfg()
    model = TransformerLM(cfg, qcfg)
    params = _import_params(tm)
    quant = calibrate_on_batches(model, {"params": params},
                                 [(jnp.asarray(ids_cal),)])
    got = np.asarray(model.apply({"params": params, "quant": quant},
                                 jnp.asarray(ids_eval)))

    # chosen adaptive types must match the reference site-by-site (weight
    # quantizers are the even entries of the reference's ordered list)
    wsite_cfg = qcfg.weight_site()
    names = [("attn", "qkv"), ("attn", "out"), (None, "fc_in"),
             (None, "fc_out")]
    rs = _ref_sites(qt, oref)
    for li in range(NL):
        for j, (par, site) in enumerate(names):
            node = (quant[f"h_{li}"]["attn"][site] if par
                    else quant[f"h_{li}"][site])
            ours = wsite_cfg.candidate_modes[
                int(node["weight_q"].mode_idx)]
            ref_q = rs[(li * 4 + j) * 2]
            assert ours == ref_q.mode, (li, site, ours, ref_q.mode)
    any_outlier = any(
        bool(np.any(np.abs(np.asarray(
            (quant[f"h_{li}"]["attn"][s] if p else quant[f"h_{li}"][s])
            ["weight_q"].outliers)) > 0))
        for li in range(NL) for p, s in names)
    assert any_outlier, "no OVP outliers occurred — weights too tame"
    np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)

    # ---- leg 3: real-quant serving engine on the same states ----
    ecfg = eng.EngineConfig(lm=cfg, weight_mode="w4", act_bits=4,
                            kv_int8=False, max_seq=32, dtype=jnp.float32,
                            interpret=True)
    ep = eng.build_engine_params(ecfg, params, quant)
    kv = eng.init_cache(ecfg, 2)
    served, _ = eng.forward(ecfg, ep, jnp.asarray(ids_eval), kv, 0)
    np.testing.assert_allclose(np.asarray(served), ref_logits,
                               rtol=2e-4, atol=2e-4)

    # ---- leg 4: set_8_bit_layer_n promotion + recalibration ----
    from ant_quantization_tpu.calibrate.promote import set_8_bit_layer_n
    ids2 = rng.integers(0, V, (2, T))
    oref.qm.set_8_bit_layer_n(qt, 3)
    with torch.no_grad():
        qt(torch.from_numpy(ids2))                      # recalibrates
        ref_logits8 = qt(torch.from_numpy(ids_eval)).numpy()
    ref_bits = [int(s.bit.item()) for s in _ref_sites(qt, oref)]

    q8 = set_8_bit_layer_n(quant, 3)
    q8 = calibrate_on_batches(model, {"params": params, "quant": q8},
                              [(jnp.asarray(ids2),)])
    our_bits = []
    for li in range(NL):
        for par, site in names:
            node = (q8[f"h_{li}"]["attn"][site] if par
                    else q8[f"h_{li}"][site])
            our_bits += [int(node["weight_q"].bit),
                         int(node["input_q"].bit)]
    assert our_bits == ref_bits, (our_bits, ref_bits)
    got8 = np.asarray(model.apply({"params": params, "quant": q8},
                                  jnp.asarray(ids_eval)))
    np.testing.assert_allclose(got8, ref_logits8, rtol=2e-4, atol=2e-4)
