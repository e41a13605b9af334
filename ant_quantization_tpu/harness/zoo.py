"""Model factory + on-disk checkpoint loading.

The reference's equivalents: ``get_model`` pulling pretrained torchvision
models (ant antquant/quant_utils.py:82-86) and
``AutoModelForCausalLM.from_pretrained`` (olive run_clm.py:469-477).

Here model construction is config-driven and weights come from local files:
- HF-format model directories: config.json + model*.safetensors (possibly
  sharded) or pytorch_model*.bin
- bare torch state-dict files (.pth/.pt/.bin) for the torchvision CNNs
- .npz archives (name -> array), the dependency-free interchange format

No network access is required or attempted.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models import bert as bert_mod
from ..models import cnn as cnn_mod
from ..models import import_hf
from ..models import resnet as resnet_mod
from ..models import vit as vit_mod
from ..models.transformer_lm import (LMConfig, TransformerLM, bloom_config,
                                     gpt2_config, opt_config)
from ..nn.config import QuantConfig

__all__ = ["load_state_dict_file", "load_hf_model_dir", "lm_config_from_hf",
           "get_lm", "get_image_model", "get_bert", "IMAGE_MODELS"]


# ---------------------------------------------------------------------------
# Raw weight-file loading
# ---------------------------------------------------------------------------

def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load one weight file: .safetensors, .npz, or torch .pth/.pt/.bin."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return {k: np.asarray(v, np.float32)
                for k, v in load_file(path).items()}
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k], np.float32) for k in z.files}
    # torch pickle (cpu-only torch is available in the image)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
            hasattr(v, "numpy") for v in sd["model"].values()):
        sd = sd["model"]
    return import_hf.torch_state_dict_to_numpy(sd)


def load_hf_model_dir(path: str) -> Tuple[dict, Dict[str, np.ndarray]]:
    """HF model directory -> (config dict, merged state_dict)."""
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    sd: Dict[str, np.ndarray] = {}
    files = sorted(os.listdir(path))
    st = [f for f in files if f.endswith(".safetensors")]
    bins = [f for f in files if f.endswith(".bin") and "pytorch_model" in f]
    for f in st or bins:
        sd.update(load_state_dict_file(os.path.join(path, f)))
    if not sd:
        raise FileNotFoundError(f"no weight files in {path}")
    return config, sd


# ---------------------------------------------------------------------------
# Decoder LMs (GPT-2 / OPT / BLOOM)
# ---------------------------------------------------------------------------

def lm_config_from_hf(config: dict) -> Tuple[str, LMConfig]:
    """Map an HF config.json to (family, LMConfig)."""
    mt = config.get("model_type", "")
    if mt == "gpt2":
        d = config["n_embd"]
        cfg = LMConfig(vocab_size=config["vocab_size"], d_model=d,
                       n_layers=config["n_layer"], n_heads=config["n_head"],
                       d_ff=config.get("n_inner") or 4 * d,
                       max_seq=config["n_positions"], positions="learned",
                       activation="gelu_new", fused_qkv=True)
        return "gpt2", cfg
    if mt == "opt":
        cfg = LMConfig(vocab_size=config["vocab_size"],
                       d_model=config["hidden_size"],
                       n_layers=config["num_hidden_layers"],
                       n_heads=config["num_attention_heads"],
                       d_ff=config["ffn_dim"],
                       max_seq=config["max_position_embeddings"],
                       positions="learned_offset2", activation="relu",
                       fused_qkv=False)
        return "opt", cfg
    if mt == "bloom":
        d = config.get("hidden_size") or config["n_embed"]
        cfg = LMConfig(vocab_size=config["vocab_size"], d_model=d,
                       n_layers=config.get("num_hidden_layers",
                                           config.get("n_layer")),
                       n_heads=config.get("num_attention_heads",
                                          config.get("n_head")),
                       d_ff=4 * d, max_seq=2048, positions="alibi",
                       activation="gelu", fused_qkv=True, embed_ln=True)
        return "bloom", cfg
    raise ValueError(f"unsupported model_type {mt!r}")


_LM_PRESETS = {
    "gpt2": lambda s: ("gpt2", gpt2_config(s or "small")),
    "opt": lambda s: ("opt", opt_config(s or "125m")),
    "bloom": lambda s: ("bloom", bloom_config(s or "560m")),
}


def get_lm(name_or_path: str, qcfg: QuantConfig,
           params: bool = True):
    """Build (model, cfg, params|None) for a decoder LM.

    ``name_or_path``: a local HF model dir, or a preset "family[:size]"
    (e.g. "opt:6.7b") for randomly initialized runs/smoke tests.
    """
    if os.path.isdir(name_or_path):
        config, sd = load_hf_model_dir(name_or_path)
        family, cfg = lm_config_from_hf(config)
        model = TransformerLM(cfg, qcfg)
        p = import_hf.IMPORTERS[family](sd, cfg) if params else None
        return model, cfg, p
    family, _, size = name_or_path.partition(":")
    family, cfg = _LM_PRESETS[family](size or None)
    return TransformerLM(cfg, qcfg), cfg, None


# ---------------------------------------------------------------------------
# Image classifiers
# ---------------------------------------------------------------------------

IMAGE_MODELS = ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
                "vgg16", "vgg16_bn", "alexnet", "vit_b_16", "vit_l_16",
                "inception_v3")


def get_image_model(name: str, qcfg: QuantConfig,
                    weights_path: Optional[str] = None):
    """Build (model, import_fn, params|None) for an image classifier.

    ``weights_path``: a torchvision state-dict file (.pth/.npz); its layout
    is converted by the per-model importer.
    """
    name = name.lower()
    if name.startswith("resnet"):
        cfg = getattr(resnet_mod, f"{name}_config")()
        model = resnet_mod.ResNet(cfg, qcfg)
        conv = lambda sd: resnet_mod.import_torchvision_resnet(sd, cfg)
    elif name in ("vgg16", "vgg16_bn"):
        bn = name.endswith("_bn")
        model = cnn_mod.VGG16(qcfg, with_bn=bn)
        if bn:
            conv = lambda sd: cnn_mod.import_torchvision_vgg16(sd, True)
        else:
            conv = lambda sd: (cnn_mod.import_torchvision_vgg16(sd), None)
    elif name == "alexnet":
        model = cnn_mod.AlexNet(qcfg)
        conv = lambda sd: (cnn_mod.import_torchvision_alexnet(sd), None)
    elif name in ("vit_b_16", "vit_l_16"):
        cfg = getattr(vit_mod, f"{name}_config")()
        model = vit_mod.ViT(cfg, qcfg)
        conv = lambda sd: (vit_mod.import_torchvision_vit(sd, cfg), None)
    elif name == "inception_v3":
        from ..models import inception as inc_mod
        cfg = inc_mod.inception_v3_config()
        model = inc_mod.InceptionV3(cfg, qcfg)
        conv = lambda sd: inc_mod.import_torchvision_inception(sd, cfg)
    else:
        raise ValueError(f"unknown image model {name!r}; "
                         f"choices: {IMAGE_MODELS}")

    if weights_path is None:
        return model, conv, None
    sd = load_state_dict_file(weights_path)
    out = conv(sd)
    params, batch_stats = out if isinstance(out, tuple) else (out, None)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    return model, conv, variables


# ---------------------------------------------------------------------------
# BERT / BART encoders (GLUE + SQuAD)
# ---------------------------------------------------------------------------

def _load_sd(weights_path: str) -> Dict[str, np.ndarray]:
    if os.path.isdir(weights_path):
        _, sd = load_hf_model_dir(weights_path)
        return sd
    return load_state_dict_file(weights_path)


def get_bert(size: str, qcfg: QuantConfig, head: str = "classification",
             num_labels: int = 2, weights_path: Optional[str] = None):
    cfg_fn = (bert_mod.bert_large_config if size == "large"
              else bert_mod.bert_base_config)
    cfg = cfg_fn(num_labels=num_labels)
    cls = (bert_mod.BertForQuestionAnswering if head == "qa"
           else bert_mod.BertForSequenceClassification)
    model = cls(cfg, qcfg)
    params = None
    if weights_path:
        params = bert_mod.import_hf_bert(_load_sd(weights_path), cfg,
                                         head=head)
    return model, cfg, params


def get_bart(size: str, qcfg: QuantConfig, head: str = "classification",
             num_labels: int = 2, weights_path: Optional[str] = None):
    from ..models import bart as bart_mod
    cfg_fn = (bart_mod.bart_large_config if size == "large"
              else bart_mod.bart_base_config)
    cfg = cfg_fn(num_labels=num_labels)
    cls = (bart_mod.BartForQuestionAnswering if head == "qa"
           else bart_mod.BartForSequenceClassification)
    model = cls(cfg, qcfg)
    params = None
    if weights_path:
        params = bart_mod.import_hf_bart(_load_sd(weights_path), cfg,
                                         head=head)
    return model, cfg, params


def get_encoder_model(family: str, size: str, qcfg: QuantConfig,
                      head: str = "classification", num_labels: int = 2,
                      weights_path: Optional[str] = None):
    fn = {"bert": get_bert, "bart": get_bart}[family]
    return fn(size, qcfg, head=head, num_labels=num_labels,
              weights_path=weights_path)
