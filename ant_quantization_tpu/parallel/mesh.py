"""Device mesh + sharding rules (GSPMD tensor parallelism for the LM zoo).

The reference's only parallelism is NCCL data-parallel (SURVEY.md §2.8:
torch DDP over up to 4 GPUs). The TPU-native design replaces that with a
(dp, tp) jax.sharding.Mesh: data parallel over 'dp', Megatron-style tensor
parallel over 'tp' — qkv/fc_in column-parallel (output dim sharded), attn
out/fc_out row-parallel (input dim sharded), embeddings sharded over the
model dim. XLA/GSPMD inserts the all-reduces the reference did by hand via
torch.distributed; calibration collectives (quant_modules.py:517-531)
disappear entirely because calibration runs once, globally.

Per-channel quantization state (alpha over output channels) shards exactly
like its kernel's output dim, so fake-quant stays collective-free.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "LM_PARAM_RULES", "LM_QUANT_RULES", "spec_for_path",
           "shard_pytree", "lm_batch_spec"]


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("dp", "tp"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Default: all devices on the tp axis (single-host serving layout).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


# (regex over 'a/b/c' param path, PartitionSpec) — first match wins.
LM_PARAM_RULES = [
    (r"wte/embedding", P(None, "tp")),
    (r"wpe/embedding", P(None, "tp")),
    (r"attn/(qkv|q|k|v)/kernel", P(None, "tp")),     # column parallel
    (r"attn/(qkv|q|k|v)/bias", P("tp")),
    (r"attn/(out|out_proj)/kernel", P("tp", None)),  # row parallel
    (r"fc_in/kernel", P(None, "tp")),
    (r"fc_in/bias", P("tp")),
    (r"fc_out/kernel", P("tp", None)),
    (r"mlp_1/kernel", P(None, "tp")),
    (r"mlp_1/bias", P("tp")),
    (r"mlp_2/kernel", P("tp", None)),
    (r"lm_head/kernel", P(None, "tp")),
    (r".*", P()),                                     # LN, biases: replicate
]

# Quant states: per-channel alpha follows the kernel's output-dim sharding
# for column-parallel sites; everything else (grids, scalars) replicates.
LM_QUANT_RULES = [
    (r"attn/(qkv|q|k|v)/weight_q/alpha", P("tp")),
    (r"fc_in/weight_q/alpha", P("tp")),
    (r"mlp_1/weight_q/alpha", P("tp")),
    (r".*", P()),
]


def spec_for_path(path: str, rules) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield "/".join(prefix), tree


def shard_pytree(tree, mesh: Mesh, rules, leaf_rules=None):
    """device_put a nested-dict pytree with rule-derived NamedShardings.

    Leaves that are themselves structured (e.g. QuantState dataclasses) are
    sharded field-wise using the same path with the field name appended.
    """
    def place(path, leaf):
        if hasattr(leaf, "__dataclass_fields__"):  # flax.struct node
            kw = {}
            for f in leaf.__dataclass_fields__:
                sub = getattr(leaf, f)
                spec = spec_for_path(f"{path}/{f}", rules)
                spec = _clip_spec(spec, getattr(sub, "ndim", 0))
                kw[f] = jax.device_put(sub, NamedSharding(mesh, spec))
            return leaf.replace(**kw)
        spec = _clip_spec(spec_for_path(path, rules),
                          getattr(leaf, "ndim", 0))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, prefix + (k,)) for k, v in node.items()}
        return place("/".join(prefix), node)

    return walk(tree, ())


def _clip_spec(spec: P, ndim: int) -> P:
    if len(spec) > ndim:
        return P(*spec[:ndim]) if ndim else P()
    return spec


def lm_batch_spec() -> P:
    return P("dp", None)
