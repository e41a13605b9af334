"""Mixed-precision promotion: re-set the highest-MSE quantizer pairs to
8-bit — the reference's ``set_8_bit_layer_n`` / ``set_8_bit_layer_l``
(ant quant_model.py:62-149).

A "site" is one quantized layer holding a (weight_q, input_q) state pair.
Promotion is a pure transform over the 'quant' variable collection:
  - every state gets ``initialized=False`` (forces recalibration, matching
    the has_inited reset at quant_model.py:102)
  - the last two sites are always promoted (quant_model.py:117-121)
  - the top (n-2) remaining sites by summed pair MSE are promoted
    (quant_model.py:130-146; argsort of -mse, stable)
The caller then runs one calibration pass; ``bit >= 8`` in a state makes
the site recalibrate at 8-bit (see nn/layers._QuantSite).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .spec import QuantState

__all__ = ["quant_sites", "set_8_bit_layer_n", "set_8_bit_layer_l",
           "promoted_site_paths"]


def _natural_key(path: Tuple[str, ...]):
    key = []
    for comp in path:
        key.append(tuple(int(t) if t.isdigit() else t
                         for t in re.split(r"(\d+)", comp) if t))
    return key


def quant_sites(quant_tree: Dict[str, Any]) -> List[Tuple[Tuple[str, ...],
                                                          Dict[str, QuantState]]]:
    """Ordered (path, {'weight_q','input_q'}) site list.

    Order is a natural sort over module paths, which reproduces the
    reference's model-definition traversal (model.modules()) for models
    whose submodules are named in definition order (all of ours are).
    """
    sites = []

    def walk(node, path):
        if isinstance(node, dict):
            if "weight_q" in node and isinstance(node["weight_q"], QuantState):
                sites.append((path, node))
                return
            for k, v in node.items():
                walk(v, path + (k,))

    walk(dict(quant_tree), ())
    sites.sort(key=lambda s: _natural_key(s[0]))
    return sites


def _with(state: QuantState, **kw) -> QuantState:
    return state.replace(**kw)


def _rebuild(quant_tree, updates: Dict[Tuple[str, ...], Dict[str, QuantState]]):
    def walk(node, path):
        if isinstance(node, dict):
            if path in updates:
                return {**node, **updates[path]}
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(dict(quant_tree), ())


def _reset_all(sites):
    updates = {}
    for path, st in sites:
        updates[path] = {
            k: _with(v, initialized=jnp.asarray(False))
            for k, v in st.items() if isinstance(v, QuantState)}
    return updates


def _promote(updates, path):
    updates[path] = {k: _with(v, bit=jnp.asarray(8, jnp.int32))
                     for k, v in updates[path].items()}


def set_8_bit_layer_n(quant_tree, n: int):
    """Promote the last 2 sites + the (n-2) highest-MSE remaining sites.

    Returns the new quant collection; run a calibration pass afterwards.
    """
    assert n > 0
    sites = quant_sites(quant_tree)
    updates = _reset_all(sites)

    last = sites[-2:] if len(sites) >= 2 else sites
    for path, _ in last:
        _promote(updates, path)

    body = sites[: max(0, len(sites) - 2)]
    pair_mse = np.array([
        sum(float(v.mse) for v in st.values() if isinstance(v, QuantState))
        for _, st in body])
    take = n - 2
    if take > 0 and len(body):
        order = np.argsort(-pair_mse, kind="stable")
        for i in order[:take]:
            _promote(updates, body[i][0])
    return _rebuild(quant_tree, updates)


def set_8_bit_layer_l(quant_tree, layer_list):
    """Promote an explicit list of site indices (quant_model.py:62-87)."""
    if isinstance(layer_list, str):
        if layer_list == "None":
            return quant_tree
        layer_list = [int(t) for t in layer_list.split(",")]
    sites = quant_sites(quant_tree)
    updates = _reset_all(sites)
    for i in layer_list:
        _promote(updates, sites[i][0])
    return _rebuild(quant_tree, updates)


def promoted_site_paths(quant_tree) -> List[Tuple[str, ...]]:
    return [path for path, st in quant_sites(quant_tree)
            if any(int(v.bit) >= 8 for v in st.values()
                   if isinstance(v, QuantState))]
