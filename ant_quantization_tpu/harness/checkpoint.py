"""Checkpoint save/resume for params + quantizer calibration state.

The reference round-trips calibration through torch ``state_dict`` because
alpha is a Parameter and quant_grid/bit/has_inited are registered buffers
(ant quant_modules.py:39-42); ``load_ant_state_dict`` force-copies the grid
(quant_model.py:151-154), and the ImageNet harness saves
{model, epoch, optimizer, scheduler} each epoch (ImageNet/main.py:226-234).

Here the analog is direct: the 'quant' collection is already a pytree of
QuantState arrays, so one orbax save of
{params, quant, opt_state?, step?} captures everything; a restored
``initialized=True`` suppresses recalibration exactly like the reference's
restored has_inited_quant_para==1 (quant_modules.py:470).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(path: str):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Dict[str, Any], step: int = 0) -> str:
    """Save a pytree (e.g. {'params', 'quant', 'opt_state'}) under
    ``path/step_<n>``. Returns the concrete directory."""
    import orbax.checkpoint as ocp
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    tree = jax.tree_util.tree_map(np.asarray, tree)
    ocp.PyTreeCheckpointer().save(target, tree, force=True)
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(path)
             if d.startswith("step_") and d.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None,
                       step: Optional[int] = None) -> Dict[str, Any]:
    """Restore the pytree saved by :func:`save_checkpoint`.

    ``template`` (same structure, e.g. a freshly initialized variables
    dict) restores typed leaves — QuantState dataclasses keep their class,
    the load_ant_state_dict equivalent. Without it, raw nested dicts are
    returned.
    """
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    ckpt = ocp.PyTreeCheckpointer()
    if template is not None:
        template = jax.tree_util.tree_map(np.asarray, template)
        return ckpt.restore(target, item=template)
    return ckpt.restore(target)
