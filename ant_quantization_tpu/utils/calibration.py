"""Model-level calibration drivers.

The reference calibrates lazily inside the first forward pass (ant
quant_modules.py:468-470), with a sequential cascade: layer i quantizes its
weights/inputs *before* layer i+1 sees its activations, so later layers
calibrate against already-quantized upstream outputs. We preserve that
cascade exactly.

Execution strategy: the calibration forward runs *eagerly* (op-by-op), so
each quant site dispatches the per-shape cached ``calibrate_jit``
executable; a whole-model jitted calibration would inline every site's
scan ladder into one enormous HLO that compiles for many minutes at scale.
On a remote-TPU backend eager dispatch pays a network round trip per op,
so by default the calibration pass runs on the host CPU backend (one-time
cost) and the resulting states are then device_put back. The serving
engine has a per-block TPU-side driver for large LMs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

__all__ = ["calibrate_model"]


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def calibrate_model(model, variables: dict, *args, on_cpu: bool = True,
                    **kwargs):
    """Run one calibration forward; returns (output, quant_collection).

    ``variables`` must contain 'params' (+ optionally previous 'quant' for
    promotion-aware recalibration, and 'batch_stats' etc.).
    """
    cpu = _cpu_device() if on_cpu else None
    if cpu is not None:
        variables = jax.device_put(variables, cpu)
        args = jax.device_put(args, cpu)
        ctx = jax.default_device(cpu)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        out, upd = model.apply(variables, *args, mutable=["quant"], **kwargs)
    return out, upd["quant"]
