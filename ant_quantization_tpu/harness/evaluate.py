"""Evaluation loops: CLM perplexity, GLUE, calibration pre-pass.

Mirrors the reference flows:
- perplexity = exp(mean eval CE) via HF Trainer (olive llm/run_clm.py:652-666)
- OliVe's explicit calibration pre-pass over the *train* split before eval
  (olive bert/run_glue.py:539-546, run_qa.py:860)
- ANT's implicit first-batch calibration (quant_modules.py:468-470) is the
  same code path with n_batches=1.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..calibrate.promote import set_8_bit_layer_l, set_8_bit_layer_n
from ..utils.calibration import calibrate_model
from . import metrics as M

__all__ = ["calibrate_on_batches", "lm_perplexity", "glue_eval"]


def _reset_initialized(tree):
    """Set initialized=False on every QuantState (forces recalibration;
    promoted bits stay sticky — see nn/layers._QuantSite)."""
    from ..calibrate.spec import QuantState
    if isinstance(tree, QuantState):
        return tree.replace(initialized=jnp.asarray(False))
    if isinstance(tree, dict):
        return {k: _reset_initialized(v) for k, v in tree.items()}
    return tree


def calibrate_on_batches(model, variables: Dict[str, Any],
                         batches: Iterable[tuple], n8: int = 0,
                         layer_list: Optional[str] = None,
                         on_cpu: bool = True,
                         recalibrate_each: bool = False,
                         log: Optional[Callable[[str], None]] = None,
                         **apply_kwargs) -> Dict[str, Any]:
    """Run the calibration pass over a batch stream.

    Default semantics match the reference exactly: every quantizer
    calibrates on the **first** batch it sees and is frozen afterwards
    (the ``has_inited_quant_para`` short-circuit, olive
    quant_modules.py:261, ant :468-470) — later batches of the stream run
    forward but change no state, like the reference's
    ``quantize_batch_size`` loop (olive bert/run_glue.py:539-546).

    ``recalibrate_each=True`` is an explicit opt-in divergence: each batch
    recalibrates from scratch and the *last* batch's states win.

    Optional 8-bit promotion (``n8`` / ``layer_list``) resets the
    initialized flags (reference quant_model.py:102) and recalibrates on
    the first batch of the stream (the reference recalibrates on whatever
    forward comes next — its first eval batch; using the calibration
    batch keeps the state a pure function of the calibration stream)."""
    variables = dict(variables)
    quant = variables.get("quant")
    first = None
    for i, batch in enumerate(batches):
        if quant is not None:
            if recalibrate_each:
                quant = _reset_initialized(quant)
            variables["quant"] = quant
        _, quant = calibrate_model(model, variables, *batch,
                                   on_cpu=on_cpu, **apply_kwargs)
        if first is None:
            first = batch
        if log:
            log(f"calibration batch {i + 1} done")
    assert first is not None, "empty calibration stream"
    if layer_list:
        quant = set_8_bit_layer_l(quant, layer_list)
    elif n8 > 0:
        quant = set_8_bit_layer_n(quant, n8)
    else:
        return quant
    variables["quant"] = quant
    _, quant = calibrate_model(model, variables, *first,
                               on_cpu=on_cpu, **apply_kwargs)
    if log:
        log(f"promoted {n8 or layer_list} sites to 8-bit + recalibrated")
    return quant


def lm_perplexity(model, variables: Dict[str, Any], blocks: np.ndarray,
                  batch_size: int,
                  log: Optional[Callable[[str], None]] = None) -> Dict[str, float]:
    """Perplexity over (N, block) token blocks: mean over all shifted-token
    CE, exp'd (run_clm.py:652-666)."""

    @jax.jit
    def batch_loss(variables, ids):
        logits = model.apply(variables, ids)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits[:, :-1], ids[:, 1:])
        return ce.sum(), ce.size

    total, count = 0.0, 0
    n = (len(blocks) // batch_size) * batch_size
    for i in range(0, n, batch_size):
        s, c = batch_loss(variables, jnp.asarray(blocks[i:i + batch_size]))
        total += float(s)
        count += int(c)
        if log and (i // batch_size + 1) % 10 == 0:
            log(f"eval {i + batch_size}/{n} blocks, "
                f"ppl so far {M.perplexity(total / count):.3f}")
    loss = total / max(count, 1)
    return {"eval_loss": loss, "perplexity": M.perplexity(loss)}


def glue_eval(model, variables: Dict[str, Any], batches: Iterable[dict],
              task: str, regression: bool = False) -> Dict[str, float]:
    """GLUE metrics over encoded batches (dicts with input_ids /
    token_type_ids / attention_mask / labels)."""

    @jax.jit
    def logits_fn(variables, input_ids, token_type_ids, attention_mask):
        return model.apply(variables, input_ids, token_type_ids,
                           attention_mask)

    preds, labels = [], []
    for b in batches:
        logits = np.asarray(logits_fn(
            variables, jnp.asarray(b["input_ids"]),
            jnp.asarray(b.get("token_type_ids",
                              np.zeros_like(b["input_ids"]))),
            jnp.asarray(b["attention_mask"])))
        if regression:
            preds.extend(logits[:, 0].tolist())
        else:
            preds.extend(np.argmax(logits, axis=-1).tolist())
        labels.extend(np.asarray(b["labels"]).tolist())
    return M.glue_compute_metrics(task, preds, labels)
