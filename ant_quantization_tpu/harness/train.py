"""QAT / finetune training loops.

The reference has two trainers:
- ImageNet QAT (ant ImageNet/main.py:178-243): SGD momentum + MultiStepLR,
  a priming forward on the first batch followed by ``set_8_bit_layer_n``
  mixed-precision promotion, then STE training; per-epoch eval + checkpoint.
- BERT GLUE finetune (ant BERT/run_glue.py:599-646): BertAdam
  (warmup-linear Adam with weight decay), same first-batch promotion.

TPU-native shape: the step is one jitted function over a (dp, tp) mesh —
DDP's gradient all-reduce becomes GSPMD's psum, and the calibration
statistic all-reduces (quant_modules.py:517-531) disappear because
calibration runs once on a global batch. Quant state is *frozen* during
training steps (STE flows gradients through the snap), exactly like the
reference after its first-forward init.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..calibrate.promote import set_8_bit_layer_l, set_8_bit_layer_n
from ..utils.calibration import calibrate_model

__all__ = ["multi_step_lr", "warmup_linear", "sgd_multistep", "bert_adam",
           "TrainState", "make_classification_step", "make_lm_step",
           "prime_and_promote", "evaluate_classification"]


# ---------------------------------------------------------------------------
# Optimizers / schedules
# ---------------------------------------------------------------------------

def multi_step_lr(base_lr: float, milestones: Sequence[int],
                  gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR: lr * gamma^(#milestones passed). Milestones are in
    *epochs* in the reference (ImageNet/main.py); pass step-converted ones."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def warmup_linear(base_lr: float, warmup_proportion: float,
                  total_steps: int) -> optax.Schedule:
    """BertAdam's warmup-linear schedule (BERT/optimization.py): linear
    ramp to base_lr over warmup, then linear decay to 0."""
    warmup = max(int(total_steps * warmup_proportion), 1)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup),
         optax.linear_schedule(base_lr, 0.0, total_steps - warmup)],
        [warmup])


def sgd_multistep(base_lr: float, milestones: Sequence[int],
                  gamma: float = 0.1, momentum: float = 0.9,
                  weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """The ImageNet QAT optimizer (main.py:164-176 semantics)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(multi_step_lr(base_lr, milestones, gamma),
                  momentum=momentum))


def bert_adam(base_lr: float, total_steps: int,
              warmup_proportion: float = 0.1,
              weight_decay: float = 0.01) -> optax.GradientTransformation:
    """BertAdam equivalent: Adam + decoupled weight decay + warmup-linear."""
    return optax.adamw(warmup_linear(base_lr, warmup_proportion, total_steps),
                       b1=0.9, b2=0.999, eps=1e-6,
                       weight_decay=weight_decay)


# ---------------------------------------------------------------------------
# Train state + steps
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainState:
    params: Any
    quant: Any               # frozen during steps; rebuilt by calibration
    opt_state: Any
    extra: Dict[str, Any]    # batch_stats etc.
    step: int = 0


def _variables(state: TrainState) -> Dict[str, Any]:
    v = {"params": state.params, **state.extra}
    if state.quant is not None:
        v["quant"] = state.quant
    return v


def make_classification_step(model, tx: optax.GradientTransformation,
                             has_batch_stats: bool = False,
                             grad_accum: int = 1,
                             preprocess=None):
    """Jitted (state, images, labels) -> (state, loss). Softmax CE.

    ``grad_accum`` > 1 splits the batch into that many microbatches and
    accumulates gradients in a lax.scan — peak activation memory drops by
    ~grad_accum (the reference's BERT harness has the same
    gradient_accumulation_steps knob, run_glue.py:161-165). Batch must
    divide evenly. Numerics are identical (mean-of-means) only for models
    *without* batch statistics; with ``has_batch_stats=True`` (BN models
    like resnet18) BN normalizes per-microbatch and updates running stats
    once per microbatch, so activations and gradients differ from the
    full-batch step.

    ``preprocess`` (e.g. data.normalize_images for uint8 pipelines) is
    applied to the images INSIDE the jitted step — on-device
    normalization, the DALI split of host-decode / device-normalize.
    """

    @jax.jit
    def step(params, quant, extra, opt_state, images, labels):
        def loss_fn(params, extra, images, labels):
            if preprocess is not None:
                images = preprocess(images)
            variables = {"params": params, **extra}
            if quant is not None:
                variables["quant"] = quant
            if has_batch_stats:
                logits, upd = model.apply(variables, images, train=True,
                                          mutable=["batch_stats"])
                new_extra = {**extra, **upd}
            else:
                logits = model.apply(variables, images)
                new_extra = extra
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, new_extra

        if grad_accum == 1:
            (loss, new_extra), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, extra, images, labels)
        else:
            B = images.shape[0]
            assert B % grad_accum == 0, (B, grad_accum)
            mb = B // grad_accum
            im = images.reshape(grad_accum, mb, *images.shape[1:])
            lb = labels.reshape(grad_accum, mb, *labels.shape[1:])

            def micro(carry, batch):
                g_acc, l_acc, extra = carry
                (loss, extra), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, extra, *batch)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + loss, extra), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (grads, loss, new_extra), _ = jax.lax.scan(
                micro, (zeros, 0.0, extra), (im, lb))
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_extra, opt_state, loss

    def apply(state: TrainState, images, labels) -> Tuple[TrainState, float]:
        params, extra, opt_state, loss = step(
            state.params, state.quant, state.extra, state.opt_state,
            images, labels)
        return TrainState(params, state.quant, opt_state, extra,
                          state.step + 1), loss

    return apply


def make_lm_step(model, tx: optax.GradientTransformation):
    """Jitted causal-LM step: next-token CE over shifted ids."""

    @jax.jit
    def step(params, quant, opt_state, ids):
        def loss_fn(params):
            variables = {"params": params}
            if quant is not None:
                variables["quant"] = quant
            logits = model.apply(variables, ids)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], ids[:, 1:]).mean()
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def apply(state: TrainState, ids) -> Tuple[TrainState, float]:
        params, opt_state, loss = step(state.params, state.quant,
                                       state.opt_state, ids)
        return TrainState(params, state.quant, opt_state, state.extra,
                          state.step + 1), loss

    return apply


# ---------------------------------------------------------------------------
# Priming + mixed-precision promotion (the reference's first-batch flow,
# ImageNet/main.py:190-195, BERT/run_glue.py:604-613)
# ---------------------------------------------------------------------------

def prime_and_promote(model, variables: Dict[str, Any], batch_args: tuple,
                      n8: int = 0, layer_list: Optional[str] = None,
                      on_cpu: bool = True, **apply_kwargs) -> Dict[str, Any]:
    """Calibrate on one priming batch; optionally promote N highest-MSE
    sites (or an explicit list) to 8-bit and recalibrate. Returns the final
    'quant' collection."""
    _, quant = calibrate_model(model, variables, *batch_args,
                               on_cpu=on_cpu, **apply_kwargs)
    if layer_list:
        quant = set_8_bit_layer_l(quant, layer_list)
    elif n8 > 0:
        quant = set_8_bit_layer_n(quant, n8)
    else:
        return quant
    _, quant = calibrate_model(model, {**variables, "quant": quant},
                               *batch_args, on_cpu=on_cpu, **apply_kwargs)
    return quant


# ---------------------------------------------------------------------------
# Eval
# ---------------------------------------------------------------------------

def evaluate_classification(model, variables: Dict[str, Any],
                            batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                            topk: Tuple[int, ...] = (1, 5),
                            log_every: int = 0,
                            logger: Optional[Callable[[str], None]] = None,
                            journal: Optional[str] = None,
                            journal_every: int = 50,
                            journal_fingerprint: str = "",
                            preprocess=None):
    """Top-k accuracy over an eval stream (ImageNet/main.py:245-284).

    ``journal``: optional path for crash-resumable accumulation
    (harness/resilient.py) — a restarted eval skips already-folded
    batches instead of starting over. ``journal_fingerprint`` should
    identify the run configuration; a journal from a different
    configuration is discarded, not resumed."""
    from .resilient import ResumableAccumulator

    @jax.jit
    def logits_fn(variables, images):
        if preprocess is not None:
            images = preprocess(images)
        return model.apply(variables, images)

    acc = ResumableAccumulator(
        journal or "", init={f"correct{k}": 0 for k in topk} | {"total": 0},
        save_every=journal_every, fingerprint=journal_fingerprint)
    t0 = time.perf_counter()
    for i, (images, labels) in enumerate(batches):
        if acc.already_done(i):
            continue
        logits = np.asarray(logits_fn(variables, jnp.asarray(images)))
        order = np.argsort(-logits, axis=-1)
        contrib = {f"correct{k}": int(
            (order[:, :k] == labels[:, None]).any(axis=1).sum())
            for k in topk}
        contrib["total"] = len(labels)
        acc.fold(i, contrib)
        if log_every and logger and (i + 1) % log_every == 0:
            s = acc.state
            logger(f"eval batch {i + 1}: top1="
                   f"{s[f'correct{topk[0]}'] / max(s['total'], 1):.4f} "
                   f"n={s['total']} "
                   f"({s['total'] / (time.perf_counter() - t0):.1f} img/s)")
    state = acc.finalize()
    total = max(state["total"], 1)
    return {f"top{k}": state[f"correct{k}"] / total for k in topk}
