"""Optimizer + LR schedule construction (optax).

Reference parity: visreps/utils.py:826-893 —
  * weight-decay split: no decay on biases / 1-D params;
  * adam / adamw / sgd (momentum 0.9);
  * schedules stepped per EPOCH: steplr (step 10, γ 0.1), multisteplr
    (30/60/90% milestones), cosine (eta_min = 5%·lr), each optionally
    preceded by a LinearLR warmup from 0.25× over warmup_epochs.
Optax schedules are per-step; epoch-granular semantics are preserved by
evaluating the reference's epoch formula at step // steps_per_epoch.

Additional TPU concern: frozen-layer masks (CustomCNN trainability
strings) are applied with optax.multi_transform so frozen parameters
receive zero updates — the functional analog of requires_grad=False.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def lr_at_epoch(cfg, completed_epochs: int) -> float:
    """Reference scheduler value after ``completed_epochs`` steps."""
    base = cfg.learning_rate
    warmup = cfg.get("warmup_epochs", 0)
    total = cfg.num_epochs
    t_max = total - warmup if warmup > 0 else total
    name = cfg.get("lr_scheduler", "cosineannealinglr").lower()

    if warmup > 0 and completed_epochs < warmup:
        return base * (0.25 + 0.75 * completed_epochs / warmup)
    t = completed_epochs - warmup if warmup > 0 else completed_epochs

    if name == "steplr":
        return base * (0.1 ** (t // 10))
    if name == "multisteplr":
        milestones = [int(t_max * 0.3), int(t_max * 0.6), int(t_max * 0.9)]
        return base * (0.1 ** sum(t >= m for m in milestones))
    if name == "cosineannealinglr":
        eta_min = base * 0.05
        return eta_min + (base - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2
    raise ValueError(f"Invalid LR scheduler name: {name}")


def make_schedule(cfg, steps_per_epoch: int):
    """Per-step optax schedule with per-epoch granularity."""
    # Precompute the per-epoch table once (host side) — the schedule is
    # then a cheap gather inside the jitted update.
    table = jnp.asarray(
        [lr_at_epoch(cfg, e) for e in range(cfg.num_epochs + 1)], jnp.float32
    )

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, cfg.num_epochs)
        return table[epoch]

    return schedule


def _decay_mask(params):
    """True for weight-decayed params: ndim > 1 (not biases/BN).

    Reference: visreps/utils.py:832-838.
    """
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def _trainable_labels(params, trainable_mask: dict | None):
    """Top-level-module labels: 'train' or 'frozen'."""
    if not trainable_mask:
        return jax.tree_util.tree_map(lambda _: "train", params)

    def label_subtree(flag, sub):
        return jax.tree_util.tree_map(lambda _: "train" if flag else "frozen", sub)

    return {k: label_subtree(trainable_mask.get(k, True), v) for k, v in params.items()}


def setup_optimizer(params, cfg, steps_per_epoch: int, trainable_mask: dict | None = None):
    """Build the optax chain: clip → optimizer(wd mask) → freeze mask."""
    schedule = make_schedule(cfg, steps_per_epoch)
    name = cfg.optimizer.lower()
    wd = cfg.get("weight_decay", 0.0)

    if name == "adam":
        tx = optax.adam(schedule)
    elif name == "adamw":
        tx = optax.adamw(schedule, weight_decay=wd, mask=_decay_mask)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"Unknown optimizer: {cfg.optimizer}")

    grad_clip = cfg.get("grad_clip", 0)
    parts = []
    if grad_clip and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(tx)
    tx = optax.chain(*parts)

    if trainable_mask and not all(trainable_mask.values()):
        labels = _trainable_labels(params, trainable_mask)
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)

    return tx, schedule


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.1):
    """Label-smoothed softmax CE (reference: trainer.py:30,
    nn.CrossEntropyLoss(label_smoothing=0.1))."""
    n_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n_classes)
    soft = one_hot * (1 - label_smoothing) + label_smoothing / n_classes
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))
