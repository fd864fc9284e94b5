"""Optimizer + LR-schedule factories (optax), reference-config-compatible.

Mirrors the reference's string-keyed dispatch (reference:
models/mcat/main.py:287-307):

* ``sgd``      -> SGD(lr), no weight decay (the reference's sgd branch passes
                  none, mcat/main.py:288-289)
* ``adadelta`` -> Adadelta(lr, weight_decay)
* ``adamax``   -> Adamax(lr, weight_decay)
* ``adam``     -> Adam(lr, weight_decay) — also the fallback for unknown names
                  (mcat/main.py:296-299)
* ``rms``      -> RMSprop(lr, weight_decay). The reference *advertises* rms in
                  config comments (config.yaml:61) but silently falls through
                  to adam; implemented properly here (SURVEY.md §7.1 caveat 5).

Weight decay matches torch semantics (L2 added to the gradient, not decoupled
AdamW). The ``exp`` scheduler multiplies lr by gamma **per epoch** like
torch ExponentialLR (mcat/main.py:302-305, 82-85); the learning rate lives in
``inject_hyperparams`` so the epoch driver can step it without rebuilding
optimizer state.
"""

from __future__ import annotations

import optax


def _with_decay(tx: optax.GradientTransformation, weight_decay: float):
    if weight_decay and weight_decay > 0.0:
        return optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def make_optimizer(
    name: str,
    lr: float,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Build the optimizer; learning_rate is injected as a mutable hyperparam.

    ``grad_clip`` > 0 clips the GLOBAL gradient norm before the update (and
    before weight decay is added, so decay is never scaled by the clip) —
    torch.nn.utils.clip_grad_norm_ semantics. The reference has no clipping;
    0 (the default) keeps its behavior exactly.
    """

    name = (name or "adam").lower()

    def _clip(tx: optax.GradientTransformation):
        if grad_clip and grad_clip > 0.0:
            return optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    @optax.inject_hyperparams
    def build(learning_rate):
        if name == "sgd":
            return _clip(optax.sgd(learning_rate))
        if name == "adadelta":
            return _clip(_with_decay(optax.adadelta(learning_rate), weight_decay))
        if name == "adamax":
            return _clip(_with_decay(optax.adamax(learning_rate), weight_decay))
        if name == "rms":
            return _clip(_with_decay(
                optax.rmsprop(learning_rate, decay=0.99, eps=1e-8), weight_decay
            ))
        # default / fallback: adam (torch defaults betas=(0.9, 0.999), eps=1e-8)
        return _clip(_with_decay(
            optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8), weight_decay
        ))

    return build(learning_rate=lr)


def current_lr(opt_state) -> float:
    """Read the injected learning rate (mirrors optimizer.param_groups[0]['lr'],
    mcat/main.py:83)."""
    return float(opt_state.hyperparams["learning_rate"])


def step_exponential(opt_state, gamma: float):
    """Per-epoch ExponentialLR step: lr *= gamma (mcat/main.py:84)."""
    opt_state.hyperparams["learning_rate"] = (
        opt_state.hyperparams["learning_rate"] * gamma
    )
    return opt_state


def set_lr(opt_state, lr: float):
    """Absolutely set the injected learning rate (epoch-indexed schedules)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def schedule_lr(
    name,
    base_lr: float,
    epoch: int,
    *,
    gamma: float = 1.0,
    total_epochs: int = 0,
    warmup_epochs: int = 0,
    min_lr: float = 0.0,
    step_size: int = 10,
) -> float:
    """Absolute lr for 0-based ``epoch`` under the epoch-indexed schedules.

    Beyond the reference's ExponentialLR (its only scheduler,
    mcat/main.py:302-305), the framework adds:

    * ``cosine``: torch CosineAnnealingLR shape — half-cosine from base_lr to
      ``min_lr`` over the run (post-warmup), clamped at min_lr after.
    * ``step``: torch StepLR — lr = base * gamma^(epoch // step_size).
    * linear warmup (``training.warmup_epochs``): epochs 0..W-1 ramp
      (e+1)/W * base_lr, composable with any schedule (incl. None / exp).

    Epoch-indexed (not stateful-multiplicative) so resume lands on exactly
    the lr a straight-through run would use at that epoch.
    """
    import math

    if warmup_epochs and epoch < warmup_epochs:
        return base_lr * (epoch + 1) / warmup_epochs
    e = epoch - warmup_epochs
    if name == "cosine":
        horizon = max(1, total_epochs - warmup_epochs - 1)
        t = min(e, horizon)
        return min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + math.cos(math.pi * t / horizon)
        )
    if name == "step":
        return base_lr * gamma ** (e // max(1, step_size))
    if name == "exp":
        return base_lr * gamma**e
    return base_lr
