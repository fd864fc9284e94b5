"""Survival loss zoo — vectorized, batched, jit-safe.

TPU-native rewrites of the reference's five losses (reference: models/loss.py):

* ``cross_entropy_survival``            ("ces",   loss.py:5-28)
* ``negative_log_likelihood_survival``  ("nll",   loss.py:31-43)
* ``cox_survival``                      ("cox",   loss.py:46-59)
* ``survival_classification_tobit``     ("sct",   loss.py:62-85)
* ``cross_entropy_survival_attn_reg``   ("cesar", loss.py:88-101)
* ``cross_entropy_on_probs``            ("ce" — the reference feeds the softmax
  output Y back into nn.CrossEntropyLoss, i.e. a double softmax;
  mcat/main.py:41-42 + mcat.py:138. Reproduced faithfully.)

Differences from the reference, by design:

* fully batched over ``[B, ...]`` (the reference is batch-size-1);
* every data-dependent Python branch (e.g. ``c.item() == 0`` at loss.py:77)
  becomes ``jnp.where`` so everything traces under jit;
* an optional ``sample_weight`` lets padded dummy samples in a bucketed batch
  contribute zero loss while keeping static shapes.

Golden fp32 parity anchors from loss.py:115/121 are enforced in
tests/test_losses.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _wmean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Weighted mean over the batch axis; plain mean when w is None."""
    if w is None:
        return jnp.mean(x)
    w = w.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _gather1(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: [B, K], idx: [B] int -> [B]; torch.gather(x, 1, idx) equivalent."""
    return jnp.take_along_axis(x, idx[:, None], axis=1)[:, 0]


def cross_entropy_survival(
    hazards: jnp.ndarray,
    survs: jnp.ndarray,
    y: jnp.ndarray,
    c: jnp.ndarray,
    alpha: float = 0.75,
    eps: float = 1e-7,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """"ces" — discrete-hazard survival loss (reference: loss.py:5-28).

    hazards, survs: [B, n_bins]; y: [B] int bin; c: [B] censorship (1 = may be
    alive). S is padded with a leading ones column (loss.py:19).
    """
    y = y.astype(jnp.int32)
    c = c.astype(hazards.dtype)
    s_padded = jnp.concatenate([jnp.ones_like(c)[:, None], survs], axis=1)
    s_at_y = _gather1(s_padded, y)
    h_at_y = _gather1(hazards, y)
    # L_uncensored (loss.py:21-22)
    reg = -(1.0 - c) * (
        jnp.log(jnp.clip(s_at_y, min=eps)) + jnp.log(jnp.clip(h_at_y, min=eps))
    )
    # censored/uncensored CE blend term (loss.py:24-25); note the reference
    # clamps S *before* the (1 - S) — reproduced exactly.
    surv_at_y = jnp.clip(_gather1(survs, y), min=eps)
    ce_l = -(c * jnp.log(surv_at_y) + (1.0 - c) * jnp.log(1.0 - surv_at_y))
    loss = (1.0 - alpha) * ce_l + alpha * reg
    return _wmean(loss, sample_weight)


def negative_log_likelihood_survival(
    hazards: jnp.ndarray,
    survs: jnp.ndarray,
    y: jnp.ndarray,
    c: jnp.ndarray,
    alpha: float = 0.15,
    eps: float = 1e-7,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """"nll" — classic discrete NLL survival loss (reference: loss.py:31-43)."""
    y = y.astype(jnp.int32)
    c = c.astype(hazards.dtype)
    s_padded = jnp.concatenate([jnp.ones_like(c)[:, None], survs], axis=1)
    uncensored = -(1.0 - c) * (
        jnp.log(jnp.clip(_gather1(s_padded, y), min=eps))
        + jnp.log(jnp.clip(_gather1(hazards, y), min=eps))
    )
    censored = -c * jnp.log(jnp.clip(_gather1(s_padded, y + 1), min=eps))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return _wmean(loss, sample_weight)


def cox_survival(
    hazards: jnp.ndarray,
    survs: jnp.ndarray,
    c: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cox partial likelihood (reference: loss.py:46-59).

    The reference builds the O(n^2) risk-set matrix R[i, j] = S[j] >= S[i] in a
    numpy double loop; here it is one broadcast compare on device.
    hazards: [B] (theta); survs: [B]; c: [B].
    """
    theta = hazards.reshape(-1)
    s = survs.reshape(-1)
    r_mat = (s[None, :] >= s[:, None]).astype(theta.dtype)  # [B, B]
    if sample_weight is not None:
        # padded (weight-0) samples must not appear in any risk set
        r_mat = r_mat * sample_weight.astype(theta.dtype)[None, :]
    exp_theta = jnp.exp(theta)
    # a weight-0 padded row can end up with an empty risk set (log 0 = -inf,
    # and -inf * 0 = NaN in the weighted mean) — clamp the reduction
    risk_sum = jnp.maximum(jnp.sum(exp_theta[None, :] * r_mat, axis=1), 1e-30)
    per = (theta - jnp.log(risk_sum)) * (1.0 - c.astype(theta.dtype))
    return -_wmean(per, sample_weight)


def survival_classification_tobit(
    predictions: jnp.ndarray,
    y: jnp.ndarray,
    c: jnp.ndarray,
    eps: float = 1e-7,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """"sct" — Tobit-style classification survival loss (reference: loss.py:62-85).

    predictions: [B, n_bins] class probabilities; y: [B]; c: [B].
    The reference branches in Python on ``c.item()`` (loss.py:77) and hard-codes
    ``reshape(4)`` (loss.py:76); here it is a masked, bin-count-agnostic
    ``jnp.where``: uncensored -> -log p[y]; censored -> -log sum_{j>=y} p[j].
    """
    y = y.astype(jnp.int32)
    c = c.astype(predictions.dtype)
    p_at_y = _gather1(predictions, y)
    # cumulative tail probability sum_{j >= y} p[j]
    rev_cumsum = jnp.cumsum(predictions[:, ::-1], axis=1)[:, ::-1]
    tail = _gather1(rev_cumsum, y)
    loss = jnp.where(c == 0, -jnp.log(p_at_y + eps), -jnp.log(tail + eps))
    return _wmean(loss, sample_weight)


def cross_entropy_survival_attn_reg(
    hazards: jnp.ndarray,
    survs: jnp.ndarray,
    y: jnp.ndarray,
    c: jnp.ndarray,
    attention: jnp.ndarray,
    alpha: float = 0.75,
    eps: float = 1e-7,
    lambda_reg: float = 0.01,
    sample_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """"cesar" — ces + lambda * ||A||_2 (reference: loss.py:88-101).

    Returns ``(loss, attn_loss)`` like the reference. ``attention`` is the raw
    co-attention map [B, ...]; the penalty is the global L2 (Frobenius) norm,
    matching ``torch.norm(attention, p=2)`` exactly at the reference's
    batch-1. With ``sample_weight``, padded rows are excluded from the norm
    (sqrt of the weighted sum of per-sample squares) so batch padding
    contributes zero loss. Note the Trainer's batched cesar (train/loop.py)
    instead generalizes batch-1 as the weighted MEAN of per-sample norms —
    both reduce to the reference at B=1.
    """
    loss = cross_entropy_survival(
        hazards, survs, y, c, alpha=alpha, eps=eps, sample_weight=sample_weight
    )
    sq = jnp.sum(attention.reshape(attention.shape[0], -1) ** 2, axis=1)
    if sample_weight is not None:
        sq = sq * sample_weight
    attn_loss = lambda_reg * jnp.sqrt(jnp.sum(sq))
    return loss + attn_loss, attn_loss


def cross_entropy_on_probs(
    y_probs: jnp.ndarray,
    labels: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """"ce" — nn.CrossEntropyLoss applied to the model's softmax output.

    The reference passes Y (already a softmax, mcat.py:138) as the *logits* of
    nn.CrossEntropyLoss (mcat/main.py:41-42) — an (intentional-or-not) double
    softmax. Reproduced faithfully: log_softmax over the probability vector.
    """
    logp = y_probs - jnp.log(jnp.sum(jnp.exp(y_probs), axis=1, keepdims=True))
    nll = -_gather1(logp, labels.astype(jnp.int32))
    return _wmean(nll, sample_weight)


def l1_reg(params) -> jnp.ndarray:
    """Sum of |w| over a parameter pytree (reference: models/utils.py:33-40)."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.abs(w)) for w in leaves)
