"""Evaluation metrics — host-side numpy, no external survival library.

The reference scores with ``sksurv.metrics.concordance_index_censored``
(reference: models/mcat/main.py:12, 81, 148) on risk ``= -sum(survs)``
(mcat/main.py:56). sksurv is not a dependency here;
``concordance_index_censored`` below is a behavior-compatible numpy port of
sksurv's pair-counting algorithm (comparable pairs, 0.5 credit for tied
estimates with ``tied_tol``, events comparable to censored samples at the
same time point).

Three implementations exist, cross-checked against each other in
tests/test_metrics.py (sksurv itself is not installable in this
environment, so the correctness argument is: the slow port mirrors sksurv's
published algorithm step-for-step, the brute force encodes Harrell's
definition independently, and the fast version must agree with both on
randomized data including heavy time/estimate ties):

* ``concordance_index_censored`` — production: vectorized chunked counting,
  O(n log n)-ish; scores n = 50k in well under a second;
* ``_concordance_index_censored_loop`` — direct per-event port of sksurv's
  loop (the round-1 implementation), kept as the readable reference;
* ``concordance_index_censored_bruteforce`` — O(n^2) pairwise evaluation of
  the comparability DEFINITION, structurally independent of both.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _validate(event_indicator, event_time, estimate):
    event_indicator = np.asarray(event_indicator, dtype=bool)
    event_time = np.asarray(event_time, dtype=float)
    estimate = np.asarray(estimate, dtype=float)
    n = len(event_time)
    if not (len(event_indicator) == len(estimate) == n):
        raise ValueError("all inputs must have the same length")
    if n < 2:
        raise ValueError("need at least two samples")
    return event_indicator, event_time, estimate, n


def concordance_index_censored(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """Censored concordance index (Harrell's C), sksurv-compatible.

    Args:
      event_indicator: bool [n] — True where the event (death) was observed.
      event_time: float [n] — observed/censoring times.
      estimate: float [n] — predicted risk (higher = more at risk).

    Returns:
      (cindex, concordant, discordant, tied_risk, tied_time) like sksurv.

    Vectorized: samples are sorted by time and processed in reverse
    chunk-of-groups order; comparisons against strictly-later chunks use
    binary search into an incrementally maintained sorted array, and
    within-chunk comparisons (including the censored-at-same-time rule) use
    one small dense matrix per chunk.
    """
    event_indicator, event_time, estimate, n = _validate(
        event_indicator, event_time, estimate
    )

    order = np.argsort(event_time, kind="stable")
    st = event_time[order]
    se = event_indicator[order]
    sr = estimate[order]

    # contiguous tie groups of equal time
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = st[1:] != st[:-1]
    group_start = np.flatnonzero(new_group)
    group_end = np.concatenate([group_start[1:], [n]])
    gid = np.cumsum(new_group) - 1  # [n] group id per sample

    # tied_time: each event is "comparable-tied" with every censored sample
    # of its own group (counted once per event, like sksurv)
    ev_per_group = np.add.reduceat(se.astype(np.int64), group_start)
    size_per_group = group_end - group_start
    cens_per_group = size_per_group - ev_per_group
    tied_time = int(np.sum(ev_per_group * cens_per_group))

    # chunk whole groups so each chunk holds <= target samples (a single
    # oversized group becomes its own chunk)
    target = 512
    chunks = []  # (sample_start, sample_end)
    cs = 0
    for g in range(len(group_start)):
        if group_end[g] - cs > target and cs != group_start[g]:
            chunks.append((cs, group_start[g]))
            cs = group_start[g]
    chunks.append((cs, n))

    numerator = 0.0
    denominator = 0
    concordant = 0
    discordant = 0
    tied_risk = 0

    suffix_sorted = np.empty(0, dtype=float)  # estimates of strictly-later chunks
    for s0, s1 in reversed(chunks):
        sub_e = se[s0:s1]
        ev_rows = np.flatnonzero(sub_e)
        if ev_rows.size:
            r_ev = sr[s0:s1][ev_rows]
            # later-chunk comparisons via binary search
            lo = np.searchsorted(suffix_sorted, r_ev - tied_tol, side="left")
            hi = np.searchsorted(suffix_sorted, r_ev + tied_tol, side="right")
            less_out = lo
            tie_out = hi - lo
            n_out = suffix_sorted.size
            # within-chunk comparisons: strictly later groups, plus censored
            # samples of the event's own group
            sub_g = gid[s0:s1]
            sub_r = sr[s0:s1]
            g_ev = sub_g[ev_rows]
            comp = (sub_g[None, :] > g_ev[:, None]) | (
                (sub_g[None, :] == g_ev[:, None]) & ~sub_e[None, :]
            )
            diff = sub_r[None, :] - r_ev[:, None]
            tie_in = (comp & (np.abs(diff) <= tied_tol)).sum(axis=1)
            less_in = (comp & (diff < -tied_tol)).sum(axis=1)
            n_in = comp.sum(axis=1)

            n_con = less_out + less_in
            n_tie = tie_out + tie_in
            n_all = n_out + n_in
            numerator += float(np.sum(n_con + 0.5 * n_tie))
            denominator += int(np.sum(n_all))
            concordant += int(np.sum(n_con))
            tied_risk += int(np.sum(n_tie))
            discordant += int(np.sum(n_all - n_con - n_tie))
        suffix_sorted = np.sort(np.concatenate([suffix_sorted, sr[s0:s1]]))

    if denominator == 0:
        raise ValueError(
            "data has no comparable pairs, cannot estimate concordance index"
        )
    return numerator / denominator, concordant, discordant, tied_risk, tied_time


def _concordance_index_censored_loop(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """Per-event loop port of sksurv's algorithm (readable reference; the
    production function above must match this exactly)."""
    event_indicator, event_time, estimate, n = _validate(
        event_indicator, event_time, estimate
    )

    order = np.argsort(event_time, kind="stable")
    st = event_time[order]
    se = event_indicator[order]
    sr = estimate[order]

    concordant = 0
    discordant = 0
    tied_risk = 0
    tied_time = 0
    numerator = 0.0
    denominator = 0.0

    i = 0
    while i < n - 1:
        ti = st[i]
        end = i + 1
        while end < n and st[end] == ti:
            end += 1
        censored_at_same_time = ~se[i:end]
        for j in range(i, end):
            if not se[j]:
                continue
            # comparable: everything with a strictly later time, plus censored
            # samples tied at this exact time
            mask = np.zeros(n, dtype=bool)
            mask[end:] = True
            mask[i:end] = censored_at_same_time
            tied_time += int(censored_at_same_time.sum())
            est_j = sr[j]
            others = sr[mask]
            ties = np.abs(others - est_j) <= tied_tol
            n_ties = int(ties.sum())
            n_con = int(np.sum(others[~ties] < est_j))
            n_all = int(mask.sum())
            numerator += n_con + 0.5 * n_ties
            denominator += n_all
            concordant += n_con
            tied_risk += n_ties
            discordant += n_all - n_con - n_ties
        i = end

    if denominator == 0:
        raise ValueError(
            "data has no comparable pairs, cannot estimate concordance index"
        )
    return numerator / denominator, concordant, discordant, tied_risk, tied_time


def concordance_index_censored_bruteforce(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """O(n^2) pairwise evaluation straight from the DEFINITION (test oracle).

    A pair (i, j) is comparable when sample i had an observed event and
    either t_i < t_j, or t_i == t_j and j is censored. Concordant when the
    event sample carries the strictly higher risk (beyond ``tied_tol``);
    tied-risk pairs get 0.5 credit. ``tied_time`` counts, for every event,
    its same-time censored partners.
    """
    event_indicator, event_time, estimate, n = _validate(
        event_indicator, event_time, estimate
    )
    t = event_time
    e = event_indicator
    r = estimate
    comparable = e[:, None] & (
        (t[:, None] < t[None, :])
        | ((t[:, None] == t[None, :]) & ~e[None, :])
    )
    diff = r[:, None] - r[None, :]  # event risk minus other risk
    tie = comparable & (np.abs(diff) <= tied_tol)
    con = comparable & (diff > tied_tol)
    n_all = int(comparable.sum())
    n_con = int(con.sum())
    n_tie = int(tie.sum())
    tied_time = int((e[:, None] & (t[:, None] == t[None, :]) & ~e[None, :]).sum())
    if n_all == 0:
        raise ValueError(
            "data has no comparable pairs, cannot estimate concordance index"
        )
    return (
        (n_con + 0.5 * n_tie) / n_all,
        n_con,
        n_all - n_con - n_tie,
        n_tie,
        tied_time,
    )


def survival_risk(survs: np.ndarray) -> np.ndarray:
    """Risk score from survival curve: -sum_j S_j (reference: mcat/main.py:56)."""
    return -np.sum(np.asarray(survs, dtype=float), axis=-1)


def kaplan_meier(
    event_time: np.ndarray, event: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Product-limit (Kaplan-Meier) survival estimate.

    ``event`` is the EVENT indicator (1 = death observed; the reference's
    CSV stores censorship, so pass ``1 - censorship``). Returns
    ``(times, S(t))`` at each distinct event time: S = prod(1 - d_i / n_i)
    over event times <= t with d_i events among n_i still at risk. The
    reference has no survival-curve estimation at all (its only metric is
    the c-index, mcat/main.py:81).
    """
    t = np.asarray(event_time, dtype=float)
    e = np.asarray(event, dtype=bool)
    order = np.argsort(t, kind="stable")
    t, e = t[order], e[order]
    times, s, surv = [], 1.0, []
    n = len(t)
    i = 0
    while i < n:
        j = i
        while j < n and t[j] == t[i]:
            j += 1
        d = int(e[i:j].sum())  # events at this time
        at_risk = n - i
        if d > 0:
            s *= 1.0 - d / at_risk
            times.append(t[i])
            surv.append(s)
        i = j
    return np.asarray(times), np.asarray(surv)


def logrank_test(
    event_time: np.ndarray, event: np.ndarray, group: np.ndarray
) -> Tuple[float, float]:
    """Two-group log-rank test: ``(chi2, p_value)``.

    Standard Mantel-Cox statistic: at each distinct event time, compare
    group 1's observed event count with its hypergeometric expectation given
    the pooled at-risk sets; chi2 = (sum(O1-E1))^2 / sum(V). The 1-dof
    chi-square p-value is computed exactly via erfc (chi2_1 = Z^2, so
    P(X > x) = erfc(sqrt(x/2))) — no scipy dependency. This is the statistic
    the MCAT-family papers report alongside the KM curves; the reference
    implements neither.
    """
    import math

    t = np.asarray(event_time, dtype=float)
    e = np.asarray(event, dtype=bool)
    g = np.asarray(group).astype(bool)  # True = group 1
    if g.all() or not g.any():
        raise ValueError("logrank_test needs two non-empty groups")
    obs_minus_exp = 0.0
    var = 0.0
    for tt in np.unique(t[e]):
        at_risk = t >= tt
        n_all = int(at_risk.sum())
        n1 = int((at_risk & g).sum())
        died = e & (t == tt)
        d_all = int(died.sum())
        d1 = int((died & g).sum())
        if n_all < 2 or d_all == 0:
            continue
        exp1 = d_all * n1 / n_all
        v = (
            d_all * (n1 / n_all) * (1.0 - n1 / n_all)
            * (n_all - d_all) / (n_all - 1)
        )
        obs_minus_exp += d1 - exp1
        var += v
    if var <= 0.0:
        return 0.0, 1.0
    chi2 = obs_minus_exp ** 2 / var
    p = math.erfc(math.sqrt(chi2 / 2.0))
    return float(chi2), float(p)


# ---------------------------------------------------------------------------
# Time-dependent accuracy: IPCW Brier score + cumulative/dynamic AUC.
#
# The reference's only metric is the c-index (mcat/main.py:81). The survival
# literature the MCAT family sits in reports two more: the censoring-weighted
# (IPCW) Brier score / its integral (Graf et al. 1999) and Uno's
# cumulative/dynamic time-dependent AUC (Uno et al. 2007) — both standard in
# sksurv (`brier_score`, `cumulative_dynamic_auc`), which is not installable
# here, so they are implemented from the published definitions and pinned
# against hand-computed worked examples in tests/test_metrics.py.
# ---------------------------------------------------------------------------


def _km_step_eval(times: np.ndarray, surv: np.ndarray, t, *, left: bool = False):
    """Evaluate a right-continuous KM step function at ``t``.

    ``(times, surv)`` as returned by :func:`kaplan_meier`. ``left=True``
    evaluates the left limit S(t-) (the value just before t). Values before
    the first drop are 1.0."""
    t = np.asarray(t, dtype=float)
    if len(times) == 0:  # no drops at all (e.g. a fully-uncensored cohort)
        out = np.ones_like(t, dtype=float)
        return out if out.ndim else 1.0
    side = "left" if left else "right"
    idx = np.searchsorted(times, t, side=side) - 1
    out = np.where(idx >= 0, surv[np.clip(idx, 0, len(surv) - 1)], 1.0)
    return out if out.ndim else float(out)


def _check_eval_times_in_followup(event_time: np.ndarray, taus: np.ndarray):
    """Time-dependent metrics are only estimable strictly inside the
    observed follow-up (same contract as sksurv): at tau >= max(T) there are
    no controls/future subjects left and censored mass silently vanishes."""
    lo, hi = float(np.min(event_time)), float(np.max(event_time))
    if np.any(taus < lo) or np.any(taus >= hi):
        raise ValueError(
            f"eval times must lie within the observed follow-up "
            f"[{lo}, {hi}) — got {np.asarray(taus).tolist()}"
        )


def censoring_survival(
    event_time: np.ndarray, event: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """KM estimate G(t) of the CENSORING distribution (roles swapped:
    censorings are the 'events'). This is the IPCW weight denominator."""
    e = np.asarray(event, dtype=bool)
    return kaplan_meier(event_time, ~e)


def brier_scores(
    event_time: np.ndarray,
    event: np.ndarray,
    surv_at_times: np.ndarray,
    eval_times: np.ndarray,
) -> np.ndarray:
    """IPCW (censoring-weighted) Brier score BS(t) at each eval time.

    Graf et al. 1999 / sksurv ``brier_score`` estimator:

        BS(t) = mean_i [ S_i(t)^2 * 1{T_i <= t, event_i} / G(T_i-)
                       + (1 - S_i(t))^2 * 1{T_i > t}     / G(t) ]

    where G is the KM estimate of the censoring survival function and
    ``surv_at_times[i, k]`` is model survival S_i(eval_times[k]). Subjects
    censored at or before t contribute 0 (their weight is deferred to the
    two observable classes). Raises if any required IPCW weight has
    G == 0 (eval time beyond the censoring follow-up) — same contract as
    sksurv."""
    t = np.asarray(event_time, dtype=float)
    e = np.asarray(event, dtype=bool)
    s = np.asarray(surv_at_times, dtype=float)
    taus = np.atleast_1d(np.asarray(eval_times, dtype=float))
    n = len(t)
    if s.shape != (n, len(taus)):
        raise ValueError(
            f"surv_at_times must be [n={n}, n_times={len(taus)}], got {s.shape}"
        )
    _check_eval_times_in_followup(t, taus)
    g_times, g_surv = censoring_survival(t, e)
    g_at_event_left = _km_step_eval(g_times, g_surv, t, left=True)  # G(T_i-)
    out = np.empty(len(taus), dtype=float)
    for k, tau in enumerate(taus):
        past_event = (t <= tau) & e
        future = t > tau
        g_tau = _km_step_eval(g_times, g_surv, tau)
        if np.any(past_event & (g_at_event_left <= 0)) or (
            future.any() and g_tau <= 0
        ):
            raise ValueError(
                f"censoring survival G is 0 at eval time {tau}; pick eval "
                "times inside the censoring follow-up range"
            )
        contrib = np.zeros(n, dtype=float)
        contrib[past_event] = (
            s[past_event, k] ** 2 / g_at_event_left[past_event]
        )
        contrib[future] = (1.0 - s[future, k]) ** 2 / g_tau
        out[k] = contrib.mean()
    return out


def integrated_brier_score(
    event_time: np.ndarray,
    event: np.ndarray,
    surv_at_times: np.ndarray,
    eval_times: np.ndarray,
) -> float:
    """IBS: trapezoid integral of BS(t) over eval_times, normalized by the
    span — a single proper-scoring summary (lower is better; 0.25 is the
    score of a constant S=0.5 prediction)."""
    taus = np.asarray(eval_times, dtype=float)
    if len(taus) < 2:
        raise ValueError("integrated_brier_score needs >= 2 eval times")
    if np.any(np.diff(taus) <= 0):
        raise ValueError("eval_times must be strictly increasing")
    bs = brier_scores(event_time, event, surv_at_times, taus)
    trapezoid = getattr(np, "trapezoid", np.trapz)
    return float(trapezoid(bs, taus) / (taus[-1] - taus[0]))


def cumulative_dynamic_auc(
    event_time: np.ndarray,
    event: np.ndarray,
    risk: np.ndarray,
    eval_times: np.ndarray,
) -> np.ndarray:
    """Uno's IPCW cumulative/dynamic time-dependent AUC(t).

    AUC(t) = P(risk_i > risk_j | T_i <= t < T_j) with the case set weighted
    by 1/G(T_i) (G = censoring KM, evaluated right-continuously — Uno's
    estimator and sksurv's convention; the left limit G(T_i-) belongs to the
    Brier score, where Graf specifies it). The two differ exactly when an
    event time coincides with a censoring time. Tied risks count 0.5. Cases
    are subjects with an observed event by t; controls are subjects still at
    risk after t. Returns one AUC per eval time (NaN where there are no
    cases or no controls)."""
    t = np.asarray(event_time, dtype=float)
    e = np.asarray(event, dtype=bool)
    r = np.asarray(risk, dtype=float)
    taus = np.atleast_1d(np.asarray(eval_times, dtype=float))
    _check_eval_times_in_followup(t, taus)
    g_times, g_surv = censoring_survival(t, e)
    g_at_event = _km_step_eval(g_times, g_surv, t)  # G(T_i), right-continuous
    out = np.empty(len(taus), dtype=float)
    for k, tau in enumerate(taus):
        cases = (t <= tau) & e
        controls = t > tau
        if not cases.any() or not controls.any():
            out[k] = np.nan
            continue
        if np.any(cases & (g_at_event <= 0)):
            raise ValueError(
                f"censoring survival G is 0 at an event time <= {tau}; "
                "pick eval times inside the censoring follow-up range"
            )
        w = 1.0 / g_at_event[cases]  # [n_cases]
        rc, rk = r[cases], r[controls]
        # pairwise comparison matrix [n_cases, n_controls]
        greater = (rc[:, None] > rk[None, :]).astype(float)
        tied = (rc[:, None] == rk[None, :]).astype(float)
        num = float((w[:, None] * (greater + 0.5 * tied)).sum())
        den = float(w.sum() * len(rk))
        out[k] = num / den
    return out


def survival_at_times(
    survs: np.ndarray, bin_edges: np.ndarray, eval_times: np.ndarray
) -> np.ndarray:
    """Evaluate the discrete-bin model survival curve at continuous times.

    The survival heads emit S over q qcut bins (models/common.py::
    survival_head); the curve is a step function: S(t) for t inside bin j is
    ``survs[:, j]`` (probability of surviving through bin j). ``bin_edges``
    are the q+1 qcut boundaries; times beyond the last edge clamp to the
    final bin.

    qcut bins are right-closed — bin j covers (e_j, e_{j+1}] — so a time
    exactly on an interior edge e_{j+1} belongs to bin j and returns
    ``survs[:, j]`` (searchsorted side='left'). This matters because
    evaluate_survival's default eval grid IS the interior qcut edges: the
    wrong side would shift every default Brier/IBS one full bin pessimistic."""
    survs = np.asarray(survs, dtype=float)
    edges = np.asarray(bin_edges, dtype=float)
    taus = np.atleast_1d(np.asarray(eval_times, dtype=float))
    q = survs.shape[1]
    if len(edges) != q + 1:
        raise ValueError(
            f"bin_edges must have {q + 1} entries for {q}-bin curves, "
            f"got {len(edges)}"
        )
    idx = np.clip(np.searchsorted(edges[1:-1], taus, side="left"), 0, q - 1)
    return survs[:, idx]


def classification_report(
    labels: np.ndarray, probs: np.ndarray
) -> dict:
    """Multi-class metric panel from predicted class probabilities.

    Returns accuracy, per-class precision/recall/F1 + support, macro-F1,
    and the confusion matrix (rows = true class, cols = predicted). The
    GE family's training metric is top-1 accuracy only
    (train/trainer.py::val_accuracy); this is the full panel for
    `cli evaluate` on GE models. Pure numpy — pinned against a
    hand-computed worked example in tests/test_metrics.py."""
    y_true = np.asarray(labels, dtype=int)
    p = np.asarray(probs, dtype=float)
    if p.ndim != 2 or len(p) != len(y_true):
        raise ValueError(f"probs must be [n={len(y_true)}, n_classes], got {p.shape}")
    n_classes = p.shape[1]
    if y_true.min() < 0 or y_true.max() >= n_classes:
        raise ValueError("labels out of range for the probability columns")
    y_pred = np.argmax(p, axis=1)
    cm = np.zeros((n_classes, n_classes), dtype=int)
    np.add.at(cm, (y_true, y_pred), 1)
    tp = np.diag(cm).astype(float)
    pred_tot = cm.sum(axis=0).astype(float)  # column sums
    true_tot = cm.sum(axis=1).astype(float)  # row sums
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_tot > 0, tp / pred_tot, 0.0)
        recall = np.where(true_tot > 0, tp / true_tot, 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / denom, 0.0)
    return {
        "accuracy": float(tp.sum() / len(y_true)),
        "precision": precision.tolist(),
        "recall": recall.tolist(),
        "f1": f1.tolist(),
        "support": true_tot.astype(int).tolist(),
        "macro_f1": float(f1.mean()),
        "confusion": cm.tolist(),
    }
