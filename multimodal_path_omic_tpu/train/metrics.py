"""Evaluation metrics — host-side numpy, no external survival library.

The reference scores with ``sksurv.metrics.concordance_index_censored``
(reference: models/mcat/main.py:12, 81, 148) on risk ``= -sum(survs)``
(mcat/main.py:56). sksurv is not a dependency here; `concordance_index_censored`
below is a behavior-compatible numpy port of sksurv's pair-counting algorithm
(comparable pairs, 0.5 credit for tied estimates, events comparable to
censored samples at the same time point).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


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
    """
    event_indicator = np.asarray(event_indicator, dtype=bool)
    event_time = np.asarray(event_time, dtype=float)
    estimate = np.asarray(estimate, dtype=float)
    n = len(event_time)
    if not (len(event_indicator) == len(estimate) == n):
        raise ValueError("all inputs must have the same length")
    if n < 2:
        raise ValueError("need at least two samples")

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


def survival_risk(survs: np.ndarray) -> np.ndarray:
    """Risk score from survival curve: -sum_j S_j (reference: mcat/main.py:56)."""
    return -np.sum(np.asarray(survs, dtype=float), axis=-1)
