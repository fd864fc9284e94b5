"""Risk stratification analysis: Kaplan-Meier groups + log-rank test.

The MCAT-family papers report their models as KM curves of predicted
high/low-risk groups with a log-rank p-value; the reference repo computes
only the c-index (reference: mcat/main.py:81) and leaves the figure to
offline notebooks. ``cli stratify`` closes that gap end-to-end: score a
split with the trained model, cut the cohort at a risk quantile, run the
Mantel-Cox log-rank test (train/metrics.py::logrank_test, exact 1-dof
p-value via erfc), and optionally render the KM figure — one command from
checkpoint to the paper statistic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def stratify(
    config,
    checkpoint: Optional[str] = None,
    torch_checkpoint: Optional[str] = None,
    quantile: float = 0.5,
    split: str = "val",
    out_csv: Optional[str] = None,
    png: Optional[str] = None,
    mc_samples: int = 0,
    verbose: bool = True,
    trainer=None,
) -> Dict[str, Any]:
    """Predict risks for ``split`` ("val" / "train" / "all"), cut at the
    ``quantile`` risk threshold, and test the two groups' survival
    separation. Returns the full result dict (groups, chi2, p_value, KM
    curves); writes per-slide assignments to ``out_csv`` and the KM figure
    to ``png`` when given. ``mc_samples`` adds MC-dropout risk_std columns
    to the CSV. ``trainer``: analyze an ALREADY-TRAINED in-memory Trainer
    instead of building one from config + checkpoint."""
    if not 0.0 < quantile < 1.0:
        raise ValueError(f"quantile must be in (0, 1), got {quantile}")
    from multimodal_path_omic_tpu.serve import Predictor
    from multimodal_path_omic_tpu.train.metrics import kaplan_meier, logrank_test

    predictor = (
        Predictor(trainer)
        if trainer is not None
        else Predictor.from_config(
            config, checkpoint=checkpoint, torch_checkpoint=torch_checkpoint
        )
    )
    t = predictor._t
    if t.ge_mode:
        raise ValueError("stratify needs a survival model (not GE)")
    ds = {"val": t.val_ds, "train": t.train_ds, "all": t.dataset}.get(split)
    if ds is None:
        raise ValueError(f'split must be "val", "train" or "all", got {split!r}')
    if len(ds) < 4:
        raise ValueError(f"split {split!r} has only {len(ds)} samples")

    cols = predictor.predict_dataset(ds, mc_samples=mc_samples)
    risk = np.asarray(cols["risk"], dtype=float)
    # predict_dataset rows come in BUCKET-EMISSION order (BucketBatcher
    # groups bags by padded length), not table order — align the survival
    # labels through slide_id, never positionally
    table = ds.table
    pos = {sid: i for i, sid in enumerate(table.slide_ids)}
    rows = np.array([pos[sid] for sid in cols["slide_id"]], dtype=int)
    months = np.asarray(table.survival_months, dtype=float)[rows]
    event = 1.0 - np.asarray(table.censorship, dtype=float)[rows] > 0.5

    thresh = float(np.quantile(risk, quantile))
    high = risk > thresh
    if high.all() or not high.any():
        raise ValueError(
            f"risk quantile {quantile} does not split this cohort "
            "(all risks on one side — degenerate predictions?)"
        )
    chi2, p = logrank_test(months, event, high)
    km = {
        "high": kaplan_meier(months[high], event[high]),
        "low": kaplan_meier(months[~high], event[~high]),
    }
    result: Dict[str, Any] = {
        "split": split,
        "n": int(len(risk)),
        "n_high": int(high.sum()),
        "n_low": int((~high).sum()),
        "risk_threshold": thresh,
        "quantile": quantile,
        "chi2": chi2,
        "p_value": p,
        "median_months_high": float(np.median(months[high])),
        "median_months_low": float(np.median(months[~high])),
        "km": {k: (v[0].tolist(), v[1].tolist()) for k, v in km.items()},
    }
    if verbose:
        print(
            f"stratify[{split}]: n={result['n']} "
            f"(high {result['n_high']} / low {result['n_low']} at "
            f"risk>{thresh:.4f}), log-rank chi2={chi2:.3f}, p={p:.4g}"
        )
    if out_csv:
        import pandas as pd

        flat = {
            "slide_id": cols["slide_id"],
            "risk": risk,
            "group": np.where(high, "high", "low"),
            "survival_months": months,
            "event": event.astype(int),
        }
        if mc_samples > 0:
            flat["risk_mc_std"] = np.asarray(cols["risk_std"], dtype=float)
        pd.DataFrame(flat).to_csv(out_csv, index=False)
        result["csv"] = out_csv
    if png:
        from multimodal_path_omic_tpu.utils.visualize import save_km_png

        save_km_png(km, png, p_value=p, title=f"KM by predicted risk ({split})")
        result["png"] = png
    return result
