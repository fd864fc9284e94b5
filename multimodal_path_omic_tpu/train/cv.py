"""Patient-level k-fold cross-validation driver.

The reference evaluates on a single seeded train/val split per run
(reference: mcat/main.py:239-252); the MCAT literature reports patient-level
cross-validated c-index. This driver runs k full trainings over seeded
patient-level folds (data/tables.py::patient_kfold) and aggregates the final
validation metric — one command instead of a hand-rolled SLURM array.

CLI: ``python -m multimodal_path_omic_tpu.cli cv --config cfg.yaml
--folds 5 [--out cv_results.json]``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def cross_validate(
    config, k: int = 5, verbose: bool = True, fold_indices=None
) -> Dict:
    """Train ``k`` patient-level folds of ``config`` and aggregate metrics.

    Each fold is a FULL training run (same epochs/optimizer/cadence as a
    single run). The fold split seeds from ``training.seed`` so results are
    reproducible. Returns per-fold rows plus mean/std of the quality metric
    (val_c_index for survival models, val_accuracy for GE).

    ``fold_indices``: optional subset of folds to run (e.g. one fold per
    SLURM array task); the fold SPLIT is always computed over all k.
    """
    from multimodal_path_omic_tpu.data.tables import patient_kfold
    from multimodal_path_omic_tpu.train.trainer import Trainer

    # probe dataset once for the patient column; each fold's Trainer re-opens
    # it (cheap CSV parse) so per-fold state is fully independent
    probe = Trainer(config, verbose=False)
    patients = probe.dataset.table.patients
    metric_key = "val_accuracy" if probe.ge_mode else "val_c_index"
    del probe

    folds = patient_kfold(patients, k, seed=config.training.seed)
    run = range(k) if fold_indices is None else list(fold_indices)
    rows = []
    for i in run:
        tr_rows, va_rows = folds[i]
        if verbose:
            print(
                f"=== fold {i + 1}/{k}: {len(tr_rows)} train / "
                f"{len(va_rows)} val rows"
            )
        trainer = Trainer(config, verbose=False, split_rows=(tr_rows, va_rows))
        out = trainer.fit()
        row = {"fold": i, **{m: float(v) for m, v in out.items()}}
        rows.append(row)
        if verbose:
            print(f"    fold {i + 1}: {metric_key}={row[metric_key]:.4f}")
    vals = np.array([r[metric_key] for r in rows])
    result = {
        "metric": metric_key,
        "folds": rows,
        "mean": float(vals.mean()),
        "std": float(vals.std()),
        "k": k,
    }
    if verbose:
        print(
            f"{k}-fold {metric_key}: {result['mean']:.4f} "
            f"± {result['std']:.4f}"
        )
    return result


def save_results(result: Dict, path: Optional[str]) -> None:
    if not path:
        return
    import json

    with open(path, "w") as f:
        json.dump(result, f, indent=1)
