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
    config, k: int = 5, verbose: bool = True, fold_indices=None,
    save_folds: bool = False,
) -> Dict:
    """Train ``k`` patient-level folds of ``config`` and aggregate metrics.

    Each fold is a FULL training run (same epochs/optimizer/cadence as a
    single run). The fold split seeds from ``training.seed`` so results are
    reproducible. Returns per-fold rows plus mean/std of the quality metric
    (val_c_index for survival models, val_accuracy for GE).

    ``fold_indices``: optional subset of folds to run (e.g. one fold per
    SLURM array task); the fold SPLIT is always computed over all k.

    ``save_folds``: save each fold's final model under
    ``<checkpoint_dir>/fold<i>/`` and report the paths in the result —
    feed them back as repeated ``--checkpoint`` flags for ensemble
    inference (serve.py::Predictor.from_config).
    """
    import copy
    import os

    from multimodal_path_omic_tpu.data.dataset import (
        GeneExprDataset,
        MultimodalDataset,
    )
    from multimodal_path_omic_tpu.data.tables import patient_kfold
    from multimodal_path_omic_tpu.train.trainer import Trainer, _is_ge

    # read the patient column through the SAME dataset class each fold's
    # Trainer builds (row filters + missing-bag drops must match, or fold row
    # indices would point at different rows) — but without a full Trainer:
    # a probe Trainer would pay model/optimizer init and leak its
    # MetricLogger (an unfinished wandb run)
    ge_mode = _is_ge(config.model.name)
    if ge_mode:
        ds = GeneExprDataset(
            config.dataset.file, config, gene=config.model.gene, verbose=False
        )
    else:
        ds = MultimodalDataset(
            config.dataset.file, config, use_signatures=True, verbose=False
        )
    patients = ds.table.patients
    metric_key = "val_accuracy" if ge_mode else "val_c_index"
    del ds

    folds = patient_kfold(patients, k, seed=config.training.seed)
    run = list(range(k)) if fold_indices is None else list(fold_indices)
    if not run:
        raise ValueError("fold_indices is empty — nothing to run")
    bad = [i for i in run if not 0 <= i < k]
    if bad:
        # folds[-1] would silently train an aliased fold under the wrong id
        raise ValueError(f"fold_indices {bad} out of range for k={k}")
    rows = []
    for i in run:
        tr_rows, va_rows = folds[i]
        if verbose:
            print(
                f"=== fold {i + 1}/{k}: {len(tr_rows)} train / "
                f"{len(va_rows)} val rows"
            )
        fold_cfg = copy.deepcopy(config)
        if fold_cfg.model.checkpoint_dir:
            # per-fold checkpoint namespace: folds otherwise collide on the
            # minute-resolution checkpoint filename and carry no fold identity
            fold_cfg.model.checkpoint_dir = os.path.join(
                fold_cfg.model.checkpoint_dir, f"fold{i}"
            )
        trainer = Trainer(fold_cfg, verbose=False, split_rows=(tr_rows, va_rows))
        out = trainer.fit()
        row = {"fold": i, **{m: float(v) for m, v in out.items()}}
        if save_folds:
            if not fold_cfg.model.checkpoint_dir:
                raise ValueError(
                    "save_folds needs model.checkpoint_dir set in the config"
                )
            # save() takes the 0-indexed epoch just finished (stores +1)
            row["checkpoint"] = trainer.save(
                config.training.epochs - 1, row.get("val_loss", 0.0),
                tag=f"cv{i}",
            )
        rows.append(row)
        if verbose:
            print(f"    fold {i + 1}: {metric_key}={row[metric_key]:.4f}")
    if save_folds:
        # saves are async (orbax background commit) — join before returning
        # so the reported paths exist when the caller reads them
        from multimodal_path_omic_tpu.train import checkpoint as ckpt

        ckpt.wait_for_checkpoints()
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
