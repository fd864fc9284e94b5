"""Hyperparameter grid sweep driver.

The reference tunes by editing its YAML and resubmitting SLURM jobs by hand
(reference: models/mcat/config.yaml + README.md:14-33). Here one command
trains the cartesian product of dotted-config grids and reports the best
point by the run's quality metric:

    python -m multimodal_path_omic_tpu.cli sweep --config cfg.yaml \
        --grid training.lr=1e-4,2e-4 --grid model.fusion=concat,bilinear \
        --out sweep.json

Each point is a FULL training run under the merged config; results carry the
point's overrides alongside the final metrics, ranked best-first.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence


def parse_grid(specs: Sequence[str]) -> List[Dict]:
    """``key=v1,v2,...`` specs -> list of override dicts (cartesian product).

    Values parse through the same scalar rules as ``--set``
    (config.parse_cli_scalar), so the two spellings cannot drift apart.
    """
    from multimodal_path_omic_tpu.config import parse_cli_scalar

    axes = []
    for spec in specs:
        if "=" not in spec:
            raise ValueError(f"--grid expects key=v1,v2,..., got {spec!r}")
        key, values = spec.split("=", 1)
        parsed = [parse_cli_scalar(raw) for raw in values.split(",")]
        if not parsed:
            raise ValueError(f"--grid {key!r} has no values")
        axes.append((key, parsed))
    return [
        dict(zip((k for k, _ in axes), combo))
        for combo in itertools.product(*(vs for _, vs in axes))
    ]


def run_sweep(
    config_path: str,
    grids: Sequence[str],
    base_overrides: Optional[Dict] = None,
    metric: Optional[str] = None,
    verbose: bool = True,
) -> Dict:
    """Train every grid point; return rows ranked best-first by ``metric``
    (default: val_c_index for survival configs, val_accuracy for GE).
    Loss-like metrics (``*loss*``/``*mse*``) rank ascending — lower is
    better; everything else descending. An unknown ``metric`` fails after
    the FIRST run, not after the whole grid."""
    import os

    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer, _is_ge

    points = parse_grid(grids)
    rows = []
    for i, point in enumerate(points):
        overrides = {**(base_overrides or {}), **point}
        cfg = load_config(config_path, overrides)
        if metric is None:
            # same GE detection as the Trainer itself (trainer._is_ge) —
            # a prefix check would mis-key names like 'NaCAGaT_GE'
            metric = "val_accuracy" if _is_ge(cfg.model.name) else "val_c_index"
        if cfg.model.checkpoint_dir:
            # per-point checkpoint namespace (same collision as CV folds)
            cfg.model.checkpoint_dir = os.path.join(
                cfg.model.checkpoint_dir, f"point{i}"
            )
        if verbose:
            print(f"=== sweep point {i + 1}/{len(points)}: {point}")
        out = Trainer(cfg, verbose=False).fit()
        if metric not in out:
            raise ValueError(
                f"metric {metric!r} not in run results {sorted(out)} — "
                "aborting before training the remaining grid points"
            )
        row = {"point": point, **{k: float(v) for k, v in out.items()}}
        rows.append(row)
        if verbose:
            print(f"    {metric}={row[metric]:.4f}")
    lower_is_better = "loss" in metric or "mse" in metric
    rows.sort(key=lambda r: r[metric], reverse=not lower_is_better)
    result = {
        "metric": metric,
        "lower_is_better": lower_is_better,
        "rows": rows,
        "best": rows[0],
    }
    if verbose:
        print(f"best {metric}={rows[0][metric]:.4f} at {rows[0]['point']}")
    return result
