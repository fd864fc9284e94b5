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

import yaml


def parse_grid(specs: Sequence[str]) -> List[Dict]:
    """``key=v1,v2,...`` specs -> list of override dicts (cartesian product).

    Values parse as YAML like ``--set`` does, with the same on/off-stays-a-
    string guard (cli._parse_overrides) so string-valued knobs survive.
    """
    axes = []
    for spec in specs:
        if "=" not in spec:
            raise ValueError(f"--grid expects key=v1,v2,..., got {spec!r}")
        key, values = spec.split("=", 1)
        parsed = []
        for raw in values.split(","):
            v = yaml.safe_load(raw)
            if isinstance(v, bool) and raw.strip().lower() not in ("true", "false"):
                v = raw.strip()
            parsed.append(v)
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
    (default: val_c_index for survival configs, val_accuracy for GE)."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    points = parse_grid(grids)
    rows = []
    for i, point in enumerate(points):
        overrides = {**(base_overrides or {}), **point}
        cfg = load_config(config_path, overrides)
        if metric is None:
            metric = (
                "val_accuracy"
                if cfg.model.name.lower().startswith(("geneexpr", "ge"))
                else "val_c_index"
            )
        if verbose:
            print(f"=== sweep point {i + 1}/{len(points)}: {point}")
        out = Trainer(cfg, verbose=False).fit()
        row = {"point": point, **{k: float(v) for k, v in out.items()}}
        rows.append(row)
        if verbose:
            print(f"    {metric}={row[metric]:.4f}")
    rows.sort(key=lambda r: r[metric], reverse=True)
    result = {"metric": metric, "rows": rows, "best": rows[0]}
    if verbose:
        print(f"best {metric}={rows[0][metric]:.4f} at {rows[0]['point']}")
    return result
