"""Throughput benchmark for the user's OWN config/data: ``cli bench``.

The repo-level ``bench.py`` measures the fixed headline workload; this
module productizes the same methodology — warmup epochs absorb compile +
device-cache upload, then steady-state epochs are timed with a hard host
sync — for whatever cohort and config the user actually runs. The reference
offers a per-50-batches seconds print with a /32 divisor bug
(reference: mcat/main.py:63-68); this prints one honest JSON line.
"""

from __future__ import annotations

import time
from typing import Any, Dict


def benchmark_training(
    config,
    epochs: int = 5,
    warmup: int = 1,
    validate: bool = False,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Run ``warmup`` untimed epochs (compile + cache upload) then ``epochs``
    timed ones; returns the measurement dict (also printed as one JSON line
    when ``verbose``). ``validate`` times validated-epoch cadence (train +
    validation + metric each epoch) instead of train-only."""
    if epochs < 1 or warmup < 0:
        raise ValueError("need epochs >= 1 and warmup >= 0")
    import numpy as np

    from multimodal_path_omic_tpu.train.trainer import Trainer

    trainer = Trainer(config, verbose=False)
    n_train = len(trainer.train_ds)
    if n_train == 0:
        raise ValueError("empty training split — nothing to benchmark")

    t0 = time.perf_counter()
    cache_engaged = trainer._ensure_device_cache()
    upload_s = time.perf_counter() - t0

    e = 0
    for _ in range(warmup):
        if validate:
            trainer.validated_epoch(e)
        else:
            trainer.train_epoch(e)
        e += 1

    train_s, val_s = [], []
    for _ in range(epochs):
        if validate:
            # the fit() path: train + validation as ONE overlapped dispatch
            # chain with a single combined metric sync (validated_epoch) —
            # what a real validated run actually costs per epoch
            t0 = time.perf_counter()
            trainer.validated_epoch(e)
            train_s.append(time.perf_counter() - t0)
        else:
            t0 = time.perf_counter()
            trainer.train_epoch(e)
            train_s.append(time.perf_counter() - t0)
        e += 1

    med_train = float(np.median(train_s))
    med_val = float(np.median(val_s)) if val_s else 0.0
    epoch_s = med_train + med_val
    result: Dict[str, Any] = {
        "metric": "train_bags_per_sec_e2e",
        "value": round(n_train / epoch_s, 1),
        "unit": "bags/sec",
        "backend": __import__("jax").default_backend(),
        "n_train_bags": n_train,
        "steps_per_epoch": getattr(trainer, "last_epoch_steps", None),
        # validated mode times the whole overlapped train+val chain under
        # median_train_epoch_s (phases are not separable in one dispatch
        # chain); median_val_epoch_s stays for schema continuity
        "median_train_epoch_s": round(med_train, 4),
        "median_val_epoch_s": round(med_val, 4) if validate else None,
        "validated_cadence": bool(validate),
        "warmup_epochs": warmup,
        "timed_epochs": epochs,
        "device_cache": bool(cache_engaged),
        "cache_dtype": trainer.cache_dtype if cache_engaged else None,
        "cache_upload_s": round(upload_s, 3),
        "steps_per_dispatch": trainer.steps_per_dispatch,
        "batch_size": trainer.batch_size,
    }
    if verbose:
        import json

        print(json.dumps(result))
    return result
