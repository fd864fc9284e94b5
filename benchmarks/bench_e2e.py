"""End-to-end Trainer benchmark: full epochs on a 512-patient synthetic cohort.

Reproduces the BASELINE.md "END-TO-END Trainer run" row: MCAT medium,
ces+adam, bags of 300-500x1024 patches + 6 signature groups, device-resident
dataset cache + multi-step dispatch. Reports the one-time cache upload time,
steady-state epoch seconds, and quality (val c-index), as one JSON line.

Usage:
  python benchmarks/bench_e2e.py [--cache-dtype auto|float32|bfloat16|int8] [--epochs 6]
      [--patients 512] [--cache on|off|auto] [--steps-per-dispatch 8]

The cohort is generated once into --cohort-dir (default /tmp/bench_e2e_cohort)
and reused across invocations, so A/B runs compare the identical dataset.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cohort(out_dir: str, n_patients: int, seed: int = 0):
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )

    marker = os.path.join(out_dir, f".cohort_{n_patients}_{seed}")
    csv = os.path.join(out_dir, "cohort.csv")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        # the cohort files are SHARED per out_dir: drop every other marker so
        # a later run with the old params regenerates instead of silently
        # benchmarking this run's cohort
        import glob as _glob

        for old in _glob.glob(os.path.join(out_dir, ".cohort_*")):
            os.unlink(old)
        csv, sig, patches = make_synthetic_cohort(
            out_dir,
            n_patients=n_patients,
            bag_lengths=(300, 400, 500),
            n_genes=60,
            n_signatures=6,
            seed=seed,
            signal_strength=2.0,
        )
        with open(marker, "w") as f:
            f.write("ok")
    sig = os.path.join(out_dir, "signatures.csv")
    patches = os.path.join(out_dir, "patches")
    return synthetic_config_dict(csv, sig, patches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cache-dtype", default="auto",
        choices=["auto", "float32", "bfloat16", "int8"],
        help="auto = the Trainer default (bfloat16 on TPU)",
    )
    ap.add_argument("--cache", default="on", choices=["on", "off", "auto"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--patients", type=int, default=512)
    ap.add_argument("--steps-per-dispatch", type=int, default=8)
    ap.add_argument("--cohort-dir", default="/tmp/bench_e2e_cohort")
    ap.add_argument("--validate", action="store_true", help="per-epoch validation")
    ap.add_argument(
        "--overlap", default="on", choices=["on", "off"],
        help="with --validate: run train+val as ONE overlapped dispatch chain "
        "(Trainer.validated_epoch, the fit() default) vs the serial "
        "train_epoch-then-validate composition (the pre-round-5 behavior)",
    )
    args = ap.parse_args()
    if args.epochs < 1:
        ap.error("--epochs must be >= 1")

    raw = build_cohort(args.cohort_dir, args.patients)
    raw["model"]["model_size"] = "medium"
    raw["training"].update(epochs=args.epochs, lr=2e-4, loss="ces")
    raw["tpu"] = {
        "bag_buckets": [512],
        "batch_size": 32,
        "steps_per_dispatch": args.steps_per_dispatch,
        "device_cache": args.cache,
        "cache_dtype": args.cache_dtype,
        # A/B invocations recompile identical steps otherwise (multi-minute
        # on the tunneled chip)
        "compilation_cache_dir": "/tmp/bench_e2e_jax_cache",
    }
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = config_from_dict(raw)
    cfg.training.test_output_dir = ""
    t = Trainer(cfg, verbose=False)

    t_up0 = time.perf_counter()
    engaged = t._ensure_device_cache()
    upload_s = time.perf_counter() - t_up0

    epoch_s, val_s, combined_s, val = [], [], [], {}
    for e in range(args.epochs):
        if args.validate and args.overlap == "on":
            # the fit() path: train dispatch -> metric-fetch enqueue -> val
            # dispatch -> host reduces, as one chain. Component times are not
            # separable here; the combined wall time is the cadence.
            t0 = time.perf_counter()
            out, val = t.validated_epoch(e)
            combined_s.append(time.perf_counter() - t0)
            continue
        t0 = time.perf_counter()
        out = t.train_epoch(e)
        epoch_s.append(time.perf_counter() - t0)
        if args.validate:
            t0 = time.perf_counter()
            val = t.validate(e)
            val_s.append(time.perf_counter() - t0)
    if not args.validate:
        val = t.validate(args.epochs - 1)
    if combined_s:
        # synthesize the per-phase rows the serial path reports so the JSON
        # schema stays comparable; train/val split is not observable here
        epoch_s = combined_s
        val_s = [0.0] * len(combined_s)
    n_train = len(t.train_ds)
    steady = min(epoch_s[1:]) if len(epoch_s) > 1 else epoch_s[0]
    rec = {
        "metric": "e2e_train_bags_per_sec",
        "value": round(n_train / steady, 1),
        "unit": "bags/sec",
        "cache": args.cache,
        "cache_dtype": args.cache_dtype,
        "cache_engaged": bool(engaged),
        "upload_s": round(upload_s, 2),
        "first_epoch_s": round(epoch_s[0], 2),
        "steady_epoch_s": round(steady, 3),
        "epochs": args.epochs,
        "train_bags": n_train,
        "val_c_index": round(val.get("val_c_index", float("nan")), 4),
    }
    if val_s:
        steady_val = min(val_s[1:]) if len(val_s) > 1 else val_s[0]
        rec["overlap"] = args.overlap
        rec["val_epoch_s"] = round(steady_val, 3)
        # train+val throughput: full validated-epoch cadence
        rec["train_val_bags_per_sec"] = round(
            n_train / (steady + steady_val), 1
        )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
