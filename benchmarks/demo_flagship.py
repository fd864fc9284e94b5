"""Flagship end-to-end capability demo — one script, the whole story.

Builds a TCGA-shaped ragged cohort (bags of 500 to 20,000 x 1024 patch
embeddings — the reference's real data regime, BASELINE.json configs), then
drives the full production path on the dev chip:

1. train MCAT medium at validated-epoch cadence (per-epoch validation +
   censored c-index, the reference's loop shape, mcat/main.py:320-337),
   with the device-resident dataset cache (bf16 on TPU) + multi-step
   dispatch auto-engaged,
2. checkpoints asynchronously mid-run (orbax background commits),
3. RESUMES from that checkpoint in a fresh Trainer and trains to the end,
4. exports leave-one-out attention maps (ATTN_* files, chunked kernel
   emission at M up to 20k — reference mcat/main.py:180-183),
5. runs the post-training analysis a real study needs: risk stratification
   of the validation split (KM curves + log-rank p, train/analysis.py) and
   MC-dropout predictive uncertainty for a held-out bag (serve.Predictor
   mc_samples) — neither exists anywhere in the reference.

Prints one JSON summary line; the measured numbers land in BASELINE.md.

Run:  python benchmarks/demo_flagship.py [--workdir DIR] [--patients N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BAG_LENGTHS = (500, 900, 1800, 3500, 7000, 14000, 20000)
BUCKETS = [1024, 2048, 4096, 8192, 20480]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mpot_flagship")
    ap.add_argument("--patients", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--resume-at", type=int, default=8)
    args = ap.parse_args()

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )
    from multimodal_path_omic_tpu.train.trainer import Trainer

    wd = args.workdir
    cohort_dir = os.path.join(wd, "cohort")
    t0 = time.time()
    # marker carries the patient count: reusing an old cohort after a
    # --patients change would train the old size while the summary reports
    # the new one
    marker = os.path.join(cohort_dir, f".cohort_{args.patients}")
    if not os.path.exists(marker):
        print(f"[flagship] generating ragged cohort ({args.patients} patients, "
              f"bags {min(BAG_LENGTHS)}-{max(BAG_LENGTHS)} x 1024) ...")
        import shutil

        shutil.rmtree(cohort_dir, ignore_errors=True)
        make_synthetic_cohort(
            cohort_dir, n_patients=args.patients, bag_lengths=BAG_LENGTHS,
            n_genes=60, n_signatures=6, seed=0, signal_strength=2.0,
        )
        with open(marker, "w") as f:
            f.write("ok")
    gen_s = time.time() - t0

    csv = os.path.join(cohort_dir, "cohort.csv")
    sig = os.path.join(cohort_dir, "signatures.csv")
    patches = os.path.join(cohort_dir, "patches")
    total_patches = 0
    for f in glob.glob(os.path.join(patches, "*.npy")):
        total_patches += np.load(f, mmap_mode="r").shape[0]

    def build_cfg(epochs, load_ckpt=None):
        raw = synthetic_config_dict(csv, sig, patches)
        raw["model"].update(
            model_size="medium", checkpoint_epoch=args.resume_at,
            checkpoint_dir=os.path.join(wd, "ckpts"),
        )
        raw["training"].update(
            epochs=epochs, loss="ces", optimizer="adam", lr=2e-4,
            grad_acc_step=8, leave_one_out="P000", output_attn_epoch=epochs,
            test_output_dir=os.path.join(wd, "outputs"),
        )
        raw["tpu"] = {
            "bag_buckets": BUCKETS,
            "compilation_cache_dir": os.path.join(wd, "xla_cache"),
        }
        cfg = config_from_dict(raw)
        if load_ckpt:
            cfg.model.load_from_checkpoint = load_ckpt
        return cfg

    # ---- phase 1: train to the checkpoint (async orbax commit mid-run) ----
    print(f"[flagship] phase 1: train epochs 1..{args.resume_at} "
          f"(async checkpoint at {args.resume_at})")
    t1 = Trainer(build_cfg(args.resume_at))
    p1 = time.time()
    out1 = t1.fit()
    p1 = time.time() - p1
    ckpts = sorted(glob.glob(os.path.join(wd, "ckpts", "*")), key=os.path.getmtime)
    assert ckpts, "no checkpoint written"
    ckpt = ckpts[-1]
    cache_engaged = t1.device_cache is not None
    cache_dtype = t1.cache_dtype

    # ---- phase 2: resume from the async checkpoint, train to the end ------
    print(f"[flagship] phase 2: resume from {os.path.basename(ckpt)} -> "
          f"epochs {args.resume_at + 1}..{args.epochs} + attention export")
    t2 = Trainer(build_cfg(args.epochs, load_ckpt=ckpt))
    assert t2.starting_epoch == args.resume_at, (
        f"resume epoch {t2.starting_epoch} != {args.resume_at}"
    )
    epoch_times = []
    p2 = time.time()
    out2 = t2.fit()  # runs train+validate per epoch, exports ATTN at the end
    p2 = time.time() - p2

    # steady-state validated-epoch cadence, measured directly — through the
    # overlapped dispatch chain fit() itself uses (Trainer.validated_epoch)
    n_meas = 3
    bags = len(t2.train_ds) + len(t2.val_ds)
    for e in range(n_meas):
        te = time.time()
        t2.validated_epoch(args.epochs + e)
        epoch_times.append(time.time() - te)
    steady = min(epoch_times)

    attn_files = glob.glob(os.path.join(wd, "outputs", "ATTN_*"))
    attn_shape = list(np.load(attn_files[-1]).shape) if attn_files else None

    # ---- phase 3: analysis on the trained model -------------------------
    # risk stratification (KM + log-rank) on the val split and MC-dropout
    # uncertainty for one bag — the post-training story a real study runs
    print("[flagship] phase 3: risk stratification + MC-dropout uncertainty")
    from multimodal_path_omic_tpu.serve import Predictor
    from multimodal_path_omic_tpu.train.analysis import stratify

    strat = stratify(
        t2.config, split="val", trainer=t2,
        out_csv=os.path.join(wd, "strat.csv"),
        png=os.path.join(wd, "km.png"),
        verbose=True,
    ) if len(t2.val_ds) >= 4 else None
    pred = Predictor(t2)
    _, _, _, omics0, bag0 = t2.val_ds[0]
    mc = pred.predict_bag(bag0, omics0, mc_samples=16, mc_seed=0)

    summary = {
        "patients": args.patients,
        "total_patches": int(total_patches),
        "bag_range": [int(min(BAG_LENGTHS)), int(max(BAG_LENGTHS))],
        "cohort_gen_s": round(gen_s, 1),
        "device_cache": cache_engaged,
        "cache_dtype": cache_dtype,
        "phase1_wall_s": round(p1, 1),
        "phase2_wall_s": round(p2, 1),
        "resume_from_epoch": args.resume_at,
        "final_val_c_index": round(float(out2.get("val_c_index", float("nan"))), 4),
        "steady_validated_epoch_s": round(steady, 3),
        "validated_bags_per_sec": round(bags / steady, 1),
        "attention_exports": len(attn_files),
        "attn_shape": attn_shape,
        "logrank_p": round(strat["p_value"], 4) if strat else None,
        "km_png": bool(strat and os.path.exists(os.path.join(wd, "km.png"))),
        "mc_risk": round(float(mc["risk_mean"][0]), 4),
        "mc_risk_std": round(float(mc["risk_std"][0]), 4),
    }
    print("[flagship] " + json.dumps(summary))


if __name__ == "__main__":
    main()
