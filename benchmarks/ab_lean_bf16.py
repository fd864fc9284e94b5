"""Quality A/B: lean attention reassociation under bfloat16 compute.

VERDICT r4 #5: the lean forms (ops/attention.py::lean_single_head_cross_
attention + the lean-V/lean-K pre-gated branch) are exact in real arithmetic
and parity-pinned in f32, but bf16 rounds their different contraction order
(``(q@wkᵀ)@kvᵀ`` vs ``q@(kv@wk)ᵀ``, reference math blocks.py:180-192)
differently — and bf16 compute is the TPU default at per-device B>=128. This
script trains paired arms (MPO_NO_LEAN_ATTENTION=1 vs default) on the same
synthetic cohort with compute_dtype FORCED to bfloat16, over N paired seeds,
and reports the best-epoch validation c-index per arm.

Usage:
  python benchmarks/ab_lean_bf16.py [--seeds 42 43 44] [--epochs 20]
      [--patients 128] [--model mcat|nacagat]

One process runs all arms: quality is insensitive to the program-switch cost
that forces the TIMING ladders into one-arm-per-process.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_e2e import build_cohort  # noqa: E402


def run_arm(raw, seed: int, lean: bool, model: str, epochs: int) -> dict:
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.trainer import Trainer

    if lean:
        os.environ.pop("MPO_NO_LEAN_ATTENTION", None)
    else:
        os.environ["MPO_NO_LEAN_ATTENTION"] = "1"
    raw = json.loads(json.dumps(raw))  # deep copy
    raw["model"]["name"] = model.upper() if model == "mcat" else "NaCAGaT"
    raw["model"]["model_size"] = "medium"
    raw["training"].update(
        epochs=epochs, lr=2e-4, loss="ces", seed=seed, keep_best=True
    )
    raw["tpu"] = {
        "bag_buckets": [512],
        "batch_size": 32,
        "steps_per_dispatch": 8,
        "device_cache": "on",
        "compute_dtype": "bfloat16",
        "compilation_cache_dir": "/tmp/ab_lean_bf16_jax_cache",
    }
    cfg = config_from_dict(raw)
    cfg.training.test_output_dir = ""
    cfg.training.keep_best = False  # score only; skip checkpoint IO
    t = Trainer(cfg, verbose=False)
    out = t.fit()
    return {
        "best_val_c_index": round(out.get("best_val_c_index", float("nan")), 4),
        "final_val_c_index": round(out.get("val_c_index", float("nan")), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43, 44])
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--patients", type=int, default=128)
    ap.add_argument("--model", default="mcat", choices=["mcat", "nacagat"])
    ap.add_argument("--cohort-dir", default="/tmp/ab_lean_bf16_cohort")
    args = ap.parse_args()

    raw = build_cohort(args.cohort_dir, args.patients)
    rows = []
    for seed in args.seeds:
        pair = {}
        for lean in (True, False):
            arm = "lean" if lean else "no_lean"
            pair[arm] = run_arm(raw, seed, lean, args.model, args.epochs)
        rec = {"seed": seed, "model": args.model, "epochs": args.epochs,
               "compute": "bfloat16", **{
                   k: v["best_val_c_index"] for k, v in pair.items()}}
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    import numpy as np

    d = np.array([r["lean"] - r["no_lean"] for r in rows], float)
    print(json.dumps({
        "summary": "paired best-val c-index, lean minus no_lean",
        "mean_diff": round(float(d.mean()), 4),
        "std_diff": round(float(d.std(ddof=1)) if len(d) > 1 else 0.0, 4),
        "n_seeds": len(d),
    }))


if __name__ == "__main__":
    main()
