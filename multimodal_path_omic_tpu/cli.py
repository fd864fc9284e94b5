"""Command-line interface.

The reference has no CLI: each model directory hard-codes its config path in
``__main__`` (reference: mcat/main.py:343-345) and relies on CWD-relative
imports. Here one entry point drives everything:

    python -m multimodal_path_omic_tpu.cli train --config cfg.yaml
    python -m multimodal_path_omic_tpu.cli train --config cfg.yaml \
        --set training.lr=1e-4 --set model.fusion=bilinear
    python -m multimodal_path_omic_tpu.cli validate --config cfg.yaml \
        --checkpoint checkpoints/MCAT_...
    python -m multimodal_path_omic_tpu.cli export-attn --config cfg.yaml \
        --checkpoint ... --patient P013 --png
    python -m multimodal_path_omic_tpu.cli convert-checkpoint --config cfg.yaml \
        --torch-checkpoint ref.pt --out ckpt_dir
    python -m multimodal_path_omic_tpu.cli check-data --config cfg.yaml
    python -m multimodal_path_omic_tpu.cli plan --config cfg.yaml
    python -m multimodal_path_omic_tpu.cli profile --config cfg.yaml --top 20
    python -m multimodal_path_omic_tpu.cli bench --config cfg.yaml --epochs 5
    python -m multimodal_path_omic_tpu.cli cv --config cfg.yaml --folds 5
    python -m multimodal_path_omic_tpu.cli stratify --config cfg.yaml \
        --checkpoint ... --png km.png
    python -m multimodal_path_omic_tpu.cli evaluate --config cfg.yaml \
        --checkpoint ... --split val --json
    python -m multimodal_path_omic_tpu.cli sweep --config cfg.yaml \
        --grid training.lr=1e-4,2e-4
    python -m multimodal_path_omic_tpu.cli predict --config cfg.yaml \
        --checkpoint ... --out preds.csv
    python -m multimodal_path_omic_tpu.cli export-model --config cfg.yaml \
        --checkpoint ... --out bundle/
    python -m multimodal_path_omic_tpu.cli convert-bags --src bags/ --dst bags_npy/
    python -m multimodal_path_omic_tpu.cli serve --config cfg.yaml \
        --checkpoint ... --port 8008 --dynamic-batch 8
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict, List, Optional


def _parse_overrides(pairs: List[str], args=None) -> Dict[str, Any]:
    from multimodal_path_omic_tpu.config import parse_cli_scalar

    overrides: Dict[str, Any] = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got {pair!r}")
        key, value = pair.split("=", 1)
        # YAML-scalar parsing incl. the on/off-stays-a-string guard — shared
        # with --grid (train/sweep.py) so the two cannot drift apart
        overrides[key] = parse_cli_scalar(value)
    if args is not None and getattr(args, "bug_compat", False):
        overrides["training.bug_compat"] = True
    return overrides


def cmd_train(args) -> int:
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    trainer = Trainer(cfg)
    if args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    if args.profile_dir:
        from multimodal_path_omic_tpu.train.logging import profile_trace

        with profile_trace(args.profile_dir):
            result = trainer.fit()
    else:
        result = trainer.fit()
    print({k: round(float(v), 6) for k, v in result.items()})
    return 0


def cmd_validate(args) -> int:
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    trainer = Trainer(cfg)
    if args.checkpoint:
        trainer.restore(args.checkpoint)
    elif args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    result = trainer.validate("final validation")
    print({k: round(float(v), 6) for k, v in result.items()})
    return 0


def cmd_export_attn(args) -> int:
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    overrides = _parse_overrides(args.set, args)
    overrides["training.leave_one_out"] = args.patient
    cfg = load_config(args.config, overrides)
    trainer = Trainer(cfg)
    if args.checkpoint:
        trainer.restore(args.checkpoint)
    elif args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    trainer.test(epoch=args.epoch, save=True, png=getattr(args, "png", False))
    return 0


def cmd_predict(args) -> int:
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.serve import Predictor

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    predictor = Predictor.from_config(
        cfg, checkpoint=args.checkpoint, torch_checkpoint=args.torch_checkpoint
    )
    path = predictor.predict_to_csv(
        args.out, mc_samples=args.mc, mc_seed=args.mc_seed
    )
    print(f"Predictions written to {path}")
    return 0


def cmd_bench(args) -> int:
    """Throughput benchmark on the user's own config/data
    (train/benchmark.py): warmup epochs absorb compile + cache upload, then
    steady-state epochs are timed; prints one JSON line."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.benchmark import benchmark_training

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    benchmark_training(
        cfg, epochs=args.epochs, warmup=args.warmup, validate=args.validate
    )
    return 0


def cmd_stratify(args) -> int:
    """Risk stratification (train/analysis.py): KM groups + log-rank test,
    the statistic/figure the MCAT-family papers report."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.analysis import stratify

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    result = stratify(
        cfg,
        checkpoint=args.checkpoint,
        torch_checkpoint=args.torch_checkpoint,
        quantile=args.quantile,
        split=args.split,
        out_csv=args.out,
        png=args.png,
        mc_samples=args.mc,
    )
    if args.json:
        import json as _json

        print(_json.dumps({k: v for k, v in result.items() if k != "km"}))
    return 0


def cmd_evaluate(args) -> int:
    """Time-dependent survival evaluation (train/analysis.py): c-index +
    IPCW Brier scores / IBS + Uno's AUC(t) — the metric panel the survival
    literature reports beyond the reference's lone c-index."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.analysis import evaluate

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    times = (
        [float(x) for x in args.times.split(",")] if args.times else None
    )
    result = evaluate(
        cfg,
        checkpoint=args.checkpoint,
        torch_checkpoint=args.torch_checkpoint,
        split=args.split,
        eval_times=times,
    )
    if args.json:
        import json as _json

        print(_json.dumps(result))
    return 0


def cmd_convert_checkpoint(args) -> int:
    """Convert a reference PyTorch checkpoint to this framework's format."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train import checkpoint as ckpt
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    trainer = Trainer(cfg)
    trainer.load_torch_checkpoint(args.torch_checkpoint)
    # save() stores epoch+1; passing starting_epoch-1 round-trips exactly.
    # A torch payload without an 'epoch' key leaves starting_epoch=0 — the
    # converted checkpoint must store 0 (resume trains from epoch 0), not 1
    # (the old `if starting_epoch else 0` branch made resume SKIP epoch 0).
    path = trainer.save(trainer.starting_epoch - 1, 0.0)
    ckpt.wait_for_checkpoints()  # surface async-commit errors before exit 0
    print(f"Converted checkpoint written to {path}")
    return 0


def cmd_cv(args) -> int:
    """Patient-level k-fold cross-validation (train/cv.py): the reference
    evaluates one seeded split per run; the MCAT literature reports
    cross-validated c-index."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.cv import cross_validate, save_results

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    folds = (
        [int(x) for x in args.fold_indices.split(",")]
        if args.fold_indices
        else None
    )
    result = cross_validate(
        cfg, k=args.folds, fold_indices=folds, save_folds=args.save_folds
    )
    save_results(result, args.out)
    return 0


def cmd_check_data(args) -> int:
    """Cohort preflight (data/check.py): validate CSV schema, labels,
    signature coverage, and the bag store before spending device time."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.data.check import check_data

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    report = check_data(cfg)
    return 1 if report["fatal"] else 0


def cmd_profile(args) -> int:
    """Trace-and-rank profiler (train/profiling.py): train briefly under a
    jax.profiler capture and print a ranked device-op report — no
    TensorBoard needed. ``--trace-dir`` alone re-analyzes an existing
    capture (e.g. one from ``train --profile-dir``)."""
    from multimodal_path_omic_tpu.train.profiling import (
        format_report,
        parse_trace,
        profile_training,
    )

    if args.config is None:
        if not args.trace_dir:
            print("profile: need --config (capture + analyze) or --trace-dir")
            return 1
        print(format_report(parse_trace(args.trace_dir, steps=args.steps or None),
                            top=args.top))
        return 0

    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    trainer = Trainer(cfg)
    trace_dir = args.trace_dir or os.path.join(
        cfg.training.checkpoint_dir or ".", "profile_trace"
    )
    profile_training(trainer, trace_dir, epochs=args.epochs, top=args.top)
    print(f"trace kept at {trace_dir} (TensorBoard-viewable)")
    return 0


def cmd_plan(args) -> int:
    """AOT memory-fit report (train/plan.py): params + optimizer + device
    cache + per-bucket step-program peaks vs the device's HBM, computed
    WITHOUT running a step. Exit 1 when the estimate does not fit."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.plan import format_plan, memory_plan

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    plan = memory_plan(cfg)
    print(format_plan(plan))
    return 0 if plan["fits"] else 1


def cmd_sweep(args) -> int:
    """Hyperparameter grid sweep (train/sweep.py): the cartesian product of
    --grid axes, each a full training run; rows ranked best-first."""
    import json

    from multimodal_path_omic_tpu.train.sweep import run_sweep

    result = run_sweep(
        args.config,
        args.grid or [],
        base_overrides=_parse_overrides(args.set, args),
        metric=args.metric,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


def cmd_export_model(args) -> int:
    """Export the trained model as a self-contained StableHLO bundle
    (deploy.export_model): serving needs only the jax runtime + the bundle,
    not this framework. The reference's only inference surface is the
    in-process test() loop (reference: mcat/main.py:158-183)."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.deploy import export_model
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(args.config, _parse_overrides(args.set, args))
    trainer = Trainer(cfg)
    if args.checkpoint:
        trainer.restore(args.checkpoint)
    elif args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    elif not args.allow_untrained:
        # unlike validate/predict (read-only diagnostics), this mints a
        # deployment artifact — a bundle of random init weights looks valid
        # and serves garbage
        raise SystemExit(
            "export-model without --checkpoint/--torch-checkpoint would "
            "bundle RANDOM weights; pass --allow-untrained if that is "
            "really what you want"
        )
    manifest = export_model(
        trainer,
        args.out,
        batch_sizes=tuple(int(x) for x in args.batch_sizes.split(",")),
        platforms=tuple(args.platforms.split(",")),
        max_bag=args.max_bag,
        weights_dtype=args.weights_dtype,
    )
    print(
        f"Exported {len(manifest['artifacts'])} programs "
        f"({manifest['model']}, buckets {manifest['buckets']}, "
        f"batch sizes {manifest['batch_sizes']}) to {args.out}"
    )
    return 0


def cmd_convert_bags(args) -> int:
    """Convert a reference bag store (.pt dir / .h5 file) to the fast .npy
    store (data/bags.py::convert_bags)."""
    from multimodal_path_omic_tpu.data.bags import convert_bags

    convert_bags(args.src, args.dst, dtype=args.dtype)  # raises on 0 bags
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["serve"]:
        # passthrough: `cli serve ...` == `python -m multimodal_path_omic_tpu.server ...`
        # (delegated before argparse — the server owns its own flag surface)
        from multimodal_path_omic_tpu.server import main as server_main

        return server_main(argv[1:])
    parser = argparse.ArgumentParser(prog="multimodal_path_omic_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--config", required=True, help="YAML config (reference schema)")
        p.add_argument("--set", action="append", metavar="KEY=VALUE",
                       help="dotted config override, e.g. training.lr=1e-4")
        p.add_argument("--torch-checkpoint", help="reference .pt checkpoint to load")
        p.add_argument(
            "--bug-compat", action="store_true",
            help="replicate the reference's bugs exactly (unseeded split, "
            "misaligned signature subsets, frozen fusion gates) for A/B studies",
        )

    p_train = sub.add_parser("train", help="train a model (mcat/nacagat/ge_nacagat)")
    common(p_train)
    p_train.add_argument("--profile-dir", help="capture a jax.profiler trace here")
    p_train.set_defaults(fn=cmd_train)

    p_val = sub.add_parser("validate", help="run validation only")
    common(p_val)
    p_val.add_argument("--checkpoint", help="framework checkpoint to restore")
    p_val.set_defaults(fn=cmd_validate)

    p_attn = sub.add_parser("export-attn", help="leave-one-out attention export")
    common(p_attn)
    p_attn.add_argument("--checkpoint")
    p_attn.add_argument("--patient", required=True)
    p_attn.add_argument("--epoch", type=int, default=0)
    p_attn.add_argument(
        "--png",
        action="store_true",
        help="also render each exported map as a heatmap/profile PNG",
    )
    p_attn.set_defaults(fn=cmd_export_attn)

    p_pred = sub.add_parser("predict", help="batch inference -> CSV")
    common(p_pred)
    p_pred.add_argument("--checkpoint", action="append",
                        help="framework checkpoint; repeat to average a "
                        "checkpoint ENSEMBLE (e.g. the cv fold models)")
    p_pred.add_argument("--out", required=True, help="output CSV path")
    p_pred.add_argument("--mc", type=int, default=0,
                        help="MC-dropout samples: add risk_mc_std / y_*_mc_std "
                        "predictive-uncertainty columns from N stochastic "
                        "forwards (0 = off)")
    p_pred.add_argument("--mc-seed", type=int, default=0)
    p_pred.set_defaults(fn=cmd_predict)

    p_conv = sub.add_parser(
        "convert-checkpoint", help="reference .pt -> framework checkpoint"
    )
    common(p_conv)
    p_conv.add_argument("--out", help="(unused; checkpoint_dir from config)")
    p_conv.set_defaults(fn=cmd_convert_checkpoint)

    p_chk = sub.add_parser(
        "check-data",
        help="cohort preflight: CSV schema, labels, signature coverage, bag "
        "store consistency (exit 1 on fatal issues)",
    )
    common(p_chk)
    p_chk.set_defaults(fn=cmd_check_data)

    p_sweep = sub.add_parser(
        "sweep",
        help="grid sweep: train the cartesian product of --grid axes, rank "
        "by the run's quality metric",
    )
    common(p_sweep)
    p_sweep.add_argument(
        "--grid", action="append", metavar="KEY=V1,V2,...",
        help="dotted-config axis, e.g. training.lr=1e-4,2e-4 (repeatable; "
        "axes combine as a cartesian product)",
    )
    p_sweep.add_argument("--metric", help="rank key (default: val_c_index / val_accuracy)")
    p_sweep.add_argument("--out", help="write ranked results JSON")
    p_sweep.set_defaults(fn=cmd_sweep)

    p_cv = sub.add_parser(
        "cv", help="patient-level k-fold cross-validation (mean±std metric)"
    )
    common(p_cv)
    p_cv.add_argument("--folds", type=int, default=5)
    p_cv.add_argument("--out", help="write per-fold + aggregate results JSON")
    p_cv.add_argument("--save-folds", action="store_true",
                      help="save each fold's final model checkpoint and "
                      "report its path (feed back as repeated --checkpoint "
                      "for ensemble inference)")
    p_cv.add_argument(
        "--fold-indices",
        help="comma list: run only these folds (one per SLURM array task); "
        "the fold split is still computed over all --folds",
    )
    p_cv.set_defaults(fn=cmd_cv)

    p_exp = sub.add_parser(
        "export-model",
        help="trained model -> self-contained StableHLO bundle (jax.export); "
        "serve with jax runtime only, no framework code",
    )
    common(p_exp)
    p_exp.add_argument("--checkpoint", help="framework checkpoint to restore")
    p_exp.add_argument("--out", required=True, help="output bundle directory")
    p_exp.add_argument(
        "--batch-sizes", default="1",
        help="comma-separated batch sizes to export programs for (e.g. 1,8)",
    )
    p_exp.add_argument(
        "--platforms", default="cpu,tpu",
        help="lowering targets baked into each artifact",
    )
    p_exp.add_argument(
        "--max-bag", type=int, default=None,
        help="largest expected bag; exports the rounded-up buckets the "
        "dataset path would jit on the fly (AOT bundles cannot)",
    )
    p_exp.add_argument(
        "--allow-untrained", action="store_true",
        help="export without a checkpoint (random init weights)",
    )
    p_exp.add_argument(
        "--weights-dtype", default="float32", choices=("float32", "bfloat16"),
        help="bfloat16 halves artifact bytes (storage cast; compute stays f32)",
    )
    p_exp.set_defaults(fn=cmd_export_model)

    p_bags = sub.add_parser(
        "convert-bags",
        help="reference .pt dir / .h5 file -> per-slide .npy store "
        "(native-loader fast path)",
    )
    p_bags.add_argument("--src", required=True, help=".pt directory or .h5 file")
    p_bags.add_argument("--dst", required=True, help="output .npy directory")
    p_bags.add_argument(
        "--dtype", default="float32", choices=("float32", "float16"),
        help="float16 halves disk but bypasses the native loader (f32-only)",
    )
    p_bags.set_defaults(fn=cmd_convert_bags)

    p_bench = sub.add_parser(
        "bench",
        help="steady-state training-throughput benchmark on your config/data",
    )
    common(p_bench)
    p_bench.add_argument("--epochs", type=int, default=5, help="timed epochs")
    p_bench.add_argument("--warmup", type=int, default=1,
                         help="untimed epochs (compile + cache upload)")
    p_bench.add_argument("--validate", action="store_true",
                         help="time validated-epoch cadence (train + val)")
    p_bench.set_defaults(fn=cmd_bench)

    p_strat = sub.add_parser(
        "stratify",
        help="KM risk groups + log-rank test from a trained model",
    )
    common(p_strat)
    p_strat.add_argument("--checkpoint", action="append",
                         help="framework checkpoint; repeatable (ensemble)")
    p_strat.add_argument("--quantile", type=float, default=0.5,
                         help="risk cut point (0.5 = median split)")
    p_strat.add_argument("--split", default="val", choices=("val", "train", "all"))
    p_strat.add_argument("--out", help="per-slide CSV (slide_id, risk, group, ...)")
    p_strat.add_argument("--png", help="render the KM figure here")
    p_strat.add_argument("--mc", type=int, default=0,
                         help="MC-dropout samples for risk_mc_std CSV column")
    p_strat.add_argument("--json", action="store_true",
                         help="also print the result summary as one JSON line")
    p_strat.set_defaults(fn=cmd_stratify)

    p_eval = sub.add_parser(
        "evaluate",
        help="metric panel: c-index + IPCW Brier/IBS + AUC(t) (survival) "
        "or per-class P/R/F1 + confusion (GE)",
    )
    common(p_eval)
    p_eval.add_argument("--checkpoint", action="append",
                        help="framework checkpoint; repeatable (ensemble)")
    p_eval.add_argument("--split", default="val", choices=("val", "train", "all"))
    p_eval.add_argument("--times",
                        help="comma-separated eval months (default: the "
                        "cohort's qcut bin edges)")
    p_eval.add_argument("--json", action="store_true",
                        help="also print the result as one JSON line")
    p_eval.set_defaults(fn=cmd_evaluate)

    p_plan = sub.add_parser(
        "plan",
        help="AOT memory-fit report: will this config fit the device's HBM?",
    )
    common(p_plan)
    p_plan.set_defaults(fn=cmd_plan)

    p_prof = sub.add_parser(
        "profile",
        help="trace a short training run and print a ranked device-op report",
    )
    p_prof.add_argument("--config", help="YAML config (reference schema)")
    p_prof.add_argument("--set", action="append", metavar="KEY=VALUE",
                        help="dotted config override, e.g. training.lr=1e-4")
    p_prof.add_argument("--trace-dir",
                        help="where to write the capture; alone (no --config): "
                        "re-analyze an existing capture")
    p_prof.add_argument("--epochs", type=int, default=1,
                        help="traced epochs after the untraced warmup epoch")
    p_prof.add_argument("--steps", type=int, default=0,
                        help="with --trace-dir alone: per-step normalizer")
    p_prof.add_argument("--top", type=int, default=25, help="ranked rows to print")
    p_prof.set_defaults(fn=cmd_profile)

    # listed for --help discoverability; dispatch happens before argparse
    # (the server owns its own flag surface, see the top of main)
    sub.add_parser(
        "serve",
        help="HTTP scoring server (flags: --config/--bundle --port --warmup "
        "--dynamic-batch ... ; see `serve --help`)",
        add_help=False,
    )

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
