"""Training A/B: the PyTorch reference vs this framework on one cohort.

The strongest available stand-in for real-data c-index parity (no TCGA-style
cohort exists in this environment): train the ACTUAL reference MCAT
(/root/reference, torch CPU, its own batch-1 + grad-accum loop semantics,
mcat/main.py:19-103) and this framework's Trainer on the IDENTICAL synthetic
planted-signal cohort and the IDENTICAL seeded patient split, then compare
per-epoch validation c-index trajectories. Dropout RNG necessarily differs,
so the comparison is statistical: both arms must learn the planted signal to
a comparable final c-index.

Usage: python benchmarks/ab_torch_vs_jax.py [--epochs 20] [--patients 128]
Prints one JSON line per (arm, epoch) plus a final summary line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_ROOT = "/root/reference"

from multimodal_path_omic_tpu.train.metrics import (  # noqa: E402
    concordance_index_censored,
)


def build_cohort(out_dir: str, n_patients: int, seed: int,
                 cohort: str = "dense"):
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.dataset import MultimodalDataset
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )

    # 'dense' plants the risk signal on EVERY patch (easy pooled signal —
    # regularizers can't discriminate there, see docs/ab_torch_vs_jax.md).
    # 'sparse' is the MIL-attention regime: 5% informative patches at 4x
    # per-patch magnitude + 10% broken survival labels.
    hardness = (
        {}
        if cohort == "dense"
        else {"informative_patch_frac": 0.05,
              "informative_patch_scale": 4.0,
              "label_noise": 0.1}
    )
    csv, sig, patches = make_synthetic_cohort(
        out_dir,
        n_patients=n_patients,
        bag_lengths=(200, 350, 500),
        n_genes=60,
        n_signatures=6,
        seed=seed,
        signal_strength=2.0,
        **hardness,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["training"]["lr"] = 2e-4
    # FAIR ARMS: the torch arm steps its optimizer every grad_acc_step
    # samples, the jax arm every batch — they must be equal or the arm with
    # more Adam updates/epoch converges faster regardless of framework
    # (synthetic_config_dict defaults grad_acc_step to 8, which silently gave
    # the torch arm 4x the update cadence in early round-2 runs).
    raw["training"]["grad_acc_step"] = 32  # reference default (config.yaml:67)
    raw["tpu"] = {"bag_buckets": [512], "batch_size": 32}
    cfg = config_from_dict(raw)
    dataset = MultimodalDataset(csv, cfg, use_signatures=True, verbose=False)
    return cfg, dataset


def torch_arm(dataset, split_seed: int, epochs: int, lr: float, grad_acc: int,
              model_name: str = "mcat", loss_name: str = "ces"):
    """The reference's training loop, faithfully (mcat/main.py:19-155;
    nacagat/main.py:30-60 for the cesar branch)."""
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.loss import (  # type: ignore
        CrossEntropySurvivalAttnRegLoss,
        CrossEntropySurvivalLoss,
    )

    if model_name == "nacagat":
        from models.nacagat.nacagat import (  # type: ignore
            NarrowContextualAttentionGateTransformer as RefModel,
        )
    else:
        from models.mcat.mcat import (  # type: ignore
            MultimodalCoAttentionTransformer as RefModel,
        )

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    train_ds, val_ds, _ = dataset.split(0.8, seed=split_seed)

    def rows(ds):
        t = ds.table
        out = []
        for i in range(len(t.df)):
            omics = [
                torch.tensor(t.signature_data[n][i]) for n in t.signature_names
            ]
            bag = torch.tensor(np.asarray(ds.store.get(t.slide_ids[i]), np.float32))
            out.append(
                (
                    float(t.survival_months[i]),
                    int(t.survival_class[i]),
                    float(t.censorship[i]),
                    omics,
                    bag,
                )
            )
        return out

    train_rows, val_rows = rows(train_ds), rows(val_ds)
    model = RefModel(omic_sizes=dataset.signature_sizes, model_size="small")
    # mirror the REFERENCE's factory (mcat/main.py:272-280): 'ce' is plain
    # CrossEntropyLoss on the softmaxed Y — mapping it to CES here would
    # train different objectives in the two arms and fake a quality gap
    if loss_name == "cesar":
        loss_fn = CrossEntropySurvivalAttnRegLoss()
    elif loss_name == "ce":
        loss_fn = torch.nn.CrossEntropyLoss()
    else:
        loss_fn = CrossEntropySurvivalLoss()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    rng = np.random.default_rng(split_seed)

    history = []
    for epoch in range(epochs):
        model.train()
        order = rng.permutation(len(train_rows))
        opt.zero_grad()
        for bi, ridx in enumerate(order):
            months, klass, cens, omics, bag = train_rows[ridx]
            hazards, survs, y, attn = model(wsi=bag, omics=omics)
            if loss_name == "cesar":
                loss, _attn_loss = loss_fn(
                    hazards, survs, torch.tensor([[klass]]),
                    c=torch.tensor([[cens]]), attention=attn["coattn"],
                )
            elif loss_name == "ce":
                # reference mcat/main.py:41-42: CE on the softmaxed Y
                loss = loss_fn(y, torch.tensor([klass]).long())
            else:
                loss = loss_fn(
                    hazards, survs, torch.tensor([[klass]]), c=torch.tensor([[cens]])
                )
            (loss / grad_acc).backward()
            if (bi + 1) % grad_acc == 0:
                opt.step()
                opt.zero_grad()
        model.eval()
        risks, times, events = [], [], []
        with torch.no_grad():
            for months, klass, cens, omics, bag in val_rows:
                _, survs, _, _ = model(wsi=bag, omics=omics)  # noqa
                risks.append(float(-survs.sum()))
                times.append(months)
                events.append(1.0 - cens)
        c = concordance_index_censored(
            np.array(events).astype(bool), np.array(times), np.array(risks)
        )[0]
        history.append(c)
        print(
            json.dumps({"arm": "torch_reference", "epoch": epoch + 1,
                        "val_c_index": round(c, 4)}),
            flush=True,
        )
    return history


def torch_arm_ge(cfg, gene: str, split_seed: int, epochs: int, lr: float,
                 grad_acc: int):
    """The reference GE driver's loop, faithfully (ge_nacagat/main.py:9-128):
    CE on the already-softmaxed Y (double-softmax quirk), grad-accum, val loss
    per epoch. Labels/split come from the framework's GeneExprDataset so both
    arms see the identical task."""
    import torch

    from multimodal_path_omic_tpu.data.dataset import GeneExprDataset

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.ge_nacagat.ge_nacagat import (  # type: ignore
        GeneExprNarrowContextualAttentionGateTransformer as RefGE,
    )

    dataset = GeneExprDataset(cfg.dataset.file, cfg, gene=gene, verbose=False)
    train_ds, val_ds, _ = dataset.split(0.8, seed=split_seed)

    def rows(ds):
        return [
            (int(ds.table.gene_expr_class[i]),
             torch.tensor(np.asarray(ds.bag(i), np.float32)))
            for i in range(len(ds))
        ]

    train_rows, val_rows = rows(train_ds), rows(val_ds)
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    model = RefGE(model_size="small")
    loss_fn = torch.nn.CrossEntropyLoss()
    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    rng = np.random.default_rng(split_seed)

    history = []
    for epoch in range(epochs):
        model.train()
        order = rng.permutation(len(train_rows))
        opt.zero_grad()
        for bi, ridx in enumerate(order):
            klass, bag = train_rows[ridx]
            y, _attn = model(wsi=bag)
            # reference quirk kept: CE applied to softmaxed Y
            # (ge_nacagat/main.py:33, ge_nacagat.py:67-68)
            loss = loss_fn(y.unsqueeze(0), torch.tensor([klass]))
            (loss / grad_acc).backward()
            if (bi + 1) % grad_acc == 0:
                opt.step()
                opt.zero_grad()
        model.eval()
        val_loss, correct = 0.0, 0
        with torch.no_grad():
            for klass, bag in val_rows:
                y, _ = model(wsi=bag)
                val_loss += float(loss_fn(y.unsqueeze(0), torch.tensor([klass])))
                correct += int(int(torch.argmax(y)) == klass)
        val_loss /= max(len(val_rows), 1)
        acc = correct / max(len(val_rows), 1)
        history.append((val_loss, acc))
        print(
            json.dumps({"arm": "torch_reference", "epoch": epoch + 1,
                        "val_loss": round(val_loss, 4),
                        "val_accuracy": round(acc, 4)}),
            flush=True,
        )
    return history


def jax_arm(cfg, epochs: int, ge: bool = False):
    """One epoch loop for both task families; ``ge`` selects the metrics
    recorded ((val_loss, val_accuracy) tuples vs val_c_index floats)."""
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg.training.epochs = epochs
    trainer = Trainer(cfg, verbose=False)
    history = []

    for epoch in range(epochs):
        trainer.train_epoch(epoch)
        out = trainer.validate(epoch)
        if ge:
            rec = (out["val_loss"], out.get("val_accuracy", float("nan")))
            payload = {"val_loss": round(rec[0], 4),
                       "val_accuracy": round(rec[1], 4)}
        else:
            rec = out["val_c_index"]
            payload = {"val_c_index": round(rec, 4)}
        history.append(rec)
        print(
            json.dumps({"arm": "jax_tpu_framework", "epoch": epoch + 1,
                        **payload}),
            flush=True,
        )
    return history


def jax_arm_ge(cfg, epochs: int):
    return jax_arm(cfg, epochs, ge=True)


def _emit(summary: dict, args) -> None:
    summary["cohort"] = args.cohort
    if args.patch_dropout > 0.0:
        summary["patch_dropout"] = args.patch_dropout
    line = json.dumps(summary)
    print(line, flush=True)
    if args.log:
        with open(args.log, "a") as f:
            f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--model", default="mcat", choices=["mcat", "nacagat", "ge"])
    ap.add_argument("--loss", default="ces", choices=["ces", "cesar", "ce"])
    ap.add_argument("--gene", default="G000", help="GE arm: gene to predict")
    ap.add_argument("--patients", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out-dir", default="/tmp/ab_cohort")
    ap.add_argument(
        "--platform", default=None, choices=[None, "cpu"],
        help="cpu = force the jax arm onto a hermetic CPU backend with true-"
        "f32 matmuls (the ambient plugin overrides the JAX_PLATFORMS env "
        "var, so an env var alone is NOT enough); default = ambient backend")
    ap.add_argument("--arm", default="both", choices=["both", "torch", "jax"])
    ap.add_argument(
        "--cohort", default="dense", choices=["dense", "sparse"],
        help="dense = signal on every patch; sparse = 5%% informative "
        "patches at 4x magnitude + 10%% label noise (MIL-attention regime)")
    ap.add_argument(
        "--patch-dropout", type=float, default=0.0,
        help="jax arm only: training.patch_dropout (regularizer A/B)")
    ap.add_argument(
        "--log", default=None,
        help="append the summary JSON line to this file (multi-seed sweeps)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        # hermetic CPU comparisons also want true-f32 matmuls (this jax build
        # defaults to bf16-like precision)
        jax.config.update("jax_default_matmul_precision", "highest")

    cfg, dataset = build_cohort(
        args.out_dir, args.patients, args.seed, cohort=args.cohort
    )
    cfg.training.seed = args.seed
    if args.patch_dropout > 0.0:
        cfg.training.patch_dropout = args.patch_dropout
    if args.model == "ge":
        cfg.model.name = "GeneExpr-NaCAGaT"
        cfg.model.gene = args.gene
        cfg.training.loss = "ce"  # the GE driver's only loss (main.py:32-35)

        torch_hist = jax_hist = [(float("nan"), float("nan"))]
        torch_secs = jax_secs = float("nan")
        if args.arm in ("both", "torch"):
            t0 = time.time()
            torch_hist = torch_arm_ge(
                cfg, args.gene, split_seed=args.seed, epochs=args.epochs,
                lr=cfg.training.lr, grad_acc=cfg.training.grad_acc_step,
            )
            torch_secs = time.time() - t0
        if args.arm in ("both", "jax"):
            t0 = time.time()
            jax_hist = jax_arm_ge(cfg, args.epochs)
            jax_secs = time.time() - t0

        k = max(1, args.epochs // 4)
        summary = {
            "gene": args.gene,
            "arm_final_mean_val_loss": {
                "torch_reference": round(float(np.mean([h[0] for h in torch_hist[-k:]])), 4),
                "jax_tpu_framework": round(float(np.mean([h[0] for h in jax_hist[-k:]])), 4),
            },
            "arm_final_mean_val_accuracy": {
                "torch_reference": round(float(np.mean([h[1] for h in torch_hist[-k:]])), 4),
                "jax_tpu_framework": round(float(np.mean([h[1] for h in jax_hist[-k:]])), 4),
            },
            "wall_seconds": {
                "torch_reference": round(torch_secs, 1),
                "jax_tpu_framework": round(jax_secs, 1),
            },
            "epochs": args.epochs,
            "patients": args.patients,
            "split_seed": args.seed,
        }
        _emit(summary, args)
        return

    cfg.model.name = "NaCAGaT" if args.model == "nacagat" else "MCAT"
    cfg.training.loss = args.loss

    torch_hist, jax_hist = [float("nan")], [float("nan")]
    torch_secs = jax_secs = float("nan")
    if args.arm in ("both", "torch"):
        t0 = time.time()
        torch_hist = torch_arm(
            dataset, split_seed=args.seed, epochs=args.epochs,
            lr=cfg.training.lr, grad_acc=cfg.training.grad_acc_step,
            model_name=args.model, loss_name=args.loss,
        )
        torch_secs = time.time() - t0

    if args.arm in ("both", "jax"):
        t0 = time.time()
        jax_hist = jax_arm(cfg, args.epochs)
        jax_secs = time.time() - t0

    k = max(1, args.epochs // 4)  # average the last quarter of epochs
    summary = {
        "arm_final_mean_val_c_index": {
            "torch_reference": round(float(np.mean(torch_hist[-k:])), 4),
            "jax_tpu_framework": round(float(np.mean(jax_hist[-k:])), 4),
        },
        "best": {
            "torch_reference": round(float(np.max(torch_hist)), 4),
            "jax_tpu_framework": round(float(np.max(jax_hist)), 4),
        },
        "wall_seconds": {
            "torch_reference": round(torch_secs, 1),
            "jax_tpu_framework": round(jax_secs, 1),
        },
        "epochs": args.epochs,
        "patients": args.patients,
        "split_seed": args.seed,
        "model": args.model,
        "loss": args.loss,
    }
    _emit(summary, args)


if __name__ == "__main__":
    main()
