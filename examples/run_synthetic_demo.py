"""Self-contained demo: generate a synthetic cohort, train MCAT via the CLI
config path, evaluate, and export predictions + attention maps.

    python examples/run_synthetic_demo.py [workdir]

Exercises the full user journey on throwaway data: CSV + signatures + .npy
bags -> seeded patient split -> bucketed training with c-index -> checkpoint
-> batch inference CSV -> leave-one-out attention export.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml  # noqa: E402

from multimodal_path_omic_tpu import cli  # noqa: E402
from multimodal_path_omic_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_cohort,
    synthetic_config_dict,
)


def main(workdir: str = "demo_workdir") -> None:
    os.makedirs(workdir, exist_ok=True)
    print(f"== generating synthetic cohort in {workdir}")
    csv, sig, patches = make_synthetic_cohort(
        workdir, n_patients=48, bag_lengths=(200, 350, 500), seed=0,
        signal_strength=2.5,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["model"]["checkpoint_epoch"] = 5
    raw["model"]["checkpoint_dir"] = os.path.join(workdir, "checkpoints")
    raw["training"]["epochs"] = 5
    raw["training"]["lr"] = 1e-3
    raw["training"]["test_output_dir"] = os.path.join(workdir, "outputs")
    raw["tpu"] = {"bag_buckets": [512], "batch_size": 16}
    config_path = os.path.join(workdir, "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(raw, f)

    print("== training (5 epochs)")
    cli.main(["train", "--config", config_path])

    ckpts = sorted(os.listdir(raw["model"]["checkpoint_dir"]))
    ckpt = os.path.join(raw["model"]["checkpoint_dir"], ckpts[-1])
    print(f"== batch inference from {ckpt}")
    preds = os.path.join(workdir, "predictions.csv")
    cli.main(["predict", "--config", config_path, "--checkpoint", ckpt, "--out", preds])

    print("== leave-one-out attention export for patient P000")
    cli.main([
        "export-attn", "--config", config_path, "--checkpoint", ckpt,
        "--patient", "P000", "--epoch", "5",
    ])
    attn_files = [
        f for f in os.listdir(raw["training"]["test_output_dir"]) if f.startswith("ATTN_")
    ]

    print("== AOT deployment bundle (jax.export) + framework-free scoring")
    bundle = os.path.join(workdir, "bundle")
    cli.main([
        "export-model", "--config", config_path, "--checkpoint", ckpt,
        "--out", bundle, "--platforms", "cpu",
    ])
    import numpy as np

    from multimodal_path_omic_tpu.deploy import load_exported

    exported = load_exported(bundle)
    rng = np.random.default_rng(0)
    bag = rng.normal(size=(300, 1024)).astype(np.float32)
    omics = [
        rng.normal(size=(s,)).astype(np.float32)
        for s in exported.manifest["omic_sizes"]
    ]
    out = exported.predict_bag(bag, omics)
    print(f"   bundle risk for a fresh 300-patch bag: {float(out['risk']):.4f}")

    print(f"== done. predictions: {preds}; attention maps: {attn_files}; "
          f"bundle: {bundle}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_workdir")
