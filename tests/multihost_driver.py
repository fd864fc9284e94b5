"""Subprocess driver for the REAL multi-host test (tests/test_multihost.py).

Runs one of N jax.distributed processes (CPU backend, 4 local virtual
devices each), trains the full Trainer for 2 epochs on a shared synthetic
cohort over a data=N*4 mesh, and prints one JSON result line. Each process
feeds only its host slice of every batch (BucketBatcher.host_slice +
make_array_from_process_local_data) and metrics are process-allgathered.

Usage: python multihost_driver.py <process_id> <num_processes> <port> <cohort_dir> \
           [seq_axis] [device_cache] [steps_per_dispatch] [model(mcat|ge)]
"""

import json
import os
import sys


def build_raw_config(
    csv,
    sig,
    patches,
    *,
    model="mcat",
    seq_axis=1,
    device_cache="off",
    steps_per_dispatch=1,
    total_devices=8,
):
    """The ONE config both the 2-process driver and the single-process
    reference arms in tests/test_multihost.py train under — shared so the two
    halves of every equality test cannot drift apart."""
    from multimodal_path_omic_tpu.data.synthetic import synthetic_config_dict

    raw = synthetic_config_dict(csv, sig, patches)
    if model == "ge":  # GE-mode: WSI-only, 3-class CE on one gene's qcut
        raw["model"]["name"] = "GeneExpr-NaCAGaT"
        raw["model"]["gene"] = "G000"
        loss = "ce"
    else:
        raw["model"]["name"] = "MCAT"
        loss = "ces"
    raw["model"]["model_size"] = "small"
    raw["training"].update({"loss": loss, "epochs": 2, "lr": 1e-3, "seed": 0})
    raw["tpu"] = {
        "bag_buckets": [128],
        "batch_size": 8,
        "use_pallas": False,
        "data_axis": total_devices // seq_axis,
        "seq_axis": seq_axis,
        "device_cache": device_cache,
        "steps_per_dispatch": steps_per_dispatch,
    }
    return raw


def main():
    pid, nproc, port, work = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    seq_axis = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    device_cache = sys.argv[6] if len(sys.argv) > 6 else "off"
    steps_per_dispatch = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    model = sys.argv[8] if len(sys.argv) > 8 else "mcat"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.trainer import Trainer

    csv = os.path.join(work, "cohort.csv")
    sig = os.path.join(work, "signatures.csv")
    patches = os.path.join(work, "patches")
    raw = build_raw_config(
        csv,
        sig,
        patches,
        model=model,
        seq_axis=seq_axis,
        device_cache=device_cache,
        steps_per_dispatch=steps_per_dispatch,
        total_devices=nproc * 4,
    )
    cfg = config_from_dict(raw)
    cfg.model.checkpoint_epoch = 0
    cfg.model.checkpoint_dir = os.path.join(work, "ckpt")
    cfg.training.test_output_dir = os.path.join(work, f"out_p{pid}")

    trainer = Trainer(cfg, verbose=False)
    assert trainer.n_processes == nproc
    assert trainer.train_batcher.host_slice == (pid, nproc)
    out = trainer.fit()

    # distributed checkpoint roundtrip: every process participates in the
    # (async-capable) orbax save, then a restore must reproduce the params
    import jax as _jax
    import numpy as _np

    path = trainer.save(cfg.training.epochs - 1, out["train_loss"])
    from multimodal_path_omic_tpu.train import checkpoint as ckpt

    ckpt.wait_for_checkpoints()
    before = _jax.tree_util.tree_leaves(trainer.state.params)
    trainer.restore(path)
    after = _jax.tree_util.tree_leaves(trainer.state.params)
    ckpt_ok = all(
        _np.allclose(_np.asarray(a), _np.asarray(b)) for a, b in zip(before, after)
    )

    res = {
        "pid": pid,
        "ckpt_roundtrip_ok": bool(ckpt_ok),
        "cache_engaged": trainer.device_cache is not None,
    }
    # survival runs report c-index; GE runs report accuracy — emit what exists
    for key in (
        "train_loss", "val_loss", "train_c_index", "val_c_index", "val_accuracy"
    ):
        if key in out:
            res[key] = round(float(out[key]), 6)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
