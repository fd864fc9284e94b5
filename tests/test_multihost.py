"""REAL multi-host training test: 2 jax.distributed processes on the CPU
backend (4 virtual devices each -> an 8-device data mesh spanning processes).

Exercises the actual multi-host stack end to end — per-process batch slices
(BucketBatcher.host_slice), global-array assembly from process-local data
(parallel/mesh.py shard_batch), cross-process metric gathers
(Trainer._host_gather) — and checks both processes agree with each other AND
with a single-process run over the same 8-device mesh on the same cohort.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from multimodal_path_omic_tpu.data.synthetic import make_synthetic_cohort

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "multihost_driver.py")
sys.path.insert(0, os.path.dirname(DRIVER))
from multihost_driver import build_raw_config  # noqa: E402


def _single_process_reference(
    work, csv, sig, patches, *, model="mcat", seq_axis=1,
    device_cache="off", steps_per_dispatch=1,
):
    """Train the single-process arm under the SAME config the 2-process
    driver uses (multihost_driver.build_raw_config) — the two halves of each
    equality test cannot drift apart."""
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.trainer import Trainer

    raw = build_raw_config(
        csv, sig, patches, model=model, seq_axis=seq_axis,
        device_cache=device_cache, steps_per_dispatch=steps_per_dispatch,
        total_devices=8,
    )
    cfg = config_from_dict(raw)
    cfg.model.checkpoint_epoch = 0
    cfg.training.test_output_dir = os.path.join(work, "out_single")
    trainer = Trainer(cfg, verbose=False)
    return trainer, trainer.fit()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process(
    work, seq_axis, device_cache="off", steps_per_dispatch=1, model="mcat"
):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [
                sys.executable, DRIVER, str(pid), "2", str(port), work,
                str(seq_axis), device_cache, str(steps_per_dispatch), model,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host driver timed out")
        if p.returncode != 0:
            if "distributed" in stderr or "gloo" in stderr.lower():
                pytest.skip(f"jax.distributed unavailable: {stderr[-400:]}")
            pytest.fail(f"driver failed:\n{stderr[-2000:]}")
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    return sorted(outs, key=lambda o: o["pid"])


@pytest.mark.parametrize("seq_axis", [1, 2])
def test_two_process_training_matches_single_process(tmp_path, seq_axis):
    """seq_axis=2: the patch axis shards ACROSS the process boundary — the
    sequence-parallel co-attention collectives ride the cross-process (gloo)
    transport, not just intra-process ICI emulation."""
    work = str(tmp_path)
    csv, sig, patches = make_synthetic_cohort(
        work, n_patients=16, bag_lengths=(48, 80, 120), n_genes=36,
        n_signatures=4, seed=0, signal_strength=2.0,
    )
    # the driver expects canonical names inside work
    assert os.path.basename(csv) == "cohort.csv", csv
    assert os.path.basename(sig) == "signatures.csv", sig

    a, b = _run_two_process(work, seq_axis)
    # both processes compute identical (allgathered) metrics
    for key in ("train_loss", "val_loss", "train_c_index", "val_c_index"):
        assert np.isclose(a[key], b[key], atol=1e-6), (key, a, b)
    # distributed (cross-process) orbax checkpoint roundtrip
    assert a["ckpt_roundtrip_ok"] and b["ckpt_roundtrip_ok"], (a, b)

    # single-process reference over the same 8-device mesh + cohort
    _, ref = _single_process_reference(
        work, csv, sig, patches, seq_axis=seq_axis
    )
    assert np.isclose(a["train_loss"], ref["train_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_loss"], ref["val_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_c_index"], ref["val_c_index"], atol=1e-6), (a, ref)


def test_two_process_device_cache_matches_single_process(tmp_path):
    """Multi-host DEVICE-CACHED fast path: both processes contribute their
    addressable shards of the global cache arrays (mesh.py::put_global), train
    with K=2 cached multi-step dispatch over a data=4 x seq=2 cross-process
    mesh, and must agree with a single-process cached run on the same cohort
    (fp reduction-order tolerance)."""
    work = str(tmp_path)
    csv, sig, patches = make_synthetic_cohort(
        work, n_patients=16, bag_lengths=(48, 80, 120), n_genes=36,
        n_signatures=4, seed=0, signal_strength=2.0,
    )
    a, b = _run_two_process(
        work, seq_axis=2, device_cache="on", steps_per_dispatch=2
    )
    assert a["cache_engaged"] and b["cache_engaged"], (a, b)
    for key in ("train_loss", "val_loss", "train_c_index", "val_c_index"):
        assert np.isclose(a[key], b[key], atol=1e-6), (key, a, b)
    assert a["ckpt_roundtrip_ok"] and b["ckpt_roundtrip_ok"], (a, b)

    single, ref = _single_process_reference(
        work, csv, sig, patches, seq_axis=2, device_cache="on",
        steps_per_dispatch=2,
    )
    assert single.device_cache is not None
    assert np.isclose(a["train_loss"], ref["train_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_loss"], ref["val_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_c_index"], ref["val_c_index"], atol=1e-6), (a, ref)


def test_two_process_ge_device_cache_matches_single_process(tmp_path):
    """GE-mode multi-host cached path: WSI-only self-attention over the ring
    (seq=2 crosses the process boundary), gene-expression labels sliced
    per-process in the cached val feed (Trainer._batch_info ge_labels), K=2
    cached dispatch. Must agree with the single-process cached GE run."""
    work = str(tmp_path)
    csv, sig, patches = make_synthetic_cohort(
        work, n_patients=16, bag_lengths=(48, 80, 120), n_genes=36,
        n_signatures=4, seed=0, signal_strength=2.0,
    )
    a, b = _run_two_process(
        work, seq_axis=2, device_cache="on", steps_per_dispatch=2, model="ge"
    )
    assert a["cache_engaged"] and b["cache_engaged"], (a, b)
    for key in ("train_loss", "val_loss", "val_accuracy"):
        assert np.isclose(a[key], b[key], atol=1e-6), (key, a, b)
    assert a["ckpt_roundtrip_ok"] and b["ckpt_roundtrip_ok"], (a, b)

    single, ref = _single_process_reference(
        work, csv, sig, patches, model="ge", seq_axis=2, device_cache="on",
        steps_per_dispatch=2,
    )
    assert single.device_cache is not None
    assert np.isclose(a["train_loss"], ref["train_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_loss"], ref["val_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_accuracy"], ref["val_accuracy"], atol=1e-6), (a, ref)


def test_two_process_host_fed_grouped_dispatch_matches_single_process(tmp_path):
    """HOST-FED multi-host K=2 dispatch: each process stacks its [K, local_B]
    batch slice and the global [K, B] stack assembles from per-process shards
    (shard_batch stacked+process_local). Must agree with a single-process
    host-fed K=2 run on the same cohort."""
    work = str(tmp_path)
    csv, sig, patches = make_synthetic_cohort(
        work, n_patients=16, bag_lengths=(48, 80, 120), n_genes=36,
        n_signatures=4, seed=0, signal_strength=2.0,
    )
    a, b = _run_two_process(
        work, seq_axis=2, device_cache="off", steps_per_dispatch=2
    )
    assert not a["cache_engaged"] and not b["cache_engaged"], (a, b)
    for key in ("train_loss", "val_loss", "train_c_index", "val_c_index"):
        assert np.isclose(a[key], b[key], atol=1e-6), (key, a, b)
    # distributed ckpt roundtrip after donated host-fed K>1 dispatch: state
    # placement must survive the stacked-group path too
    assert a["ckpt_roundtrip_ok"] and b["ckpt_roundtrip_ok"], (a, b)

    _, ref = _single_process_reference(
        work, csv, sig, patches, seq_axis=2, device_cache="off",
        steps_per_dispatch=2,
    )
    assert np.isclose(a["train_loss"], ref["train_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_loss"], ref["val_loss"], atol=2e-4), (a, ref)
    assert np.isclose(a["val_c_index"], ref["val_c_index"], atol=1e-6), (a, ref)
