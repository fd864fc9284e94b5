"""Mesh-backed inference/serving parity (VERDICT r3 #6).

docs/scaling.md's stated scale-out use case is inference over a (data, seq)
mesh — mega-bag scoring through sequence-parallel attention — but until this
file the Predictor/evaluate paths were only tested single-device. Every test
pins mesh outputs against the identical-params single-device Predictor.

Single-bag note: batch rows shard over the mesh data axis
(parallel/mesh.py::batch_spec), so ``predict_bag`` pads B=1 requests to
``data_axis`` zero-weight rows (serve.py::Predictor._min_rows) — the very
bug this suite was written against (B=1 device_put used to fail on any
data_axis>1 mesh).
"""

import os

import jax
import numpy as np
import pytest

from multimodal_path_omic_tpu.config import config_from_dict
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)
from multimodal_path_omic_tpu.serve import Predictor
from multimodal_path_omic_tpu.train.trainer import Trainer


def _raw_cfg(tmp, *, model="MCAT", n_patients=12, seed=0):
    csv, sig, patches = make_synthetic_cohort(
        str(tmp), n_patients=n_patients, bag_lengths=(48, 80), n_genes=24,
        n_signatures=3, seed=seed, signal_strength=2.0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["name"] = model
    raw["model"]["model_size"] = "small"
    if model.startswith("GeneExpr"):
        raw["model"]["gene"] = "G000"
        raw["training"]["loss"] = "ce"
    return raw


def _trainer(raw, tmp, label, *, data_axis=1, seq_axis=1, batch_size=4):
    raw = {**raw, "tpu": {
        "bag_buckets": [128], "batch_size": batch_size, "use_pallas": False,
        "data_axis": data_axis, "seq_axis": seq_axis,
    }}
    cfg = config_from_dict(raw)
    cfg.model.checkpoint_dir = os.path.join(str(tmp), f"ck_{label}")
    cfg.training.test_output_dir = os.path.join(str(tmp), f"out_{label}")
    return Trainer(cfg, verbose=False)


def _assert_same_params(t0, t1):
    # same config seed => same init; the parity below is meaningless otherwise
    a = jax.tree_util.tree_leaves(t0.state.params)
    b = jax.tree_util.tree_leaves(t1.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def surv_pair(tmp_path_factory):
    """(single-device trainer, data=4 mesh trainer) with identical params."""
    tmp = tmp_path_factory.mktemp("serve_mesh")
    raw = _raw_cfg(tmp)
    t0 = _trainer(raw, tmp, "single")
    t1 = _trainer(raw, tmp, "mesh", data_axis=4)
    assert t1.mesh is not None
    _assert_same_params(t0, t1)
    return t0, t1


def test_predict_bag_on_data_mesh_matches_single_device(surv_pair):
    t0, t1 = surv_pair
    rng = np.random.default_rng(0)
    wsi = rng.normal(size=(60, 1024)).astype(np.float32)
    omics = [rng.normal(size=(s,)).astype(np.float32) for s in t0.omic_sizes]
    base = Predictor(t0).predict_bag(wsi, omics=omics)
    out = Predictor(t1).predict_bag(wsi, omics=omics)
    np.testing.assert_allclose(out["risk"], base["risk"], atol=1e-5)
    np.testing.assert_allclose(out["hazards"], base["hazards"], atol=1e-5)
    np.testing.assert_allclose(out["survs"], base["survs"], atol=1e-5)


def test_predict_bags_on_data_mesh_matches_single_device(surv_pair):
    t0, t1 = surv_pair
    rng = np.random.default_rng(1)
    # 6 bags of mixed length: spans two batch_size=4 dispatches
    bags = [rng.normal(size=(m, 1024)).astype(np.float32)
            for m in (40, 70, 55, 90, 33, 80)]
    omics = [
        [rng.normal(size=(s,)).astype(np.float32) for s in t0.omic_sizes]
        for _ in bags
    ]
    base = Predictor(t0).predict_bags(bags, omics=omics)
    out = Predictor(t1).predict_bags(bags, omics=omics)
    np.testing.assert_allclose(out["risk"], base["risk"], atol=1e-5)
    np.testing.assert_allclose(out["hazards"], base["hazards"], atol=1e-5)


def test_predict_dataset_and_evaluate_on_data_seq_mesh(tmp_path):
    """Full metric panel (cli evaluate path) on a (data=4, seq=2) mesh —
    sequence-parallel K/V attention under the eval program included."""
    from multimodal_path_omic_tpu.train.analysis import evaluate

    raw = _raw_cfg(tmp_path, n_patients=24)
    t0 = _trainer(raw, tmp_path, "single")
    t1 = _trainer(raw, tmp_path, "mesh2d", data_axis=4, seq_axis=2)
    _assert_same_params(t0, t1)

    base_cols = Predictor(t0).predict_dataset()
    cols = Predictor(t1).predict_dataset()
    assert list(cols["slide_id"]) == list(base_cols["slide_id"])
    np.testing.assert_allclose(cols["risk"], base_cols["risk"], atol=1e-5)

    base_panel = evaluate(t0.config, trainer=t0, split="val", verbose=False)
    panel = evaluate(t1.config, trainer=t1, split="val", verbose=False)
    assert panel["n"] == base_panel["n"]
    np.testing.assert_allclose(panel["c_index"], base_panel["c_index"], atol=1e-6)
    np.testing.assert_allclose(
        panel["integrated_brier_score"], base_panel["integrated_brier_score"],
        atol=1e-5,
    )


def test_checkpoint_ensemble_predictor_on_mesh(surv_pair):
    """Ensemble (>=2 param sets) served from a mesh trainer: member outputs
    average exactly as on the single device."""
    t0, t1 = surv_pair
    rng = np.random.default_rng(2)
    wsi = rng.normal(size=(52, 1024)).astype(np.float32)
    omics = [rng.normal(size=(s,)).astype(np.float32) for s in t0.omic_sizes]
    perturbed = jax.tree_util.tree_map(
        lambda x: np.asarray(x) * 1.01, t0.state.params
    )
    base = Predictor(t0, param_sets=[t0.state.params, perturbed]).predict_bag(
        wsi, omics=omics
    )
    out = Predictor(t1, param_sets=[t1.state.params, perturbed]).predict_bag(
        wsi, omics=omics
    )
    np.testing.assert_allclose(out["risk"], base["risk"], atol=1e-5)
    np.testing.assert_allclose(out["risk_ens_std"], base["risk_ens_std"], atol=1e-5)


def test_ge_predict_and_evaluate_on_data_seq_mesh(tmp_path):
    """GE classification served over a (data=2, seq=2) mesh — the mega-bag
    inference layout — matches the single-device class probabilities and
    classification panel."""
    from multimodal_path_omic_tpu.train.analysis import evaluate

    raw = _raw_cfg(tmp_path, model="GeneExpr-NaCAGaT", n_patients=24)
    t0 = _trainer(raw, tmp_path, "ge_single")
    t1 = _trainer(raw, tmp_path, "ge_mesh", data_axis=2, seq_axis=2)
    _assert_same_params(t0, t1)

    base_cols = Predictor(t0).predict_dataset()
    cols = Predictor(t1).predict_dataset()
    np.testing.assert_allclose(cols["y"], base_cols["y"], atol=1e-5)

    rng = np.random.default_rng(3)
    wsi = rng.normal(size=(77, 1024)).astype(np.float32)
    base = Predictor(t0).predict_bag(wsi)
    out = Predictor(t1).predict_bag(wsi)
    np.testing.assert_allclose(out["y"], base["y"], atol=1e-5)

    base_panel = evaluate(t0.config, trainer=t0, split="val", verbose=False)
    panel = evaluate(t1.config, trainer=t1, split="val", verbose=False)
    assert panel["accuracy"] == pytest.approx(base_panel["accuracy"], abs=1e-6)
    np.testing.assert_array_equal(
        np.asarray(panel["confusion"]), np.asarray(base_panel["confusion"])
    )


def test_trainer_rejects_indivisible_batch_on_mesh(tmp_path):
    """batch rows shard over the data axis: an indivisible tpu.batch_size
    must be a config-time error, not a device_put failure mid-epoch."""
    raw = _raw_cfg(tmp_path)
    with pytest.raises(ValueError, match="divisible"):
        _trainer(raw, tmp_path, "bad", data_axis=4, batch_size=6)
