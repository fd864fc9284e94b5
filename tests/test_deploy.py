"""AOT deployment bundles (multimodal_path_omic_tpu/deploy.py).

An exported bundle must reproduce the in-framework Predictor exactly — same
bucketing, padding, and outputs — while needing zero framework code to score
(jax.export deserialization + .call only). The reference has no deployment
surface at all (its inference is the in-process test() loop,
reference: mcat/main.py:158-183).
"""

import json
import os

import numpy as np
import pytest

from multimodal_path_omic_tpu.config import config_from_dict
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)
from multimodal_path_omic_tpu.deploy import ExportedModel, export_model, load_exported
from multimodal_path_omic_tpu.serve import Predictor
from multimodal_path_omic_tpu.train.trainer import Trainer


def _trainer(tmp, *, model="MCAT", loss="ces", **model_kw):
    csv, sig, patches = make_synthetic_cohort(
        str(tmp), n_patients=12, bag_lengths=(48, 80, 120), n_genes=36,
        n_signatures=4, seed=0, signal_strength=2.0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["name"] = model
    raw["model"]["model_size"] = "small"
    raw["model"].update(model_kw)
    raw["training"].update({"loss": loss, "epochs": 1, "lr": 1e-3})
    raw["tpu"] = {"bag_buckets": [64, 128], "batch_size": 4, "use_pallas": False}
    cfg = config_from_dict(raw)
    cfg.model.checkpoint_dir = os.path.join(str(tmp), "ckpt")
    cfg.training.test_output_dir = os.path.join(str(tmp), "out")
    return Trainer(cfg, verbose=False)


def _survival_inputs(trainer, lengths, seed=7):
    rng = np.random.default_rng(seed)
    dim = 1024
    bags = [rng.normal(size=(m, dim)).astype(np.float32) for m in lengths]
    omics = [
        [rng.normal(size=(s,)).astype(np.float32) for s in trainer.omic_sizes]
        for _ in lengths
    ]
    return bags, omics


@pytest.mark.parametrize(
    "model,loss",
    [
        ("MCAT", "ces"),
        # NaCAGaT exports the pre-gate + CAG graph (~12 s compile on 1 CPU)
        pytest.param("NaCAGaT", "cesar", marks=pytest.mark.slow),
    ],
)
def test_exported_bundle_matches_predictor_survival(tmp_path, model, loss):
    t = _trainer(tmp_path / "c", model=model, loss=loss)
    bundle = str(tmp_path / "bundle")
    manifest = export_model(
        t, bundle, batch_sizes=(1,), platforms=("cpu",)
    )
    assert set(manifest["artifacts"]) == {"64:1", "128:1"}
    assert manifest["outputs"] == ["hazards", "survs", "y", "risk"]
    # manifest round-trips through disk
    assert json.load(open(os.path.join(bundle, "manifest.json"))) == manifest

    exported = load_exported(bundle)
    predictor = Predictor(t)
    bags, omics = _survival_inputs(t, [48, 100])
    for bag, om in zip(bags, omics):
        a = exported.predict_bag(bag, om)
        b = predictor.predict_bag(bag, om)  # keeps the leading batch-1 dim
        for k in ("hazards", "survs", "y", "risk"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k])[0], atol=1e-5, err_msg=k
            )


def test_exported_bundle_matches_predictor_ge(tmp_path):
    t = _trainer(tmp_path / "c", model="GeneExpr-NaCAGaT", loss="ce", gene="G000")
    bundle = str(tmp_path / "bundle")
    manifest = export_model(t, bundle, batch_sizes=(1,), platforms=("cpu",))
    assert manifest["ge_mode"] and manifest["outputs"] == ["y"]
    assert manifest["omic_sizes"] == []

    exported = load_exported(bundle)
    predictor = Predictor(t)
    rng = np.random.default_rng(3)
    bag = rng.normal(size=(90, 1024)).astype(np.float32)
    a = exported.predict_bag(bag)
    b = predictor.predict_bag(bag)  # keeps the leading batch-1 dim
    np.testing.assert_allclose(np.asarray(a["y"]), np.asarray(b["y"])[0], atol=1e-5)


def test_exported_batch_rows_align_with_request(tmp_path):
    """Mixed bucket sizes + remainder chunking through the (bucket, n)
    program grid: outputs must be row-aligned with the request order and
    identical to per-bag calls."""
    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    export_model(t, bundle, batch_sizes=(1, 2), platforms=("cpu",))
    exported = ExportedModel(bundle)
    # 5 bags over two buckets: chunks of 2 + a remainder 1 per bucket
    bags, omics = _survival_inputs(t, [48, 100, 60, 120, 30])
    batched = exported.predict_bags(bags, omics)
    assert batched["risk"].shape == (5,)
    for i, (bag, om) in enumerate(zip(bags, omics)):
        single = exported.predict_bag(bag, om)
        for k in ("hazards", "survs", "y", "risk"):
            np.testing.assert_allclose(
                batched[k][i], single[k], atol=1e-5, err_msg=f"{k}[{i}]"
            )


def test_exported_bundle_errors(tmp_path):
    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    export_model(t, bundle, batch_sizes=(1,), platforms=("cpu",))
    exported = ExportedModel(bundle)
    bags, omics = _survival_inputs(t, [300])  # beyond the exported grid
    with pytest.raises(ValueError, match="re-export with export-model --max-bag"):
        exported.predict_bags(bags, omics)
    with pytest.raises(ValueError, match="one omics list per bag"):
        exported.predict_bags([np.zeros((4, 1024), np.float32)], None)
    with pytest.raises(ValueError, match="unsupported bundle format"):
        man = json.load(open(os.path.join(bundle, "manifest.json")))
        man["format_version"] = 99
        json.dump(man, open(os.path.join(bundle, "manifest.json"), "w"))
        ExportedModel(bundle)


def test_bundle_http_server_matches_predictor(tmp_path):
    """server.make_bundle_server: the same HTTP wire contract as the
    config+checkpoint server, backed only by the bundle."""
    import io
    import json as _json
    import threading
    import urllib.request

    from multimodal_path_omic_tpu.server import make_bundle_server

    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    export_model(t, bundle, batch_sizes=(1, 2), platforms=("cpu",))
    server = make_bundle_server(bundle, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
            health = _json.loads(resp.read())
        assert health["status"] == "ok" and health["bundle"] == bundle
        assert health["batch_sizes"] == [1, 2]
        # same healthz contract as the config server (n_params included)
        assert health["n_params"] == t.n_params

        bags, omics = _survival_inputs(t, [48, 100])
        predictor = Predictor(t)

        # JSON single-bag endpoint
        body = _json.dumps(
            {"wsi": bags[0].tolist(), "omics": [o.tolist() for o in omics[0]]}
        ).encode()
        req = urllib.request.Request(
            base + "/predict", data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = _json.loads(resp.read())
        want = predictor.predict_bag(bags[0], omics[0])
        np.testing.assert_allclose(
            np.asarray(out["risk"]), np.asarray(want["risk"]), atol=1e-5
        )

        # npz batch endpoint
        buf = io.BytesIO()
        arrays = {f"wsi_{i}": b for i, b in enumerate(bags)}
        for i, om in enumerate(omics):
            for j, o in enumerate(om):
                arrays[f"omic_{i}_{j}"] = o
        np.savez(buf, **arrays)
        req = urllib.request.Request(
            base + "/predict_batch_npz", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = _json.loads(resp.read())
        want = predictor.predict_bags(bags, omics)
        np.testing.assert_allclose(
            np.asarray(out["risk"]), np.asarray(want["risk"]), atol=1e-5
        )
    finally:
        server.shutdown()


def test_max_bag_exports_rounded_up_buckets(tmp_path):
    """The dataset path handles oversize bags by rounding up to a multiple of
    the largest bucket and jitting on the fly; an AOT bundle must carry those
    programs ahead of time (export_model max_bag) — and then match the
    Predictor on the same oversize bag."""
    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    manifest = export_model(
        t, bundle, batch_sizes=(1,), platforms=("cpu",), max_bag=300
    )
    # grid [64, 128] + multiples of 128 up to bucket_for(300) = 384
    assert manifest["buckets"] == [64, 128, 256, 384]
    exported = ExportedModel(bundle)
    predictor = Predictor(t)
    bags, omics = _survival_inputs(t, [300])
    a = exported.predict_bag(bags[0], omics[0])
    b = predictor.predict_bag(bags[0], omics[0])
    np.testing.assert_allclose(
        np.asarray(a["risk"]), np.asarray(b["risk"])[0], atol=1e-5
    )


def test_cli_export_model_refuses_untrained(tmp_path):
    """export-model mints a deployment artifact; without a checkpoint it must
    refuse rather than bundle random weights (override: --allow-untrained)."""
    import yaml

    from multimodal_path_omic_tpu.cli import main as cli_main
    from multimodal_path_omic_tpu.data.synthetic import synthetic_config_dict

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=8, bag_lengths=(48,), n_genes=24,
        n_signatures=3, seed=0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["tpu"] = {"bag_buckets": [64], "batch_size": 4, "use_pallas": False}
    cfg_path = str(tmp_path / "config.yaml")
    yaml.safe_dump(raw, open(cfg_path, "w"))
    out = str(tmp_path / "bundle")
    with pytest.raises(SystemExit, match="RANDOM weights"):
        cli_main(["export-model", "--config", cfg_path, "--out", out])
    assert not os.path.exists(os.path.join(out, "manifest.json"))
    assert cli_main(
        ["export-model", "--config", cfg_path, "--out", out,
         "--allow-untrained", "--platforms", "cpu"]
    ) == 0
    assert os.path.exists(os.path.join(out, "manifest.json"))


def test_bf16_weight_bundle_halves_bytes_within_tolerance(tmp_path):
    """weights_dtype=bfloat16: a storage cast (upcast to f32 inside the
    program), so artifacts shrink ~2x and outputs differ from the f32 bundle
    only by bf16 weight rounding."""
    t = _trainer(tmp_path / "c")
    b32, b16 = str(tmp_path / "b32"), str(tmp_path / "b16")
    export_model(t, b32, buckets=(64,), batch_sizes=(1,), platforms=("cpu",))
    man16 = export_model(
        t, b16, buckets=(64,), batch_sizes=(1,), platforms=("cpu",),
        weights_dtype="bfloat16",
    )
    assert man16["weights_dtype"] == "bfloat16"
    s32 = os.path.getsize(os.path.join(b32, "b64_n1.jaxexport"))
    s16 = os.path.getsize(os.path.join(b16, "b64_n1.jaxexport"))
    assert s16 < 0.65 * s32, (s16, s32)  # ~half, plus shared scaffolding
    bags, omics = _survival_inputs(t, [40])
    a = ExportedModel(b32).predict_bag(bags[0], omics[0])
    b = ExportedModel(b16).predict_bag(bags[0], omics[0])
    np.testing.assert_allclose(a["risk"], b["risk"], rtol=0.02, atol=0.02)
    np.testing.assert_allclose(a["survs"], b["survs"], rtol=0.05, atol=0.02)
    with pytest.raises(ValueError, match="weights_dtype"):
        export_model(t, str(tmp_path / "bad"), weights_dtype="int4")


def test_export_targets_tpu_platform_from_cpu_host(tmp_path):
    """Cross-platform AOT lowering: the default bundle carries a tpu target
    baked from this CPU-only host, and still executes on cpu."""
    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    manifest = export_model(
        t, bundle, buckets=(64,), batch_sizes=(1,)
    )  # default platforms=("cpu", "tpu")
    assert manifest["platforms"] == ["cpu", "tpu"]
    exported = ExportedModel(bundle)
    bags, omics = _survival_inputs(t, [40])
    out = exported.predict_bags(bags, omics)
    assert np.isfinite(out["risk"]).all()


def test_exported_warmup_runs_every_program(tmp_path):
    t = _trainer(tmp_path / "c")
    bundle = str(tmp_path / "bundle")
    export_model(t, bundle, batch_sizes=(1, 2), platforms=("cpu",))
    exported = ExportedModel(bundle)
    warmed = exported.warmup()
    assert sorted(warmed) == [(64, 1), (64, 2), (128, 1), (128, 2)]
    bags, omics = _survival_inputs(t, [40])
    out = exported.predict_bags(bags, omics)
    assert np.isfinite(out["risk"]).all()
