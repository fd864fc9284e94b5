"""CLI smoke tests: train + validate + export-attn over the synthetic cohort,
driven exactly as a user would (config YAML + dotted overrides)."""

import os

import numpy as np
import pytest
import yaml

from multimodal_path_omic_tpu import cli
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)


@pytest.fixture(scope="module")
def config_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    csv, sig, patches = make_synthetic_cohort(
        str(tmp), n_patients=16, bag_lengths=(48, 96), n_genes=24,
        n_signatures=3, seed=11, signal_strength=2.0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["model"]["checkpoint_dir"] = str(tmp / "ckpts")
    raw["training"]["epochs"] = 1
    raw["training"]["test_output_dir"] = str(tmp / "outputs")
    raw["tpu"] = {"bag_buckets": [128], "batch_size": 8, "use_pallas": False}
    path = tmp / "config.yaml"
    path.write_text(yaml.safe_dump(raw))
    return str(path)


def test_cli_train(config_path, capsys):
    rc = cli.main(["train", "--config", config_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "train_loss" in out


def test_cli_train_with_overrides(config_path, capsys):
    rc = cli.main(
        ["train", "--config", config_path, "--set", "training.lr=0.002",
         "--set", "model.fusion=gated_concat"]
    )
    assert rc == 0


def test_cli_validate(config_path, capsys):
    rc = cli.main(["validate", "--config", config_path])
    assert rc == 0
    assert "val_loss" in capsys.readouterr().out


def test_cli_export_attn(config_path):
    rc = cli.main(
        ["export-attn", "--config", config_path, "--patient", "P000",
         "--epoch", "3"]
    )
    assert rc == 0
    cfg = yaml.safe_load(open(config_path))
    out_dir = cfg["training"]["test_output_dir"]
    files = [f for f in os.listdir(out_dir) if f.startswith("ATTN_") and "_E3_" in f]
    assert files
    attn = np.load(os.path.join(out_dir, files[0]))
    assert attn.ndim == 2


def test_cli_unknown_override_errors(config_path):
    with pytest.raises(KeyError):
        cli.main(["train", "--config", config_path, "--set", "training.bogus=1"])


def test_cli_override_on_off_spellings():
    """YAML 1.1 turns on/off/yes/no into booleans; --set must keep them as
    strings for string fields (tpu.device_cache=on once silently became the
    string "True", disabling the cache) and coerce them properly onto bool
    fields (bool("off") would be True)."""
    ov = cli._parse_overrides(
        ["tpu.device_cache=on", "tpu.use_native_pipeline=off", "wandb.enabled=true"]
    )
    assert ov["tpu.device_cache"] == "on"
    assert ov["tpu.use_native_pipeline"] == "off"
    assert ov["wandb.enabled"] is True

    from multimodal_path_omic_tpu.config import Config, _apply_override

    cfg = Config()
    _apply_override(cfg, "tpu.device_cache", "on")
    assert cfg.tpu.device_cache == "on"
    # casing is normalized ("On" must not silently disable the cache) and
    # typos fail at load time instead of becoming a silent "off"
    _apply_override(cfg, "tpu.device_cache", "On")
    assert cfg.tpu.device_cache == "on"
    with pytest.raises(ValueError, match="device_cache"):
        _apply_override(cfg, "tpu.device_cache", "onn")
    _apply_override(cfg, "tpu.use_native_pipeline", "off")
    assert cfg.tpu.use_native_pipeline is False
    _apply_override(cfg, "tpu.use_native_pipeline", "on")
    assert cfg.tpu.use_native_pipeline is True
    with pytest.raises(ValueError, match="boolean"):
        _apply_override(cfg, "tpu.use_native_pipeline", "maybe")


def test_cli_override_revalidates_at_load_time():
    """A bad --set value fails at config load (post_init re-run), not
    mid-training."""
    from multimodal_path_omic_tpu.config import Config, _apply_override

    cfg = Config()
    with pytest.raises(ValueError, match="cache_dtype"):
        _apply_override(cfg, "tpu.cache_dtype", "int4")
    with pytest.raises(ValueError, match="loss"):
        _apply_override(cfg, "training.loss", "hinge")


def test_cli_convert_checkpoint_roundtrip(config_path, tmp_path, capsys):
    """Reference .pt -> framework checkpoint via the CLI, then restore."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from models.mcat.mcat import MultimodalCoAttentionTransformer
    except Exception as exc:
        pytest.skip(f"reference unavailable: {exc}")

    cfg = yaml.safe_load(open(config_path))
    # build a reference model matching the synthetic config's signature sizes
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.trainer import Trainer

    trainer = Trainer(config_from_dict(cfg), verbose=False)
    tmod = MultimodalCoAttentionTransformer(
        omic_sizes=trainer.omic_sizes, model_size="small", fusion="concat"
    )
    pt_path = str(tmp_path / "ref.pt")
    torch.save(
        {
            "epoch": 4,
            "model_state_dict": tmod.state_dict(),
            "optimizer_state_dict": {},
            "loss": 0.5,
        },
        pt_path,
    )
    rc = cli.main(
        ["convert-checkpoint", "--config", config_path, "--torch-checkpoint", pt_path]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Converted checkpoint written to" in out
    ck_path = out.strip().rsplit(" ", 1)[-1]
    restored = Trainer(config_from_dict(cfg), verbose=False)
    restored.restore(ck_path)
    # torch payload said epoch 4 finished -> resume trains epoch 5 next
    assert restored.starting_epoch == 5

    # a raw state-dict payload WITHOUT an 'epoch' key must resume at epoch 0
    # (the old starting_epoch-1-if-truthy expression saved 1 and SKIPPED
    # epoch 0 on resume)
    pt_bare = str(tmp_path / "ref_bare.pt")
    torch.save({"model_state_dict": tmod.state_dict()}, pt_bare)
    rc = cli.main(
        ["convert-checkpoint", "--config", config_path, "--torch-checkpoint", pt_bare]
    )
    assert rc == 0
    ck_bare = capsys.readouterr().out.strip().rsplit(" ", 1)[-1]
    restored0 = Trainer(config_from_dict(cfg), verbose=False)
    restored0.restore(ck_bare)
    assert restored0.starting_epoch == 0


def test_cli_predict_writes_csv(config_path, tmp_path):
    out_csv = str(tmp_path / "preds.csv")
    rc = cli.main(["predict", "--config", config_path, "--out", out_csv])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert "slide_id" in df.columns and "risk" in df.columns
    assert len(df) == 16  # every slide in the synthetic cohort
    assert set(f"hazard_{j}" for j in range(4)) <= set(df.columns)


def test_predictor_single_bag(config_path):
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.serve import Predictor

    cfg = config_from_dict(_yaml.safe_load(open(config_path)))
    pred = Predictor.from_config(cfg)
    ds = pred._t.dataset
    _, _, _, omics, bag = ds[0]
    out = pred.predict_bag(bag, omics)
    assert out["hazards"].shape == (1, 4)
    np.testing.assert_allclose(out["y"].sum(), 1.0, rtol=1e-5)


def test_predictor_matches_eval_risks(config_path):
    """Predictor risks equal the Trainer eval path on the same samples."""
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.serve import Predictor

    cfg = config_from_dict(_yaml.safe_load(open(config_path)))
    pred = Predictor.from_config(cfg)
    cols = pred.predict_dataset(pred._t.val_ds)
    # recompute one sample through predict_bag
    ds = pred._t.val_ds
    _, _, _, omics, bag = ds[0]
    single = pred.predict_bag(bag, omics)
    i = list(cols["slide_id"]).index(ds.slide_id(0))
    np.testing.assert_allclose(single["risk"][0], cols["risk"][i], atol=1e-4)


def test_reference_yaml_configs_load_unchanged():
    """The reference's own config files parse into our typed Config (drop-in
    schema compatibility)."""
    import os

    from multimodal_path_omic_tpu.config import load_config

    ref = "/root/reference/models/mcat/config/config.yaml"
    if not os.path.exists(ref):
        pytest.skip("reference unavailable")
    cfg = load_config(ref)
    assert cfg.model.name == "MCAT"
    assert cfg.model.fusion == "concat"
    assert cfg.training.loss == "ces"
    assert cfg.training.grad_acc_step == 32
    assert cfg.training.lambda_ == 0.0
    assert cfg.dataset.tcga_only is True

    ge = "/root/reference/models/ge_nacagat/config/config.yaml"
    if os.path.exists(ge):
        cfg = load_config(ge)
        assert cfg.model.gene == "CCNE1"
        assert cfg.training.leave_one_out == "M013"


def test_override_rejects_non_integral_float_for_int_field(config_path):
    """--set training.epochs=19.9 must raise, not silently run 19 epochs;
    integral floats (2.5e9 bytes) still coerce."""
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict

    from multimodal_path_omic_tpu.config import _apply_override

    raw = _yaml.safe_load(open(config_path))
    cfg = config_from_dict(raw)
    with pytest.raises(ValueError, match="epochs"):
        _apply_override(cfg, "training.epochs", 19.9)
    _apply_override(cfg, "tpu.device_cache_budget_bytes", 2.5e9)
    assert cfg.tpu.device_cache_budget_bytes == 2_500_000_000


def test_cli_convert_bags_pt_dir_and_h5(tmp_path):
    """convert-bags turns both reference stores (.pt dir, .h5 file) into the
    fast .npy store with bit-identical f32 content; f16 stores round-trip
    through NpyBagStore within half-precision tolerance."""
    h5py = pytest.importorskip("h5py")
    torch = pytest.importorskip("torch")

    from multimodal_path_omic_tpu.data.bags import NpyBagStore

    rng = np.random.default_rng(0)
    bags = {f"S{i:03d}.svs": rng.normal(size=(8 + i, 16)).astype(np.float32)
            for i in range(3)}
    pt_dir = tmp_path / "pt"
    pt_dir.mkdir()
    h5_path = tmp_path / "bags.h5"
    with h5py.File(h5_path, "w") as f:
        for sid, arr in bags.items():
            # keys/stems deliberately KEEP the '.svs' suffix (common in
            # external feature-extraction exports): the converter must read
            # the raw entry and strip the suffix only on the OUTPUT stem
            torch.save(torch.from_numpy(arr), pt_dir / (sid + ".pt"))
            f.create_dataset(sid, data=arr)

    out_pt = tmp_path / "npy_from_pt"
    out_h5 = tmp_path / "npy_from_h5"
    assert cli.main(["convert-bags", "--src", str(pt_dir), "--dst", str(out_pt)]) == 0
    assert cli.main(["convert-bags", "--src", str(h5_path), "--dst", str(out_h5)]) == 0
    for out in (out_pt, out_h5):
        store = NpyBagStore(str(out))
        for sid, arr in bags.items():
            assert store.exists(sid)
            np.testing.assert_array_equal(store.get(sid), arr)

    out_f16 = tmp_path / "npy_f16"
    assert cli.main([
        "convert-bags", "--src", str(pt_dir), "--dst", str(out_f16),
        "--dtype", "float16",
    ]) == 0
    store = NpyBagStore(str(out_f16))
    for sid, arr in bags.items():
        got = store.get(sid)
        assert got.dtype == np.float32  # store casts to f32 on read
        np.testing.assert_allclose(got, arr, rtol=2e-3, atol=2e-3)


def test_cli_serve_passthrough_delegates_to_server(monkeypatch):
    """`cli serve ...` forwards its argv to server.main (and is listed in
    --help via a stub subparser that never dispatches)."""
    import multimodal_path_omic_tpu.server as server_mod

    seen = {}

    def fake_main(argv):
        seen["argv"] = argv
        return 0

    monkeypatch.setattr(server_mod, "main", fake_main)
    rc = cli.main(["serve", "--config", "x.yaml", "--port", "1234"])
    assert rc == 0
    assert seen["argv"] == ["--config", "x.yaml", "--port", "1234"]


def test_cli_profile_capture_and_reanalyze(config_path, tmp_path, capsys):
    """`cli profile` trains one untraced warmup epoch + one traced epoch,
    prints a ranked device-op report, and the kept trace re-analyzes with
    --trace-dir alone."""
    trace_dir = str(tmp_path / "trace")
    rc = cli.main([
        "profile", "--config", config_path, "--trace-dir", trace_dir,
        "--top", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device op-time" in out
    assert "rank" in out
    assert "us/step" in out  # per-step normalization via last_epoch_steps

    rc = cli.main(["profile", "--trace-dir", trace_dir, "--top", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device op-time" in out

    # neither --config nor --trace-dir is an error, not a crash
    assert cli.main(["profile"]) == 1


def test_trainer_reports_backend_and_warns_on_cpu_fallback(config_path, capsys):
    """The Trainer prints the resolved jax backend (the reference prints its
    CUDA devices, mcat/main.py:228-237) and warns to stderr when the config
    requests an accelerator but jax initialized the CPU backend — the
    silent-CPU-fallback footgun on a held single-tenant TPU."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = load_config(config_path, {"device": "tpu"})
    t = Trainer(cfg)
    cap = capsys.readouterr()
    assert "jax backend: cpu" in cap.out
    assert "WARNING: config requests device 'tpu'" in cap.err
    del t

    # no warning when the config asks for what it gets
    cfg = load_config(config_path, {"device": "cpu"})
    Trainer(cfg)
    cap = capsys.readouterr()
    assert "jax backend: cpu" in cap.out
    assert "WARNING" not in cap.err


def test_cli_plan_memory_fit_report(config_path, capsys):
    """`cli plan` AOT-compiles the per-bucket step programs and reports a
    memory-fit verdict without running a step."""
    rc = cli.main(["plan", "--config", config_path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "params" in out and "optimizer state" in out
    assert "device cache" in out and "fits the" in out
    assert "bucket" in out and "peak" in out
    assert "FITS" in out

    # a starved cache budget flips the budget verdict (the cache would
    # host-feed, so it no longer counts toward the peak)
    rc = cli.main([
        "plan", "--config", config_path,
        "--set", "tpu.device_cache_budget_bytes=1024",
    ])
    out = capsys.readouterr().out
    assert "OVER the" in out
    assert rc == 0  # step programs alone still fit


def test_memory_plan_structure(config_path):
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.plan import memory_plan

    plan = memory_plan(load_config(config_path, {}))
    assert plan["params_bytes"] > 0 and plan["opt_state_bytes"] > 0
    assert plan["cache_bytes_total"] > 0
    assert plan["n_bags"] == 16
    rows = {r["bucket"]: r for r in plan["step_programs"]}
    assert 128 in rows and rows[128]["argument"] > 0
    # peak >= the program's own argument bytes (params+opt+batch live in HBM)
    assert rows[128]["peak"] >= rows[128]["argument"]
    assert plan["estimated_peak_bytes"] >= rows[128]["peak"]
    assert plan["fits"] is True


def test_plan_cache_modes_match_trainer_policy(config_path, capsys):
    """plan's cache verdict runs the SAME plan_cache_fit policy the Trainer
    does: forced caches ignore the budget (and count toward the peak),
    partial caches count their resident share, host-feed counts zero."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.plan import format_plan, memory_plan

    # forced over a starved budget: the trainer uploads EVERYTHING, so the
    # plan must count the full cache
    plan = memory_plan(load_config(config_path, {
        "tpu.device_cache": "on", "tpu.device_cache_budget_bytes": 1024,
    }))
    assert plan["cache_engaged"] and plan["cache_partial_buckets"] is None
    assert plan["cache_resident_bytes"] == plan["cache_bytes_total"]
    assert plan["estimated_peak_bytes"] >= plan["cache_bytes_total"]
    assert "full cache resident" in format_plan(plan)

    # auto with a budget covering only one bucket: greedy partial
    probe = memory_plan(load_config(config_path, {"tpu.bag_buckets": [64, 128]}))
    per_bucket = probe["cache_bytes_per_bucket"]
    assert set(per_bucket) == {64, 128}
    cheap = min(per_bucket, key=lambda b: per_bucket[b])
    budget = per_bucket[cheap] + min(per_bucket.values()) // 2
    plan = memory_plan(load_config(config_path, {
        "tpu.bag_buckets": [64, 128],
        "tpu.device_cache_budget_bytes": int(budget),
    }))
    assert plan["cache_engaged"] and plan["cache_partial_buckets"] is not None
    assert 0 < plan["cache_resident_bytes"] < plan["cache_bytes_total"]
    assert "PARTIAL: buckets" in format_plan(plan)

    # auto with nothing fitting: host feeding, zero resident
    plan = memory_plan(load_config(config_path, {
        "tpu.device_cache_budget_bytes": 1024,
    }))
    assert not plan["cache_engaged"]
    assert plan["cache_resident_bytes"] == 0
    assert "would NOT engage" in format_plan(plan)


def test_plan_mesh_accounts_per_device_bytes(config_path):
    """On a mesh config the abstract batch carries the canonical shardings,
    so XLA's argument accounting is per-device (smaller than the unsharded
    program's), and the cache row reports the per-device share."""
    from multimodal_path_omic_tpu.config import load_config
    from multimodal_path_omic_tpu.train.plan import memory_plan

    single = memory_plan(load_config(config_path, {}))
    mesh = memory_plan(load_config(config_path, {
        "tpu.data_axis": 4, "tpu.seq_axis": 2,
    }))
    assert mesh["n_mesh_devices"] == 8
    assert mesh["cache_bytes_per_device"] * 8 <= mesh["cache_bytes_total"] + 8
    s_arg = single["step_programs"][0]["argument"]
    m_arg = mesh["step_programs"][0]["argument"]
    assert m_arg < s_arg  # the batch share shrank; replicated params remain


def test_predictor_mc_dropout_uncertainty(config_path):
    """MC-dropout uncertainty: mc_samples stochastic forwards give a positive
    risk_std (the model trains with p=0.25 dropout), seeded-deterministic
    across calls, without touching the deterministic prediction columns."""
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.serve import Predictor

    cfg = config_from_dict(_yaml.safe_load(open(config_path)))
    pred = Predictor.from_config(cfg)
    ds = pred._t.dataset
    _, _, _, omics, bag = ds[0]

    plain = pred.predict_bag(bag, omics)
    out = pred.predict_bag(bag, omics, mc_samples=8, mc_seed=3)
    assert float(out["risk_std"][0]) > 0.0
    assert out["survs_mean"].shape == (1, 4)
    # deterministic columns are untouched by the MC pass
    np.testing.assert_array_equal(out["risk"], plain["risk"])

    again = pred.predict_bag(bag, omics, mc_samples=8, mc_seed=3)
    np.testing.assert_array_equal(out["risk_mean"], again["risk_mean"])
    np.testing.assert_array_equal(out["risk_std"], again["risk_std"])
    other = pred.predict_bag(bag, omics, mc_samples=8, mc_seed=4)
    assert float(other["risk_mean"][0]) != float(out["risk_mean"][0])


def test_cli_predict_mc_columns(config_path, tmp_path, capsys):
    out_csv = str(tmp_path / "preds_mc.csv")
    rc = cli.main([
        "predict", "--config", config_path, "--out", out_csv, "--mc", "4",
    ])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert "risk_mc_std" in df.columns and "risk_mc_mean" in df.columns
    assert "y_0_mc_std" in df.columns
    assert (df["risk_mc_std"] > 0).all()
    assert len(df) == 16


def test_cli_stratify(config_path, tmp_path, capsys):
    """`cli stratify` scores a split, cuts at the risk quantile, and reports
    the log-rank statistic; CSV + KM PNG artifacts land where asked."""
    out_csv = str(tmp_path / "strat.csv")
    png = str(tmp_path / "km.png")
    rc = cli.main([
        "stratify", "--config", config_path, "--split", "all",
        "--out", out_csv, "--png", png, "--json",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "log-rank" in out
    import json as _json

    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = _json.loads(line)
    assert res["n"] == 16 and res["n_high"] + res["n_low"] == 16
    assert 0.0 <= res["p_value"] <= 1.0
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert set(df["group"]) == {"high", "low"}
    assert len(df) == 16
    assert os.path.getsize(png) > 1000

    # quantile must actually split
    with pytest.raises(ValueError):
        from multimodal_path_omic_tpu.config import load_config
        from multimodal_path_omic_tpu.train.analysis import stratify

        stratify(load_config(config_path, {}), quantile=1.5)


def test_stratify_label_alignment_across_buckets(tmp_path):
    """Regression: predict_dataset emits rows in BUCKET order, not table
    order. On a two-bucket cohort the survival labels must follow slide_id,
    never position — every CSV row's months/event must equal the table's
    value for that slide."""
    import pandas as pd
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )
    from multimodal_path_omic_tpu.train.analysis import stratify

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=12, bag_lengths=(40, 200), n_genes=24,
        n_signatures=3, seed=2,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["tpu"] = {"bag_buckets": [64, 256], "batch_size": 4, "use_pallas": False}
    cfg = config_from_dict(raw)
    out_csv = str(tmp_path / "strat.csv")
    stratify(cfg, split="all", out_csv=out_csv, verbose=False)

    df = pd.read_csv(out_csv)
    cohort = pd.read_csv(csv).set_index("slide_id")
    assert len(df) == 12
    for _, row in df.iterrows():
        assert row["survival_months"] == pytest.approx(
            float(cohort.loc[row["slide_id"], "survival_months"])
        ), row["slide_id"]


def test_predict_dataset_mc_keys_independent_per_batch(config_path):
    """MC noise must be independent ACROSS batches: with a multi-batch
    dataset, per-sample risk_std from predict_dataset must match calling the
    per-batch fold explicitly — and batches must not share mask realizations
    (spot check: row-aligned risks differ between first rows of batches)."""
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.serve import Predictor

    cfg = config_from_dict(_yaml.safe_load(open(config_path)))
    pred = Predictor.from_config(cfg)
    cols = pred.predict_dataset(pred._t.dataset, mc_samples=6, mc_seed=1)
    # 16 samples / batch 8 -> 2+ batches; stds all positive and not all equal
    assert len(cols["risk_std"]) == 16
    assert (np.asarray(cols["risk_std"]) > 0).all()
    # seeded determinism still holds end-to-end
    again = pred.predict_dataset(pred._t.dataset, mc_samples=6, mc_seed=1)
    np.testing.assert_array_equal(cols["risk_std"], again["risk_std"])


def test_full_reference_example_covers_every_knob(capsys):
    """examples/full_reference.yaml documents EVERY config field (the
    cross-check fails when a new knob lands without documentation) and loads
    without any unknown-key warning."""
    import dataclasses

    import yaml as _yaml

    from multimodal_path_omic_tpu import config as C

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "full_reference.yaml",
    )
    raw = _yaml.safe_load(open(path))
    C.config_from_dict(raw)
    assert "unknown config key" not in capsys.readouterr().err
    for section, cls in [
        ("wandb", C.WandbConfig), ("dataset", C.DatasetConfig),
        ("model", C.ModelConfig), ("training", C.TrainingConfig),
        ("tpu", C.TpuConfig),
    ]:
        have = {("lambda_" if k == "lambda" else k) for k in raw.get(section, {})}
        missing = {f.name for f in dataclasses.fields(cls)} - have
        assert not missing, f"undocumented {section} knobs: {sorted(missing)}"


def test_unknown_yaml_key_warns(capsys):
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict

    config_from_dict({"tpu": {"device_cahce": "on"}})
    err = capsys.readouterr().err
    assert "unknown config key 'device_cahce'" in err


def test_cli_bench_reports_json_line(config_path, capsys):
    rc = cli.main([
        "bench", "--config", config_path, "--epochs", "2", "--validate",
    ])
    assert rc == 0
    import json as _json

    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    res = _json.loads(line)
    assert res["metric"] == "train_bags_per_sec_e2e" and res["value"] > 0
    assert res["validated_cadence"] is True
    assert res["median_val_epoch_s"] is not None
    assert res["timed_epochs"] == 2 and res["warmup_epochs"] == 1
    assert res["n_train_bags"] == 12


def test_stratify_uses_passed_trainer(config_path):
    """stratify(trainer=...) must analyze the TRAINED in-memory model, not a
    fresh init built from config (the flagship demo's phase-3 path)."""
    import yaml as _yaml

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.train.analysis import stratify
    from multimodal_path_omic_tpu.train.trainer import Trainer

    cfg = config_from_dict(_yaml.safe_load(open(config_path)))
    t = Trainer(cfg, verbose=False)
    t.fit()
    trained = stratify(cfg, split="all", trainer=t, verbose=False)
    fresh = stratify(cfg, split="all", verbose=False)
    assert trained["risk_threshold"] != fresh["risk_threshold"]


def test_cli_evaluate(config_path, capsys):
    """`cli evaluate` reports the full survival metric panel (c-index +
    IPCW Brier/IBS + AUC(t)) on a split, with default eval times taken from
    the cohort's qcut bin edges."""
    rc = cli.main(["evaluate", "--config", config_path, "--split", "all",
                   "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "c-index" in out and "IBS" in out
    import json as _json

    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    res = _json.loads(line)
    assert res["n"] == 16
    assert 0.0 <= res["c_index"] <= 1.0
    assert res["bin_edges_exact"] is True
    assert len(res["eval_times"]) == len(res["brier_scores"]) == len(res["auc"])
    assert len(res["eval_times"]) >= 1
    assert all(0.0 <= b <= 1.0 for b in res["brier_scores"])
    assert 0.0 <= res["integrated_brier_score"] <= 1.0

    # explicit --times: the grid is honored (filter happens only on default)
    t0 = res["eval_times"][0]
    rc = cli.main(["evaluate", "--config", config_path, "--split", "all",
                   "--times", f"{t0}", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    res2 = _json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert res2["eval_times"] == [t0]
