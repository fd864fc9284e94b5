"""Data layer tests: synthetic cohort -> tables, bag stores, bucketing,
batching. Mirrors the reference's (environment-bound, unrunnable) dataset
tests (dataset.py:250-343) with hermetic synthetic data."""

import numpy as np
import pytest

from multimodal_path_omic_tpu.data import (
    BucketBatcher,
    GeneExprDataset,
    MultimodalDataset,
    bucket_for,
    pad_bag,
    prefetch,
)
from multimodal_path_omic_tpu.data.pipeline import gene_expr_extras, survival_extras
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    out = tmp_path_factory.mktemp("cohort")
    csv, sig, patches = make_synthetic_cohort(str(out), n_patients=20, seed=0)
    return csv, sig, patches


@pytest.fixture(scope="module")
def dataset(cohort):
    csv, sig, patches = cohort
    cfg = synthetic_config_dict(csv, sig, patches)
    return MultimodalDataset(csv, cfg, use_signatures=True)


def test_dataset_basics(dataset):
    assert len(dataset) == 20
    assert len(dataset.signature_sizes) == 6
    months, klass, cens, omics, bag = dataset[0]
    assert bag.ndim == 2 and bag.shape[1] == 1024
    assert len(omics) == 6
    assert 0 <= klass <= 3


def test_survival_classes_are_quartiles(dataset):
    classes = dataset.table.survival_class
    counts = np.bincount(classes, minlength=4)
    assert counts.min() >= len(dataset) // 4 - 1


def test_split_is_patient_level_and_seeded(dataset):
    tr1, va1, _ = dataset.split(0.8, seed=7)
    tr2, va2, _ = dataset.split(0.8, seed=7)
    assert list(tr1.table.patients) == list(tr2.table.patients)
    assert set(tr1.table.patients).isdisjoint(set(va1.table.patients))
    tr3, _, _ = dataset.split(0.8, seed=8)
    assert list(tr1.table.patients) != list(tr3.table.patients)


def test_leave_one_out_split(dataset):
    patient = dataset.table.patients[0]
    tr, va, te = dataset.split(0.8, test=True, patient=patient)
    assert te is not None and len(te) >= 1
    assert all(p == patient for p in te.table.patients)
    assert patient not in set(tr.table.patients)
    assert patient not in set(va.table.patients)


def test_subset_signature_alignment(dataset):
    """The reference misaligns signature omics after splits
    (dataset.py:238-241); verify ours stay row-aligned."""
    tr, va, _ = dataset.split(0.7, seed=3)
    full = dataset.table
    for sub in (tr, va):
        for j, slide in enumerate(sub.table.slide_ids):
            orig = int(np.where(full.slide_ids == slide)[0][0])
            for name in full.signature_names:
                np.testing.assert_array_equal(
                    sub.table.signature_data[name][j], full.signature_data[name][orig]
                )


def test_standardize_rnaseq(dataset):
    r = dataset.table.rnaseq
    np.testing.assert_allclose(r.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(r.std(0, ddof=1), 1.0, atol=1e-4)


def test_bucket_for():
    assert bucket_for(1, (512, 1024)) == 512
    assert bucket_for(512, (512, 1024)) == 512
    assert bucket_for(513, (512, 1024)) == 1024
    assert bucket_for(3000, (512, 1024)) == 3072  # beyond largest: multiple of it


def test_pad_bag():
    bag = np.ones((5, 8), np.float32)
    padded, mask = pad_bag(bag, 16)
    assert padded.shape == (16, 8) and mask.sum() == 5
    assert padded[5:].sum() == 0


def test_bucket_batcher_covers_all_samples(dataset):
    batcher = BucketBatcher(
        dataset, survival_extras, batch_size=8, buckets=(256, 512), shuffle=True
    )
    seen = []
    for batch in batcher.batches():
        assert batch["wsi"].shape[0] == 8
        assert batch["wsi"].shape[1] in (256, 512)
        assert batch["mask"].shape == batch["wsi"].shape[:2]
        real = int(batch["weight"].sum())
        seen.extend(batch["index"][:real].tolist())
        assert len(batch["omics"]) == 6
        # mask matches actual bag lengths
        for b in range(real):
            length = dataset.bag(int(batch["index"][b])).shape[0]
            assert batch["mask"][b].sum() == length
    assert sorted(seen) == list(range(len(dataset)))


def test_batches_are_bucket_homogeneous(dataset):
    batcher = BucketBatcher(
        dataset, survival_extras, batch_size=4, buckets=(256, 512), shuffle=False
    )
    for batch in batcher.batches():
        lengths = batch["mask"].sum(1)
        real = int(batch["weight"].sum())
        assert all(
            bucket_for(int(l), (256, 512)) == batch["bucket"] for l in lengths[:real]
        )


def test_prefetch_preserves_order_and_errors():
    items = list(range(10))
    assert list(prefetch(iter(items), depth=3)) == items

    def boom():
        yield 1
        raise RuntimeError("io error")

    with pytest.raises(RuntimeError):
        list(prefetch(boom(), depth=2))


def test_h5_backend(tmp_path):
    csv, sig, h5_path = make_synthetic_cohort(
        str(tmp_path), n_patients=6, bag_format="h5", seed=1
    )
    cfg = synthetic_config_dict(csv, sig, h5_path, h5=True)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    assert len(ds) == 6
    _, _, _, _, bag = ds[0]
    assert bag.shape[1] == 1024


def test_pt_backend(tmp_path):
    pytest.importorskip("torch")
    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=4, bag_format="pt", seed=2
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    assert len(ds) == 4
    assert ds.bag(0).dtype == np.float32


def test_missing_bags_dropped(tmp_path):
    import os

    csv, sig, patches = make_synthetic_cohort(str(tmp_path), n_patients=6, seed=3)
    # delete two bag files; dataset init must drop those rows (dataset.py:39-59)
    victims = sorted(os.listdir(patches))[:2]
    for v in victims:
        os.remove(os.path.join(patches, v))
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    assert len(ds) == 4


def test_gene_expr_dataset(cohort):
    csv, sig, patches = cohort
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = GeneExprDataset(csv, cfg, gene="G000")
    assert len(ds) == 20
    label, bag = ds[0]
    assert 0 <= label <= 2
    assert "G000_rnaseq" not in ds.table.df.columns
    batcher = BucketBatcher(ds, gene_expr_extras, batch_size=4, buckets=(512,))
    batch = next(batcher.batches())
    assert batch["label"].shape == (4,)


def test_raw_yaml_dict_config_accepted(cohort):
    """A reference-style raw YAML dict works as config (schema compat)."""
    csv, sig, patches = cohort
    raw = {
        "dataset": {
            "file": csv,
            "patches_dir": patches,
            "signatures": sig,
            "decider_only": False,
            "tcga_only": False,
            "diagnostic_only": False,
            "normalize": False,
            "standardize": True,
        }
    }
    ds = MultimodalDataset(csv, raw, use_signatures=True)
    assert len(ds) == 20


def test_decider_filter(cohort):
    csv, sig, patches = cohort
    cfg = synthetic_config_dict(csv, sig, patches)
    cfg["dataset"]["decider_only"] = True
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    assert 0 < len(ds) < 20


def test_from_dataframe_api_shim(dataset):
    """Reference-style from_dataframe classmethod (dataset.py:187-243) with
    row-aligned signatures."""
    df = dataset.table.df.iloc[[3, 7, 1]]
    sub = type(dataset).from_dataframe(df, dataset)
    assert len(sub) == 3
    assert list(sub.table.slide_ids) == list(df["slide_id"])
    # signature rows aligned with the selected slides
    for j, slide in enumerate(sub.table.slide_ids):
        orig = int(np.where(dataset.table.slide_ids == slide)[0][0])
        for name in dataset.table.signature_names:
            np.testing.assert_array_equal(
                sub.table.signature_data[name][j],
                dataset.table.signature_data[name][orig],
            )


def test_multi_slide_patients_split_together(tmp_path):
    """Patient-level splits keep all of a patient's slides on one side."""
    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=10, slides_per_patient=3, seed=9
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    assert len(ds) == 30
    tr, va, _ = ds.split(0.7, seed=1)
    assert set(tr.table.patients).isdisjoint(set(va.table.patients))
    # every kept patient keeps all 3 slides
    import collections

    for side in (tr, va):
        counts = collections.Counter(side.table.patients)
        assert all(v == 3 for v in counts.values())


def test_batcher_len_is_exact(dataset):
    batcher = BucketBatcher(
        dataset, survival_extras, batch_size=8, buckets=(256, 512), shuffle=True
    )
    assert len(batcher) == sum(1 for _ in batcher.batches())


def test_pt_store_length_sidecar(tmp_path):
    pytest.importorskip("torch")
    import json
    import os

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=4, bag_format="pt", seed=5
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    b1 = BucketBatcher(ds, survival_extras, 2, (512,), shuffle=False)
    lengths1 = b1._bag_lengths()
    sidecar = os.path.join(patches, ".bag_lengths.json")
    assert os.path.exists(sidecar)
    cached = json.load(open(sidecar))
    assert len(cached) == 4
    # second batcher reads from the sidecar and agrees
    b2 = BucketBatcher(ds, survival_extras, 2, (512,), shuffle=False)
    np.testing.assert_array_equal(lengths1, b2._bag_lengths())


# ---------------------------------------------------------------------------
# --bug-compat: exact replication of the reference's bugs (SURVEY.md §7.1)
# ---------------------------------------------------------------------------


def test_bug_compat_split_is_unseeded(dataset):
    """bug-compat splits reproduce the reference's UNSEEDED patient shuffle
    (dataset.py:154): repeated splits give different orders."""
    orders = [
        tuple(dataset.split(0.8, seed=7, bug_compat=True)[0].table.patients)
        for _ in range(5)
    ]
    assert len(set(orders)) > 1, "bug-compat split unexpectedly deterministic"


def test_bug_compat_misaligns_signature_subsets(dataset):
    """bug-compat subsets take rows 0..n-1 of the ORIGINAL signature tensors
    (the reference's from_dataframe reset-index bug, dataset.py:238-241)."""
    tr, va, _ = dataset.split(0.8, seed=3, bug_compat=True)
    name = dataset.table.signature_names[0]
    np.testing.assert_array_equal(
        tr.table.signature_data[name],
        dataset.table.signature_data[name][: len(tr)],
    )
    np.testing.assert_array_equal(
        va.table.signature_data[name],
        dataset.table.signature_data[name][: len(va)],
    )
    # and the fixed (default) path is row-aligned, i.e. different whenever the
    # split isn't the identity prefix
    tr_fixed, _, _ = dataset.split(0.8, seed=3)
    assert not np.array_equal(
        tr_fixed.table.signature_data[name],
        dataset.table.signature_data[name][: len(tr_fixed)],
    )


def test_bug_compat_ge_labels_misaligned(cohort):
    csv, sig, patches = cohort
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = GeneExprDataset(csv, cfg, gene="G000", verbose=False)
    tr, _, _ = ds.split(0.8, seed=3, bug_compat=True)
    np.testing.assert_array_equal(
        tr.table.gene_expr_class, ds.table.gene_expr_class[: len(tr)]
    )


def test_hdf5_shape_probes(tmp_path):
    """The reference's HDF5 size probes (models/utils.py:7-30) on the same
    on-disk layout: per-case groups with omics/ categories and genomics/
    rnaseq+cnv vectors."""
    import h5py

    from multimodal_path_omic_tpu.utils import (
        get_cnv_size_from_dataset,
        get_omics_sizes_from_dataset,
        get_rnaseq_size_from_dataset,
    )

    path = str(tmp_path / "cases.h5")
    with h5py.File(path, "w") as f:
        case = f.create_group("case_000")
        om = case.create_group("omics")
        om.create_dataset("b_sig", data=np.zeros(7))
        om.create_dataset("a_sig", data=np.zeros(3))
        gen = case.create_group("genomics")
        gen.create_dataset("rnaseq", data=np.zeros(60))
        gen.create_dataset("cnv", data=np.zeros(30))
        f.create_group("case_001")  # probes read only the first case

    assert get_omics_sizes_from_dataset(path) == [3, 7]  # sorted by name
    assert get_rnaseq_size_from_dataset(path) == 60
    assert get_cnv_size_from_dataset(path) == 30


def test_prefetch_abandoned_consumer_closes_source():
    """Dropping the prefetch generator mid-stream must not leave the worker
    thread blocked on a full queue — the source iterator's close() (which
    releases native-pipeline slot buffers in real feeds) must still run."""
    import gc
    import time

    closed = []

    def source():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.append(True)

    gen = prefetch(source(), depth=2)
    assert next(gen) == 0
    gen.close()  # abandon mid-stream (same path as a raising train step)
    gc.collect()
    for _ in range(50):  # worker closes the source asynchronously
        if closed:
            break
        time.sleep(0.05)
    assert closed, "source generator was never finalized"


def test_sidecar_invalidates_on_bag_rewrite(tmp_path):
    """Re-extracted embeddings (same slide id, new patch count) must not be
    served with stale cached lengths: the sidecar keys entries by file
    mtime+size, so the rewritten bag is re-probed (a stale 48 would send the
    96-patch bag to pad_bag/device-cache with a too-small bucket)."""
    import os
    import time

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=4, bag_lengths=(48,), seed=3
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    b1 = BucketBatcher(ds, survival_extras, 2, buckets=(64, 128), shuffle=False)
    b1._native = None  # force the sidecar path (native probes headers live)
    assert set(b1._bag_lengths().tolist()) == {48}
    assert os.path.exists(os.path.join(patches, ".bag_lengths.json"))

    sid = ds.slide_id(0)
    path = ds.store._path(sid)
    old = np.load(path)
    time.sleep(0.01)  # ensure a distinct mtime even on coarse filesystems
    np.save(path, np.concatenate([old, old], axis=0))

    b2 = BucketBatcher(ds, survival_extras, 2, buckets=(64, 128), shuffle=False)
    b2._native = None
    lengths = {ds.slide_id(i): int(m) for i, m in enumerate(b2._bag_lengths())}
    assert lengths[sid] == 96  # fresh probe, not the stale cached 48


def test_unparseable_npy_falls_back_to_python_path(tmp_path):
    """A bag the C++ header parser rejects (float64) but np.load accepts must
    not corrupt bucketing (-1 lengths) or crash batch loads: the batcher
    drops to the pure-Python loader for the whole cohort."""
    from multimodal_path_omic_tpu.data import native as native_mod

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=4, bag_lengths=(48,), seed=4
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    sid = ds.slide_id(1)
    path = ds.store._path(sid)
    np.save(path, np.load(path).astype(np.float64))  # header now '<f8'

    batcher = BucketBatcher(ds, survival_extras, 2, buckets=(64,), shuffle=False)
    lengths = batcher._bag_lengths()
    assert (lengths == 48).all(), lengths
    if native_mod.available():
        assert batcher._native is None  # fallback engaged
    batches = list(batcher.batches())
    assert sum(int(b["weight"].sum()) for b in batches) == len(ds)


def test_check_data_clean_and_corrupted(tmp_path):
    """Preflight checker (data/check.py): clean cohort passes; a deleted bag
    warns; a wrong-dim bag and an all-censored cohort are fatal."""
    import os

    import pandas as pd

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.check import check_data
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )

    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=8, bag_lengths=(48, 80), n_genes=24,
        n_signatures=3, seed=0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["tpu"] = {"bag_buckets": [64], "batch_size": 4}
    cfg = config_from_dict(raw)

    rep = check_data(cfg, verbose=False)
    assert not rep["fatal"] and not rep["issues"]
    assert rep["rows"] == 8 and rep["bags_missing"] == 0
    assert rep["bag_dim"] == 1024
    # bags of 80 exceed the only bucket (64): warned, not fatal
    assert any("exceed the largest bucket" in w for w in rep["warnings"])
    assert all(v["present"] > 0 for v in rep["signatures"].values())

    # delete one bag -> missing warning, still not fatal (rows drop at load)
    from multimodal_path_omic_tpu.data.bags import slide_basename

    sid = pd.read_csv(csv)["slide_id"].iloc[0]
    bag_path = os.path.join(patches, f"{slide_basename(sid)}.npy")
    bag = np.load(bag_path)
    os.remove(bag_path)
    rep = check_data(cfg, verbose=False)
    assert rep["bags_missing"] == 1 and not rep["fatal"]

    # wrong-dim bag -> fatal (mixed widths cannot feed one model)
    np.save(bag_path, np.zeros((10, 512), np.float32))
    rep = check_data(cfg, verbose=False)
    assert rep["fatal"] and any("inconsistent" in i for i in rep["issues"])
    np.save(bag_path, bag)

    # all-censored cohort -> fatal (no comparable pairs, no event terms)
    df = pd.read_csv(csv)
    df["censorship"] = 1.0
    df.to_csv(csv, index=False)
    rep = check_data(cfg, verbose=False)
    assert rep["fatal"] and any("censored" in i for i in rep["issues"])

    # GE mode: a target gene without a _rnaseq column is fatal
    raw["model"]["name"] = "GeneExpr-NaCAGaT"
    raw["model"]["gene"] = "NOSUCH"
    rep = check_data(config_from_dict(raw), verbose=False)
    assert rep["fatal"] and any("NOSUCH_rnaseq" in i for i in rep["issues"])
    raw["model"]["gene"] = "G000"
    rep = check_data(config_from_dict(raw), verbose=False)
    assert not any("_rnaseq" in i for i in rep["issues"])
