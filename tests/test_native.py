"""Native C++ bag loader tests: byte-exact parity with the Python path."""

import numpy as np
import pytest

from multimodal_path_omic_tpu.data import BucketBatcher, MultimodalDataset
from multimodal_path_omic_tpu.data.pipeline import survival_extras
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)

native = pytest.importorskip("multimodal_path_omic_tpu.data.native")

if not native.available():  # pragma: no cover
    pytest.skip("native loader unavailable (no g++)", allow_module_level=True)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    out = tmp_path_factory.mktemp("native_cohort")
    return make_synthetic_cohort(str(out), n_patients=12, seed=7)


def test_native_store_matches_numpy(cohort):
    csv, sig, patches = cohort
    store = native.NativeBagStore(patches)
    import os

    names = sorted(f[:-4] for f in os.listdir(patches) if f.endswith(".npy"))
    assert store.exists(names[0] + ".svs")
    for name in names[:4]:
        ref = np.load(f"{patches}/{name}.npy")
        assert store.length(name) == ref.shape[0]
        assert store.dim(name) == ref.shape[1]
        got = store.get(name)
        np.testing.assert_array_equal(got, ref)


def test_native_batch_fill_padding_and_mask(cohort):
    csv, sig, patches = cohort
    store = native.NativeBagStore(patches)
    import os

    names = sorted(f[:-4] for f in os.listdir(patches) if f.endswith(".npy"))[:5]
    bucket = 512
    dim = store.dim(names[0])
    wsi, mask = store.load_batch(names, bucket, dim)
    assert wsi.shape == (5, bucket, dim) and mask.shape == (5, bucket)
    for i, name in enumerate(names):
        ref = np.load(f"{patches}/{name}.npy")
        m = ref.shape[0]
        np.testing.assert_array_equal(wsi[i, :m], ref)
        assert wsi[i, m:].sum() == 0
        assert mask[i, :m].all() and not mask[i, m:].any()


def test_batcher_uses_native_and_matches_python(cohort):
    csv, sig, patches = cohort
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    b_native = BucketBatcher(ds, survival_extras, 4, (512,), shuffle=False)
    assert b_native._native is not None, "native path not engaged"
    b_python = BucketBatcher(ds, survival_extras, 4, (512,), shuffle=False)
    b_python._native = None
    for bn, bp in zip(b_native.batches(), b_python.batches()):
        np.testing.assert_array_equal(bn["wsi"], bp["wsi"])
        np.testing.assert_array_equal(bn["mask"], bp["mask"])
        np.testing.assert_array_equal(bn["label"], bp["label"])


def test_missing_bag_raises(cohort):
    csv, sig, patches = cohort
    store = native.NativeBagStore(patches)
    with pytest.raises(FileNotFoundError):
        store.load_batch(["nonexistent_slide"], 64, 1024)


def test_truncated_npy_rejected_at_open(tmp_path):
    """A .npy whose header-declared payload exceeds the file size must be
    skipped at index time (it would otherwise SIGBUS the fill memcpy)."""
    import os

    good = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    np.save(tmp_path / "good.npy", good)
    np.save(tmp_path / "bad.npy", good)
    # truncate the payload, keeping the header intact
    full = os.path.getsize(tmp_path / "bad.npy")
    os.truncate(tmp_path / "bad.npy", full - 512)
    store = native.NativeBagStore(str(tmp_path))
    assert store.exists("good")
    assert not store.exists("bad")


def test_pipeline_dim_mismatch_errors(tmp_path):
    """fill_bag must reject bags whose feature dim differs from the batch's
    (same check bl_load_batch performs) instead of memcpy-ing garbage."""
    rng = np.random.default_rng(1)
    np.save(tmp_path / "a.npy", rng.normal(size=(8, 64)).astype(np.float32))
    np.save(tmp_path / "b.npy", rng.normal(size=(8, 32)).astype(np.float32))
    store = native.NativeBagStore(str(tmp_path))
    # batch path
    with pytest.raises(IOError):
        store.load_batch(["a", "b"], bucket=16, dim=64)
    # pipelined path
    pipe = native.NativePipeline(
        store, [(["a", "b"], 16)], batch_size=2, dim=64, n_slots=2
    )
    with pytest.raises(IOError):
        list(pipe.batches())


def test_native_pipeline_matches_batch_loads(cohort):
    """The pipelined executor yields byte-identical batches, in plan order."""
    csv, sig, patches = cohort
    store = native.NativeBagStore(patches)
    import os

    names = sorted(f[:-4] for f in os.listdir(patches) if f.endswith(".npy"))
    plan = [(names[0:4], 512), (names[4:8], 512), (names[8:12], 384)]
    pipe = native.NativePipeline(store, plan, batch_size=4, dim=1024, n_slots=2)
    seen = 0
    for b, wsi, mask in pipe.batches():
        ids, bucket = plan[b]
        ref_wsi, ref_mask = store.load_batch(ids, bucket, 1024)
        np.testing.assert_array_equal(wsi, ref_wsi)
        np.testing.assert_array_equal(mask, ref_mask)
        seen += 1
    assert seen == len(plan)


def test_native_pipeline_many_batches(cohort):
    """More batches than slots: ring recycling under worker contention."""
    csv, sig, patches = cohort
    store = native.NativeBagStore(patches)
    import os

    names = sorted(f[:-4] for f in os.listdir(patches) if f.endswith(".npy"))
    plan = [(names[i % len(names):][:2] + names[:2], 256) for i in range(17)]
    plan = [(ids[:2], 256) for ids, _ in [(p[0], None) for p in plan]]
    pipe = native.NativePipeline(store, plan, batch_size=2, dim=1024, n_slots=3, threads=3)
    order = [b for b, _, _ in pipe.batches()]
    assert order == list(range(17))


def test_batcher_opt_in_pipeline_matches(cohort):
    """Opt-in pipelined batches equal the default path when each batch is
    copied before advancing (the documented aliasing contract)."""
    csv, sig, patches = cohort
    from multimodal_path_omic_tpu.data import BucketBatcher, MultimodalDataset
    from multimodal_path_omic_tpu.data.pipeline import survival_extras
    from multimodal_path_omic_tpu.data.synthetic import synthetic_config_dict

    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True)
    ref_b = BucketBatcher(ds, survival_extras, 4, (512,), shuffle=False)
    ref = [(b["wsi"].copy(), b["mask"].copy(), b["label"].copy()) for b in ref_b.batches()]

    pipe_b = BucketBatcher(ds, survival_extras, 4, (512,), shuffle=False)
    pipe_b.use_native_pipeline = True
    got = [(b["wsi"].copy(), b["mask"].copy(), b["label"].copy()) for b in pipe_b.batches()]
    assert len(ref) == len(got)
    for (w1, m1, l1), (w2, m2, l2) in zip(ref, got):
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(l1, l2)
