"""Int8 WSI-embedding path: quantization numerics + e2e training paths
(tpu.transfer_dtype=int8, tpu.cache_dtype=int8).

The reference has no quantization (f32 bags torch.loaded per item,
reference: dataset.py:124-126); this is a TPU-bandwidth feature: 4x fewer
H2D / on-device-gather bytes and ~4x more cohort per device-cache budget.
"""

import numpy as np
import pytest

import os

from multimodal_path_omic_tpu.config import config_from_dict
from multimodal_path_omic_tpu.data.quant import dequantize, quantize_bag_int8
from multimodal_path_omic_tpu.data.synthetic import (
    make_synthetic_cohort,
    synthetic_config_dict,
)
from multimodal_path_omic_tpu.train.trainer import Trainer

from test_train import _make_cfg


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(3, 64, 32)) * rng.uniform(0.1, 10, (3, 64, 1))).astype(
        np.float32
    )
    x[1, 5] = 0.0  # an all-zero (padding) row
    q, scale = quantize_bag_int8(x)
    assert q.dtype == np.int8 and scale.shape == (3, 64)
    dq = np.asarray(dequantize(np.asarray(q), np.asarray(scale)))
    # symmetric rounding: per-element error <= half a quantization step
    err = np.abs(dq - x)
    assert np.all(err <= scale[..., None] / 2 + 1e-7), err.max()
    # zero rows are exact (scale forced to 1, q to 0)
    np.testing.assert_array_equal(dq[1, 5], 0.0)
    np.testing.assert_array_equal(scale[1, 5], 1.0)


def test_quantize_extremes_map_to_127():
    x = np.array([[[-2.0, 0.0, 2.0, 1.0]]], np.float32)
    q, scale = quantize_bag_int8(x)
    np.testing.assert_array_equal(q[0, 0], [-127, 0, 127, 64])
    np.testing.assert_allclose(scale[0, 0], 2.0 / 127.0, rtol=1e-6)


def test_int8_transfer_e2e_learns(tmp_path):
    """transfer_dtype=int8: full training stays finite and beats chance on the
    planted signal (quantization noise must not destroy learnability)."""
    cfg = _make_cfg(tmp_path, epochs=6)
    cfg.tpu.transfer_dtype = "int8"
    trainer = Trainer(cfg, verbose=False)
    out = trainer.fit()
    assert np.isfinite(out["train_loss"]) and np.isfinite(out["val_loss"])
    assert out["train_c_index"] > 0.55, out


def test_int8_cache_equals_int8_transfer_exactly(tmp_path):
    """cache_dtype=int8 and transfer_dtype=int8 quantize the SAME padded rows
    with the same math — device-cached int8 training must EXACTLY equal
    host-fed int8 training (same RNG chain, same dequantized values)."""
    cfg_host = _make_cfg(tmp_path, epochs=2)
    cfg_host.tpu.device_cache = "off"
    cfg_host.tpu.transfer_dtype = "int8"
    t_host = Trainer(cfg_host, verbose=False)
    out_host = t_host.fit()

    cfg_cache = _make_cfg(tmp_path, epochs=2)
    cfg_cache.tpu.device_cache = "on"
    cfg_cache.tpu.cache_dtype = "int8"
    t_cache = Trainer(cfg_cache, verbose=False)
    out_cache = t_cache.fit()
    assert t_cache.device_cache is not None, "cache did not engage"
    assert t_cache.device_cache.store_dtype == "int8"
    assert np.isclose(out_cache["train_loss"], out_host["train_loss"], atol=1e-6)
    assert np.isclose(out_cache["val_loss"], out_host["val_loss"], atol=1e-6)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(t_host.state.params),
        jax.tree_util.tree_leaves(t_cache.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_int8_eval_close_to_f32(tmp_path):
    """Same trained params: int8-quantized inputs track f32 eval within
    quantization noise (catches wired-wrong dequant paths)."""
    cfg = _make_cfg(tmp_path, epochs=2)
    cfg.tpu.device_cache = "off"  # validate() must go through _device_batch
    t = Trainer(cfg, verbose=False)
    for e in range(2):  # train a bit so outputs aren't random-init near-ties
        t.train_epoch(e)
    out_f32 = t.validate(0)

    t.config.tpu.transfer_dtype = "int8"
    out_int8 = t.validate(0)
    assert abs(out_int8["val_loss"] - out_f32["val_loss"]) < 0.05
    assert abs(out_int8["val_c_index"] - out_f32["val_c_index"]) < 0.2


def test_cache_nbytes_int8_accounting():
    from multimodal_path_omic_tpu.data.device_cache import DeviceBagCache

    lengths = np.array([100, 600])
    buckets = (128, 1024)
    f32 = DeviceBagCache.nbytes(lengths, buckets, dim=1024)
    i8 = DeviceBagCache.nbytes(lengths, buckets, dim=1024, store_dtype="int8")
    assert f32 == (128 + 1024) * 1024 * 4
    assert i8 == (128 + 1024) * (1024 + 4)  # 1 byte/elem + 4-byte row scale


def test_int8_cache_budget_uses_int8_size(tmp_path):
    """A budget that fits the int8 cohort but not the f32 one must still
    engage the cache when cache_dtype=int8."""
    cfg = _make_cfg(tmp_path, epochs=1)
    from multimodal_path_omic_tpu.data.device_cache import DeviceBagCache

    cfg.tpu.device_cache = "auto"
    cfg.tpu.cache_dtype = "int8"
    t = Trainer(cfg, verbose=False)
    lengths = np.concatenate(
        [t.train_batcher._bag_lengths(), t.val_batcher._bag_lengths()]
    )
    f32_bytes = DeviceBagCache.nbytes(lengths, t.buckets, 1024)
    int8_bytes = DeviceBagCache.nbytes(lengths, t.buckets, 1024, store_dtype="int8")
    cfg.tpu.device_cache_budget_bytes = (f32_bytes + int8_bytes) // 2
    t.fit()
    assert t.device_cache is not None, "int8 cache should fit this budget"


def test_config_rejects_bad_dtypes():
    from multimodal_path_omic_tpu.config import TpuConfig

    with pytest.raises(ValueError, match="transfer_dtype"):
        TpuConfig(transfer_dtype="int4")
    with pytest.raises(ValueError, match="cache_dtype"):
        TpuConfig(cache_dtype="fp16")
    with pytest.raises(ValueError, match="compute_dtype"):
        TpuConfig(compute_dtype="fp8")


@pytest.mark.slow
def test_bfloat16_cache_and_transfer_train_close_to_f32(tmp_path):
    """cache_dtype/transfer_dtype "bfloat16" (the TPU "auto" resolution):
    training stays finite and lands near the f32 run. Under default TPU
    matmul precision bf16 feeding is the same math as f32 feeding; on CPU
    (true f32 matmuls) it differs only by the storage rounding, so the
    comparison here is a closeness bar, not exact equality."""
    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=16, bag_lengths=(48, 96), n_genes=24,
        n_signatures=3, seed=7, signal_strength=2.0,
    )

    def run(cache, transfer, label):
        raw = synthetic_config_dict(csv, sig, patches)
        raw["model"]["model_size"] = "small"
        raw["training"]["epochs"] = 2
        raw["tpu"] = {
            "bag_buckets": [128], "batch_size": 8, "use_pallas": False,
            "cache_dtype": cache, "transfer_dtype": transfer,
            "device_cache": "on" if cache != "off" else "off",
        }
        cfg = config_from_dict(raw)
        cfg.model.checkpoint_dir = os.path.join(str(tmp_path), f"ck_{label}")
        cfg.training.test_output_dir = os.path.join(str(tmp_path), f"o_{label}")
        t = Trainer(cfg, verbose=False)
        assert t.cache_dtype == cache and t.transfer_dtype == transfer
        return t.fit()

    ref = run("float32", "float32", "f32")
    bf = run("bfloat16", "bfloat16", "bf16")
    assert np.isfinite(bf["train_loss"]) and np.isfinite(bf["val_loss"])
    assert abs(bf["train_loss"] - ref["train_loss"]) < 0.05
    assert abs(bf["val_loss"] - ref["val_loss"]) < 0.05


def test_auto_dtypes_resolve_to_f32_on_cpu(tmp_path):
    """"auto" transfer/cache dtypes resolve per backend (f32 on CPU, bf16 on
    TPU) so CPU equality tests stay exact while TPU runs get convert-free
    MXU feeding by default."""
    csv, sig, patches = make_synthetic_cohort(
        str(tmp_path), n_patients=4, bag_lengths=(48,), n_genes=12,
        n_signatures=2, seed=8,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    cfg = config_from_dict(raw)
    assert cfg.tpu.transfer_dtype == "auto" and cfg.tpu.cache_dtype == "auto"
    t = Trainer(cfg, verbose=False)
    assert t.transfer_dtype == "float32"
    assert t.cache_dtype == "float32"
    assert t.compute_dtype == "float32"  # auto: bf16 only on TPU at B>=128


def test_auto_compute_dtype_gates_on_per_device_batch():
    """"auto" compute dtype uses the per-DEVICE batch (global / data_axis):
    a data_axis=8 mesh at global B=256 puts 32 bags on each device — the
    regime where bf16 casts measured a 12% LOSS — so auto stays f32 there."""
    from multimodal_path_omic_tpu.train.trainer import resolve_compute_dtype

    assert resolve_compute_dtype("auto", "tpu", 256, 1) == "bfloat16"
    assert resolve_compute_dtype("auto", "tpu", 256, 8) == "float32"
    assert resolve_compute_dtype("auto", "tpu", 1024, 8) == "bfloat16"
    assert resolve_compute_dtype("auto", "cpu", 256, 1) == "float32"
    # explicit values pass through untouched on any backend/mesh
    assert resolve_compute_dtype("bfloat16", "cpu", 8, 1) == "bfloat16"
    assert resolve_compute_dtype("float32", "tpu", 1024, 1) == "float32"


def test_w8a8_linear_value_and_grads():
    """w8a8_linear (ops/layers.py): int8-MXU first projection. Value must
    equal dequant(q)@k + b up to the KERNEL's own per-column int8 error
    (the activation error is already in q); grads must be EXACTLY the float
    path's dW = dequant(q)T @ dy and db = sum(dy) (straight-through kernel
    quantization, no dX — the input is data)."""
    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.ops.layers import w8a8_linear

    rng = np.random.default_rng(0)
    B, M, F, E = 2, 16, 32, 8
    x = rng.normal(size=(B, M, F)).astype(np.float32)
    q, rs = quantize_bag_int8(x)
    q, rs = jnp.asarray(q), jnp.asarray(rs)
    k = jnp.asarray(rng.normal(size=(F, E)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))

    xdq = np.asarray(dequantize(q, rs))
    y = np.asarray(w8a8_linear(q, rs, k, b, None))
    ref = xdq @ np.asarray(k) + np.asarray(b)
    # kernel int8 error bound: |dk| <= col_scale/2 per element, F terms
    col_scale = np.abs(np.asarray(k)).max(0) / 127.0
    bound = (np.abs(xdq).sum(-1)[..., None] * col_scale / 2.0) + 1e-5
    assert np.all(np.abs(y - ref) <= bound), np.abs(y - ref).max()

    def loss_w8a8(k_, b_):
        return jnp.sum(jnp.sin(w8a8_linear(q, rs, k_, b_, None)))

    def loss_float(k_, b_):
        return jnp.sum(jnp.sin(dequantize(q, rs) @ k_ + b_))

    dk8, db8 = jax.grad(loss_w8a8, argnums=(0, 1))(k, b)
    dkf, dbf = jax.grad(loss_float, argnums=(0, 1))(k, b)
    # dy differs slightly (sin' at slightly different y); compare against the
    # float formula evaluated at the SAME dy instead of loose tolerances
    dy = np.cos(y)
    np.testing.assert_allclose(
        np.asarray(dk8),
        np.einsum("bmf,bme->fe", xdq, dy),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(db8), dy.sum((0, 1)), rtol=1e-5, atol=1e-5
    )
    # and the float-path grads are close (same math, perturbed dy)
    assert np.abs(np.asarray(dk8) - np.asarray(dkf)).max() < np.abs(dkf).max()


def test_torch_linear_int8_route():
    """TorchLinear(x_int8, row_scale) routes through w8a8_linear and keeps
    the float param structure (checkpoint-compatible)."""
    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.ops.layers import TorchLinear

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 8, 16)).astype(np.float32)
    q, rs = quantize_bag_int8(x)
    mod = TorchLinear(4)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    y_f = mod.apply(params, jnp.asarray(x))
    y_q = mod.apply(params, jnp.asarray(q), jnp.asarray(rs))
    assert y_q.shape == y_f.shape
    # int8 path approximates the float path within quantization error
    assert float(jnp.abs(y_q - y_f).mean() / jnp.abs(y_f).mean()) < 0.02


def test_int8_matmul_training_tracks_dequant_path(tmp_path):
    """tpu.int8_matmul with an int8 cache: the first projection runs
    s8 x s8 -> s32 (w8a8_linear) instead of dequantizing the bag. Training
    must run NaN-free and track the int8-dequant baseline closely (the only
    delta is the kernel's own per-column int8 quantization, second-order
    next to the shared activation quantization)."""
    outs, params = [], []
    for int8_mm in (False, True):
        cfg = _make_cfg(tmp_path, epochs=2)
        cfg.tpu.device_cache = "on"
        cfg.tpu.cache_dtype = "int8"
        cfg.tpu.int8_matmul = int8_mm
        t = Trainer(cfg, verbose=False)
        outs.append(t.fit())
        params.append(t.state.params)
        assert t.device_cache is not None and t.device_cache.store_dtype == "int8"
    assert np.isfinite(outs[1]["train_loss"])
    assert abs(outs[1]["train_loss"] - outs[0]["train_loss"]) < 0.05
    assert abs(outs[1]["val_loss"] - outs[0]["val_loss"]) < 0.05
    # params stay in the same neighborhood (identical rng chain, perturbed
    # first-layer numerics drift a little over 2 epochs — catch only wild
    # divergence, the loss deltas above carry the tight bound)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params[0]), jax.tree_util.tree_leaves(params[1])
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 0.5 * (np.abs(a).max() + 1e-3)
