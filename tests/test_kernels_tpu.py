"""TPU-hardware kernel tests (skipped off-TPU).

The fused co-attention kernel's in-kernel attention dropout uses the TPU PRNG
(``pltpu.prng_seed`` / ``prng_random_bits``) which has no interpret-mode
emulation, so its correctness is verified on the real chip:

* determinism: the same (seed, batch, tile) triple regenerates the identical
  mask (this is also what makes the recompute backward exact);
* EXACT parity: a replica kernel extracts the keep-mask (same seeding
  contract: seed, batch index, tile index; same generation shape), and the
  kernel's outputs AND gradients must match an einsum reference computed with
  that mask — for out, ssq, and both cotangents.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_path_omic_tpu.ops.attention import attention_core
from multimodal_path_omic_tpu.ops.coattn import (
    LANES,
    coattention,
    _dropout_threshold,
)

if jax.devices()[0].platform != "tpu":  # pragma: no cover
    pytest.skip("TPU-only kernel tests", allow_module_level=True)

D = 128
RATE = 0.25


def _data(b=2, n=6, m=512, d=D, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.array(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.array(rng.normal(size=(b, m, d)), jnp.float32)
    v = jnp.array(rng.normal(size=(b, m, d)), jnp.float32)
    lengths = rng.integers(m // 2, m, size=b)
    mask = jnp.array(np.arange(m)[None, :] < lengths[:, None], bool)
    return q, k, v, mask


def _extract_keep_mask(seed: int, b: int, m: int, bk: int, rate: float):
    """Replica of the kernel's PRNG contract: seeded with (seed, batch, tile),
    one (LANES-padded-N, block_k) generation per tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    thresh = _dropout_threshold(rate)

    def kern(seed_ref, o_ref):
        bi = pl.program_id(0)
        j = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], bi * pl.num_programs(1) + j)
        bits = pltpu.prng_random_bits((LANES, bk))
        o_ref[0] = (bits.astype(jnp.uint32) >= jnp.uint32(thresh)).astype(
            jnp.float32
        )

    return pl.pallas_call(
        kern,
        grid=(b, m // bk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, LANES, bk), lambda bi, j: (bi, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, LANES, m), jnp.float32),
    )(jnp.array([seed], jnp.int32))


def _ref_with_mask(q, k, v, mask, keep, rate, pre_gate):
    """Einsum reference with an explicit keep-mask (torch dropout semantics:
    normalize first, then drop + rescale)."""
    d = q.shape[-1]
    s = jnp.einsum("bnd,bmd->bnm", q / jnp.sqrt(jnp.float32(d)), k)
    if pre_gate:
        p = (jnp.einsum("bnd,bmd->bnm", jnp.tanh(q), jnp.tanh(k)) + 1.0) / 2.0
        s = s * p
    s = jnp.where(mask[:, None, :], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    dw = keep[:, : q.shape[1], :] * w / (1.0 - rate)
    out = jnp.einsum("bnm,bmd->bnd", dw, v)
    ssq = jnp.sum(dw * dw, axis=-1)
    return out, ssq


@pytest.mark.parametrize("pre_gate", [False, True])
@pytest.mark.parametrize("m", [512, 1024])  # 1 and 2 KV tiles
def test_kernel_dropout_exact_vs_extracted_mask(pre_gate, m):
    q, k, v, mask = _data(m=m, seed=11)
    seed = 1234
    out_k, ssq_k = coattention(
        q, k, v, mask, pre_gate=pre_gate, dropout_rate=RATE,
        dropout_seed=jnp.array([seed], jnp.int32), need_ssq=True,
        interpret=False,
    )
    keep = _extract_keep_mask(seed, q.shape[0], max(512, m), min(512, m), RATE)
    out_r, ssq_r = _ref_with_mask(q, k, v, mask, keep[:, :, :m], RATE, pre_gate)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ssq_k), np.asarray(ssq_r), atol=3e-5)


@pytest.mark.parametrize("pre_gate", [False, True])
def test_kernel_dropout_grads_exact_vs_extracted_mask(pre_gate):
    m, seed = 1024, 77
    q, k, v, mask = _data(b=1, m=m, seed=12)
    keep = _extract_keep_mask(seed, 1, m, 512, RATE)
    rng = np.random.default_rng(13)
    c_out = jnp.array(rng.normal(size=(1, 6, D)), jnp.float32)
    c_ssq = jnp.array(rng.normal(size=(1, 6)), jnp.float32)

    def loss_ker(q, k, v):
        out, ssq = coattention(
            q, k, v, mask, pre_gate=pre_gate, dropout_rate=RATE,
            dropout_seed=jnp.array([seed], jnp.int32), need_ssq=True,
            interpret=False,
        )
        return jnp.sum(out * c_out) + jnp.sum(ssq * c_ssq)

    def loss_ref(q, k, v):
        out, ssq = _ref_with_mask(q, k, v, mask, keep, RATE, pre_gate)
        return jnp.sum(out * c_out) + jnp.sum(ssq * c_ssq)

    g_ker = jax.jit(jax.grad(loss_ker, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_ref, g_ker, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=1e-3,
            err_msg=f"grad d{name} mismatch",
        )


def test_kernel_dropout_deterministic_per_seed():
    q, k, v, mask = _data(seed=14)
    f = functools.partial(
        coattention, q, k, v, mask, pre_gate=True, dropout_rate=RATE,
        interpret=False,
    )
    a = f(dropout_seed=jnp.array([5], jnp.int32))
    b = f(dropout_seed=jnp.array([5], jnp.int32))
    c = f(dropout_seed=jnp.array([6], jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_kernel_no_dropout_matches_xla_on_tpu():
    """Non-interpreted kernel parity on the real chip (values)."""
    q, k, v, mask = _data(m=1024, seed=15)
    out, _ = attention_core(
        q[:, None], k[:, None], v[:, None], mask,
        pre_gate=True, dropout_rate=0.0, deterministic=True, need_weights=False,
    )
    got = coattention(q, k, v, mask, pre_gate=True, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out[:, 0]), atol=3e-5)


def test_exported_bundle_runs_on_tpu(tmp_path_factory):
    """The cpu+tpu cross-platform AOT bundle (deploy.export_model) must
    execute on the real chip and match the in-framework Predictor there."""
    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )
    from multimodal_path_omic_tpu.deploy import ExportedModel, export_model
    from multimodal_path_omic_tpu.serve import Predictor
    from multimodal_path_omic_tpu.train.trainer import Trainer

    tmp = tmp_path_factory.mktemp("bundle_tpu")
    csv, sig, patches = make_synthetic_cohort(
        str(tmp), n_patients=8, bag_lengths=(48, 80), n_genes=24,
        n_signatures=3, seed=0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "small"
    raw["tpu"] = {"bag_buckets": [128], "batch_size": 4, "use_pallas": False}
    t = Trainer(config_from_dict(raw), verbose=False)
    bundle = str(tmp / "bundle")
    export_model(t, bundle, batch_sizes=(1,))  # default platforms cpu+tpu

    rng = np.random.default_rng(5)
    bag = rng.normal(size=(90, 1024)).astype(np.float32)
    omics = [
        rng.normal(size=(s,)).astype(np.float32) for s in t.omic_sizes
    ]
    a = ExportedModel(bundle).predict_bag(bag, omics)
    b = Predictor(t).predict_bag(bag, omics)
    np.testing.assert_allclose(
        np.asarray(a["risk"]), np.asarray(b["risk"])[0], atol=5e-5
    )


def test_milpool_kernel_on_tpu_matches_xla():
    """Non-interpreted fused MIL pool parity on the real chip."""
    from multimodal_path_omic_tpu.ops.milpool import fused_gated_mil_pool

    rng = np.random.default_rng(3)
    b, m, d, h = 2, 4096, 128, 128
    x = jnp.asarray(rng.normal(size=(b, m, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, m)) > 0.3)
    w = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.1), jnp.float32)
    wa, ba, wb, bb, wc, bc = w(d, h), w(h), w(d, h), w(h), w(h, 1), w(1)

    pooled, scores = fused_gated_mil_pool(
        x, mask, wa, ba, wb, bb, wc, bc, interpret=False
    )
    from multimodal_path_omic_tpu.ops.milpool import reference_gated_mil_pool

    ref, s = reference_gated_mil_pool(x, mask, wa, ba, wb, bb, wc, bc)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), atol=3e-5)


def test_gather_rows_on_tpu_exact():
    """Pallas row-gather == jnp.take bit-exactly on the real chip, for every
    cache dtype and for a non-divisible-by-default-block bucket."""
    from multimodal_path_omic_tpu.ops.gather import gather_rows, supported

    rng = np.random.default_rng(5)
    n, m, d, b = 17, 512, 1024, 9
    idx = jnp.asarray(rng.integers(0, n, size=(b,)).astype(np.int32))
    for dtype in (jnp.bfloat16, jnp.float32, jnp.int8):
        if dtype == jnp.int8:
            pool = jnp.asarray(rng.integers(-127, 127, size=(n, m, d)).astype(np.int8))
        else:
            pool = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32)).astype(dtype)
        assert supported(pool, idx)
        got = jax.jit(gather_rows)(pool, idx)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.take(pool, idx, axis=0))
        )
    # mega-bag bucket: multiple blocks per row
    pool = jnp.asarray(rng.normal(size=(4, 24576, 256)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(np.array([2, 0], np.int32))
    got = jax.jit(gather_rows)(pool, idx)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take(pool, idx, axis=0))
    )


def test_gather_rows_sharded_on_tpu_exact():
    """shard_map'd row-gather kernel == jnp.take bit-exactly on the real chip
    (1-device mesh — the hardware kernel under the exact shard_map wrapper the
    mesh cached path dispatches through)."""
    from multimodal_path_omic_tpu.ops import gather
    from multimodal_path_omic_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, seq=1)
    rng = np.random.default_rng(11)
    n, m, d, b = 9, 1024, 1024, 7
    idx = jnp.asarray(rng.integers(0, n, size=(b,)).astype(np.int32))
    pool = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        p = pool.astype(dtype)
        assert gather.sharded_supported(p, idx, mesh)
        got = gather.take_rows_sharded(p, idx, mesh)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.take(p, idx, axis=0))
        )
