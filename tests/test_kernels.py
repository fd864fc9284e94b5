"""Pallas kernel equivalence tests (interpret mode on CPU).

The fused co-attention kernel (ops/coattn.py) must match the XLA einsum
reference (ops/attention.py attention_core) in both forward values and
gradients, with and without the pre-gate, with bag masks — SURVEY.md §7.2
step 6's "equivalence tests vs einsum versions".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_path_omic_tpu.ops.attention import attention_core
from multimodal_path_omic_tpu.ops.coattn import coattention

D = 128


def _data(b=2, n=6, m=512, d=D, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.array(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.array(rng.normal(size=(b, m, d)), jnp.float32)
    v = jnp.array(rng.normal(size=(b, m, d)), jnp.float32)
    if masked:
        lengths = rng.integers(m // 2, m, size=b)
        mask = jnp.array(
            np.arange(m)[None, :] < lengths[:, None], bool
        )
    else:
        mask = None
    return q, k, v, mask


def _xla(q, k, v, mask, pre_gate):
    out, _ = attention_core(
        q[:, None], k[:, None], v[:, None], mask,
        pre_gate=pre_gate, dropout_rate=0.0, deterministic=True,
        need_weights=False,
    )
    return out[:, 0]


@pytest.mark.parametrize("pre_gate", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_coattention_forward_matches_xla(pre_gate, masked):
    q, k, v, mask = _data(masked=masked)
    ref = _xla(q, k, v, mask, pre_gate)
    got = coattention(q, k, v, mask, pre_gate=pre_gate, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("pre_gate", [False, True])
def test_coattention_grads_match_xla(pre_gate):
    q, k, v, mask = _data(b=1, m=512, seed=1)

    def loss_ref(q, k, v):
        return jnp.sum(_xla(q, k, v, mask, pre_gate) ** 2)

    def loss_ker(q, k, v):
        return jnp.sum(coattention(q, k, v, mask, pre_gate=pre_gate, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_ker, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"grad d{name} mismatch",
        )


def test_coattention_multiple_kv_tiles():
    # m = 1024 with block 512 -> 2 KV tiles: exercises the online softmax
    q, k, v, mask = _data(b=2, m=1024, seed=2)
    ref = _xla(q, k, v, mask, True)
    got = coattention(q, k, v, mask, pre_gate=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_coattention_non_tile_multiple_m():
    # m = 768 pads to 1024 internally; padded keys must be masked out
    q, k, v, _ = _data(b=1, m=768, seed=3, masked=False)
    ref = _xla(q, k, v, None, False)
    got = coattention(q, k, v, None, pre_gate=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_attention_dispatch_xla_fallback():
    """Shapes the kernels don't cover fall back to XLA silently."""
    from multimodal_path_omic_tpu.ops.coattn import fused_attention

    rng = np.random.default_rng(4)
    q = jnp.array(rng.normal(size=(1, 1, 3, 64)), jnp.float32)  # d not 128-mult
    k = jnp.array(rng.normal(size=(1, 1, 100, 64)), jnp.float32)
    v = jnp.array(rng.normal(size=(1, 1, 100, 64)), jnp.float32)
    out = fused_attention(q, k, v, None, pre_gate=False)
    ref, _ = attention_core(
        q, k, v, None, pre_gate=False, dropout_rate=0.0,
        deterministic=True, need_weights=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_mcat_with_pallas_coattention_matches_xla_path():
    """End-to-end: MCAT with use_pallas must equal the XLA model in eval."""
    from multimodal_path_omic_tpu.models import MCAT

    rng = np.random.default_rng(5)
    wsi = jnp.array(rng.normal(size=(1, 512, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(1, s)), jnp.float32) for s in [32, 48]]
    mask = jnp.array(np.arange(512)[None, :] < 400, bool)

    ref_model = MCAT(n_signatures=2, model_size="small", use_pallas=False)
    params = ref_model.init(jax.random.key(0), wsi, omics, mask)
    out_ref = ref_model.apply(params, wsi, omics, mask)

    pal_model = MCAT(n_signatures=2, model_size="small", use_pallas=True)
    out_pal = pal_model.apply(params, wsi, omics, mask)
    np.testing.assert_allclose(
        np.asarray(out_pal.hazards), np.asarray(out_ref.hazards), atol=5e-5
    )
