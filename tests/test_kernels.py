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
    """End-to-end: MCAT with use_pallas must equal the XLA model in eval at
    M >= 4096. Since round 4 the single-head co-attention takes the LEAN
    reassociated path on BOTH settings (ops/attention.py::
    lean_single_head_cross_attention supersedes the fused kernel there — the
    kernel still pays the [B, M, E] k/v projections outside itself), so this
    additionally pins that the kernel is NOT dispatched; model-level kernel
    engagement is covered by the NaCAGaT (pre-gated) dispatch tests below."""
    from multimodal_path_omic_tpu.models import MCAT
    from multimodal_path_omic_tpu.ops import coattn

    m = 4096
    rng = np.random.default_rng(5)
    wsi = jnp.array(rng.normal(size=(1, m, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(1, s)), jnp.float32) for s in [32, 48]]
    mask = jnp.array(np.arange(m)[None, :] < 3600, bool)

    ref_model = MCAT(n_signatures=2, model_size="small", use_pallas=False)
    params = ref_model.init(jax.random.key(0), wsi, omics, mask)
    out_ref = ref_model.apply(params, wsi, omics, mask)

    pal_model = MCAT(n_signatures=2, model_size="small", use_pallas=True)
    before = dict(coattn.DISPATCH_COUNTS)
    out_pal = pal_model.apply(params, wsi, omics, mask)
    assert coattn.DISPATCH_COUNTS["kernel"] == before["kernel"], (
        "MCAT's 1-head co-attention should take the lean path, not the kernel"
    )
    np.testing.assert_allclose(
        np.asarray(out_pal.hazards), np.asarray(out_ref.hazards), atol=5e-5
    )


# ---------------------------------------------------------------------------
# ssq side-output (cesar's ||A||_2 without materializing N x M)
# ---------------------------------------------------------------------------


def _xla_weights(q, k, v, mask, pre_gate):
    out, w = attention_core(
        q[:, None], k[:, None], v[:, None], mask,
        pre_gate=pre_gate, dropout_rate=0.0, deterministic=True,
        need_weights=True,
    )
    return out[:, 0], w[:, 0]


@pytest.mark.parametrize("pre_gate", [False, True])
def test_coattention_ssq_matches_weight_sum_of_squares(pre_gate):
    q, k, v, mask = _data(b=2, m=1024, seed=6)
    _, w = _xla_weights(q, k, v, mask, pre_gate)
    ref_ssq = jnp.sum(w * w, axis=-1)  # [B, N]
    out, ssq = coattention(
        q, k, v, mask, pre_gate=pre_gate, need_ssq=True, interpret=True
    )
    ref_out = _xla(q, k, v, mask, pre_gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ssq), np.asarray(ref_ssq), atol=2e-5)


@pytest.mark.parametrize("pre_gate", [False, True])
def test_coattention_ssq_grads_match_xla(pre_gate):
    """Gradients must be correct through BOTH outputs (out and ssq) — the
    cesar loss differentiates the attention penalty."""
    q, k, v, mask = _data(b=1, m=1024, seed=7)
    rng = np.random.default_rng(8)
    c_out = jnp.array(rng.normal(size=(1, 6, D)), jnp.float32)
    c_ssq = jnp.array(rng.normal(size=(1, 6)), jnp.float32)

    def loss_ref(q, k, v):
        out, w = _xla_weights(q, k, v, mask, pre_gate)
        return jnp.sum(out * c_out) + jnp.sum(jnp.sum(w * w, axis=-1) * c_ssq)

    def loss_ker(q, k, v):
        out, ssq = coattention(
            q, k, v, mask, pre_gate=pre_gate, need_ssq=True, interpret=True
        )
        return jnp.sum(out * c_out) + jnp.sum(ssq * c_ssq)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_ker, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"grad d{name} mismatch",
        )


# ---------------------------------------------------------------------------
# sumw side-output (lean-V's bias-through-dropped-weights term: Σ of the
# final post-dropout weights per query row, ops/attention.py lean_v)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pre_gate", [False, True])
def test_coattention_sumw_matches_weight_sum(pre_gate):
    q, k, v, mask = _data(b=2, m=1024, seed=16)
    _, w = _xla_weights(q, k, v, mask, pre_gate)
    ref_sumw = jnp.sum(w, axis=-1)  # [B, N] — exactly 1 per valid row here
    out, sumw = coattention(
        q, k, v, mask, pre_gate=pre_gate, need_sumw=True, interpret=True
    )
    ref_out = _xla(q, k, v, mask, pre_gate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sumw), np.asarray(ref_sumw), atol=2e-5)


def test_coattention_ssq_and_sumw_together_in_order():
    """Both side outputs at once (the cesar + lean-V training combination):
    returned as (out, ssq, sumw)."""
    q, k, v, mask = _data(b=2, m=1024, seed=17)
    _, w = _xla_weights(q, k, v, mask, True)
    out, ssq, sumw = coattention(
        q, k, v, mask, pre_gate=True, need_ssq=True, need_sumw=True,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ssq), np.asarray(jnp.sum(w * w, axis=-1)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sumw), np.asarray(jnp.sum(w, axis=-1)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla(q, k, v, mask, True)), atol=2e-5
    )


@pytest.mark.parametrize("pre_gate", [False, True])
def test_coattention_sumw_grads_match_xla(pre_gate):
    """Gradients through BOTH outputs (out and sumw) — the lean-V epilogue
    ``bv·Σw`` differentiates the weight mass wrt q and k (dv must stay
    untouched: sumw does not depend on v)."""
    q, k, v, mask = _data(b=1, m=1024, seed=18)
    rng = np.random.default_rng(19)
    c_out = jnp.array(rng.normal(size=(1, 6, D)), jnp.float32)
    c_sumw = jnp.array(rng.normal(size=(1, 6)), jnp.float32)

    def loss_ref(q, k, v):
        out, w = _xla_weights(q, k, v, mask, pre_gate)
        return jnp.sum(out * c_out) + jnp.sum(jnp.sum(w, axis=-1) * c_sumw)

    def loss_ker(q, k, v):
        out, sumw = coattention(
            q, k, v, mask, pre_gate=pre_gate, need_sumw=True, interpret=True
        )
        return jnp.sum(out * c_out) + jnp.sum(sumw * c_sumw)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_ker, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"grad d{name} mismatch",
        )


def test_coattention_ssq_and_sumw_joint_grads_match_xla():
    """All three cotangents live simultaneously in a cesar + lean-V step."""
    q, k, v, mask = _data(b=1, m=1024, seed=20)
    rng = np.random.default_rng(21)
    c_out = jnp.array(rng.normal(size=(1, 6, D)), jnp.float32)
    c_ssq = jnp.array(rng.normal(size=(1, 6)), jnp.float32)
    c_sumw = jnp.array(rng.normal(size=(1, 6)), jnp.float32)

    def loss_ref(q, k, v):
        out, w = _xla_weights(q, k, v, mask, True)
        return (
            jnp.sum(out * c_out)
            + jnp.sum(jnp.sum(w * w, axis=-1) * c_ssq)
            + jnp.sum(jnp.sum(w, axis=-1) * c_sumw)
        )

    def loss_ker(q, k, v):
        out, ssq, sumw = coattention(
            q, k, v, mask, pre_gate=True, need_ssq=True, need_sumw=True,
            interpret=True,
        )
        return (
            jnp.sum(out * c_out) + jnp.sum(ssq * c_ssq) + jnp.sum(sumw * c_sumw)
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_ker, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3,
            err_msg=f"grad d{name} mismatch",
        )


# ---------------------------------------------------------------------------
# Dispatch assertions: the kernel must actually ENGAGE in model train steps
# at production shapes (VERDICT r1: "built" vs "wired")
# ---------------------------------------------------------------------------


def _nacagat_step(loss_name, m, dropout, use_pallas=True):
    """Trace one NaCAGaT train step and return the step's dispatch delta."""
    import optax

    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.ops import coattn
    from multimodal_path_omic_tpu.train.loop import TrainState, make_train_step

    rng = np.random.default_rng(9)
    b = 2
    batch = {
        "wsi": jnp.array(rng.normal(size=(b, m, 1024)), jnp.float32),
        "mask": jnp.array(np.arange(m)[None, :] < m - 5, bool) | jnp.zeros((b, m), bool),
        "omics": [jnp.array(rng.normal(size=(b, 16)), jnp.float32)],
        "label": jnp.zeros((b,), jnp.int32),
        "censorship": jnp.zeros((b,), jnp.float32),
        "survival_months": jnp.ones((b,), jnp.float32),
        "weight": jnp.ones((b,), jnp.float32),
    }
    model = NaCAGaT(
        n_signatures=1, model_size="small", dropout_rate=dropout,
        use_pallas=use_pallas,
    )
    params = model.init(
        jax.random.key(0), batch["wsi"], batch["omics"], batch["mask"],
        deterministic=True,
    )["params"]
    opt = optax.sgd(1e-3)
    state = TrainState(params, opt.init(params), jax.random.key(1), jnp.zeros((), jnp.int32))
    step = make_train_step(model, loss_name, opt, patch_budget=None)
    before = dict(coattn.DISPATCH_COUNTS)
    # trace only (abstract evaluation) — counts are bumped at trace time, and
    # the in-kernel PRNG dropout path cannot EXECUTE off-TPU
    jax.eval_shape(step, state, batch)
    return {k: coattn.DISPATCH_COUNTS[k] - before[k] for k in before}


def test_nacagat_ces_train_step_dispatches_pregated_kernel():
    """ces training with M >= 4096 must hit the fused pre-gated kernel: the
    model honors need_attention=False (the reference materializes the map
    even though ces never consumes it, nacagat.py:80)."""
    delta = _nacagat_step("ces", m=4096, dropout=0.0)
    assert delta["kernel"] >= 1, delta


def test_nacagat_cesar_train_step_dispatches_kernel_via_ssq():
    """cesar training must ALSO run the kernel: the ssq side-output feeds the
    ||A||_2 penalty without materializing the map."""
    delta = _nacagat_step("cesar", m=4096, dropout=0.0)
    assert delta["kernel"] >= 1, delta


def test_nacagat_train_step_with_dropout_dispatches_kernel_on_tpu():
    """With attention dropout active (the reference's p=0.25 training config)
    the kernel engages via its in-kernel PRNG — TPU-only at runtime; traced
    structurally here via the platform override."""
    from multimodal_path_omic_tpu.ops import coattn

    coattn._FORCE_KERNEL_DROPOUT = True
    try:
        # dropout-path dispatch threshold is M >= 8192 (A/B-tuned)
        delta = _nacagat_step("ces", m=8192, dropout=0.25)
    finally:
        coattn._FORCE_KERNEL_DROPOUT = False
    assert delta["kernel"] >= 1, delta


def test_nacagat_small_bag_training_stays_on_xla():
    """Below the M threshold the XLA einsum path must win the dispatch."""
    delta = _nacagat_step("ces", m=512, dropout=0.0)
    assert delta["kernel"] == 0 and delta["xla"] >= 1, delta


def test_nacagat_need_weights_dispatches_chunked_emission():
    """Explicit need_attention=True (export path) materializes the full map
    via the chunked two-pass weights-emission KERNEL at eligible shapes
    (round 3; previously this always fell back to the XLA softmax). The map
    shape and availability are unchanged for the export consumer."""
    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.ops import coattn

    rng = np.random.default_rng(10)
    wsi = jnp.array(rng.normal(size=(1, 4096, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(1, 16)), jnp.float32)]
    model = NaCAGaT(n_signatures=1, model_size="small", use_pallas=True)
    params = model.init(jax.random.key(0), wsi, omics, deterministic=True)
    before = dict(coattn.DISPATCH_COUNTS)
    out = jax.eval_shape(
        lambda p, w, o: model.apply(p, w, o, deterministic=True, need_attention=True),
        params, wsi, omics,
    )
    delta = {k: coattn.DISPATCH_COUNTS[k] - before[k] for k in before}
    assert delta["kernel"] >= 1, delta
    assert out.attention["coattn"].shape == (1, 1, 4096)


@pytest.mark.slow
def test_chunked_weights_emission_matches_xla():
    """VERDICT r2 #6 / SURVEY §7.1: the export path's attention weights can
    be emitted CHUNKED from the kernel (two-pass: online-softmax stats, then
    per-tile normalized emission) — matching the XLA-materialized softmax to
    float precision at an export-scale M, with and without the pre-gate."""
    from multimodal_path_omic_tpu.ops.attention import attention_core
    from multimodal_path_omic_tpu.ops.coattn import (
        attention_with_weights,
        coattention_weights,
    )

    rng = np.random.default_rng(50)
    b, h, n, m, d = 1, 1, 6, 4096, 128
    q = jnp.array(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.array(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.array(rng.normal(size=(b, h, m, d)), jnp.float32)
    mask = jnp.array(np.arange(m)[None, :] < 3500, bool)

    for pre_gate in (False, True):
        ref_out, ref_w = attention_core(
            q, k, v, mask, pre_gate=pre_gate, dropout_rate=0.0,
            deterministic=True, need_weights=True,
        )
        out, w = attention_with_weights(q, k, v, mask, pre_gate=pre_gate)
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(ref_w), atol=1e-5,
            err_msg=f"pre_gate={pre_gate}",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), atol=1e-4,
            err_msg=f"pre_gate={pre_gate}",
        )
        # weight rows sum to 1 over valid keys, 0 over padding
        wn = np.asarray(w)
        np.testing.assert_allclose(wn.sum(-1), 1.0, atol=1e-5)
        assert float(np.abs(wn[..., 3500:]).max()) == 0.0

    # direct chunked emission (the piece the export consumes)
    w2 = coattention_weights(
        q.reshape(b * h, n, d), k.reshape(b * h, m, d), mask, pre_gate=True
    )
    ref_out, ref_w = attention_core(
        q, k, v, mask, pre_gate=True, dropout_rate=0.0,
        deterministic=True, need_weights=True,
    )
    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(ref_w)[:, 0], atol=1e-5
    )


# ---------------------------------------------------------------------------
# Fused masked gated-MIL pooling (ops/milpool.py, interpret mode)
# ---------------------------------------------------------------------------


def _milpool_inputs(b=2, m=1024, d=128, h=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, m, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, m)) > 0.3)
    w = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.1), jnp.float32)
    return x, mask, w(d, h), w(h), w(d, h), w(h), w(h, 1), w(1)


def _milpool_ref(*args):
    from multimodal_path_omic_tpu.ops.milpool import reference_gated_mil_pool

    return reference_gated_mil_pool(*args)


@pytest.mark.parametrize("block_m", [256, 512])
def test_milpool_kernel_matches_xla(block_m):
    from multimodal_path_omic_tpu.ops.milpool import fused_gated_mil_pool

    args = _milpool_inputs()
    pooled, scores = fused_gated_mil_pool(*args, block_m=block_m)
    rp, rs = _milpool_ref(*args)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(rs), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(rp), atol=2e-5)


def test_milpool_kernel_edge_masks():
    from multimodal_path_omic_tpu.ops.milpool import fused_gated_mil_pool

    x, mask, *w = _milpool_inputs()
    # all-padded row: uniform over the finite fill, never NaN (matches
    # masked_softmax); no-mask call matches all-True
    mask0 = mask.at[0].set(False)
    p, _ = fused_gated_mil_pool(x, mask0, *w)
    rp, _ = _milpool_ref(x, mask0, *w)
    np.testing.assert_allclose(np.asarray(p), np.asarray(rp), atol=2e-5)
    p1, s1 = fused_gated_mil_pool(x, None, *w)
    rp1, _ = _milpool_ref(x, jnp.ones(mask.shape, bool), *w)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(rp1), atol=2e-5)
    assert np.isfinite(np.asarray(s1)).all()


def test_ge_eval_dispatches_milpool_kernel_and_matches():
    """GE eval with use_pallas at an eligible pool size runs the fused MIL
    pool (dispatch-counted) and matches the XLA path end to end; TRAINING
    (deterministic=False) must stay on XLA."""
    from multimodal_path_omic_tpu.models import GENaCAGaT
    from multimodal_path_omic_tpu.ops import milpool

    rng = np.random.default_rng(0)
    wsi = jnp.asarray(rng.normal(size=(1, 4096, 64)), jnp.float32)
    mask = jnp.asarray(rng.random((1, 4096)) > 0.2)
    m_xla = GENaCAGaT(model_size="small", use_pallas=False)
    params = m_xla.init(jax.random.key(0), wsi, mask)["params"]
    y0, attn0 = m_xla.apply({"params": params}, wsi, mask, deterministic=True)

    m_k = GENaCAGaT(model_size="small", use_pallas=True)
    old = milpool._FORCE_KERNEL
    milpool._FORCE_KERNEL = True
    try:
        before = dict(milpool.DISPATCH_COUNTS)
        y1, attn1 = m_k.apply({"params": params}, wsi, mask, deterministic=True)
        assert milpool.DISPATCH_COUNTS["kernel"] > before["kernel"]
        # training path: XLA only (dropout + backward live there)
        before = dict(milpool.DISPATCH_COUNTS)
        m_k.apply(
            {"params": params}, wsi, mask, deterministic=False,
            rngs={"dropout": jax.random.key(1)},
        )
        assert milpool.DISPATCH_COUNTS["kernel"] == before["kernel"]
    finally:
        milpool._FORCE_KERNEL = old
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(attn1["path"]), np.asarray(attn0["path"]), atol=3e-5
    )


# ---------------------------------------------------------------------------
# Pallas row-gather kernel (ops/gather.py): device-cache batch assembly
# ---------------------------------------------------------------------------


def test_gather_rows_interpret_matches_take():
    """Kernel copy semantics == jnp.take exactly (interpret mode, all cache
    dtypes, repeated + padded indices like build_meta produces)."""
    from multimodal_path_omic_tpu.ops import gather

    rng = np.random.default_rng(0)
    n, m, d = 7, 256, 128
    for dtype in (jnp.float32, jnp.bfloat16, jnp.int8):
        if dtype == jnp.int8:
            pool = jnp.asarray(rng.integers(-127, 127, size=(n, m, d)).astype(np.int8))
        else:
            pool = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32)).astype(dtype)
        # repeated indices (build_meta pads short batches by repeating the
        # last real row) and out-of-order access
        idx = jnp.asarray(np.array([3, 0, 6, 3, 3], np.int32))
        got = gather.gather_rows(pool, idx, interpret=True)
        want = jnp.take(pool, idx, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_dispatch_policy():
    """take_rows falls back to jnp.take off-TPU / on ineligible shapes but
    stays numerically identical either way."""
    from multimodal_path_omic_tpu.ops import gather

    rng = np.random.default_rng(1)
    pool = jnp.asarray(rng.normal(size=(5, 96, 128)).astype(np.float32))
    idx = jnp.asarray(np.array([4, 1, 1], np.int32))
    # CPU backend in tests: supported() is False, fallback must engage
    assert not gather.supported(pool, idx)
    np.testing.assert_array_equal(
        np.asarray(gather.take_rows(pool, idx)),
        np.asarray(jnp.take(pool, idx, axis=0)),
    )
    # misaligned feature dim is never eligible, on any backend
    pool_odd = jnp.zeros((4, 256, 100), jnp.float32)
    assert not gather.supported(pool_odd, idx)


def test_gather_rows_sharded_interpret_matches_take():
    """shard_map'd row gather on the cache layout (patch axis split over a
    data=4 x seq=2 mesh) == jnp.take exactly, for every cache dtype. Runs the
    kernel in interpret mode (CPU mesh); on-hardware exactness is pinned in
    test_kernels_tpu.py."""
    from multimodal_path_omic_tpu.ops import gather
    from multimodal_path_omic_tpu.parallel.mesh import cache_spec, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=4, seq=2)
    rng = np.random.default_rng(7)
    n, m, d = 6, 256, 128
    idx = jnp.asarray(np.array([5, 0, 2, 5, 5], np.int32))
    for dtype in (jnp.float32, jnp.bfloat16, jnp.int8):
        if dtype == jnp.int8:
            pool = jnp.asarray(rng.integers(-127, 127, size=(n, m, d)).astype(np.int8))
        else:
            pool = jnp.asarray(rng.normal(size=(n, m, d)).astype(np.float32)).astype(dtype)
        from jax.sharding import NamedSharding

        pool = jax.device_put(pool, NamedSharding(mesh, cache_spec("wsi")))
        got = gather.take_rows_sharded(pool, idx, mesh, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(jnp.take(pool, idx, axis=0))
        )
    # dispatch policy: off-TPU the trainer path must NOT route to the kernel
    pool_f32 = jnp.zeros((n, m, d), jnp.float32)
    if jax.devices()[0].platform != "tpu":
        assert not gather.sharded_supported(pool_f32, idx, mesh)
    # a patch axis not divisible by the mesh is never eligible
    assert not gather.sharded_supported(jnp.zeros((n, 252, d), jnp.float32), idx, mesh)


# ---------------------------------------------------------------------------
# Lean-K: in-kernel K projection (coattention_fused_k / fused_attention_leank)
# ---------------------------------------------------------------------------


def _fk_data(b=2, n=6, m=512, e=D, f=D, seed=11, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.array(rng.normal(size=(b, n, e)), jnp.float32)
    kv = jnp.array(rng.normal(size=(b, m, f)), jnp.float32)
    # small weight scale keeps tanh(k) off saturation so grads stay informative
    wk = jnp.array(rng.normal(size=(f, e)) * 0.2, jnp.float32)
    bk = jnp.array(rng.normal(size=(e,)) * 0.1, jnp.float32)
    if masked:
        lengths = rng.integers(m // 2, m, size=b)
        mask = jnp.array(np.arange(m)[None, :] < lengths[:, None], bool)
    else:
        mask = None
    return q, kv, wk, bk, mask


def _fk_ref(q, kv, wk, bk, mask, need_ssq=False, need_sumw=False):
    """XLA reference: materialize k = kv @ wk + bk, then the pre-gated core
    with the raw kv as values (the lean-V contraction order)."""
    from multimodal_path_omic_tpu.ops.coattn import _xla_fused

    k = jnp.dot(kv, wk) + bk
    res = _xla_fused(
        q[:, None], k[:, None], kv[:, None], mask, True,
        need_ssq=need_ssq, need_sumw=need_sumw,
    )
    if need_ssq or need_sumw:
        return tuple([res[0][:, 0]] + [x[:, 0] for x in res[1:]])
    return res[:, 0]


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("f_dim", [D, 2 * D])
def test_coattention_fused_k_forward_matches_xla(masked, f_dim):
    """The in-kernel K projection (kv @ wk + bk computed per tile in VMEM)
    must reproduce the XLA path that materializes the [B, M, E] k activation
    (reference: blocks.py:156,184-187). F != E exercises the rectangular
    projection + raw-value [NP, F] accumulator."""
    from multimodal_path_omic_tpu.ops.coattn import coattention_fused_k

    q, kv, wk, bk, mask = _fk_data(masked=masked, f=f_dim)
    ref = _fk_ref(q, kv, wk, bk, mask)
    got = coattention_fused_k(q, kv, wk, bk, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_coattention_fused_k_multi_tile_and_batch():
    """m = 1024 with block 512 -> 2 KV tiles x 2 batches: the dwk/dbk
    accumulator blocks survive revisiting across BOTH grid dimensions
    (their index_map is constant; semantics are sequential)."""
    from multimodal_path_omic_tpu.ops.coattn import coattention_fused_k

    q, kv, wk, bk, mask = _fk_data(b=2, m=1024, seed=12)
    ref = _fk_ref(q, kv, wk, bk, mask)
    got = coattention_fused_k(q, kv, wk, bk, mask, interpret=True)
    # slightly looser than the single-tile pin: the projection happens
    # per-tile here vs one [M, F] @ [F, E] matmul in the reference, so k
    # itself carries f32 summation-order noise into the online softmax
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_coattention_fused_k_ssq_sumw_forward():
    from multimodal_path_omic_tpu.ops.coattn import coattention_fused_k

    q, kv, wk, bk, mask = _fk_data(seed=13)
    ref_o, ref_ssq, ref_sumw = _fk_ref(
        q, kv, wk, bk, mask, need_ssq=True, need_sumw=True
    )
    got_o, got_ssq, got_sumw = coattention_fused_k(
        q, kv, wk, bk, mask, need_ssq=True, need_sumw=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_ssq), np.asarray(ref_ssq), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_sumw), np.asarray(ref_sumw), atol=3e-5)


def test_coattention_fused_k_grads_match_xla():
    """All four inputs are differentiable: dq, dkv (BOTH chain terms — the
    value path and the key path folded through the projection), dwk, dbk
    (accumulated in-kernel across the whole grid)."""
    from multimodal_path_omic_tpu.ops.coattn import coattention_fused_k

    q, kv, wk, bk, mask = _fk_data(b=2, m=1024, seed=14)

    def loss_ref(q, kv, wk, bk):
        return jnp.sum(_fk_ref(q, kv, wk, bk, mask) ** 2)

    def loss_ker(q, kv, wk, bk):
        return jnp.sum(
            coattention_fused_k(q, kv, wk, bk, mask, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, kv, wk, bk)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, kv, wk, bk)
    for a, b, name in zip(g_ref, g_ker, ["dq", "dkv", "dwk", "dbk"]):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
            err_msg=f"{name} mismatch",
        )


def test_coattention_fused_k_joint_side_output_grads():
    """ssq + sumw cotangents flow through the recompute backward jointly
    (the cesar ||A||_2 chain and the lean-V bias-mass chain together)."""
    from multimodal_path_omic_tpu.ops.coattn import coattention_fused_k

    q, kv, wk, bk, mask = _fk_data(b=1, m=512, seed=15)
    co = jnp.linspace(0.5, 1.5, q.shape[2])

    def loss(fn):
        def inner(q, kv, wk, bk):
            o, ssq, sumw = fn(q, kv, wk, bk)
            return (
                jnp.sum(o * co)
                + 0.3 * jnp.sum(ssq**2)
                + 0.7 * jnp.sum(jnp.sin(sumw))
            )

        return inner

    ref_fn = loss(
        lambda *a: _fk_ref(*a, mask, need_ssq=True, need_sumw=True)
    )
    ker_fn = loss(
        lambda *a: coattention_fused_k(
            *a, mask, need_ssq=True, need_sumw=True, interpret=True
        )
    )
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(q, kv, wk, bk)
    g_ker = jax.grad(ker_fn, argnums=(0, 1, 2, 3))(q, kv, wk, bk)
    for a, b, name in zip(g_ref, g_ker, ["dq", "dkv", "dwk", "dbk"]):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
            err_msg=f"{name} mismatch",
        )


def test_fused_attention_leank_dispatch_gates():
    """Dispatcher observability: small M falls back to XLA (and counts it);
    eligible M traces the kernel; allow_kernel=False pins XLA."""
    from multimodal_path_omic_tpu.ops import coattn

    def delta(m, allow_kernel=True):
        q, kv, wk, bk, mask = _fk_data(m=m)
        before = dict(coattn.DISPATCH_COUNTS)
        jax.eval_shape(
            lambda *a: coattn.fused_attention_leank(
                *a, allow_kernel=allow_kernel, need_sumw=True
            ),
            q, kv, wk, bk, mask,
        )
        return {k: coattn.DISPATCH_COUNTS[k] - before[k] for k in before}

    d_small = delta(512)
    assert d_small["kernel"] == 0 and d_small["xla"] >= 1, d_small
    d_big = delta(4096)
    assert d_big["kernel"] >= 1, d_big
    d_off = delta(4096, allow_kernel=False)
    assert d_off["kernel"] == 0 and d_off["xla"] >= 1, d_off


def test_nacagat_leank_model_parity(monkeypatch):
    """End-to-end: NaCAGaT with use_pallas (lean-K kernel engaged via a
    lowered MPO_LEANK_MIN_M) must match the XLA model in eval — pins that
    deleting the [B, M, E] k materialization is a pure reassociation."""
    from multimodal_path_omic_tpu.models import NaCAGaT

    monkeypatch.setenv("MPO_LEANK_MIN_M", "512")
    rng = np.random.default_rng(16)
    wsi = jnp.array(rng.normal(size=(2, 512, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(2, 16)), jnp.float32) for _ in range(2)]
    mask = jnp.array(np.arange(512)[None, :] < np.array([500, 512])[:, None])

    outs = {}
    for use_pallas in (False, True):
        model = NaCAGaT(
            n_signatures=2, model_size="small", use_pallas=use_pallas
        )
        params = model.init(
            jax.random.key(0), wsi, omics, mask, deterministic=True
        )
        outs[use_pallas] = model.apply(
            params, wsi, omics, mask, deterministic=True
        )
    np.testing.assert_allclose(
        np.asarray(outs[True].hazards), np.asarray(outs[False].hazards),
        atol=5e-5, rtol=1e-5,
    )
