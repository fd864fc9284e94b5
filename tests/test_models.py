"""Model-level tests: output shapes (mirroring the reference inline tests,
mcat.py:148-177 / nacagat.py:144-163 / ge_nacagat.py:78-94) and
padding-invariance — the core correctness property of the bucketed+masked
TPU design: padding a bag must not change eval outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_path_omic_tpu.models import MCAT, GENaCAGaT, NaCAGaT

OMIC_SIZES = [100, 200, 300, 400, 500, 600]
M = 64
B = 2


def _inputs(rng, m=M, b=B):
    wsi = jnp.array(rng.normal(size=(b, m, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(b, s)), jnp.float32) for s in OMIC_SIZES]
    return wsi, omics


@pytest.mark.parametrize("model_size", ["small", "medium", "big"])
def test_mcat_shapes(model_size):
    rng = np.random.default_rng(0)
    wsi, omics = _inputs(rng)
    model = MCAT(n_signatures=6, model_size=model_size)
    params = model.init(jax.random.key(0), wsi, omics, need_attention=True)
    out = model.apply(params, wsi, omics, need_attention=True)
    assert out.hazards.shape == (B, 4)
    assert out.survs.shape == (B, 4)
    assert out.y.shape == (B, 4)
    assert out.attention["coattn"].shape == (B, 6, M)
    assert out.attention["path"].shape == (B, 1, 6)
    assert out.attention["omic"].shape == (B, 1, 6)
    # survival head invariants
    assert np.all(np.asarray(out.hazards) >= 0) and np.all(np.asarray(out.hazards) <= 1)
    np.testing.assert_allclose(np.asarray(out.y).sum(-1), 1.0, rtol=1e-5)
    # survs = cumprod(1 - hazards) is monotone nonincreasing
    sv = np.asarray(out.survs)
    assert np.all(np.diff(sv, axis=-1) <= 1e-6)


def test_mcat_no_attention_when_not_requested():
    # mirrors need_weights=inference (mcat.py:97): coattn is None in training
    rng = np.random.default_rng(1)
    wsi, omics = _inputs(rng)
    model = MCAT(n_signatures=6)
    params = model.init(jax.random.key(0), wsi, omics)
    out = model.apply(params, wsi, omics, need_attention=False)
    assert out.attention["coattn"] is None


@pytest.mark.parametrize("fusion", ["concat", "gated_concat", "bilinear"])
def test_mcat_fusions(fusion):
    rng = np.random.default_rng(2)
    wsi, omics = _inputs(rng)
    model = MCAT(n_signatures=6, fusion=fusion)
    params = model.init(jax.random.key(0), wsi, omics)
    out = model.apply(params, wsi, omics)
    assert out.hazards.shape == (B, 4)


@pytest.mark.parametrize("model_size", ["small", "medium"])
def test_nacagat_shapes(model_size):
    rng = np.random.default_rng(3)
    wsi, omics = _inputs(rng)
    model = NaCAGaT(n_signatures=6, model_size=model_size)
    params = model.init(jax.random.key(0), wsi, omics)
    out = model.apply(params, wsi, omics)
    assert out.hazards.shape == (B, 4)
    # NaCAGaT always returns co-attention weights (nacagat.py:80)
    assert out.attention["coattn"].shape == (B, 6, M)


def test_ge_nacagat_shapes():
    rng = np.random.default_rng(4)
    wsi, _ = _inputs(rng)
    model = GENaCAGaT()
    params = model.init(jax.random.key(0), wsi, need_attention=True)
    y, attn = model.apply(params, wsi, need_attention=True)
    assert y.shape == (B, 3)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)
    assert attn["attn"].shape == (B, M, M)
    assert attn["path"].shape == (B, 1, M)


def test_mcat_padding_invariance():
    """Padding a bag + masking must reproduce the unpadded eval output."""
    rng = np.random.default_rng(5)
    m_real = 48
    wsi, omics = _inputs(rng, m=m_real, b=1)
    model = MCAT(n_signatures=6)
    params = model.init(jax.random.key(0), wsi, omics)
    out_ref = model.apply(params, wsi, omics)

    pad = 32
    wsi_padded = jnp.concatenate(
        [wsi, jnp.array(rng.normal(size=(1, pad, 1024)), jnp.float32) * 100.0], axis=1
    )
    mask = jnp.concatenate(
        [jnp.ones((1, m_real), bool), jnp.zeros((1, pad), bool)], axis=1
    )
    out_pad = model.apply(params, wsi_padded, omics, mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.hazards), np.asarray(out_pad.hazards), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ref.survs), np.asarray(out_pad.survs), atol=1e-5
    )


def test_nacagat_padding_invariance():
    rng = np.random.default_rng(6)
    m_real = 48
    wsi, omics = _inputs(rng, m=m_real, b=1)
    model = NaCAGaT(n_signatures=6)
    params = model.init(jax.random.key(0), wsi, omics)
    out_ref = model.apply(params, wsi, omics)

    pad = 16
    wsi_padded = jnp.concatenate(
        [wsi, jnp.full((1, pad, 1024), 7.0, jnp.float32)], axis=1
    )
    mask = jnp.concatenate(
        [jnp.ones((1, m_real), bool), jnp.zeros((1, pad), bool)], axis=1
    )
    out_pad = model.apply(params, wsi_padded, omics, mask)
    np.testing.assert_allclose(
        np.asarray(out_ref.hazards), np.asarray(out_pad.hazards), atol=1e-5
    )
    # attention over padded keys must be ~0
    a = np.asarray(out_pad.attention["coattn"])
    assert np.abs(a[:, :, m_real:]).max() < 1e-6


def test_ge_padding_invariance():
    rng = np.random.default_rng(7)
    m_real = 40
    wsi, _ = _inputs(rng, m=m_real, b=1)
    model = GENaCAGaT()
    params = model.init(jax.random.key(0), wsi)
    y_ref, _ = model.apply(params, wsi)

    pad = 24
    wsi_padded = jnp.concatenate(
        [wsi, jnp.array(rng.normal(size=(1, pad, 1024)), jnp.float32) * 50.0], axis=1
    )
    mask = jnp.concatenate(
        [jnp.ones((1, m_real), bool), jnp.zeros((1, pad), bool)], axis=1
    )
    y_pad, _ = model.apply(params, wsi_padded, mask)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pad), atol=1e-5)


def test_batched_matches_singles():
    """Batch independence: a batch of 2 equals two batch-of-1 evals."""
    rng = np.random.default_rng(8)
    wsi, omics = _inputs(rng, b=2)
    model = MCAT(n_signatures=6)
    params = model.init(jax.random.key(0), wsi, omics)
    out = model.apply(params, wsi, omics)
    for i in range(2):
        out_i = model.apply(
            params, wsi[i : i + 1], [o[i : i + 1] for o in omics]
        )
        # batched vs single matmuls reduce in different orders; f32 tolerance
        np.testing.assert_allclose(
            np.asarray(out.hazards[i]), np.asarray(out_i.hazards[0]), atol=3e-4
        )


def test_train_mode_runs_with_dropout_rngs():
    rng = np.random.default_rng(9)
    wsi, omics = _inputs(rng, b=1)
    model = NaCAGaT(n_signatures=6)
    params = model.init(jax.random.key(0), wsi, omics)
    out = model.apply(
        params, wsi, omics, deterministic=False, rngs={"dropout": jax.random.key(1)}
    )
    assert np.all(np.isfinite(np.asarray(out.hazards)))


def test_pcag_composite_block():
    """The standalone PCAG block (blocks.py:256-285) — shape parity with
    reference test_pcag (blocks.py:327-339), batched."""
    from multimodal_path_omic_tpu.ops.attention import PreGatingContextualAttentionGate

    rng = np.random.default_rng(10)
    slide = jnp.array(rng.normal(size=(1, 300, 1024)), jnp.float32)
    omics = jnp.array(rng.normal(size=(1, 6, 256)), jnp.float32)
    block = PreGatingContextualAttentionGate(dk=256, output_dim=128)
    params = block.init(jax.random.key(0), slide, omics)
    out, weights = block.apply(params, slide, omics)
    assert out.shape == (1, 6, 128)
    assert weights.shape == (1, 6, 300)


def test_attention_bf16_path_stays_bf16():
    """An f32 in-projection bias must not promote q/k/v (and the whole
    attention chain over the patch axis) back to f32 on the bf16 compute
    path — the bias is cast like TorchLinear's."""
    from multimodal_path_omic_tpu.ops.attention import MultiheadAttention

    mod = MultiheadAttention(embed_dim=16, num_heads=1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    q = jnp.array(rng.normal(size=(2, 4, 16)), jnp.float32)
    kv = jnp.array(rng.normal(size=(2, 8, 16)), jnp.float32)
    params = mod.init(jax.random.key(0), q, kv, kv, need_weights=False)
    _, _, qp = mod.apply(
        params, q, kv, kv, need_weights=False, return_projected_q=True
    )
    assert qp.dtype == jnp.bfloat16, qp.dtype


def test_lean_cross_attention_matches_projected_core():
    """Round-4 lean rewrite (ops/attention.py::lean_single_head_cross_
    attention): single-head few-query cross-attention reassociates the K/V
    projections off the patch axis — ``(q·wkᵀ)·kvᵀ + q·bk`` and
    ``(w·kv)·wv + bv·Σw`` — and must equal projecting k/v then running
    attention_core, for every output mode (weights / None / ssq), with and
    without a mask, to f32 precision."""
    from multimodal_path_omic_tpu.ops.attention import (
        MultiheadAttention,
        attention_core,
    )

    rng = np.random.default_rng(11)
    B, N, M, E = 3, 6, 100, 64  # M > 32 so the lean gate engages
    q_in = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    kv_in = jnp.asarray(rng.standard_normal((B, M, E)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.3)

    mha = MultiheadAttention(embed_dim=E, num_heads=1, dropout_rate=0.0)
    params = mha.init(jax.random.key(0), q_in, kv_in, kv_in, mask, need_weights=True)
    p = params["params"]
    wq, wk, wv = jnp.split(p["in_proj_kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3)
    q = q_in @ wq + bq

    out_masked = None
    for m in (mask, None):
        out, w = mha.apply(params, q_in, kv_in, kv_in, m, need_weights=True)
        if m is mask:
            out_masked = out
        oh, wh = attention_core(
            q[:, None], (kv_in @ wk + bk)[:, None], (kv_in @ wv + bv)[:, None],
            m, pre_gate=False, dropout_rate=0.0, deterministic=True,
        )
        ref = oh[:, 0] @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(wh[:, 0]), atol=1e-6)

    # need_weights=False and "ssq" ride the same lean weights
    out2, w2 = mha.apply(params, q_in, kv_in, kv_in, mask, need_weights=False)
    assert w2 is None
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out_masked), atol=1e-6)
    _, ssq = mha.apply(params, q_in, kv_in, kv_in, mask, need_weights="ssq")
    oh, wh = attention_core(
        q[:, None], (kv_in @ wk + bk)[:, None], (kv_in @ wv + bv)[:, None],
        mask, pre_gate=False, dropout_rate=0.0, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ssq), np.asarray(jnp.sum(wh[:, 0] ** 2, -1)), atol=1e-6
    )


def test_lean_cross_attention_dropout_is_draw_identical_to_core():
    """The lean path draws its dropout mask with the same [B, 1, N, M]
    layout and rng as attention_core, so a seeded training forward is
    bit-identical between the two formulations (torch dropout-on-probs
    semantics, blocks.py:188-201): same kept set, same 1/keep_prob scaling,
    and the bias-through-dropped-weights term ``bv·Σw`` stays exact."""
    from multimodal_path_omic_tpu.ops.attention import (
        attention_core,
        lean_single_head_cross_attention,
    )

    rng = np.random.default_rng(12)
    B, N, M, E = 2, 4, 64, 32
    q = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((B, M, E)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((E, E)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((E, E)) * 0.1, jnp.float32)
    bk = jnp.asarray(rng.standard_normal((E,)) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.standard_normal((E,)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.3)
    drop = jax.random.key(7)

    out_lean, w_lean = lean_single_head_cross_attention(
        q, kv, wk, bk, wv, bv, mask, dropout_rate=0.25, dropout_rng=drop
    )
    oh, wh = attention_core(
        q[:, None], (kv @ wk + bk)[:, None], (kv @ wv + bv)[:, None],
        mask, pre_gate=False, dropout_rate=0.25, deterministic=False,
        dropout_rng=drop,
    )
    assert int(np.asarray((w_lean == 0) & mask[:, None, :]).sum()) > 0, (
        "dropout did not drop any valid weight"
    )
    # identical rng stream => identical kept set (exact); kept values carry
    # only the reassociation's fp noise
    np.testing.assert_array_equal(
        np.asarray(w_lean == 0), np.asarray(wh[:, 0] == 0)
    )
    np.testing.assert_allclose(
        np.asarray(w_lean), np.asarray(wh[:, 0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_lean), np.asarray(oh[:, 0]), atol=1e-5
    )


def test_lean_v_pre_gated_cross_attention_matches_projected_core():
    """Round-4 lean-V (ops/attention.py lean_v branch): the PRE-GATED
    single-head co-attention (NaCAGaT, blocks.py:184-188) cannot lean its K
    projection (the pre-gate needs tanh(K)) but reassociates the V
    projection off the patch axis via ``out = (w·kv)@wv + bv·Σw``. Both
    training output modes (None and "ssq") must equal projecting v then
    running the pre-gated attention_core, to f32 precision; need_weights=
    True must be untouched (it keeps the exact weights/out consistency of
    the export path)."""
    from multimodal_path_omic_tpu.ops.attention import (
        MultiheadAttention,
        attention_core,
    )

    rng = np.random.default_rng(13)
    B, N, M, E = 3, 6, 100, 64
    q_in = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    kv_in = jnp.asarray(rng.standard_normal((B, M, E)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.3)

    mha = MultiheadAttention(embed_dim=E, num_heads=1, dropout_rate=0.0,
                             pre_gate=True)
    params = mha.init(jax.random.key(0), q_in, kv_in, kv_in, mask,
                      need_weights=True)
    p = params["params"]
    wq, wk, wv = jnp.split(p["in_proj_kernel"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj_bias"], 3)
    q = q_in @ wq + bq

    for m in (mask, None):
        oh, wh = attention_core(
            q[:, None], (kv_in @ wk + bk)[:, None], (kv_in @ wv + bv)[:, None],
            m, pre_gate=True, dropout_rate=0.0, deterministic=True,
        )
        ref = oh[:, 0] @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
        out, w_none = mha.apply(params, q_in, kv_in, kv_in, m,
                                need_weights=False)
        assert w_none is None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        out_s, ssq = mha.apply(params, q_in, kv_in, kv_in, m,
                               need_weights="ssq")
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ssq), np.asarray(jnp.sum(wh[:, 0] ** 2, -1)), atol=1e-6
        )
        # export mode still materializes weights (non-lean path)
        out_w, w = mha.apply(params, q_in, kv_in, kv_in, m, need_weights=True)
        np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(wh[:, 0]), atol=1e-6)


def test_lean_v_matches_disabled_path_under_dropout(monkeypatch):
    """Seeded training forward (dropout 0.25 active) must be draw-identical
    between the lean-V branch and the MPO_NO_LEAN_ATTENTION=1 projected
    path: both route the same rng through attention_core's [B, 1, N, M]
    mask draw, so outputs differ only by the reassociation's fp noise."""
    from multimodal_path_omic_tpu.ops.attention import MultiheadAttention

    rng = np.random.default_rng(14)
    B, N, M, E = 2, 6, 80, 32
    q_in = jnp.asarray(rng.standard_normal((B, N, E)), jnp.float32)
    kv_in = jnp.asarray(rng.standard_normal((B, M, E)), jnp.float32)
    mask = jnp.asarray(rng.random((B, M)) > 0.2)

    mha = MultiheadAttention(embed_dim=E, num_heads=1, dropout_rate=0.25,
                             pre_gate=True)
    params = mha.init(jax.random.key(0), q_in, kv_in, kv_in, mask,
                      need_weights=False)

    def run():
        return mha.apply(
            params, q_in, kv_in, kv_in, mask, need_weights="ssq",
            deterministic=False, rngs={"dropout": jax.random.key(5)},
        )

    out_lean, ssq_lean = run()
    monkeypatch.setenv("MPO_NO_LEAN_ATTENTION", "1")
    out_ref, ssq_ref = run()
    np.testing.assert_allclose(
        np.asarray(out_lean), np.asarray(out_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ssq_lean), np.asarray(ssq_ref), atol=1e-5
    )


def test_lean_attention_bf16_rounding_is_benign(monkeypatch):
    """VERDICT r4 #4: under compute_dtype=bfloat16 (the TPU default at
    B>=128) the lean reassociation contracts in a different order at very
    different intermediate scales — ``(q@wkᵀ)@kvᵀ`` vs ``q@(kv@wk)ᵀ``
    (reference math: blocks.py:180-192) — so its bf16 rounding is not the
    projected path's. Pin that against an f32-exact reference the lean
    forms' bf16 error stays within 2.5x of the projected path's own bf16
    error (plus a 1% slack floor), at unit activation scale and at a 4x
    hot-scale variant, for both the plain (MCAT lean) and pre-gated
    (NaCAGaT lean-V) branches."""
    from multimodal_path_omic_tpu.ops.attention import MultiheadAttention

    rng = np.random.default_rng(15)
    B, N, M, E = 3, 6, 96, 64
    for pre_gate in (False, True):
        for scale in (1.0, 4.0):
            q_in = jnp.asarray(rng.standard_normal((B, N, E)) * scale,
                               jnp.float32)
            kv_in = jnp.asarray(rng.standard_normal((B, M, E)) * scale,
                                jnp.float32)
            mask = jnp.asarray(rng.random((B, M)) > 0.3)

            def build(dtype):
                return MultiheadAttention(
                    embed_dim=E, num_heads=1, dropout_rate=0.0,
                    pre_gate=pre_gate, dtype=dtype,
                )

            params = build(None).init(
                jax.random.key(0), q_in, kv_in, kv_in, mask,
                need_weights=False,
            )

            def run(dtype):
                out, _ = build(dtype).apply(
                    params, q_in, kv_in, kv_in, mask, need_weights=False
                )
                return np.asarray(out, np.float64)

            monkeypatch.delenv("MPO_NO_LEAN_ATTENTION", raising=False)
            lean_bf16 = run(jnp.bfloat16)
            monkeypatch.setenv("MPO_NO_LEAN_ATTENTION", "1")
            core_bf16 = run(jnp.bfloat16)
            ref_f32 = run(None)
            monkeypatch.delenv("MPO_NO_LEAN_ATTENTION", raising=False)

            denom = max(float(np.abs(ref_f32).mean()), 1e-6)
            rel_lean = float(np.abs(lean_bf16 - ref_f32).max()) / denom
            rel_core = float(np.abs(core_bf16 - ref_f32).max()) / denom
            assert rel_lean <= 2.5 * rel_core + 0.01, (
                f"pre_gate={pre_gate} scale={scale}: lean bf16 error "
                f"{rel_lean:.4f} vs projected-path bf16 error {rel_core:.4f}"
            )


def test_nacagat_grads_match_with_lean_v_disabled(monkeypatch):
    """End-to-end NaCAGaT: parameter gradients of a ces loss must agree
    between the lean-V co-attention and the projected path — the V
    projection's weight/bias gradients flow through the reassociated
    epilogue (dwv from [B,N,F] pooled, dbv from Σw)."""
    import optax

    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.ops.losses import cross_entropy_survival

    rng = np.random.default_rng(15)
    b, m = 2, 96
    wsi = jnp.asarray(rng.standard_normal((b, m, 1024)), jnp.float32)
    omics = [jnp.asarray(rng.standard_normal((b, 16)), jnp.float32)]
    mask = jnp.asarray(np.arange(m)[None, :] < np.array([90, 96])[:, None])
    label = jnp.array([1, 2], jnp.int32)
    cens = jnp.array([0.0, 1.0], jnp.float32)

    model = NaCAGaT(n_signatures=1, model_size="small", dropout_rate=0.0)
    params = model.init(jax.random.key(0), wsi, omics, mask,
                        deterministic=True)

    def loss_fn(p):
        out = model.apply(p, wsi, omics, mask, deterministic=True,
                          need_attention=False)
        return jnp.mean(cross_entropy_survival(
            out.hazards, out.survs, label, cens
        ))

    g_lean = jax.grad(loss_fn)(params)
    monkeypatch.setenv("MPO_NO_LEAN_ATTENTION", "1")
    g_ref = jax.grad(loss_fn)(params)
    flat_lean = jax.tree_util.tree_leaves_with_path(g_lean)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_lean) == len(flat_ref)
    for (path, a), bb in zip(flat_lean, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pre_gated_self_attention_on_seq_mesh_keeps_the_gate():
    """ring_self_attention has no pre-gate path: a pre-gated self-attention
    on a seq mesh must fall back to a gated path (XLA core under GSPMD), not
    silently compute un-gated scores on the ring."""
    from multimodal_path_omic_tpu.ops.attention import MultiheadAttention
    from multimodal_path_omic_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 64, 16)), jnp.float32)

    plain = MultiheadAttention(embed_dim=16, num_heads=1, pre_gate=True)
    params = plain.init(jax.random.key(0), x, x, x, need_weights=False)
    ref, _ = plain.apply(params, x, x, x, need_weights=False)

    ringed = MultiheadAttention(
        embed_dim=16, num_heads=1, pre_gate=True, ring_mesh=mesh
    )
    got, _ = ringed.apply(params, x, x, x, need_weights=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bilinear_fusion_dropout_engages_in_training():
    """The models must forward `deterministic` into the fusion module:
    BilinearFusion carries five dropout sites (reference fusion.py applies
    nn.Dropout(0.25) in train mode) that silently ran in eval mode when the
    flag was not forwarded. With every OTHER dropout site disabled
    (dropout_rate=0), two different dropout rngs must still change the
    output — proof the fusion's own dropout is live."""
    from multimodal_path_omic_tpu.models import MCAT

    model = MCAT(
        n_signatures=2, model_size="small", dropout_rate=0.0, fusion="bilinear"
    )
    rng = np.random.default_rng(0)
    wsi = jnp.array(rng.normal(size=(2, 16, 1024)), jnp.float32)
    omics = [jnp.array(rng.normal(size=(2, 8)), jnp.float32) for _ in range(2)]
    mask = jnp.ones((2, 16), bool)
    params = model.init(jax.random.key(0), wsi, omics, mask, deterministic=True)

    def run(drop_seed):
        out = model.apply(
            params, wsi, omics, mask, deterministic=False,
            rngs={"dropout": jax.random.key(drop_seed)},
        )
        return np.asarray(out.y)

    a, b = run(1), run(2)
    assert not np.allclose(a, b), "fusion dropout is not active in training"
    # and eval mode stays deterministic
    det = model.apply(params, wsi, omics, mask, deterministic=True)
    det2 = model.apply(params, wsi, omics, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det.y), np.asarray(det2.y))
