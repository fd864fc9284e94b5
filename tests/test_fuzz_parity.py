"""Seeded random-sweep parity fuzz vs the PyTorch reference (VERDICT r4 #8).

The fixed-shape parity anchors (test_losses.py golden values,
test_torch_parity.py transplants) pin exact numbers at a handful of points;
this module sweeps random shapes, alphas and censorship patterns through the
exotic branches:

* sct's Python ``c.item()`` branch + hard-coded ``reshape(4)``
  (reference: loss.py:76-84) vs our masked bin-count-agnostic ``jnp.where``,
* cox risk-set TIES — the reference's ``S[j] >= S[i]`` double loop
  (reference: loss.py:50-53) is inclusive, so tied times sit in each other's
  risk sets; integer-valued times force that path,
* ces' clamp-before-(1-S) quirk (reference: loss.py:24-25) at S near 1,
* nll's off-by-one censored gather ``S_padded[Y + 1]`` (reference:
  loss.py:39) at the LAST bin,
* the pre-gated attention blocks over random (N, M) shapes (reference:
  blocks.py:209-229, 232-253) via weight transplant.

Deterministic: every sweep derives from a fixed numpy seed — "property-based"
in coverage, reproducible in CI.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_path_omic_tpu.ops import losses as L  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def _ref_loss_module():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import models.loss as ref_loss  # type: ignore

        return ref_loss
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")


def _rand_surv(rng, b, n_bins):
    """Random (hazards, survs) consistent with the discrete model: S is the
    cumprod of (1 - h), which is exactly what the models emit (mcat.py:137)."""
    hazards = rng.uniform(0.02, 0.98, size=(b, n_bins)).astype(np.float32)
    survs = np.cumprod(1.0 - hazards, axis=1).astype(np.float32)
    return hazards, survs


def test_fuzz_ces_random_shapes_and_alphas():
    ref = _ref_loss_module()
    rng = np.random.default_rng(100)
    for trial in range(20):
        b = int(rng.integers(1, 9))
        n_bins = int(rng.integers(2, 9))
        alpha = float(rng.uniform(0.0, 1.0))
        hazards, survs = _rand_surv(rng, b, n_bins)
        if trial % 3 == 0:
            # push S against 1.0 to exercise the clamp-before-(1-S) quirk
            hazards[:, 0] = 1e-9
            survs = np.cumprod(1.0 - hazards, axis=1).astype(np.float32)
        y = rng.integers(0, n_bins, size=b)
        c = rng.integers(0, 2, size=b).astype(np.float32)

        fn = ref.CrossEntropySurvivalLoss(alpha=alpha)
        per = [
            float(
                fn(
                    torch.tensor(hazards[i : i + 1]),
                    torch.tensor(survs[i : i + 1]),
                    torch.tensor(y[i : i + 1]),
                    torch.tensor(c[i : i + 1]),
                )
            )
            for i in range(b)
        ]
        expected = float(np.mean(per))
        got = float(
            L.cross_entropy_survival(
                jnp.asarray(hazards), jnp.asarray(survs), jnp.asarray(y),
                jnp.asarray(c), alpha=alpha,
            )
        )
        # nan_ok: at S -> 1.0 (f32-rounded to exactly 1) the uncensored ce_l
        # term hits log(1 - clamp(S)) = log(0) = -inf in BOTH implementations
        # and the batch mean goes NaN — NaN-for-NaN IS the parity here (the
        # clamp-before-(1-S) quirk, loss.py:24-25).
        assert got == pytest.approx(expected, abs=3e-6, nan_ok=True), (
            f"trial {trial}: b={b} bins={n_bins} alpha={alpha}"
        )


def test_fuzz_nll_including_last_bin_censored():
    ref = _ref_loss_module()
    rng = np.random.default_rng(101)
    for trial in range(20):
        b = int(rng.integers(1, 9))
        n_bins = int(rng.integers(2, 9))
        hazards, survs = _rand_surv(rng, b, n_bins)
        # force some labels to the LAST bin: the censored gather reads
        # S_padded[Y + 1], whose maximum index is exactly n_bins (loss.py:39)
        y = rng.integers(0, n_bins, size=b)
        if b > 1:
            y[0] = n_bins - 1
        c = rng.integers(0, 2, size=b).astype(np.float32)
        if b > 1:
            c[0] = 1.0

        fn = ref.NegativeLogLikelihoodSurvivalLoss()
        per = [
            float(
                fn(
                    torch.tensor(hazards[i : i + 1]),
                    torch.tensor(survs[i : i + 1]),
                    torch.tensor(y[i : i + 1]),
                    torch.tensor(c[i : i + 1]),
                )
            )
            for i in range(b)
        ]
        expected = float(np.mean(per))
        got = float(
            L.negative_log_likelihood_survival(
                jnp.asarray(hazards), jnp.asarray(survs), jnp.asarray(y),
                jnp.asarray(c),
            )
        )
        assert got == pytest.approx(expected, abs=3e-6), f"trial {trial}"


def test_fuzz_cox_with_ties():
    """The reference risk set is INCLUSIVE (S[j] >= S[i], loss.py:50): tied
    times belong to each other's risk sets. Integer-valued times force ties;
    cox is batch-level so the comparison is whole-batch, not per-sample."""
    ref = _ref_loss_module()
    rng = np.random.default_rng(102)
    for trial in range(20):
        b = int(rng.integers(2, 10))
        theta = rng.normal(size=b).astype(np.float32)
        # few distinct integer values => guaranteed ties at most sizes
        times = rng.integers(0, max(2, b // 2), size=b).astype(np.float32)
        c = rng.integers(0, 2, size=b).astype(np.float32)

        fn = ref.CoxSurvivalLoss()
        expected = float(
            fn(torch.tensor(theta), torch.tensor(times), torch.tensor(c))
        )
        got = float(
            L.cox_survival(jnp.asarray(theta), jnp.asarray(times), jnp.asarray(c))
        )
        assert got == pytest.approx(expected, abs=5e-6), (
            f"trial {trial}: times={times.tolist()}"
        )


def test_fuzz_sct_censorship_branches():
    """sct hard-codes reshape(4) and branches in Python on c.item()
    (loss.py:76-84); sweep all (label, censorship) combinations plus random
    probability vectors, including non-normalized ones (the reference never
    normalizes)."""
    ref = _ref_loss_module()
    rng = np.random.default_rng(103)
    fn = ref.SurvivalClassificationTobitLoss()
    for trial in range(30):
        b = int(rng.integers(1, 7))
        preds = rng.uniform(0.01, 1.0, size=(b, 4)).astype(np.float32)
        y = rng.integers(0, 4, size=b)
        c = rng.integers(0, 2, size=b).astype(np.float32)
        per = [
            float(
                fn(
                    torch.tensor(preds[i]),
                    torch.tensor(int(y[i])),
                    torch.tensor(c[i]),
                )
            )
            for i in range(b)
        ]
        expected = float(np.mean(per))
        got = float(
            L.survival_classification_tobit(
                jnp.asarray(preds), jnp.asarray(y), jnp.asarray(c)
            )
        )
        assert got == pytest.approx(expected, abs=3e-6), f"trial {trial}"


def test_fuzz_cesar_norm_shapes():
    """cesar's penalty is the global L2 norm of the attention tensor
    (torch.norm, loss.py:97); sweep random attention shapes at batch 1 (the
    reference's only batch size)."""
    ref = _ref_loss_module()
    rng = np.random.default_rng(104)
    fn = ref.CrossEntropySurvivalAttnRegLoss()
    for trial in range(10):
        n_bins = int(rng.integers(2, 7))
        hazards, survs = _rand_surv(rng, 1, n_bins)
        y = rng.integers(0, n_bins, size=1)
        c = rng.integers(0, 2, size=1).astype(np.float32)
        attn = rng.normal(
            size=(1, int(rng.integers(1, 8)), int(rng.integers(1, 40)))
        ).astype(np.float32)
        expected_loss, expected_attn = fn(
            torch.tensor(hazards),
            torch.tensor(survs),
            torch.tensor(y),
            torch.tensor(c),
            torch.tensor(attn[0]),
        )
        got_loss, got_attn = L.cross_entropy_survival_attn_reg(
            jnp.asarray(hazards), jnp.asarray(survs), jnp.asarray(y),
            jnp.asarray(c), jnp.asarray(attn),
        )
        assert float(got_loss) == pytest.approx(float(expected_loss), abs=5e-6)
        assert float(got_attn) == pytest.approx(float(expected_attn), abs=5e-6)


def test_fuzz_ce_double_softmax_random_scales():
    """The 'ce' quirk (softmax fed as logits, mcat/main.py:41-42) at random
    probability scales — including unnormalized inputs."""
    rng = np.random.default_rng(105)
    for trial in range(15):
        b = int(rng.integers(1, 9))
        k = int(rng.integers(2, 9))
        probs = rng.uniform(0.0, float(rng.uniform(0.5, 3.0)), size=(b, k)).astype(
            np.float32
        )
        labels = rng.integers(0, k, size=b)
        expected = float(
            torch.nn.CrossEntropyLoss()(
                torch.tensor(probs), torch.tensor(labels, dtype=torch.long)
            )
        )
        got = float(L.cross_entropy_on_probs(jnp.asarray(probs), jnp.asarray(labels)))
        assert got == pytest.approx(expected, abs=3e-6), f"trial {trial}"


# ---------------------------------------------------------------------------
# Attention blocks over random shapes (weight transplant per trial)
# ---------------------------------------------------------------------------


def _import_ref_blocks():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import models.blocks as ref_blocks  # type: ignore

        return ref_blocks
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_fuzz_pre_gated_attention_random_shapes():
    """PreGatedAttention (blocks.py:209-229: P computed but unused, the
    x sqrt(dk) quirk) over random (N, M, dk) — transplanted weights, eval.
    All three outputs (Q, Q_hat, weights) must match."""
    ref_blocks = _import_ref_blocks()
    from multimodal_path_omic_tpu.ops.attention import PreGatedAttention

    rng = np.random.default_rng(106)
    for trial in range(6):
        e = int(rng.choice([32, 64, 128]))
        n = int(rng.integers(1, 12))
        m = int(rng.integers(8, 600))
        torch.manual_seed(1000 + trial)
        tmod = ref_blocks.PreGatedAttention(dim1=e, dim2=e, dk=e)
        tmod.eval()
        x1 = torch.randn(m, e)  # patch side (K/V)
        x2 = torch.randn(n, e)  # query side
        with torch.no_grad():
            t_q, t_qhat, t_w = tmod(x1, x2)

        jmod = PreGatedAttention(dk=e)
        params = jmod.init(jax.random.key(0), _t2j(x1)[None], _t2j(x2)[None])
        p = params["params"]
        for jname, tlin in (
            ("fc_q", tmod.fc_Q), ("fc_k", tmod.fc_K), ("fc_v", tmod.fc_V),
        ):
            p[jname]["kernel"] = _t2j(tlin.weight).T
            p[jname]["bias"] = _t2j(tlin.bias)
        j_q, j_qhat, j_w = jmod.apply(
            {"params": p}, _t2j(x1)[None], _t2j(x2)[None]
        )
        err = f"trial {trial}: e={e} n={n} m={m}"
        np.testing.assert_allclose(
            np.asarray(j_q[0]), t_q.numpy(), atol=5e-5, err_msg=err
        )
        np.testing.assert_allclose(
            np.asarray(j_qhat[0]), t_qhat.numpy(), atol=5e-5, err_msg=err
        )
        np.testing.assert_allclose(
            np.asarray(j_w[0]), t_w.numpy(), atol=5e-5, err_msg=err
        )


def test_fuzz_contextual_attention_gate_random_shapes():
    """ContextualAttentionGate (blocks.py:232-253) over random (N, dim,
    hidden) — including the affine LayerNorms inside G/E."""
    ref_blocks = _import_ref_blocks()
    from multimodal_path_omic_tpu.ops.attention import ContextualAttentionGate

    rng = np.random.default_rng(107)
    for trial in range(6):
        e = int(rng.choice([32, 64, 128]))
        h = int(rng.choice([16, 64, 128]))
        n = int(rng.integers(1, 12))
        torch.manual_seed(2000 + trial)
        tmod = ref_blocks.ContextualAttentionGate(dim=e, hidden_dim=h)
        tmod.eval()
        q = torch.randn(n, e)
        q_hat = torch.randn(n, e)
        with torch.no_grad():
            t_out = tmod(q, q_hat)

        jmod = ContextualAttentionGate(dim=e, hidden_dim=h)
        params = jmod.init(jax.random.key(0), _t2j(q)[None], _t2j(q_hat)[None])
        p = params["params"]
        for jname, tlin in (
            ("fc1", tmod.fc1[0]), ("fc2", tmod.fc2[0]),
            ("fc3", tmod.fc3[0]), ("fc_c", tmod.fc_c[0]),
        ):
            p[jname]["kernel"] = _t2j(tlin.weight).T
            p[jname]["bias"] = _t2j(tlin.bias)
        for jname, tln in (("ln_g", tmod.G[1]), ("ln_e", tmod.E[1])):
            p[jname]["scale"] = _t2j(tln.weight)
            p[jname]["bias"] = _t2j(tln.bias)
        j_out = jmod.apply({"params": p}, _t2j(q)[None], _t2j(q_hat)[None])
        np.testing.assert_allclose(
            np.asarray(j_out[0]), t_out.numpy(), atol=5e-5,
            err_msg=f"trial {trial}: e={e} h={h} n={n}",
        )
