"""Loss parity tests.

Golden fp32 values come from the reference's inline tests
(reference: models/loss.py:115, 121) and serve as numerics anchors. Additional
cross-checks recompute each loss with independent numpy math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_path_omic_tpu.ops import losses


HAZARDS = np.array([[0.51, 0.52, 0.49, 0.48]], dtype=np.float32)
SURVS = np.array([[0.5, 0.4, 0.2, 0.1]], dtype=np.float32)
Y = np.array([0], dtype=np.int32)


def test_ces_golden_uncensored():
    loss = losses.cross_entropy_survival(
        jnp.array(HAZARDS), jnp.array(SURVS), jnp.array(Y), jnp.array([0.0])
    )
    assert np.isclose(float(loss), 0.6782951951026917, atol=5e-5)


def test_ces_golden_censored():
    loss = losses.cross_entropy_survival(
        jnp.array(HAZARDS), jnp.array(SURVS), jnp.array(Y), jnp.array([1.0])
    )
    assert np.isclose(float(loss), 0.1732867956161499, atol=5e-5)


def test_ces_batched_matches_mean_of_singles():
    rng = np.random.default_rng(0)
    B = 8
    hz = rng.uniform(0.1, 0.9, (B, 4)).astype(np.float32)
    sv = np.cumprod(1 - hz, axis=1).astype(np.float32)
    y = rng.integers(0, 4, B).astype(np.int32)
    c = rng.integers(0, 2, B).astype(np.float32)
    batched = float(
        losses.cross_entropy_survival(jnp.array(hz), jnp.array(sv), jnp.array(y), jnp.array(c))
    )
    singles = [
        float(
            losses.cross_entropy_survival(
                jnp.array(hz[i : i + 1]),
                jnp.array(sv[i : i + 1]),
                jnp.array(y[i : i + 1]),
                jnp.array(c[i : i + 1]),
            )
        )
        for i in range(B)
    ]
    assert np.isclose(batched, np.mean(singles), atol=1e-6)


def test_ces_sample_weight_masks_padding():
    hz = np.concatenate([HAZARDS, np.full((1, 4), 0.999, np.float32)])
    sv = np.concatenate([SURVS, np.full((1, 4), 1e-4, np.float32)])
    y = np.array([0, 3], dtype=np.int32)
    c = np.array([0.0, 0.0], dtype=np.float32)
    w = np.array([1.0, 0.0], dtype=np.float32)
    loss = losses.cross_entropy_survival(
        jnp.array(hz), jnp.array(sv), jnp.array(y), jnp.array(c), sample_weight=jnp.array(w)
    )
    assert np.isclose(float(loss), 0.6782951951026917, atol=5e-5)


def test_nll_manual():
    # reference math (loss.py:31-43) recomputed in numpy
    alpha, eps = 0.15, 1e-7
    c = 1.0
    s_padded = np.concatenate([[1.0], SURVS[0]])
    uncensored = -(1 - c) * (np.log(s_padded[0]) + np.log(HAZARDS[0, 0]))
    censored = -c * np.log(s_padded[1])
    expected = (1 - alpha) * (censored + uncensored) + alpha * uncensored
    got = losses.negative_log_likelihood_survival(
        jnp.array(HAZARDS), jnp.array(SURVS), jnp.array(Y), jnp.array([c])
    )
    assert np.isclose(float(got), expected, atol=2e-4)


def test_cox_manual():
    rng = np.random.default_rng(1)
    B = 6
    theta = rng.normal(size=B).astype(np.float32)
    s = rng.uniform(size=B).astype(np.float32)
    c = rng.integers(0, 2, B).astype(np.float32)
    r = (s[None, :] >= s[:, None]).astype(np.float64)
    expected = -np.mean(
        (theta - np.log(np.sum(np.exp(theta)[None, :] * r, axis=1))) * (1 - c)
    )
    got = losses.cox_survival(jnp.array(theta), jnp.array(s), jnp.array(c))
    assert np.isclose(float(got), expected, atol=1e-5)


@pytest.mark.parametrize(
    "pred,y,c",
    [
        ([0.1, 0.2, 0.7, 0.1], 2, 0.0),
        ([0.1, 0.2, 0.7, 0.1], 2, 1.0),
        ([0.1, 0.2, 0.7, 0.1], 0, 0.0),
        ([0.7, 0.2, 0.1, 0.1], 3, 1.0),
        ([0.7, 0.2, 0.1, 0.1], 1, 1.0),
    ],
)
def test_sct_matches_reference_branches(pred, y, c):
    # reference semantics (loss.py:77-84): uncensored -> -log p[y];
    # censored -> -log sum_{j>=y} p[j]
    eps = 1e-7
    p = np.array(pred, dtype=np.float32)
    if c == 0:
        expected = -np.log(p[y] + eps)
    else:
        expected = -np.log(np.sum(p[y:]) + eps)
    got = losses.survival_classification_tobit(
        jnp.array(p[None]), jnp.array([y]), jnp.array([c])
    )
    # XLA CPU's f32 log carries ~5e-5 abs error vs libm; tolerance reflects that
    assert np.isclose(float(got), expected, atol=2e-4)


def test_sct_ordering_properties():
    # mirrors the qualitative assertions in reference test_sct_loss (loss.py:126-173)
    p = jnp.array([[0.1, 0.2, 0.7, 0.1]])
    correct_unc = float(losses.survival_classification_tobit(p, jnp.array([2]), jnp.array([0.0])))
    correct_cen = float(losses.survival_classification_tobit(p, jnp.array([2]), jnp.array([1.0])))
    wrong_unc = float(losses.survival_classification_tobit(p, jnp.array([0]), jnp.array([0.0])))
    wrong_cen = float(losses.survival_classification_tobit(p, jnp.array([0]), jnp.array([1.0])))
    assert correct_cen < correct_unc
    assert wrong_unc > correct_unc
    assert wrong_cen < wrong_unc


def test_cesar_is_ces_plus_attn_norm():
    attn = np.random.default_rng(2).uniform(size=(6, 10, 10)).astype(np.float32)
    loss, attn_loss = losses.cross_entropy_survival_attn_reg(
        jnp.array(HAZARDS), jnp.array(SURVS), jnp.array(Y), jnp.array([0.0]), jnp.array(attn)
    )
    expected_attn = 0.01 * np.linalg.norm(attn.ravel())
    assert np.isclose(float(attn_loss), expected_attn, atol=1e-6)
    assert np.isclose(float(loss), 0.6782951951026917 + expected_attn, atol=2e-4)


def test_ce_double_softmax_quirk():
    # The reference feeds softmax probs into CrossEntropyLoss; verify vs torch.
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    probs = rng.dirichlet(np.ones(4), size=5).astype(np.float32)
    labels = rng.integers(0, 4, 5)
    expected = torch.nn.CrossEntropyLoss()(
        torch.tensor(probs), torch.tensor(labels, dtype=torch.long)
    ).item()
    got = losses.cross_entropy_on_probs(jnp.array(probs), jnp.array(labels))
    assert np.isclose(float(got), expected, atol=2e-4)


def test_losses_are_jittable():
    f = jax.jit(losses.cross_entropy_survival)
    out = f(jnp.array(HAZARDS), jnp.array(SURVS), jnp.array(Y), jnp.array([0.0]))
    assert np.isfinite(float(out))
    g = jax.jit(losses.survival_classification_tobit)
    out = g(jnp.array(HAZARDS), jnp.array(Y), jnp.array([1.0]))
    assert np.isfinite(float(out))


def test_l1_reg_matches_manual_sum():
    params = {"a": jnp.array([[1.0, -2.0]]), "b": {"w": jnp.array([3.0, -4.0])}}
    assert np.isclose(float(losses.l1_reg(params)), 10.0)


def test_cox_weight_masks_risk_sets():
    """Weight-0 (padded) samples must not appear in any risk set."""
    theta = jnp.array([1.0, 2.0, 3.0])
    months = jnp.array([5.0, 3.0, 1.0])
    c = jnp.array([0.0, 0.0, 0.0])
    w = jnp.array([1.0, 1.0, 0.0])
    masked = losses.cox_survival(theta, months, c, sample_weight=w)
    ref = losses.cox_survival(theta[:2], months[:2], c[:2])
    assert np.isclose(float(masked), float(ref), atol=1e-6)


def test_cox_padded_row_with_empty_risk_set_stays_finite():
    """A weight-0 padded row whose time exceeds every real sample's gets an
    EMPTY risk set — log(0) would poison the weighted mean with -inf * 0."""
    theta = jnp.array([1.0, 2.0, 0.5])
    months = jnp.array([5.0, 3.0, 100.0])  # padded row outlives everyone
    c = jnp.array([0.0, 0.0, 0.0])
    w = jnp.array([1.0, 1.0, 0.0])
    masked = losses.cox_survival(theta, months, c, sample_weight=w)
    assert np.isfinite(float(masked))
    ref = losses.cox_survival(theta[:2], months[:2], c[:2])
    assert np.isclose(float(masked), float(ref), atol=1e-6)


def test_masked_softmax_fully_masked_row_is_finite():
    from multimodal_path_omic_tpu.ops.layers import masked_softmax

    scores = jnp.array([[1.0, 2.0, 3.0]])
    mask = jnp.zeros((1, 3), bool)
    out = masked_softmax(scores, mask)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out).sum(), 1.0, rtol=1e-6)


def test_alpha_dropout_deterministic_passthrough():
    from multimodal_path_omic_tpu.ops.layers import AlphaDropout

    x = jnp.array([[1.0, -2.0, 3.0]])
    mod = AlphaDropout(0.5)
    out = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

def test_fast_keep_mask_statistics_and_exactness():
    """uint16-bits dropout mask (ops/layers.py::fast_keep_mask): exact
    keep_prob for multiples of 1/65536 (the reference's p=0.25,
    /root/reference/models/blocks.py:33), unbiased scaling, per-key
    determinism."""
    from multimodal_path_omic_tpu.ops.layers import fast_keep_mask

    key = jax.random.key(11)
    keep, keep_prob = fast_keep_mask(key, 0.25, (512, 512))
    assert keep_prob == 0.75  # exact, not approximate
    frac = float(np.asarray(keep).mean())
    assert abs(frac - 0.75) < 0.01  # ~3 sigma at n=262144 is 0.0025
    # deterministic per key
    keep2, _ = fast_keep_mask(key, 0.25, (512, 512))
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep2))
    # arbitrary rate: effective keep_prob within 2^-16 of requested
    _, kp = fast_keep_mask(key, 0.1, (8,))
    assert abs((1.0 - kp) - 0.1) <= 1.0 / 65536


def test_fast_keep_mask_rate_one_drops_everything():
    """rate=1.0 (and rates rounding to 1.0) zero the output like flax
    nn.Dropout — not a 1/65536-sparse tensor of 65536-scaled values, which a
    capped uint16 threshold would produce."""
    from multimodal_path_omic_tpu.ops.layers import FastDropout, fast_keep_mask

    keep, keep_prob = fast_keep_mask(jax.random.key(0), 1.0, (1024,))
    assert not bool(np.asarray(keep).any())
    assert keep_prob == 1.0  # callers' 1/keep_prob scaling stays finite
    out = FastDropout(1.0).apply(
        {}, jnp.ones((64, 64)), deterministic=False,
        rngs={"dropout": jax.random.key(1)},
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_fast_dropout_matches_flax_semantics():
    """FastDropout == inverted dropout: kept entries scaled 1/keep_prob,
    dropped are zero, mean preserved; deterministic mode is identity."""
    from multimodal_path_omic_tpu.ops.layers import FastDropout

    x = jnp.ones((256, 256), jnp.float32)
    mod = FastDropout(0.25)
    rng = jax.random.key(3)
    out = mod.apply({}, x, deterministic=False, rngs={"dropout": rng})
    vals = np.unique(np.asarray(out).round(6))
    np.testing.assert_allclose(vals, [0.0, 1.0 / 0.75], rtol=1e-6)
    assert abs(float(np.asarray(out).mean()) - 1.0) < 0.02
    # deterministic per rng (make_rng folds by module path, so exact mask
    # values are checked at the fast_keep_mask level, not through flax)
    out2 = mod.apply({}, x, deterministic=False, rngs={"dropout": rng})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out_det = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(x))


def test_cox_loss_ignores_patch_budget_chunking():
    """Cox partial likelihood is not sum-decomposable (each event's risk set
    spans the whole batch): the train step must NOT split cox batches into
    gradient-accumulation chunks, or risk sets silently shrink to chunk-local
    ones. A tiny patch_budget that forces accum=4 on every other loss must
    produce the identical cox loss as the unchunked trace."""
    from multimodal_path_omic_tpu.train.loop import make_train_step
    from multimodal_path_omic_tpu.train.optim import make_optimizer
    from tests.test_train import TinySurvival, _tiny_batch, _tiny_state

    model = TinySurvival()
    opt = make_optimizer("adam", 1e-3)
    batch = _tiny_batch(b=4, m=16)

    def run(loss_name, budget):
        step = make_train_step(
            model, loss_name, opt, alpha=0.0, l1_lambda=0.0,
            patch_budget=budget, ge_mode=False, omic_sizes=(4,),
            donate_state=False,
        )
        _, metrics = step(_tiny_state(model, opt, batch), batch)
        return float(metrics.loss)

    # batch of 4 x 16-patch bags: budget 16 forces chunk=1/accum=4 for a
    # decomposable loss (sanity: ces chunked == unchunked too), and cox must
    # ignore the budget entirely
    assert np.isclose(run("ces", 16), run("ces", None), atol=1e-6)
    assert np.isclose(run("cox", 16), run("cox", None), atol=1e-7)


def test_cesar_exported_norm_excludes_padding():
    """cross_entropy_survival_attn_reg with sample_weight: padded rows'
    attention must not leak into the global norm (the docstring's zero-loss
    contract for padding)."""
    rng = np.random.default_rng(5)
    hz = jax.nn.sigmoid(jnp.array(rng.normal(size=(2, 4)), jnp.float32))
    sv = jnp.cumprod(1 - hz, axis=1)
    y = jnp.array([1, 2]); c = jnp.array([0.0, 0.0])
    attn = jnp.array(rng.normal(size=(2, 6, 8)), jnp.float32)
    w = jnp.array([1.0, 0.0])

    _, attn_full = losses.cross_entropy_survival_attn_reg(
        hz, sv, y, c, attn, sample_weight=w
    )
    _, attn_single = losses.cross_entropy_survival_attn_reg(
        hz[:1], sv[:1], y[:1], c[:1], attn[:1], sample_weight=jnp.ones((1,))
    )
    np.testing.assert_allclose(float(attn_full), float(attn_single), rtol=1e-6)
