"""Numerics parity vs PyTorch (weights transplant, eval mode).

Two tiers:
1. Block-level parity against *stock* torch modules (nn.MultiheadAttention,
   nn.TransformerEncoder, nn.Bilinear, nn.AlphaDropout) — these are the
   primitives the reference composes, so matching them transitively matches
   the reference's compute.
2. Full-model parity against the actual reference implementation imported
   from /root/reference (skipped when unavailable).

Target: fp32 forward <= ~1e-5 per BASELINE.md (tolerances account for XLA CPU
transcendental approximations).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_path_omic_tpu.ops.attention import MultiheadAttention  # noqa: E402
from multimodal_path_omic_tpu.ops.fusion import Bilinear  # noqa: E402
from multimodal_path_omic_tpu.ops.layers import AlphaDropout  # noqa: E402
from multimodal_path_omic_tpu.ops.transformer import TransformerEncoder  # noqa: E402

ATOL = 2e-5


def _np(t):
    return t.detach().numpy()


@pytest.mark.parametrize("num_heads", [1, 8])
def test_mha_parity(num_heads):
    torch.manual_seed(0)
    e, n, m = 256, 6, 50
    tmod = torch.nn.MultiheadAttention(embed_dim=e, num_heads=num_heads)
    tmod.eval()
    q = torch.randn(n, e)
    kv = torch.randn(m, e)
    with torch.no_grad():
        t_out, t_w = tmod(q, kv, kv, need_weights=True)

    jmod = MultiheadAttention(embed_dim=e, num_heads=num_heads)
    params = jmod.init(jax.random.key(0), jnp.zeros((1, n, e)), jnp.zeros((1, m, e)), jnp.zeros((1, m, e)))
    p = params["params"]
    p["in_proj_kernel"] = jnp.array(_np(tmod.in_proj_weight).T)
    p["in_proj_bias"] = jnp.array(_np(tmod.in_proj_bias))
    p["out_proj"]["kernel"] = jnp.array(_np(tmod.out_proj.weight).T)
    p["out_proj"]["bias"] = jnp.array(_np(tmod.out_proj.bias))

    j_out, j_w = jmod.apply(
        {"params": p},
        jnp.array(_np(q))[None],
        jnp.array(_np(kv))[None],
        jnp.array(_np(kv))[None],
    )
    np.testing.assert_allclose(np.asarray(j_out[0]), _np(t_out), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_w[0]), _np(t_w), atol=ATOL)


def test_transformer_encoder_parity():
    torch.manual_seed(1)
    e, n = 256, 6
    layer = torch.nn.TransformerEncoderLayer(
        d_model=e, nhead=8, dim_feedforward=512, dropout=0.25, activation="relu"
    )
    tmod = torch.nn.TransformerEncoder(layer, num_layers=2)
    tmod.eval()
    x = torch.randn(n, e)
    with torch.no_grad():
        t_out = tmod(x)

    jmod = TransformerEncoder(d_model=e, num_layers=2)
    params = jmod.init(jax.random.key(0), jnp.zeros((1, n, e)))
    p = params["params"]
    for li in range(2):
        tl = tmod.layers[li]
        fl = p[f"layer_{li}"]
        fl["self_attn"]["in_proj_kernel"] = jnp.array(_np(tl.self_attn.in_proj_weight).T)
        fl["self_attn"]["in_proj_bias"] = jnp.array(_np(tl.self_attn.in_proj_bias))
        fl["self_attn"]["out_proj"]["kernel"] = jnp.array(_np(tl.self_attn.out_proj.weight).T)
        fl["self_attn"]["out_proj"]["bias"] = jnp.array(_np(tl.self_attn.out_proj.bias))
        fl["linear1"]["kernel"] = jnp.array(_np(tl.linear1.weight).T)
        fl["linear1"]["bias"] = jnp.array(_np(tl.linear1.bias))
        fl["linear2"]["kernel"] = jnp.array(_np(tl.linear2.weight).T)
        fl["linear2"]["bias"] = jnp.array(_np(tl.linear2.bias))
        fl["norm1"]["scale"] = jnp.array(_np(tl.norm1.weight))
        fl["norm1"]["bias"] = jnp.array(_np(tl.norm1.bias))
        fl["norm2"]["scale"] = jnp.array(_np(tl.norm2.weight))
        fl["norm2"]["bias"] = jnp.array(_np(tl.norm2.bias))

    j_out = jmod.apply({"params": p}, jnp.array(_np(x))[None])
    np.testing.assert_allclose(np.asarray(j_out[0]), _np(t_out), atol=5e-5)


def test_bilinear_parity():
    torch.manual_seed(2)
    tmod = torch.nn.Bilinear(32, 32, 16)
    tmod.eval()
    x1 = torch.randn(3, 32)
    x2 = torch.randn(3, 32)
    with torch.no_grad():
        t_out = tmod(x1, x2)
    jmod = Bilinear(16)
    params = {
        "params": {
            "weight": jnp.array(_np(tmod.weight)),
            "bias": jnp.array(_np(tmod.bias)),
        }
    }
    j_out = jmod.apply(params, jnp.array(_np(x1)), jnp.array(_np(x2)))
    np.testing.assert_allclose(np.asarray(j_out), _np(t_out), atol=ATOL)


def test_alpha_dropout_constants_match_torch():
    """Recover torch AlphaDropout's affine constants from its output on a
    constant input and compare with ours."""
    p = 0.25
    torch.manual_seed(3)
    x = torch.full((200_000,), 1.7)
    out = torch.nn.functional.alpha_dropout(x, p=p, training=True)
    vals = torch.unique(out)
    assert len(vals) == 2  # a*alpha'+b (dropped), a*1.7+b (kept)
    dropped, kept = float(vals[0]), float(vals[1])

    ap = AlphaDropout.ALPHA_PRIME
    a = ((1.0 - p) * (1.0 + p * ap**2)) ** -0.5
    b = -a * ap * p
    assert np.isclose(kept, a * 1.7 + b, atol=1e-5)
    assert np.isclose(dropped, a * ap + b, atol=1e-5)

    # and the drop *rate* matches
    frac_dropped = float((out == vals[0]).float().mean())
    assert abs(frac_dropped - p) < 0.01


def test_elu_selu_activation_parity():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    with torch.no_grad():
        t_elu = torch.nn.functional.elu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(jax.nn.elu(jnp.array(x))), t_elu, atol=1e-5)


# ---------------------------------------------------------------------------
# Tier 2: full reference-model parity via weights transplant
# ---------------------------------------------------------------------------

REFERENCE_ROOT = "/root/reference"


def _import_reference_mcat():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.mcat.mcat import MultimodalCoAttentionTransformer  # type: ignore

        return MultimodalCoAttentionTransformer
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")


def _import_reference_nacagat():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.nacagat.nacagat import NarrowContextualAttentionGateTransformer  # type: ignore

        return NarrowContextualAttentionGateTransformer
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")


OMIC_SIZES = [100, 200, 300, 400, 500, 600]


def _reference_inputs(seed=0, m=300):
    torch.manual_seed(seed)
    wsi = torch.randn(m, 1024)
    omics = [torch.randn(s) for s in OMIC_SIZES]
    return wsi, omics


@pytest.mark.parametrize("fusion", ["concat", "bilinear"])
def test_mcat_full_reference_parity(fusion):
    from multimodal_path_omic_tpu.models import MCAT
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    RefModel = _import_reference_mcat()
    tmod = RefModel(omic_sizes=OMIC_SIZES, model_size="medium", fusion=fusion)
    tmod.eval()
    wsi, omics = _reference_inputs(seed=4)
    with torch.no_grad():
        t_hz, t_sv, t_y, t_attn = tmod(wsi, omics, inference=True)

    jmod = MCAT(n_signatures=6, fusion=fusion)
    jw = jnp.array(_np(wsi))[None]
    jo = [jnp.array(_np(o))[None] for o in omics]
    init = jmod.init(jax.random.key(0), jw, jo, need_attention=True)
    params = from_torch_state_dict(
        "mcat", {k: _np(v) for k, v in tmod.state_dict().items()}, init, 6, fusion
    )
    out = jmod.apply(params, jw, jo, need_attention=True)
    np.testing.assert_allclose(np.asarray(out.hazards[0]), _np(t_hz)[0], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.survs[0]), _np(t_sv)[0], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.y[0]), _np(t_y)[0], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.attention["coattn"][0]), _np(t_attn["coattn"]), atol=5e-5
    )


def test_nacagat_full_reference_parity():
    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    RefModel = _import_reference_nacagat()
    tmod = RefModel(omic_sizes=OMIC_SIZES, model_size="medium", fusion="concat")
    tmod.eval()
    wsi, omics = _reference_inputs(seed=5)
    with torch.no_grad():
        t_hz, t_sv, t_y, t_attn = tmod(wsi, omics)

    jmod = NaCAGaT(n_signatures=6, fusion="concat")
    jw = jnp.array(_np(wsi))[None]
    jo = [jnp.array(_np(o))[None] for o in omics]
    init = jmod.init(jax.random.key(0), jw, jo)
    params = from_torch_state_dict(
        "nacagat", {k: _np(v) for k, v in tmod.state_dict().items()}, init, 6, "concat"
    )
    out = jmod.apply(params, jw, jo)
    np.testing.assert_allclose(np.asarray(out.hazards[0]), _np(t_hz)[0], atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.survs[0]), _np(t_sv)[0], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out.attention["coattn"][0]), _np(t_attn["coattn"]), atol=5e-5
    )


def test_ge_nacagat_full_reference_parity():
    from multimodal_path_omic_tpu.models import GENaCAGaT
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.ge_nacagat.ge_nacagat import (  # type: ignore
            GeneExprNarrowContextualAttentionGateTransformer as RefModel,
        )
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")

    tmod = RefModel(model_size="medium")
    tmod.eval()
    wsi, _ = _reference_inputs(seed=6, m=200)
    with torch.no_grad():
        t_y, t_attn = tmod(wsi)

    jmod = GENaCAGaT()
    jw = jnp.array(_np(wsi))[None]
    init = jmod.init(jax.random.key(0), jw, need_attention=True)
    params = from_torch_state_dict(
        "ge_nacagat", {k: _np(v) for k, v in tmod.state_dict().items()}, init
    )
    y, attn = jmod.apply(params, jw, need_attention=True)
    np.testing.assert_allclose(np.asarray(y[0]), _np(t_y), atol=5e-5)
    np.testing.assert_allclose(np.asarray(attn["attn"][0]), _np(t_attn["attn"]), atol=5e-5)


# ---------------------------------------------------------------------------
# Tier 3: TRAINING-path parity — gradients of the full loss, weights
# transplant, dropout 0. Forward parity (above, eval mode) cannot catch a
# divergence that only exists under grad / train-mode branches; these can.
# ---------------------------------------------------------------------------


def _silence_hardcoded_dropout(tmod):
    """The reference HARDCODES p=0.25 in the MIL attention heads regardless
    of the model's dropout arg (reference: blocks.py:34-36) — zero them so a
    dropout-free comparison is possible."""
    for name in ("path_attention_head", "omic_attention_head"):
        head = getattr(tmod, name, None)
        if head is None:
            continue
        for seq in (head.attention_a, head.attention_b):
            for m in seq:
                if isinstance(m, torch.nn.Dropout):
                    m.p = 0.0


def _grad_tree_from_torch(model_name, tmod, init, fusion="concat"):
    """Map torch .grad tensors into this framework's param-tree layout using
    the same transplant rules as the weights (transposes, stacking)."""
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    zeros = jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)), init)
    grads = {
        k: _np(p.grad)
        for k, p in tmod.named_parameters()
        if p.grad is not None
    }
    return from_torch_state_dict(model_name, grads, zeros, 6, fusion)


def _assert_tree_close(jax_tree, torch_tree, atol, rtol):
    jl = jax.tree_util.tree_flatten_with_path(jax_tree)[0]
    tl = jax.tree_util.tree_flatten(torch_tree)[0]
    assert len(jl) == len(tl)
    for (path, jg), tg in zip(jl, tl):
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(jg), np.asarray(tg), atol=atol, rtol=rtol,
            err_msg=f"grad mismatch at {name}",
        )


def test_mcat_ces_gradient_parity():
    """Control: MCAT + ces loss, grads torch == jax (dropout 0)."""
    from multimodal_path_omic_tpu.models import MCAT
    from multimodal_path_omic_tpu.train.loop import _survival_loss
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    RefModel = _import_reference_mcat()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.loss import CrossEntropySurvivalLoss  # type: ignore

    tmod = RefModel(
        omic_sizes=OMIC_SIZES, model_size="small", dropout=0.0, fusion="concat"
    )
    _silence_hardcoded_dropout(tmod)
    tmod.train()
    wsi, omics = _reference_inputs(seed=11)
    t_hz, t_sv, _t_y, _ = tmod(wsi, omics)
    t_loss = CrossEntropySurvivalLoss()(
        t_hz, t_sv, torch.tensor([[1]]), c=torch.tensor([[0.0]])
    )
    t_loss.backward()

    jmod = MCAT(n_signatures=6, model_size="small", dropout_rate=0.0, fusion="concat")
    jw = jnp.array(_np(wsi))[None]
    jo = [jnp.array(_np(o))[None] for o in omics]
    init = jmod.init(jax.random.key(0), jw, jo)
    params = from_torch_state_dict(
        "mcat", {k: _np(v) for k, v in tmod.state_dict().items()}, init, 6, "concat"
    )

    label = jnp.array([1], jnp.int32)
    cens = jnp.array([0.0], jnp.float32)
    months = jnp.array([10.0], jnp.float32)
    w = jnp.ones((1,), jnp.float32)

    def loss_fn(p):
        out = jmod.apply(
            {"params": p}, jw, jo, None,
            deterministic=False, need_attention=False,
            rngs={"dropout": jax.random.key(3)},
        )
        loss, _ = _survival_loss("ces", out, label, cens, months, 0.75, w)
        return loss

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=2e-3)
    t_grads = _grad_tree_from_torch("mcat", tmod, init)
    _assert_tree_close(j_grads, t_grads["params"], atol=2e-4, rtol=2e-3)


def test_nacagat_cesar_gradient_parity():
    """The flagship train path: NaCAGaT + cesar (pre-gate, CAG, attention-map
    L2 penalty) — grads torch == jax with dropout 0. Covers what eval-mode
    forward parity cannot: the backward through scores*P, the CAG residual,
    and the norm penalty on the returned (train-mode) weights."""
    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.train.loop import _survival_loss
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    RefModel = _import_reference_nacagat()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.loss import CrossEntropySurvivalAttnRegLoss  # type: ignore

    tmod = RefModel(
        omic_sizes=OMIC_SIZES, model_size="small", dropout=0.0, fusion="concat"
    )
    # the PCA block's own attention dropout is NOT tied to the model's
    # dropout arg (reference: blocks.py:52 default 0.25) — silence it too
    tmod.co_attention.dropout = 0.0
    _silence_hardcoded_dropout(tmod)
    tmod.train()
    wsi, omics = _reference_inputs(seed=12)
    t_hz, t_sv, _t_y, t_attn = tmod(wsi, omics)
    t_loss, _t_attn_loss = CrossEntropySurvivalAttnRegLoss()(
        t_hz, t_sv, torch.tensor([[2]]), c=torch.tensor([[0.0]]),
        attention=t_attn["coattn"],
    )
    t_loss.backward()

    jmod = NaCAGaT(
        n_signatures=6, model_size="small", dropout_rate=0.0, fusion="concat"
    )
    jw = jnp.array(_np(wsi))[None]
    jo = [jnp.array(_np(o))[None] for o in omics]
    init = jmod.init(jax.random.key(0), jw, jo)
    params = from_torch_state_dict(
        "nacagat", {k: _np(v) for k, v in tmod.state_dict().items()}, init, 6, "concat"
    )

    label = jnp.array([2], jnp.int32)
    cens = jnp.array([0.0], jnp.float32)
    months = jnp.array([10.0], jnp.float32)
    w = jnp.ones((1,), jnp.float32)

    def loss_fn(p):
        out = jmod.apply(
            {"params": p}, jw, jo, None,
            deterministic=False, need_attention=True,
            rngs={"dropout": jax.random.key(3)},
        )
        loss, _ = _survival_loss("cesar", out, label, cens, months, 0.75, w)
        return loss

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=2e-3)
    t_grads = _grad_tree_from_torch("nacagat", tmod, init)
    _assert_tree_close(j_grads, t_grads["params"], atol=2e-4, rtol=2e-3)


def test_ge_nacagat_ce_gradient_parity():
    """Third family: GE-NaCAGaT + ce (on softmaxed Y, the double-softmax
    quirk) — grads torch == jax with dropout 0."""
    from multimodal_path_omic_tpu.models import GENaCAGaT
    from multimodal_path_omic_tpu.ops import losses as L
    from multimodal_path_omic_tpu.utils.transplant import from_torch_state_dict

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models.ge_nacagat.ge_nacagat import (  # type: ignore
            GeneExprNarrowContextualAttentionGateTransformer as RefModel,
        )
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference unavailable: {exc}")

    tmod = RefModel(model_size="small", dropout=0.0)
    _silence_hardcoded_dropout(tmod)
    tmod.train()
    wsi, _ = _reference_inputs(seed=13, m=200)
    t_y, _t_attn = tmod(wsi)
    t_loss = torch.nn.CrossEntropyLoss()(t_y.unsqueeze(0), torch.tensor([1]))
    t_loss.backward()

    jmod = GENaCAGaT(model_size="small", dropout_rate=0.0)
    jw = jnp.array(_np(wsi))[None]
    init = jmod.init(jax.random.key(0), jw)
    params = from_torch_state_dict(
        "ge_nacagat", {k: _np(v) for k, v in tmod.state_dict().items()}, init
    )

    def loss_fn(p):
        y, _ = jmod.apply(
            {"params": p}, jw, None,
            deterministic=False, rngs={"dropout": jax.random.key(3)},
        )
        return L.cross_entropy_on_probs(
            y, jnp.array([1], jnp.int32), sample_weight=jnp.ones((1,), jnp.float32)
        )

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=2e-3)
    t_grads = _grad_tree_from_torch("ge_nacagat", tmod, init)
    _assert_tree_close(j_grads, t_grads["params"], atol=2e-4, rtol=2e-3)
