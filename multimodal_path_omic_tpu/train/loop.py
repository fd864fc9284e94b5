"""Jitted train/eval steps: one optimizer update per batched, bucketed step.

TPU-native replacement for the reference's batch-1 + 32-step gradient
accumulation loop (reference: mcat/main.py:19-103): a full effective batch
(= ``grad_acc_step`` bags) is processed in ONE jitted step. When the bucket is
too large for a single pass, the step scans over microbatch chunks
accumulating gradients (``lax.scan``, same semantics as the reference's
``loss/grad_acc_step`` accumulation at mcat/main.py:69-74), then applies one
optimizer update.

Static configuration (model/loss name/accum chunks) is baked per-trace;
ragged bags re-trace once per bucket shape.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from multimodal_path_omic_tpu.ops import losses as L
from multimodal_path_omic_tpu.ops.layers import fast_keep_mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray  # int32 scalar


class StepMetrics(NamedTuple):
    loss: jnp.ndarray  # scalar weighted-mean loss (incl. reg)
    attn_loss: jnp.ndarray  # scalar (cesar only, else 0)
    risk: jnp.ndarray  # [B] per-sample risk = -sum(survs)
    n_real: jnp.ndarray  # scalar


def _survival_loss(loss_name: str, out, label, censorship, months, alpha, weight):
    """Dispatch matching the reference's string-keyed branches
    (mcat/main.py:41-48, nacagat/main.py:42-54), plus the unwired nll/cox."""
    attn_loss = jnp.zeros((), out.hazards.dtype)
    if loss_name == "ce":
        loss = L.cross_entropy_on_probs(out.y, label, sample_weight=weight)
    elif loss_name == "ces":
        loss = L.cross_entropy_survival(
            out.hazards, out.survs, label, censorship, alpha=alpha, sample_weight=weight
        )
    elif loss_name == "sct":
        loss = L.survival_classification_tobit(
            out.y, label, censorship, sample_weight=weight
        )
    elif loss_name == "cesar":
        # per-sample L2 norm over the co-attention map, weighted-mean. When
        # the model ran the fused kernel it returns the per-query sum of
        # squares instead of the full map (attention['coattn_ssq']) — same
        # norm, never materializing N x M (reference: loss.py:97-98).
        ssq = out.attention.get("coattn_ssq")
        if ssq is not None:
            per = jnp.sqrt(jnp.sum(ssq, axis=1) + 1e-12)
        else:
            attn = out.attention["coattn"]
            per = jnp.sqrt(jnp.sum(attn.reshape(attn.shape[0], -1) ** 2, axis=1) + 1e-12)
        attn_loss = 0.01 * jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        loss = (
            L.cross_entropy_survival(
                out.hazards, out.survs, label, censorship, alpha=alpha, sample_weight=weight
            )
            + attn_loss
        )
    elif loss_name == "nll":
        loss = L.negative_log_likelihood_survival(
            out.hazards, out.survs, label, censorship, sample_weight=weight
        )
    elif loss_name == "cox":
        # batch-level Cox partial likelihood: theta = risk, risk sets from
        # observed months. Usable here because steps see real batches (the
        # reference's cox is unwired and batch-1, loss.py:46-59).
        risk = -jnp.sum(out.survs, axis=1)
        loss = L.cox_survival(risk, months, censorship, sample_weight=weight)
    else:
        raise RuntimeError(f'Loss "{loss_name}" not implemented')
    return loss, attn_loss


def _unpack_omics(batch, omic_sizes):
    """Accept either an 'omics' list or a packed [B, sum(sizes)] array (fewer
    host->device transfers; split is free inside jit)."""
    if "omics" in batch:
        return batch["omics"]
    packed = batch["omics_packed"]
    out, off = [], 0
    for s in omic_sizes:
        out.append(packed[:, off : off + s])
        off += s
    return out


def make_train_step(
    model,
    loss_name: str,
    optimizer: optax.GradientTransformation,
    *,
    alpha: float = 0.75,
    l1_lambda: float = 0.0,
    patch_budget: Optional[int] = 262_144,
    ge_mode: bool = False,
    omic_sizes: Optional[Tuple[int, ...]] = None,
    donate_state: bool = False,
    patch_dropout: float = 0.0,
    remat: bool = False,
    int8_matmul: bool = False,
) -> Callable:
    """Build the jitted train step.

    Batch dict fields (numpy/jnp): wsi [B, M, D], mask [B, M], label [B],
    weight [B]; survival mode adds omics (list of [B, s_i]), censorship [B].

    ``patch_budget`` bounds B*M patch rows held live per backward pass: the
    step scans over gradient-accumulation chunks whenever a bucket's
    B * M exceeds it (chunk count is derived from static shapes at trace
    time, so each bucket still compiles exactly once).

    ``donate_state`` donates the input TrainState's buffers to the output
    (saves a params+opt-state copy per step; measured +33%% throughput). The
    caller must NOT reuse a state after stepping it — the Trainer's linear
    state chain qualifies; ad-hoc experimentation may not.
    """
    # cesar needs the attention penalty but not the full map: request "ssq"
    # so the model can stay on the fused kernel path (models that don't
    # implement ssq fall back to returning the full map under 'coattn').
    need_attention = "ssq" if loss_name == "cesar" else False
    return _build_step(
        model, loss_name, optimizer, alpha=alpha, l1_lambda=l1_lambda,
        patch_budget=patch_budget, ge_mode=ge_mode, omic_sizes=omic_sizes,
        donate_state=donate_state, need_attention=need_attention, multi=False,
        patch_dropout=patch_dropout, remat=remat, int8_matmul=int8_matmul,
    )


def make_multi_train_step(
    model,
    loss_name: str,
    optimizer: optax.GradientTransformation,
    *,
    alpha: float = 0.75,
    l1_lambda: float = 0.0,
    patch_budget: Optional[int] = 262_144,
    ge_mode: bool = False,
    omic_sizes: Optional[Tuple[int, ...]] = None,
    donate_state: bool = False,
    patch_dropout: float = 0.0,
    remat: bool = False,
    int8_matmul: bool = False,
) -> Callable:
    """Multi-step dispatch: ONE jitted call runs K sequential optimizer steps
    (``lax.scan``) over a stacked batch dict whose arrays carry a leading
    [K, ...] axis. Semantics are EXACTLY K calls of the single train step
    (same RNG chain, same updates); the point is dispatch amortization — on
    remote/tunneled accelerators the per-call host latency otherwise
    dominates small steps. Returns (state, metrics-with-leading-K-axis)."""
    need_attention = "ssq" if loss_name == "cesar" else False
    return _build_step(
        model, loss_name, optimizer, alpha=alpha, l1_lambda=l1_lambda,
        patch_budget=patch_budget, ge_mode=ge_mode, omic_sizes=omic_sizes,
        donate_state=donate_state, need_attention=need_attention, multi=True,
        patch_dropout=patch_dropout, remat=remat, int8_matmul=int8_matmul,
    )


def make_cached_train_step(
    model,
    loss_name: str,
    optimizer: optax.GradientTransformation,
    *,
    alpha: float = 0.75,
    l1_lambda: float = 0.0,
    patch_budget: Optional[int] = 262_144,
    ge_mode: bool = False,
    omic_sizes: Optional[Tuple[int, ...]] = None,
    donate_state: bool = False,
    patch_dropout: float = 0.0,
    multi: bool = False,
    mesh=None,
    remat: bool = False,
    int8_matmul: bool = False,
) -> Callable:
    """Train step over a DEVICE-RESIDENT dataset cache (data/device_cache.py).

    ``step(state, cache, meta)``: batches are assembled ON DEVICE by gathering
    ``cache`` rows at ``meta['pos']`` (wsi/mask, bucket-local) and
    ``meta['row']`` (labels/omics, dataset rows) — the steady-state training
    loop transfers only a few KB of indices per optimizer step instead of the
    bags. With ``multi``, meta arrays carry a leading [K, ...] axis and one
    call runs K optimizer steps (lax.scan), the cache staying fixed.
    ``mesh``: mesh-sharded cache (see _gather_batch).
    """
    need_attention = "ssq" if loss_name == "cesar" else False
    return _build_step(
        model, loss_name, optimizer, alpha=alpha, l1_lambda=l1_lambda,
        patch_budget=patch_budget, ge_mode=ge_mode, omic_sizes=omic_sizes,
        donate_state=donate_state, need_attention=need_attention, multi=multi,
        cached=True, mesh=mesh, patch_dropout=patch_dropout, remat=remat,
        int8_matmul=int8_matmul,
    )


def _dequant_wsi(batch: Dict[str, Any], dtype=None) -> Dict[str, Any]:
    """Dequantize an int8 wsi field in place (no-op for float batches). The
    convert+scale fuses into the first consumer under jit; int8 storage keeps
    the gather / H2D traffic at a quarter of f32 (data/quant.py).

    ``dtype`` is the model's compute dtype: when it trains in bf16 the
    dequant goes STRAIGHT to bf16, skipping the f32 intermediate the model
    would immediately down-cast anyway (q in [-127,127] is exact in bf16;
    the scale multiply rounds once either way)."""
    if "wsi_scale" in batch:
        dt = dtype or jnp.float32
        batch = dict(batch)
        scale = batch.pop("wsi_scale")
        batch["wsi"] = batch["wsi"].astype(dt) * scale[..., None].astype(dt)
    return batch


def _gather_batch(
    cache: Dict[str, Any], meta: Dict[str, Any], ge_mode: bool, mesh=None
):
    """Assemble a batch dict from device-cache gathers (inside jit).

    With ``mesh``, the cache is stored patch-axis-sharded over every device
    (parallel/mesh.py::cache_spec) so the bag-axis gather below is
    communication-free; the gathered batch is then sharding-constrained to
    the canonical (data, seq) batch layout — ONE batch-sized all-to-all per
    step over ICI, making the device-cache fast path compose with multi-chip
    training instead of forcing mesh runs onto the slow host-fed feed."""
    pos = meta["pos"].astype(jnp.int32)
    row = meta["row"].astype(jnp.int32)
    # Pallas scalar-prefetch copy kernel: XLA lowers this row gather to
    # ~36 GB/s on the dev chip (~10x below its own contiguous reads); the
    # kernel streams block DMAs at the copy floor (4.1x measured,
    # ops/gather.py). On meshes the cache pool is patch-axis-sharded
    # (cache_spec) and GSPMD has no pallas rule, so the kernel runs
    # shard_map'd per device on the local patch slice (take_rows_sharded) —
    # same communication-free gather, jnp.take only when ineligible.
    from multimodal_path_omic_tpu.ops import gather as _gather

    if mesh is None:
        wsi = _gather.take_rows(cache["wsi"], pos)
    elif _gather.sharded_supported(cache["wsi"], pos, mesh):
        wsi = _gather.take_rows_sharded(cache["wsi"], pos, mesh)
    else:
        wsi = jnp.take(cache["wsi"], pos, axis=0)
    batch = {
        "wsi": wsi,
        "mask": jnp.take(cache["mask"], pos, axis=0),
        "weight": meta["weight"],
        "label": jnp.take(cache["label"], row, axis=0),
    }
    if "wsi_scale" in cache:
        batch["wsi_scale"] = jnp.take(cache["wsi_scale"], pos, axis=0)
    if not ge_mode:
        batch["omics_packed"] = jnp.take(cache["omics_packed"], row, axis=0)
        batch["censorship"] = jnp.take(cache["censorship"], row, axis=0)
        batch["survival_months"] = jnp.take(cache["survival_months"], row, axis=0)
    if mesh is not None:
        from jax.sharding import NamedSharding

        from multimodal_path_omic_tpu.parallel.mesh import batch_spec

        batch = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, batch_spec(k))
            )
            for k, v in batch.items()
        }
    return batch


def stack_batches(batches):
    """Stack same-shaped host batches into one [K, ...] batch dict (numpy):
    one transfer + one dispatch instead of K."""
    import numpy as _np

    out = {}
    for k in batches[0]:
        if k in ("bucket", "n_real", "aliased"):
            continue
        if k == "omics":
            out[k] = [
                _np.stack([_np.asarray(b[k][i]) for b in batches])
                for i in range(len(batches[0][k]))
            ]
        else:
            out[k] = _np.stack([_np.asarray(b[k]) for b in batches])
    return out


def _build_step(
    model, loss_name, optimizer, *, alpha, l1_lambda, patch_budget, ge_mode,
    omic_sizes, donate_state, need_attention, multi, cached=False, mesh=None,
    patch_dropout=0.0, remat=False, int8_matmul=False,
):
    def forward_loss(params, rng, wsi, mask, omics, label, censorship, months,
                     weight, wsi_scale=None):
        if patch_dropout:
            # Patch dropout (training.patch_dropout): hide a seeded random
            # fraction of each bag's REAL patches from this step's attention.
            # The masked softmax excludes hidden patches EXACTLY on every
            # path (XLA, fused kernel, ring, seq-parallel — all
            # equality-tested), so this composes with any feed/mesh/kernel
            # configuration. Static shapes, dynamic masks: the TPU-native
            # form of MIL patch subsampling. Salted fold_in keeps the stream
            # independent of the model's own dropout rngs.
            keep, _ = fast_keep_mask(
                jax.random.fold_in(rng, 0x9A7C), patch_dropout, mask.shape
            )
            dropped = jnp.logical_and(mask, keep)
            # a bag whose every real patch was hidden keeps its full mask
            # (an all-masked bag would NaN the masked softmax)
            any_kept = jnp.any(dropped, axis=1, keepdims=True)
            mask = jnp.where(any_kept, dropped, mask)
        out = model.apply(
            {"params": params},
            wsi,
            *(() if ge_mode else (omics,)),
            mask,
            deterministic=False,
            need_attention=need_attention,
            rngs={"dropout": rng},
            **({} if wsi_scale is None else {"wsi_scale": wsi_scale}),
        )
        if ge_mode:
            y, _attn = out
            loss = L.cross_entropy_on_probs(y, label, sample_weight=weight)
            attn_loss = jnp.zeros((), y.dtype)
            risk = jnp.zeros((wsi.shape[0],), y.dtype)
        else:
            loss, attn_loss = _survival_loss(
                loss_name, out, label, censorship, months, alpha, weight
            )
            risk = -jnp.sum(out.survs, axis=1)
        # scale by this chunk's weight mass so chunks average correctly
        w_sum = jnp.sum(weight)
        return loss * w_sum, (attn_loss * w_sum, risk, w_sum)

    if remat:
        # tpu.remat: recompute the 'remat_big' [B, M, d] tensors (WSI-encoder
        # activations, attention q/k/v projections — tagged via
        # checkpoint_name in ops/blocks.py / ops/attention.py) in the
        # backward instead of storing them. Everything else (small omic
        # branches, 6-token transformer, heads) stays saved, so the cost is
        # one extra MXU pass over the patch-axis matmuls while the backward's
        # HBM residual footprint drops from O(B*M*d) per tagged tensor to the
        # model inputs.
        forward_loss = jax.checkpoint(
            forward_loss,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "remat_big"
            ),
        )
    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

    def _step_impl(state: TrainState, batch: Dict[str, Any]) -> Tuple[TrainState, StepMetrics]:
        if int8_matmul and "wsi_scale" in batch:
            # tpu.int8_matmul: keep the cache's int8 bags AS int8 — the first
            # projection runs s8 x s8 on the MXU (ops/layers.py::w8a8_linear)
            # and the [B, M, F] dequantized activation never exists
            batch = dict(batch)
            wsi_scale_full = batch.pop("wsi_scale")
        else:
            batch = _dequant_wsi(batch, getattr(model, "dtype", None))
            wsi_scale_full = None
        b, m = batch["wsi"].shape[0], batch["wsi"].shape[1]
        # static (trace-time) choice of accumulation chunks: largest divisor
        # of b whose chunk fits the patch budget
        if patch_budget is None or loss_name == "cox":
            # cox is NOT sum-decomposable over samples: each event's risk set
            # spans the whole batch, so chunked accumulation would shrink the
            # risk sets to chunk-local ones and bias loss and gradient. Cox
            # always sees the full batch (at the memory cost of no remat
            # chunking on huge buckets).
            accum = 1
        else:
            max_chunk = max(1, patch_budget // max(m, 1))
            chunk = 1
            for d in range(1, b + 1):
                if b % d == 0 and d <= max_chunk:
                    chunk = d
            accum = b // chunk
        chunk = b // accum

        def resh(x):
            return x.reshape((accum, chunk) + x.shape[1:])

        wsi = resh(batch["wsi"])
        wsi_scale = None if wsi_scale_full is None else resh(wsi_scale_full)
        mask = resh(batch["mask"])
        label = resh(batch["label"].astype(jnp.int32))
        weight = resh(batch["weight"])
        omics = None if ge_mode else [resh(o) for o in _unpack_omics(batch, omic_sizes)]
        cens = None if ge_mode else resh(batch["censorship"])
        months = None if ge_mode else resh(batch["survival_months"])

        rng, step_rng = jax.random.split(state.rng)
        chunk_rngs = jax.random.split(step_rng, accum)

        if accum == 1:
            # no accumulation: skip the scan wrapper (and its per-iteration
            # dynamic slices of the whole batch)
            (loss_sum, (attn_sum, risk_single, w_sum)), grads = grad_fn(
                state.params,
                chunk_rngs[0],
                wsi[0],
                mask[0],
                None if ge_mode else [o[0] for o in omics],
                label[0],
                None if ge_mode else cens[0],
                None if ge_mode else months[0],
                weight[0],
                None if wsi_scale is None else wsi_scale[0],
            )
            risks = risk_single[None]
        else:
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(carry, i):
                grads_acc, loss_acc, attn_acc, w_acc = carry
                (loss_i, (attn_i, risk_i, w_i)), grads_i = grad_fn(
                    state.params,
                    chunk_rngs[i],
                    wsi[i],
                    mask[i],
                    None if ge_mode else [o[i] for o in omics],
                    label[i],
                    None if ge_mode else cens[i],
                    None if ge_mode else months[i],
                    weight[i],
                    None if wsi_scale is None else wsi_scale[i],
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads_i)
                return (
                    (grads_acc, loss_acc + loss_i, attn_acc + attn_i, w_acc + w_i),
                    risk_i,
                )

            (grads, loss_sum, attn_sum, w_sum), risks = jax.lax.scan(
                body,
                (zero_grads, jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
                jnp.arange(accum),
            )
        w_sum = jnp.maximum(w_sum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / w_sum, grads)
        loss = loss_sum / w_sum
        attn_loss = attn_sum / w_sum

        if l1_lambda and l1_lambda > 0.0:
            # L1 regularization over all params (reference: utils.py:33-40,
            # mcat/main.py:51-54, 314-318). The reference backwards
            # ``loss/grad_acc_step + loss_reg`` for EVERY sample
            # (mcat/main.py:69-70), so the effective per-step L1 gradient is
            # n_samples * lambda — matched here by scaling with w_sum — while
            # the REPORTED loss adds loss_reg once per sample mean
            # (mcat/main.py:60), i.e. a single lambda * reg term.
            reg, reg_grads = jax.value_and_grad(L.l1_reg)(state.params)
            grads = jax.tree_util.tree_map(
                lambda g, r: g + l1_lambda * w_sum * r, grads, reg_grads
            )
            loss = loss + l1_lambda * reg

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, rng, state.step + 1)
        metrics = StepMetrics(
            loss=loss,
            attn_loss=attn_loss,
            risk=risks.reshape(-1),
            n_real=jnp.sum(batch["weight"]),
        )
        return new_state, metrics

    donate = (0,) if donate_state else ()
    if cached:
        if multi:

            @functools.partial(jax.jit, donate_argnums=donate)
            def cached_multi(state: TrainState, cache, stacked_meta):
                def body(st, meta):
                    return _step_impl(st, _gather_batch(cache, meta, ge_mode, mesh))

                return jax.lax.scan(body, state, stacked_meta)

            return cached_multi

        @functools.partial(jax.jit, donate_argnums=donate)
        def cached_step(state: TrainState, cache, meta):
            return _step_impl(state, _gather_batch(cache, meta, ge_mode, mesh))

        return cached_step

    if not multi:
        return jax.jit(_step_impl, donate_argnums=donate)

    @functools.partial(jax.jit, donate_argnums=donate)
    def multi_step(state: TrainState, stacked: Dict[str, Any]):
        # stacked arrays carry a leading [K, ...] axis; omics lists scan
        # element-wise like any pytree leaf
        return jax.lax.scan(_step_impl, state, stacked)

    return multi_step


def make_eval_step(
    model, loss_name: str, *, alpha: float = 0.75, ge_mode: bool = False,
    need_attention: bool = False, omic_sizes: Optional[Tuple[int, ...]] = None,
    l1_lambda: float = 0.0, cached: bool = False, mesh=None,
) -> Callable:
    """Jitted no-grad eval step mirroring validate() (mcat/main.py:106-155).

    When ``training.lambda`` is set the reference adds ``reg_function(model) *
    lambda`` to every per-sample val loss (mcat/main.py:134-147, same in
    ge_nacagat/main.py:105-110) — reproduced via ``l1_lambda``.

    ``cached``: the step takes ``(params, cache, meta)`` and assembles the
    batch from device-cache gathers (data/device_cache.py) instead of a
    host-fed batch dict.
    """
    want_attn = need_attention or loss_name == "cesar"

    @jax.jit
    def eval_step(params, batch, *maybe_meta):
        if cached:
            batch = _gather_batch(batch, maybe_meta[0], ge_mode, mesh)
        batch = _dequant_wsi(batch, getattr(model, "dtype", None))
        out = model.apply(
            {"params": params},
            batch["wsi"],
            *(() if ge_mode else (_unpack_omics(batch, omic_sizes),)),
            batch["mask"],
            deterministic=True,
            need_attention=want_attn,
        )
        weight = batch["weight"]
        reg_term = (
            l1_lambda * L.l1_reg(params) if l1_lambda and l1_lambda > 0.0 else 0.0
        )
        if ge_mode:
            y, attn = out
            loss = (
                L.cross_entropy_on_probs(y, batch["label"], sample_weight=weight)
                + reg_term
            )
            # 'path' MIL scores are always produced (the GE export consumes
            # them, reference: ge_nacagat/main.py:140-142); 'attn' (M x M) is
            # None unless explicitly requested.
            return {
                "loss": loss,
                "y": y,
                "attention": attn,
                "n_real": jnp.sum(weight),
            }
        loss, attn_loss = _survival_loss(
            loss_name,
            out,
            batch["label"].astype(jnp.int32),
            batch["censorship"],
            batch["survival_months"],
            alpha,
            weight,
        )
        return {
            "loss": loss + reg_term,
            "attn_loss": attn_loss,
            "risk": -jnp.sum(out.survs, axis=1),
            "hazards": out.hazards,
            "survs": out.survs,
            "y": out.y,
            "attention": out.attention if want_attn else None,
            "n_real": jnp.sum(weight),
        }

    return eval_step


def make_mc_eval_step(
    model, n_samples: int, *, ge_mode: bool = False,
    omic_sizes: Optional[Tuple[int, ...]] = None,
) -> Callable:
    """Monte-Carlo-dropout predictive uncertainty (Gal & Ghahramani 2016):
    ``mc_step(params, batch, rng)`` runs ``n_samples`` stochastic forwards
    with the model's OWN dropout active at inference and returns the
    predictive mean and standard deviation — risk/survs for survival models,
    class probabilities for GE. Sequential ``lax.map`` over sample keys keeps
    memory at one batch regardless of ``n_samples``; the batch is scored in
    ONE device call. The reference has no uncertainty surface at all (its
    only inference is the leave-one-out test loop, mcat/main.py:158-183)."""

    @jax.jit
    def mc_step(params, batch, rng):
        batch = _dequant_wsi(batch, getattr(model, "dtype", None))
        keys = jax.random.split(rng, n_samples)

        def one(key):
            out = model.apply(
                {"params": params},
                batch["wsi"],
                *(() if ge_mode else (_unpack_omics(batch, omic_sizes),)),
                batch["mask"],
                deterministic=False,
                need_attention=False,
                rngs={"dropout": key},
            )
            if ge_mode:
                y, _attn = out
                b = y.shape[0]
                z = jnp.zeros((b,), y.dtype)
                return y, z[:, None], z[:, None], z
            return out.y, out.hazards, out.survs, -jnp.sum(out.survs, axis=1)

        ys, hazards, survs, risks = jax.lax.map(one, keys)
        res = {
            "y_mean": ys.mean(axis=0),
            "y_std": ys.std(axis=0),
        }
        if not ge_mode:
            res.update(
                risk_mean=risks.mean(axis=0),
                risk_std=risks.std(axis=0),
                hazards_mean=hazards.mean(axis=0),
                survs_mean=survs.mean(axis=0),
                survs_std=survs.std(axis=0),
            )
        return res

    return mc_step


def make_multi_eval_step(
    model, loss_name: str, *, alpha: float = 0.75, ge_mode: bool = False,
    need_attention: bool = False, omic_sizes: Optional[Tuple[int, ...]] = None,
    l1_lambda: float = 0.0, cached: bool = False, mesh=None,
) -> Callable:
    """K eval batches in ONE device call (``lax.map`` over a leading [K, ...]
    axis; eval carries no state, so this is exactly K single eval steps).
    Amortizes per-call dispatch latency for per-epoch validation the same way
    ``make_multi_train_step`` does for training. ``cached``: the call takes
    ``(params, cache, stacked_meta)``; otherwise ``(params, stacked_batch)``.
    Result leaves carry the leading [K, ...] axis."""
    step = make_eval_step(
        model, loss_name, alpha=alpha, ge_mode=ge_mode,
        need_attention=need_attention, omic_sizes=omic_sizes,
        l1_lambda=l1_lambda, cached=cached, mesh=mesh,
    )

    @jax.jit
    def multi_eval(params, batch_or_cache, *maybe_meta):
        if cached:
            return jax.lax.map(
                lambda m: step(params, batch_or_cache, m), maybe_meta[0]
            )
        return jax.lax.map(lambda b: step(params, b), batch_or_cache)

    return multi_eval
