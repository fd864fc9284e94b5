"""Attention primitives — batched, masked, torch-parity math.

Covers the reference's attention surface (reference: models/blocks.py):

* ``MultiheadAttention`` — behavior-parity with stock ``nn.MultiheadAttention``
  (packed QKV projection, per-head scaling, optional weight averaging), used by
  MCAT co-attention (mcat.py:48,97) and GE-NaCAGaT self-attention
  (ge_nacagat.py:27,49).
* ``PreGatingContextualAttention`` — the NaCAGaT co-attention: scores are
  multiplied by the pre-gate ``P = (tanh(Q)·tanh(K)^T + 1)/2`` before softmax
  (blocks.py:184-188), then a Contextual Attention Gate residual is added
  (blocks.py:110-111).
* ``PreGatedAttention`` + ``ContextualAttentionGate`` +
  ``PreGatingContextualAttentionGate`` — the standalone PCAG stack
  (blocks.py:209-285).

Unlike the reference (unbatched, full-materialized score matrices), everything
here takes ``[B, seq, dim]`` with an optional boolean key-validity mask
``[B, M]`` so ragged WSI bags can be bucketed+padded and batched. When
``use_pallas`` is set on the wrapping model, the score/softmax/PV chain is
computed by a fused Pallas kernel (ops/coattn.py) instead of XLA einsums.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_path_omic_tpu.ops.layers import (
    TorchLinear,
    fast_keep_mask,
    masked_softmax,
)


def xavier_uniform_packed_init(key, shape, dtype=jnp.float32):
    """xavier_uniform over the packed [E, 3E] QKV kernel.

    torch xaviers the packed (3E, E) matrix as a whole (blocks.py:82), giving
    bound sqrt(6 / (E + 3E)); identical for the transposed flax layout.
    """
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, L, E] -> [B, H, L, E/H]"""
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, D] -> [B, L, H*D]"""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def tiny_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    num_heads: int,
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Few-token attention as VPU elementwise fusions (no MXU, no transposes).

    q: [B, N, E]; k, v: [B, M, E] with N, M tiny — the 6-token branch
    transformers (reference: mcat.py:51-53, 60-62). The [B, H, L, D] head
    layout ``attention_core`` feeds the MXU is tiling poison at these shapes:
    D=32 in lanes and L=6 in sublanes pad ~5x, and the layout-constrained
    transposes around each matmul surface as pure HBM copies (12 recurring
    copies, ~310 us/step at the B=256 K=16 ladder). Computing scores and PV
    as broadcast-multiply-reduce instead keeps the whole chain inside XLA
    loop fusions, where index permutations are free; at these sizes the
    attention is ~2.4 MFLOP total, so losing the MXU costs nothing. Math is
    identical to ``attention_core`` (same 1/sqrt(D) scale, masked softmax
    over keys, torch dropout-on-probs semantics); only reduction order and
    the dropout mask's draw layout differ.
    """
    b, n, e = q.shape
    m = k.shape[1]
    d = e // num_heads
    q4 = q.reshape(b, n, num_heads, d)
    k4 = k.reshape(b, m, num_heads, d)
    v4 = v.reshape(b, m, num_heads, d)
    # scores [B, N, M, H]: keys on axis 2, heads trailing — no layout demand
    scores = jnp.sum(
        (q4 * (1.0 / math.sqrt(d)))[:, :, None, :, :] * k4[:, None, :, :, :],
        axis=-1,
    )
    mask4 = None if key_mask is None else key_mask[:, None, :, None]
    weights = masked_softmax(scores, mask4, axis=2)
    if dropout_rate > 0.0:
        keep, keep_prob = fast_keep_mask(dropout_rng, dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / keep_prob, 0.0)
    out = jnp.sum(weights[..., None] * v4[:, None, :, :, :], axis=2)  # [B,N,H,D]
    return out.reshape(b, n, e)


def lean_single_head_cross_attention(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    wv: jnp.ndarray,
    bv: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Few-query single-head cross-attention with the K/V projections
    reassociated OFF the patch axis.

    The standard path projects the [B, M, F] patch side twice
    (``k = kv@wk + bk``, ``v = kv@wv + bv`` — 2·B·M·F·E FLOPs each) before
    the cheap [B, N, M] score/PV einsums; at the headline ladder those two
    projections plus their backward (dX, dW, and a full-tensor bias-grad
    reduce) are ~1/3 of the whole train step. With ONE head and N ≪ M the
    same math factors through the queries instead:

        scores = (q/√d)·(kv@wk + bk)ᵀ = ((q/√d)@wkᵀ)·kvᵀ + ((q/√d)·bk)
        out    = w·(kv@wv + bv)       = (w·kv)@wv + bv·Σₘw

    so every patch-axis matmul contracts against N=6 queries rather than
    E=256 output features — ~0.4 GFLOP replaces ~34.4 GFLOP of kv-side
    projection per co-attention (B=256, M=512), and the [B, M, E] k/v
    activations (plus their backward) never exist. Exact reassociation:
    bias-through-softmax and bias-through-dropped-weights terms are kept
    (``Σₘw ≠ 1`` under dropout/padding), and the dropout mask is drawn with
    the same [B, 1, N, M] layout as ``attention_core``. Valid only for
    num_heads == 1 (per-head slices of wk would make the q-side contraction
    H× wider); the single-head genomic-guided co-attention is exactly the
    reference's configuration (mcat.py:48, nacagat.py:51).

    q: [B, N, E] (already projected, bias included, pre-scaled by caller's
    convention: raw — scaling happens here); kv: [B, M, F] raw patch-side
    input; wk/wv: [F, E]; bk/bv: [E]. Returns (out [B, N, E],
    weights [B, N, M] — the post-dropout attention map, reference
    blocks.py:188-201 semantics).
    """
    b, n, e = q.shape
    qs = q * (1.0 / math.sqrt(e))
    qk = jnp.dot(qs, wk.T)  # [B, N, F] — tiny
    scores = jnp.einsum("bnf,bmf->bnm", qk, kv) + jnp.dot(qs, bk)[..., None]
    mask3 = None if key_mask is None else key_mask[:, None, :]
    weights = masked_softmax(scores, mask3)
    if dropout_rate > 0.0:
        keep, keep_prob = fast_keep_mask(
            dropout_rng, dropout_rate, (b, 1, n, weights.shape[-1])
        )
        weights = jnp.where(keep[:, 0], weights / keep_prob, 0.0)
    pooled = jnp.einsum("bnm,bmf->bnf", weights, kv)
    sumw = jnp.sum(weights, axis=-1, keepdims=True)  # [B, N, 1]
    out = jnp.dot(pooled, wv) + bv * sumw
    return out, weights


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    pre_gate: bool,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng=None,
    need_weights: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled-dot attention on projected heads.

    q: [B, H, N, D]; k, v: [B, H, M, D]; key_mask: [B, M] bool (True = valid).
    With ``pre_gate``, scores are multiplied by (tanh(q)·tanh(k)^T + 1)/2
    before softmax (reference: blocks.py:185-187). Returns (out [B,H,N,D],
    weights [B,H,N,M] or None).
    """
    d = q.shape[-1]
    scores = jnp.einsum("bhnd,bhmd->bhnm", q / math.sqrt(d), k)
    if pre_gate:
        p = (jnp.einsum("bhnd,bhmd->bhnm", jnp.tanh(q), jnp.tanh(k)) + 1.0) / 2.0
        scores = scores * p
    mask4 = None if key_mask is None else key_mask[:, None, None, :]
    weights = masked_softmax(scores, mask4)
    if dropout_rate > 0.0 and not deterministic:
        keep, keep_prob = fast_keep_mask(dropout_rng, dropout_rate, weights.shape)
        # torch dropout semantics: returned weights are also the dropped ones
        # (blocks.py:188-201)
        weights = jnp.where(keep, weights / keep_prob, 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
    return out, (weights if need_weights else None)


class MultiheadAttention(nn.Module):
    """Stock nn.MultiheadAttention parity (packed QKV, optional pre-gating).

    Init matches torch: xavier-uniform packed in-projection, zero in/out biases,
    default-Linear out-projection weight (torch MHA._reset_parameters).
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    pre_gate: bool = False
    dtype: Optional[jnp.dtype] = None
    # Route the score/softmax/PV chain through the fused Pallas kernel when
    # weights are not requested (ops/coattn.py). Falls back to XLA otherwise.
    use_pallas: bool = False
    # Sequence-parallel ring attention: when a Mesh with a 'seq' axis > 1 is
    # supplied, self-attention K/V blocks rotate around the ring
    # (parallel/ring.py) — for bags whose patch axis is sharded across chips.
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        *,
        need_weights=True,
        average_attn_weights: bool = True,
        deterministic: bool = True,
        return_projected_q: bool = False,
    ):
        """``need_weights``: True returns the full [B, N, M] weights; False
        returns None (enables the fused kernels); "ssq" returns the per-query
        sum of squares of the final attention weights [B, N] — enough for the
        cesar loss's ||A||_2 penalty (reference: loss.py:97-98) without
        materializing N x M."""
        want_ssq = need_weights == "ssq"
        e = self.embed_dim
        in_kernel = self.param("in_proj_kernel", xavier_uniform_packed_init, (e, 3 * e))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))

        # bias cast matters: an f32 bias would silently promote q/k/v (and
        # with them the whole attention chain over up to 24k-patch keys) back
        # to f32 on the bf16 compute path — same pattern as TorchLinear
        from jax.ad_checkpoint import checkpoint_name

        # 'remat_big': under tpu.remat (train/loop.py policy) the backward
        # recomputes the projections instead of storing them — k/v over the
        # patch axis are the model's largest residuals. Inert otherwise.
        #
        # Projection FUSION (MXU shape, not math): whenever inputs alias, the
        # separate q/k/v dots collapse into one dot against a contiguous slice
        # of the packed [E, 3E] kernel (torch packs qkv the same way, so the
        # slices need no concat). Per output column the contraction is
        # identical, so results match the split dots; the payoff is the
        # BACKWARD, where dX becomes one well-tiled [.., 2E/3E] matmul instead
        # of 2-3 narrow ones (profiled 675 -> ~250 us/step at the B=256
        # ladder, the k/v dX fusions were running at ~18% MXU efficiency).
        def proj(x, lo, hi):
            w = in_kernel[:, lo * e : hi * e]
            b = in_bias[lo * e : hi * e]
            return checkpoint_name(
                jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
                + b.astype(self.dtype), "remat_big",
            )

        rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        dropout_active = self.dropout_rate > 0.0 and not deterministic
        # Huge self-attention (M x M over patch bags) cannot materialize the
        # score matrix for torch-style attention-probability dropout; on the
        # flash path we drop that single dropout site (all other dropout sites
        # in the layer remain). The reference cannot train at these lengths at
        # all (O(M^2) HBM), so there is no behavior to diverge from. Few-query
        # CO-attention keeps exact dropout semantics at any M: the fused
        # kernel (ops/coattn.py) and the sequence-parallel stat-merge path
        # (parallel/ring.py) both apply it in place.
        # Object identity, not shape equality: a cross-attention call whose N
        # happens to equal M must not be classified self-attention (the huge-M
        # paths drop the dropout site / rotate K-V on the ring — justified
        # only for genuine self-attention). Every in-repo self-attention call
        # passes the same array for q/k/v (ops/transformer.py, ge_nacagat.py).
        self_attn = query is key
        huge = self_attn and key.shape[1] >= 4096
        on_seq_mesh = (
            self.ring_mesh is not None
            and dict(self.ring_mesh.shape).get("seq", 1) > 1
        )
        # Single-head few-query CROSS-attention (the genomic-guided
        # co-attention, mcat.py:48): reassociate the K/V projections off the
        # patch axis — see lean_single_head_cross_attention. Supersedes both
        # the XLA core and the fused kernel here (the kernel still pays the
        # [B, M, E] projections outside itself; lean deletes them). Excluded
        # on a seq-sharded mesh (parallel/ring.py owns that layout).
        lean = (
            self.num_heads == 1
            and not self_attn
            and key is value
            and not self.pre_gate
            and query.shape[1] <= 32
            and key.shape[1] > 32
            and not on_seq_mesh
            # benchmarking escape hatch (A/B the reassociation in one window)
            and os.environ.get("MPO_NO_LEAN_ATTENTION") != "1"
        )
        # Pre-gated variant (NaCAGaT, blocks.py:184-188): the pre-gate needs
        # tanh(K) so the K projection cannot reassociate, but the V projection
        # still can — out = (w·kv)@wv + bv·Σw. The Σw (sum of the final
        # post-dropout weights) comes from the materialized weights on the
        # XLA path or from the kernel's sumw side output at large M, so the
        # [B, M, E] v activation and its backward never exist. Excluded for
        # need_weights=True (export wants out == einsum(weights, v) exactly
        # consistent via attention_with_weights).
        lean_v = (
            self.num_heads == 1
            and not self_attn
            and key is value
            and self.pre_gate
            and need_weights is not True
            and query.shape[1] <= 32
            and key.shape[1] > 32
            and not on_seq_mesh
            and os.environ.get("MPO_NO_LEAN_ATTENTION") != "1"
        )
        if lean:
            q = proj(query, 0, 1)
            out_flat, w_lean = lean_single_head_cross_attention(
                q,
                key.astype(self.dtype),
                in_kernel[:, e : 2 * e].astype(self.dtype),
                in_bias[e : 2 * e].astype(self.dtype),
                in_kernel[:, 2 * e : 3 * e].astype(self.dtype),
                in_bias[2 * e : 3 * e].astype(self.dtype),
                key_mask,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_rng=rng,
            )
        elif lean_v:
            # lean-K + lean-V: NEITHER patch-axis projection happens here.
            # The K projection moves into the fused kernel (eligible shapes;
            # coattn.py fuse_k) or to the dispatcher's XLA fallback; the V
            # projection reassociates onto the [B, N, F] pooled result below.
            q = proj(query, 0, 1)
            qh = kh = vh = None
        else:
            if query is key and key is value:
                q, k, v = jnp.split(proj(query, 0, 3), 3, axis=-1)
            elif key is value:
                q = proj(query, 0, 1)
                k, v = jnp.split(proj(key, 1, 3), 2, axis=-1)
            else:
                q = proj(query, 0, 1)
                k = proj(key, 1, 2)
                v = proj(value, 2, 3)

            qh = _split_heads(q, self.num_heads)
            kh = _split_heads(k, self.num_heads)
            vh = _split_heads(v, self.num_heads)
        # pallas_call has no GSPMD partitioning rule: on a multi-device mesh
        # the fused-kernel branches engage only through the shard_map-composed
        # wrapper (coattn.py::fused_attention_sharded, batch over the data
        # axis), never by calling pallas under the partitioner directly —
        # that would all-gather the sharded operands and run replicated.
        mesh_size = (
            1 if self.ring_mesh is None else int(self.ring_mesh.devices.size)
        )
        if self.use_pallas and mesh_size > 1:
            from multimodal_path_omic_tpu.ops.coattn import sharded_eligible

            pallas_sharded = sharded_eligible(self.ring_mesh, query.shape[0])
            pallas_ok = pallas_sharded
        else:
            pallas_sharded = False
            pallas_ok = self.use_pallas
        ssq = None
        if lean:
            out_h = None
            weights = w_lean[:, None] if need_weights is True else None
            if want_ssq:
                # 1 head: the head-averaged weights ARE the weights
                ssq = jnp.sum(w_lean * w_lean, axis=-1)  # [B, N]
        elif lean_v:
            from multimodal_path_omic_tpu.ops.coattn import (
                fused_attention_leank,
                fused_attention_leank_sharded,
            )

            kv_flat = key.astype(self.dtype)  # [B, M, F] raw patches
            kw = dict(
                # allow_kernel=False still routes through the dispatcher so
                # the XLA fallback shows up in DISPATCH_COUNTS like every
                # other path (ADVICE r4)
                allow_kernel=pallas_ok or pallas_sharded,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_rng=rng,
                need_ssq=want_ssq,
                need_sumw=True,
            )
            wk_mat = in_kernel[:, e : 2 * e].astype(self.dtype)
            bk_vec = in_bias[e : 2 * e].astype(self.dtype)
            if pallas_sharded:
                res = fused_attention_leank_sharded(
                    q, kv_flat, wk_mat, bk_vec, key_mask,
                    mesh=self.ring_mesh, **kw,
                )
            else:
                res = fused_attention_leank(
                    q, kv_flat, wk_mat, bk_vec, key_mask, **kw
                )
            if want_ssq:
                out_raw, ssq, sumw = res  # [B, N, F], [B, N], [B, N]
            else:
                out_raw, sumw = res
            wv = in_kernel[:, 2 * e : 3 * e].astype(self.dtype)
            bv = in_bias[2 * e : 3 * e].astype(self.dtype)
            # V-projection applied AFTER the patch-axis contraction: [B, N, F]
            # @ [F, E] + bias weighted by the row's surviving weight mass
            out_flat = (
                jnp.dot(out_raw.astype(self.dtype), wv)
                + bv * sumw[:, :, None].astype(self.dtype)
            )
            out_h = None
            weights = None
        elif (
            on_seq_mesh
            and self_attn
            and not self.pre_gate  # ring_self_attention has no pre-gate path
            and need_weights is False
            and (not dropout_active or huge)
        ):
            # self-attention: K/V blocks rotate around the ring
            from multimodal_path_omic_tpu.parallel.ring import ring_self_attention

            out_h = ring_self_attention(qh, kh, vh, key_mask, self.ring_mesh)
            weights = None
        elif (
            on_seq_mesh
            and not self_attn
            and query.shape[1] <= 256
            and (need_weights is False or (want_ssq and self.num_heads == 1))
        ):
            # few-query cross-attention: local shard attention + stat merge.
            # Engages with dropout ACTIVE (the reference's default training
            # config, blocks.py:188-190) — shard-local seeded masks keep
            # exact torch dropout semantics (VERDICT r2 #2).
            from multimodal_path_omic_tpu.parallel.ring import (
                sequence_parallel_cross_attention,
            )

            res = sequence_parallel_cross_attention(
                qh, kh, vh, key_mask, self.ring_mesh,
                pre_gate=self.pre_gate,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_rng=rng,
                need_ssq=want_ssq,
            )
            out_h, ssq = res if want_ssq else (res, None)
            weights = None
        elif (
            need_weights is False
            and not self.pre_gate
            and query.shape[1] <= 32
            and key.shape[1] <= 32
        ):
            # few-token fast path (6-token branch transformers): elementwise
            # formulation, no head-split transposes — see tiny_attention
            out_flat = tiny_attention(
                q, k, v, key_mask, self.num_heads,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_rng=rng,
            )
            out_h = None
            weights = None
        elif pallas_ok and (
            need_weights is False or (want_ssq and self.num_heads == 1)
        ) and not (dropout_active and huge):
            from multimodal_path_omic_tpu.ops.coattn import (
                fused_attention,
                fused_attention_sharded,
            )

            kw = dict(
                pre_gate=self.pre_gate,
                dropout_rate=self.dropout_rate if dropout_active else 0.0,
                dropout_rng=rng,
                need_ssq=want_ssq,
            )
            if pallas_sharded:
                res = fused_attention_sharded(
                    qh, kh, vh, key_mask, mesh=self.ring_mesh, **kw
                )
            else:
                res = fused_attention(qh, kh, vh, key_mask, **kw)
            out_h, ssq = res if want_ssq else (res, None)
            weights = None
        elif pallas_ok and need_weights is False and dropout_active and huge:
            # giant self-attention: flash path, dropout site dropped (see above)
            from multimodal_path_omic_tpu.ops.coattn import (
                fused_attention,
                fused_attention_sharded,
            )

            if pallas_sharded:
                out_h = fused_attention_sharded(
                    qh, kh, vh, key_mask, mesh=self.ring_mesh,
                    pre_gate=self.pre_gate,
                )
            else:
                out_h = fused_attention(
                    qh, kh, vh, key_mask, pre_gate=self.pre_gate
                )
            weights = None
        elif (
            self.use_pallas
            and mesh_size == 1  # export path: un-shard_map'd pallas kernels
            and need_weights is True
            and not dropout_active
            and not self_attn
        ):
            # attention-map EXPORT: chunked two-pass weights emission — the
            # N x M map is streamed tile-by-tile to HBM as the final artifact
            # (scores + pre-gate never materialize); off-eligible shapes fall
            # back to the XLA core inside (SURVEY §7.1, VERDICT r2 #6)
            from multimodal_path_omic_tpu.ops.coattn import attention_with_weights

            out_h, weights = attention_with_weights(
                qh, kh, vh, key_mask, pre_gate=self.pre_gate
            )
        else:
            out_h, weights = attention_core(
                qh,
                kh,
                vh,
                key_mask,
                pre_gate=self.pre_gate,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                dropout_rng=rng,
                need_weights=bool(need_weights),
            )
            if want_ssq:
                # non-pallas/multi-head ssq: reduce the materialized weights,
                # head-averaged — matching the reference's RETURNED weights,
                # which are what the cesar norm consumes (blocks.py:199-201)
                w = weights.mean(axis=1)
                ssq = jnp.sum(w * w, axis=-1)  # [B, N]
                weights = None
        out = out_flat if out_h is None else _merge_heads(out_h)
        # torch MHA zero-inits out_proj.bias (_reset_parameters / blocks.py:86)
        out = TorchLinear(
            e, dtype=self.dtype, bias_init=nn.initializers.zeros, name="out_proj"
        )(out)
        if weights is not None and average_attn_weights:
            weights = weights.mean(axis=1)  # [B, N, M]
        if want_ssq and ssq is not None and ssq.ndim == 3:
            ssq = ssq[:, 0]  # kernel path emits [B, H=1, N]
        second = ssq if want_ssq else weights
        if return_projected_q:
            return out, second, q
        return out, second


class ContextualAttentionGate(nn.Module):
    """CAG (reference: blocks.py:232-253).

    G = LN(ELU(fc1(Q) + fc2(Q_hat))); E = LN(ELU(fc3(Q_hat)));
    C = ELU(fc_c(G * E)). fc1/2/3 already end in ELU (double ELU is faithful).
    """

    dim: int = 256
    hidden_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, q_hat: jnp.ndarray) -> jnp.ndarray:
        act = jax.nn.elu
        fc1 = act(TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc1")(q))
        fc2 = act(TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc2")(q_hat))
        fc3 = act(TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc3")(q_hat))
        g = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_g")(act(fc1 + fc2))
        e = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_e")(act(fc3))
        c = act(TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc_c")(g * e))
        return c


class PreGatingContextualAttention(nn.Module):
    """NaCAGaT co-attention (reference: blocks.py:51-111, 114-206).

    Pre-gated multi-head attention followed by a CAG residual computed from the
    *original* query and the *projected* query (the fork returns q from the
    functional core precisely for this, blocks.py:206,110):

        out, A = PreGatedMHA(Q, K, V);  C = CAG(Q, W_q Q)
        return out + C, A
    """

    embed_dim: int
    num_heads: int = 1
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    ring_mesh: Any = None
    # Route the fused pre-gated kernel (ops/coattn.py) when weights are not
    # requested; the reference always materializes the N x M map twice.
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        average_attn_weights: bool = True,
        need_weights=True,
    ):
        """``need_weights``: True = full [B, N, M] weights (reference
        behavior, nacagat.py:80); False = None (fused-kernel training path);
        "ssq" = per-query weight sum-of-squares for the cesar penalty."""
        attn_out, weights, q_proj = MultiheadAttention(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            pre_gate=True,
            dtype=self.dtype,
            ring_mesh=self.ring_mesh,
            use_pallas=self.use_pallas,
            name="mha",
        )(
            query,
            key,
            value,
            key_mask,
            need_weights=need_weights,
            average_attn_weights=average_attn_weights,
            deterministic=deterministic,
            return_projected_q=True,
        )
        c = ContextualAttentionGate(
            dim=self.embed_dim, hidden_dim=self.embed_dim, dtype=self.dtype, name="cag"
        )(query, q_proj)
        return attn_out + c, weights


class PreGatedAttention(nn.Module):
    """Standalone pre-gated cross-attention (reference: blocks.py:209-229).

    Faithful quirks: ``scores = QK^T / scale`` with ``scale = 1/sqrt(dk)`` —
    i.e. scores are *multiplied* by sqrt(dk) (blocks.py:213,225) — and the
    pre-gate P is computed but **not** applied in this block (blocks.py:224-225).
    """

    dk: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, key_mask=None):
        q = TorchLinear(self.dk, dtype=self.dtype, name="fc_q")(x2)
        k = TorchLinear(self.dk, dtype=self.dtype, name="fc_k")(x1)
        v = TorchLinear(self.dk, dtype=self.dtype, name="fc_v")(x1)
        qk = jnp.einsum("...nd,...md->...nm", q, k)
        scores = qk * math.sqrt(self.dk)  # faithful: divide by 1/sqrt(dk)
        mask = None if key_mask is None else key_mask[..., None, :]
        weights = masked_softmax(scores, mask)
        q_hat = jnp.einsum("...nm,...md->...nd", weights, v)
        return q, q_hat, weights


class PreGatingContextualAttentionGate(nn.Module):
    """PCAG composite (reference: blocks.py:256-285).

    PreGatedAttention -> CAG -> final_fc(Q); the reference returns
    ``(final_fc(Q), attention_weights)`` with the ``Q + C`` residual commented
    out (blocks.py:284-285) — reproduced as-is. Not used by any model driver.
    """

    dk: int = 256
    output_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, key_mask=None):
        q, q_hat, weights = PreGatedAttention(dk=self.dk, dtype=self.dtype, name="pg_coattn")(
            x1, x2, key_mask
        )
        _c = ContextualAttentionGate(
            dim=self.dk, hidden_dim=self.output_dim, dtype=self.dtype, name="cag"
        )(q, q_hat)
        out = jax.nn.relu(
            TorchLinear(self.output_dim, dtype=self.dtype, name="final_fc")(q)
        )
        return out, weights
