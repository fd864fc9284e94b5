"""Fused (pre-gated) co-attention — custom Pallas TPU kernel + dispatcher.

The MIL co-attention shape is extreme: N <= ~128 omic queries against M up to
~24k patch keys (reference: mcat.py:97, nacagat.py:93). The reference
materializes the N x M score matrix — twice for the pre-gated variant, since
the gate ``P = (tanh(Q)tanh(K)^T + 1)/2`` is a second N x M matmul
(reference: blocks.py:184-187). This kernel:

* keeps the whole (padded) query block resident in VMEM,
* streams K/V tiles with an online softmax (never materializes N x M in HBM),
* computes the pre-gate tile-locally and fuses it into the score tile,
* applies bag-length masking per tile,
* optionally applies torch-style attention-probability DROPOUT in-kernel
  (reference: blocks.py:188-190 applies p=0.25 dropout to the normalized
  weights during training) using the TPU PRNG — the mask is regenerated
  bit-identically in the backward pass from the same per-(batch, tile) seed,
* optionally emits the per-query-row sum of squares of the final (post-
  dropout) attention weights (``ssq``) so the cesar loss's ||A||_2 penalty
  (reference: loss.py:97-98) runs on the fused path without ever
  materializing the N x M map,
* implements a recompute backward (custom_vjp): dV/dK per KV tile, dQ
  accumulated in VMEM scratch — flash-attention style, plus the gate's
  tanh backward terms and the dropout/ssq chain terms.

Dropout semantics match torch exactly: weights are normalized FIRST, then
dropped and rescaled by 1/keep (torch's F.dropout on softmax output). Online:
the normalizer l accumulates undropped probabilities; the dropped tile
probabilities feed the output accumulator and the ssq accumulator.

Dispatch (``fused_attention``): few-query shapes -> this kernel; big
self-attention shapes (M x M, GE-NaCAGaT path) -> the production
``jax.experimental.pallas.ops.tpu.flash_attention`` kernel via ops/flash.py;
anything unsupported -> the XLA einsum path (ops/attention.py). In-kernel
dropout needs the hardware PRNG, so the dropout path dispatches on TPU only
(interpret mode cannot emulate ``prng_seed``); CPU falls back to XLA.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_path_omic_tpu.ops.attention import attention_core

NEG = -0.7 * 3.4e38  # finite mask value (avoids exp(-inf - -inf) NaNs)
DEFAULT_BLOCK_K = 512
LANES = 128

# Trace-time dispatch counters (test observability: asserting that a model
# step actually engages the kernel, VERDICT r1 item 9). Incremented when
# fused_attention TRACES a path, i.e. once per compiled specialization.
DISPATCH_COUNTS = {"kernel": 0, "flash": 0, "xla": 0}

# Test hook: pretend the platform supports in-kernel PRNG dropout so CPU
# tests can trace (not execute) the dropout kernel path structurally.
_FORCE_KERNEL_DROPOUT = False


def kernel_dropout_available() -> bool:
    """In-kernel dropout needs the TPU PRNG (no interpret-mode emulation)."""
    return _FORCE_KERNEL_DROPOUT or jax.devices()[0].platform == "tpu"


def _dropout_threshold(rate: float) -> int:
    """uint32 threshold t such that P(bits < t) = rate."""
    return min(int(rate * 4294967296.0), 4294967295)


# =============================================================================
# Forward kernel
# =============================================================================


def _make_fwd_kernel(*, sm_scale: float, pre_gate: bool, dropout_rate: float,
                     emit_ssq: bool, emit_sumw: bool = False,
                     fuse_k: bool = False):
    """``fuse_k``: the K side arrives as RAW patch features ``kv [BK, F]``
    plus the projection ``wk [F, E]`` / ``bk [1, E]``; the kernel computes
    ``k = kv @ wk + bk`` tile-locally in VMEM, so the [B, M, E] k activation
    never exists in HBM (VERDICT r4 #1 — the NaCAGaT lean-K move; the
    reference materializes it at blocks.py:156). V is the raw ``kv`` itself
    (the caller reassociates the V projection off the patch axis, see
    ops/attention.py lean-V), so the output accumulator is [NP, F]."""
    use_dropout = dropout_rate > 0.0

    def kernel(*refs):
        i = 0
        if fuse_k:
            q_ref, kv_ref, wk_ref, bk_ref, mask_ref = refs[i : i + 5]
            i += 5
        else:
            q_ref, k_ref, v_ref, mask_ref = refs[i : i + 4]
            i += 4
        seed_ref = None
        if use_dropout:
            seed_ref = refs[i]
            i += 1
        o_ref, l_ref, m_ref = refs[i : i + 3]
        i += 3
        ssq_ref = None
        if emit_ssq:
            ssq_ref = refs[i]
            i += 1
        sumw_ref = None
        if emit_sumw:
            sumw_ref = refs[i]
            i += 1
        m_scr, l_scr, acc_scr = refs[i : i + 3]
        i += 3
        ssq_scr = None
        if emit_ssq:
            ssq_scr = refs[i]
            i += 1
        sumw_scr = refs[i] if emit_sumw else None

        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)
            if emit_ssq:
                ssq_scr[...] = jnp.zeros_like(ssq_scr)
            if emit_sumw:
                sumw_scr[...] = jnp.zeros_like(sumw_scr)

        q = q_ref[0]  # [NP, D]
        if fuse_k:
            kv = kv_ref[0]  # [BK, F] raw patch features
            # k projected tile-locally; cast back to the input dtype so the
            # numerics match the XLA path's compute-dtype projection
            k = (
                jax.lax.dot(
                    kv, wk_ref[...], preferred_element_type=jnp.float32
                )
                + bk_ref[...]
            ).astype(kv.dtype)
        else:
            k = k_ref[0]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [NP, BK]
        s = s * sm_scale
        if pre_gate:
            # P = (tanh(q) tanh(k)^T + 1) / 2 fused into the scores
            # (reference math: blocks.py:185-187)
            p_gate = jax.lax.dot_general(
                jnp.tanh(q), jnp.tanh(k), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * (p_gate + 1.0) * 0.5
        mask = mask_ref[0, 0]  # [BK] f32 — broadcast over queries
        s = jnp.where(mask[None, :] > 0, s, NEG)

        m_prev = m_scr[:, 0:1]  # [NP, 1]
        l_prev = l_scr[:, 0:1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # [NP, BK]
        # the softmax normalizer uses UNDROPPED probabilities (torch drops
        # after normalization)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        if use_dropout:
            # bit-identical mask regenerated in the backward kernel from the
            # same (seed, batch*tiles + tile) pair (Mosaic's prng_seed takes
            # at most 2 values)
            pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + j)
            bits = pltpu.prng_random_bits(p.shape)
            keep = bits.astype(jnp.uint32) >= jnp.uint32(
                _dropout_threshold(dropout_rate)
            )
            pd = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            pd = p

        v = kv if fuse_k else v_ref[0]  # [BK, D] (fuse_k: raw kv, [BK, F])
        o_curr = jax.lax.dot(pd, v, preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + o_curr
        if emit_ssq:
            ssq_curr = jnp.sum(pd * pd, axis=1, keepdims=True)
            ssq_scr[...] = ssq_scr[...] * (alpha * alpha) + jnp.broadcast_to(
                ssq_curr, ssq_scr.shape
            )
        if emit_sumw:
            # sum of DROPPED probabilities — after the final l_inv scaling
            # this is sum_m w_nm of the final (post-dropout) weights. Exactly
            # 1 for fully-valid rows without dropout; != 1 under dropout.
            sumw_curr = jnp.sum(pd, axis=1, keepdims=True)
            sumw_scr[...] = sumw_scr[...] * alpha + jnp.broadcast_to(
                sumw_curr, sumw_scr.shape
            )

        @pl.when(j == pl.num_programs(1) - 1)
        def _store():
            l_fin = l_scr[:, 0:1]
            l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            l_ref[0, 0] = l_scr[:, 0]
            m_ref[0, 0] = m_scr[:, 0]
            if emit_ssq:
                ssq_ref[0, 0] = ssq_scr[:, 0] * (l_inv * l_inv)[:, 0]
            if emit_sumw:
                sumw_ref[0, 0] = sumw_scr[:, 0] * l_inv[:, 0]

    return kernel


def _coattn_fwd_impl(
    q, k, v, mask_f, seed, *, pre_gate: bool, block_k: int, interpret: bool,
    dropout_rate: float, emit_ssq: bool, emit_sumw: bool = False,
    wk=None, bk=None,
):
    """``wk``/``bk`` non-None selects the fuse_k variant: ``k`` is the RAW
    patch tensor kv [B, M, F] (``v`` is ignored — it IS kv), the output o is
    the [B, NP, F] raw-value pooling, and the k projection happens in-kernel."""
    fuse_k = wk is not None
    b, np_, d = q.shape
    m_len = k.shape[1]
    f_dim = k.shape[2]  # == d unless fuse_k (raw feature width F)
    sm_scale = 1.0 / (d**0.5)
    grid = (b, m_len // block_k)
    use_dropout = dropout_rate > 0.0
    kernel = _make_fwd_kernel(
        sm_scale=sm_scale, pre_gate=pre_gate, dropout_rate=dropout_rate,
        emit_ssq=emit_ssq, emit_sumw=emit_sumw, fuse_k=fuse_k,
    )
    if fuse_k:
        in_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, f_dim), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((f_dim, d), lambda b_, j: (0, 0)),
            pl.BlockSpec((1, d), lambda b_, j: (0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
        ]
        inputs = [q, k, wk, bk, mask_f]
    else:
        in_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
        ]
        inputs = [q, k, v, mask_f]
    if use_dropout:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)
    o_dim = f_dim if fuse_k else d
    out_specs = [
        pl.BlockSpec((1, np_, o_dim), lambda b_, j: (b_, 0, 0)),
        pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, np_, o_dim), q.dtype),
        jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
    ]
    if emit_ssq:
        out_specs.append(pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, 1, np_), jnp.float32))
    if emit_sumw:
        out_specs.append(pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, 1, np_), jnp.float32))
    scratch_shapes = [
        pltpu.VMEM((np_, LANES), jnp.float32),
        pltpu.VMEM((np_, LANES), jnp.float32),
        pltpu.VMEM((np_, o_dim), jnp.float32),
    ]
    if emit_ssq:
        scratch_shapes.append(pltpu.VMEM((np_, LANES), jnp.float32))
    if emit_sumw:
        scratch_shapes.append(pltpu.VMEM((np_, LANES), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    outs = list(outs)
    o, l, m = outs[:3]
    i = 3
    ssq = None
    if emit_ssq:
        ssq = outs[i]
        i += 1
    sumw = outs[i] if emit_sumw else None
    return o, l, m, ssq, sumw


# =============================================================================
# Backward kernel (recompute per KV tile)
# =============================================================================


def _make_bwd_kernel(*, sm_scale: float, pre_gate: bool, dropout_rate: float,
                     emit_ssq: bool, emit_sumw: bool = False,
                     fuse_k: bool = False):
    """fuse_k backward: recompute ``k = kv @ wk + bk`` per tile, then fold
    the projection backward in-kernel — dkv carries BOTH chain terms
    (the value path ``pd^T dO`` and the key path ``dk wk^T``) in one write,
    and the weight grads accumulate across the whole grid into the dwk/dbk
    output blocks (their index_map is constant, so the blocks stay VMEM-
    resident; both grid dims run 'arbitrary' = sequential). The [B, M, E]
    dk tensor never exists in HBM."""
    use_dropout = dropout_rate > 0.0

    def kernel(*refs):
        i = 0
        wk_ref = bk_ref = None
        if fuse_k:
            q_ref, kv_ref, wk_ref, bk_ref, mask_ref = refs[i : i + 5]
            i += 5
        else:
            q_ref, k_ref, v_ref, mask_ref = refs[i : i + 4]
            i += 4
        seed_ref = None
        if use_dropout:
            seed_ref = refs[i]
            i += 1
        do_ref, l_ref, m_ref, di_ref = refs[i : i + 4]
        i += 4
        dssq_ref = None
        if emit_ssq:
            dssq_ref = refs[i]
            i += 1
        dsumw_ref = None
        if emit_sumw:
            dsumw_ref = refs[i]
            i += 1
        if fuse_k:
            dq_ref, dkv_ref, dwk_ref, dbk_ref = refs[i : i + 4]
            i += 4
        else:
            dq_ref, dk_ref, dv_ref = refs[i : i + 3]
            i += 3
        dq_scr = refs[i]

        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)

        if fuse_k:

            @pl.when((b == 0) & (j == 0))
            def _init_w():
                dwk_ref[...] = jnp.zeros_like(dwk_ref)
                dbk_ref[...] = jnp.zeros_like(dbk_ref)

        q = q_ref[0]
        if fuse_k:
            kv = kv_ref[0]  # [BK, F]
            k = (
                jax.lax.dot(
                    kv, wk_ref[...], preferred_element_type=jnp.float32
                )
                + bk_ref[...]
            ).astype(kv.dtype)
            v = kv
        else:
            k = k_ref[0]
            v = v_ref[0]
        do = do_ref[0]  # [NP, D]
        l_vec = l_ref[0, 0][:, None]  # [NP, 1]
        m_vec = m_ref[0, 0][:, None]
        # di = rowsum(W_dropped * (do V^T)) + 2 * dssq * ssq, precomputed on
        # the host side of the kernel boundary (sum(o*do) + 2*dssq*ssq)
        di = di_ref[0, 0][:, None]  # [NP, 1]

        a = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * sm_scale
        )
        if pre_gate:
            tq = jnp.tanh(q)
            tk = jnp.tanh(k)
            u = jax.lax.dot_general(
                tq, tk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            gate = (u + 1.0) * 0.5
            s = a * gate
        else:
            s = a
        mask = mask_ref[0, 0]
        s = jnp.where(mask[None, :] > 0, s, NEG)

        l_inv = jnp.where(l_vec == 0.0, 1.0, 1.0 / l_vec)
        p = jnp.exp(s - m_vec) * l_inv  # normalized (undropped) weights [NP, BK]

        if use_dropout:
            # same bits as the forward pass: same seed, same folded (b, j)
            # index, same shape
            pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + j)
            bits = pltpu.prng_random_bits(p.shape)
            keep = bits.astype(jnp.uint32) >= jnp.uint32(
                _dropout_threshold(dropout_rate)
            )
            pd = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            pd = p

        # dV = W_dropped^T dO ([BK, D]; fuse_k: the value-path term of dkv)
        dv_tile = jax.lax.dot_general(
            pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not fuse_k:
            dv_ref[0] = dv_tile.astype(dv_ref.dtype)

        # softmax backward with post-softmax dropout (+ optional ssq output):
        #   ds = D*(do V^T) + 2*dssq*D*D - p*di
        # where D = dropped normalized weights, p = undropped normalized
        # weights, di = rowsum(o*do) + 2*dssq*ssq (see module docstring math).
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = pd * dp - p * di
        if emit_ssq:
            dssq = dssq_ref[0, 0][:, None]  # [NP, 1]
            ds = ds + 2.0 * dssq * pd * pd
        if emit_sumw:
            # sumw = sum_m D_nm is LINEAR in the dropped normalized weights:
            # ds += dsumw * D (and di gains + dsumw * sumw on the host side,
            # the linear analogue of the ssq chain terms)
            dsumw = dsumw_ref[0, 0][:, None]  # [NP, 1]
            ds = ds + dsumw * pd
        ds = jnp.where(mask[None, :] > 0, ds, 0.0)

        if pre_gate:
            da = ds * gate
            du = ds * a * 0.5
            # dq += sm_scale * da k + (1 - tanh(q)^2) * (du tanh(k))
            dq_scr[...] += sm_scale * jax.lax.dot(
                da, k, preferred_element_type=jnp.float32
            ) + (1.0 - tq * tq) * jax.lax.dot(
                du, tk, preferred_element_type=jnp.float32
            )
            # dk = sm_scale * da^T q + (1 - tanh(k)^2) * (du^T tanh(q))
            dk_tile = (
                sm_scale
                * jax.lax.dot_general(
                    da, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                + (1.0 - tk * tk)
                * jax.lax.dot_general(
                    du, tq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        else:
            dq_scr[...] += sm_scale * jax.lax.dot(
                ds, k, preferred_element_type=jnp.float32
            )
            dk_tile = sm_scale * jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        if fuse_k:
            # projection backward, folded per tile: dkv = dv + dk wk^T,
            # dwk += kv^T dk, dbk += colsum(dk) — dk never leaves VMEM
            dkv_ref[0] = (
                dv_tile
                + jax.lax.dot_general(
                    dk_tile,
                    wk_ref[...],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(dkv_ref.dtype)
            dwk_ref[...] += jax.lax.dot_general(
                kv, dk_tile, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dwk_ref.dtype)
            dbk_ref[...] += jnp.sum(dk_tile, axis=0, keepdims=True).astype(
                dbk_ref.dtype
            )
        else:
            dk_ref[0] = dk_tile.astype(dk_ref.dtype)

        @pl.when(j == pl.num_programs(1) - 1)
        def _store():
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    return kernel


def _coattn_bwd_impl(
    q, k, v, mask_f, seed, do, l, m, di, dssq, dsumw=None, *, pre_gate: bool,
    block_k: int, interpret: bool, dropout_rate: float, emit_ssq: bool,
    emit_sumw: bool = False, wk=None, bk=None,
):
    """fuse_k (``wk``/``bk`` non-None): ``k`` is raw kv [B, M, F], ``v`` is
    ignored, ``do`` is [B, NP, F]; returns (dq, dkv, dwk, dbk) instead of
    (dq, dk, dv)."""
    fuse_k = wk is not None
    b, np_, d = q.shape
    m_len = k.shape[1]
    f_dim = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    grid = (b, m_len // block_k)
    use_dropout = dropout_rate > 0.0
    kernel = _make_bwd_kernel(
        sm_scale=sm_scale, pre_gate=pre_gate, dropout_rate=dropout_rate,
        emit_ssq=emit_ssq, emit_sumw=emit_sumw, fuse_k=fuse_k,
    )
    if fuse_k:
        in_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, f_dim), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((f_dim, d), lambda b_, j: (0, 0)),
            pl.BlockSpec((1, d), lambda b_, j: (0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
        ]
        inputs = [q, k, wk, bk, mask_f]
    else:
        in_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
        ]
        inputs = [q, k, v, mask_f]
    if use_dropout:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(seed)
    o_dim = f_dim if fuse_k else d
    in_specs += [
        pl.BlockSpec((1, np_, o_dim), lambda b_, j: (b_, 0, 0)),
        pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
    ]
    inputs += [do, l, m, di]
    if emit_ssq:
        in_specs.append(pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)))
        inputs.append(dssq)
    if emit_sumw:
        in_specs.append(pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)))
        inputs.append(dsumw)
    if fuse_k:
        out_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, f_dim), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((f_dim, d), lambda b_, j: (0, 0)),
            pl.BlockSpec((1, d), lambda b_, j: (0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, np_, d), q.dtype),
            jax.ShapeDtypeStruct((b, m_len, f_dim), k.dtype),
            jax.ShapeDtypeStruct((f_dim, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ]
        # the dwk/dbk blocks accumulate across BOTH grid dims — sequential
        # execution required, so the batch dim cannot be 'parallel' here
        semantics = ("arbitrary", "arbitrary")
    else:
        out_specs = [
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, np_, d), q.dtype),
            jax.ShapeDtypeStruct((b, m_len, d), k.dtype),
            jax.ShapeDtypeStruct((b, m_len, d), v.dtype),
        ]
        semantics = ("parallel", "arbitrary")
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((np_, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(*inputs)
    return tuple(outs)


# =============================================================================
# custom_vjp wrapper
# =============================================================================


def _coattn_out(o, ssq, sumw, emit_ssq, emit_sumw):
    """Output pytree: o alone, or a tuple extended by the requested extras
    (ssq then sumw, each [B, NP] rows)."""
    if not emit_ssq and not emit_sumw:
        return o
    extras = []
    if emit_ssq:
        extras.append(ssq[:, 0, :])
    if emit_sumw:
        extras.append(sumw[:, 0, :])
    return tuple([o] + extras)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _coattn(q, k, v, mask_f, seed, pre_gate, block_k, interpret, dropout_rate,
            emit_ssq, emit_sumw=False):
    o, _, _, ssq, sumw = _coattn_fwd_impl(
        q, k, v, mask_f, seed, pre_gate=pre_gate, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, emit_ssq=emit_ssq,
        emit_sumw=emit_sumw,
    )
    return _coattn_out(o, ssq, sumw, emit_ssq, emit_sumw)


def _coattn_fwd(q, k, v, mask_f, seed, pre_gate, block_k, interpret,
                dropout_rate, emit_ssq, emit_sumw=False):
    o, l, m, ssq, sumw = _coattn_fwd_impl(
        q, k, v, mask_f, seed, pre_gate=pre_gate, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, emit_ssq=emit_ssq,
        emit_sumw=emit_sumw,
    )
    res = (q, k, v, mask_f, seed, o, l, m, ssq, sumw)
    return _coattn_out(o, ssq, sumw, emit_ssq, emit_sumw), res


def _coattn_bwd(pre_gate, block_k, interpret, dropout_rate, emit_ssq,
                emit_sumw, res, ct):
    q, k, v, mask_f, seed, o, l, m, ssq, sumw = res
    dssq = dsumw = None
    if emit_ssq or emit_sumw:
        cts = list(ct)
        do = cts[0]
        i = 1
        if emit_ssq:
            dssq = cts[i][:, None, :].astype(jnp.float32)  # [B, 1, NP]
            i += 1
        if emit_sumw:
            dsumw = cts[i][:, None, :].astype(jnp.float32)  # [B, 1, NP]
    else:
        do = ct
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]
    if emit_ssq:
        # the ssq cotangent's softmax-backward row term (see module docstring)
        di = di + 2.0 * dssq * ssq
    if emit_sumw:
        # linear analogue for the sum-of-weights output: di += dsumw * sumw
        di = di + dsumw * sumw
    dq, dk, dv = _coattn_bwd_impl(
        q, k, v, mask_f, seed, do, l, m, di, dssq, dsumw,
        pre_gate=pre_gate, block_k=block_k, interpret=interpret,
        dropout_rate=dropout_rate, emit_ssq=emit_ssq, emit_sumw=emit_sumw,
    )
    return dq, dk, dv, None, None


_coattn.defvjp(_coattn_fwd, _coattn_bwd)


# ----- fuse_k variant: in-kernel K projection (raw kv + wk/bk inputs) -------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _coattn_fk(q, kv, wk, bk, mask_f, seed, pre_gate, block_k, interpret,
               dropout_rate, emit_ssq, emit_sumw):
    o, _, _, ssq, sumw = _coattn_fwd_impl(
        q, kv, None, mask_f, seed, pre_gate=pre_gate, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, emit_ssq=emit_ssq,
        emit_sumw=emit_sumw, wk=wk, bk=bk,
    )
    return _coattn_out(o, ssq, sumw, emit_ssq, emit_sumw)


def _coattn_fk_fwd(q, kv, wk, bk, mask_f, seed, pre_gate, block_k, interpret,
                   dropout_rate, emit_ssq, emit_sumw):
    o, l, m, ssq, sumw = _coattn_fwd_impl(
        q, kv, None, mask_f, seed, pre_gate=pre_gate, block_k=block_k,
        interpret=interpret, dropout_rate=dropout_rate, emit_ssq=emit_ssq,
        emit_sumw=emit_sumw, wk=wk, bk=bk,
    )
    res = (q, kv, wk, bk, mask_f, seed, o, l, m, ssq, sumw)
    return _coattn_out(o, ssq, sumw, emit_ssq, emit_sumw), res


def _coattn_fk_bwd(pre_gate, block_k, interpret, dropout_rate, emit_ssq,
                   emit_sumw, res, ct):
    q, kv, wk, bk, mask_f, seed, o, l, m, ssq, sumw = res
    dssq = dsumw = None
    if emit_ssq or emit_sumw:
        cts = list(ct)
        do = cts[0]
        i = 1
        if emit_ssq:
            dssq = cts[i][:, None, :].astype(jnp.float32)
            i += 1
        if emit_sumw:
            dsumw = cts[i][:, None, :].astype(jnp.float32)
    else:
        do = ct
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]
    if emit_ssq:
        di = di + 2.0 * dssq * ssq
    if emit_sumw:
        di = di + dsumw * sumw
    dq, dkv, dwk, dbk = _coattn_bwd_impl(
        q, kv, None, mask_f, seed, do, l, m, di, dssq, dsumw,
        pre_gate=pre_gate, block_k=block_k, interpret=interpret,
        dropout_rate=dropout_rate, emit_ssq=emit_ssq, emit_sumw=emit_sumw,
        wk=wk, bk=bk,
    )
    return dq, dkv, dwk.astype(wk.dtype), dbk.astype(bk.dtype), None, None


_coattn_fk.defvjp(_coattn_fk_fwd, _coattn_fk_bwd)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def coattention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    pre_gate: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
):
    """Fused few-query attention. q: [B, N, D]; k, v: [B, M, D];
    key_mask: [B, M] bool. Returns [B, N, D], extended to a tuple by the
    requested side outputs in order: ``need_ssq`` appends ssq [B, N]
    (per-row sum of squares of the final attention weights, for the cesar
    penalty), ``need_sumw`` appends sumw [B, N] (per-row SUM of the final
    post-dropout weights — the bias-through-dropped-weights term that lets
    the caller reassociate the V projection off the patch axis, see
    ops/attention.py lean-V). Differentiable (custom VJP). ``dropout_rate``
    > 0 applies torch-style attention dropout in-kernel; it requires a [1]
    int32 ``dropout_seed`` and a real TPU (the PRNG has no interpret-mode
    path).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, n, d = q.shape
    m_len = k.shape[1]
    # block_k swept on v5e: 512 optimal; >=2048 exceeds the backward kernel's
    # scoped VMEM (k/v/s tiles), so cap defensively
    block_k = min(block_k, 1024)
    # pad queries to lane width: the MXU operates on 128-wide tiles anyway
    np_ = max(LANES, _round_up(n, LANES))
    if np_ != n:
        q = jnp.pad(q, ((0, 0), (0, np_ - n), (0, 0)))
    bk = min(block_k, m_len)
    if m_len % bk != 0:
        pad_m = _round_up(m_len, bk) - m_len
        k = jnp.pad(k, ((0, 0), (0, pad_m), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_m), (0, 0)))
        if key_mask is None:
            key_mask = jnp.concatenate(
                [jnp.ones((b, m_len), bool), jnp.zeros((b, pad_m), bool)], axis=1
            )
        else:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_m)))
    if key_mask is None:
        mask_f = jnp.ones((b, 1, k.shape[1]), jnp.float32)
    else:
        mask_f = key_mask.astype(jnp.float32)[:, None, :]
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    seed = (
        jnp.asarray(dropout_seed, jnp.int32).reshape(1)
        if dropout_seed is not None
        else jnp.zeros((1,), jnp.int32)
    )
    out = _coattn(
        q, k, v, mask_f, seed, pre_gate, bk, interpret, float(dropout_rate),
        need_ssq, need_sumw,
    )
    if need_ssq or need_sumw:
        o = out[0][:, :n, :]
        return tuple([o] + [extra[:, :n] for extra in out[1:]])
    return out[:, :n, :]


def coattention_fused_k(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    k_weight: jnp.ndarray,
    k_bias: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    pre_gate: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
):
    """Fused few-query PRE-GATED attention with the K projection computed
    in-kernel and the V projection reassociated off the patch axis.

    q: [B, N, E] (projected queries); kv: [B, M, F] RAW patch-side input;
    k_weight: [F, E]; k_bias: [E]. The kernel computes ``k = kv @ wk + bk``
    tile-locally — the [B, M, E] k activation (and its backward dk) never
    exist in HBM (the reference materializes both, blocks.py:156,184-187).
    Returns the raw-value pooling ``w·kv`` [B, N, F] (the caller applies the
    V projection to the N-row result — ops/attention.py lean-V), extended to
    a tuple by ``need_ssq`` (ssq [B, N]) then ``need_sumw`` (sumw [B, N]).
    Differentiable in q, kv, k_weight, k_bias (custom VJP: recompute per
    tile, in-kernel dwk/dbk accumulation)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, n, d = q.shape
    m_len = kv.shape[1]
    # tighter cap than the plain kernel: the fuse_k backward additionally
    # holds kv/k/tanh(k)/dkv/dk tiles + the [F, E] accumulator in VMEM
    block_k = min(block_k, 512)
    np_ = max(LANES, _round_up(n, LANES))
    if np_ != n:
        q = jnp.pad(q, ((0, 0), (0, np_ - n), (0, 0)))
    bk_tile = min(block_k, m_len)
    if m_len % bk_tile != 0:
        pad_m = _round_up(m_len, bk_tile) - m_len
        kv = jnp.pad(kv, ((0, 0), (0, pad_m), (0, 0)))
        if key_mask is None:
            key_mask = jnp.concatenate(
                [jnp.ones((b, m_len), bool), jnp.zeros((b, pad_m), bool)], axis=1
            )
        else:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_m)))
    if key_mask is None:
        mask_f = jnp.ones((b, 1, kv.shape[1]), jnp.float32)
    else:
        mask_f = key_mask.astype(jnp.float32)[:, None, :]
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    seed = (
        jnp.asarray(dropout_seed, jnp.int32).reshape(1)
        if dropout_seed is not None
        else jnp.zeros((1,), jnp.int32)
    )
    out = _coattn_fk(
        q, kv, k_weight, k_bias.reshape(1, -1), mask_f, seed, pre_gate,
        bk_tile, interpret, float(dropout_rate), need_ssq, need_sumw,
    )
    if need_ssq or need_sumw:
        o = out[0][:, :n, :]
        return tuple([o] + [extra[:, :n] for extra in out[1:]])
    return out[:, :n, :]


# =============================================================================
# Chunked attention-weights emission (export/inference path)
# =============================================================================


def _make_weights_kernel(*, sm_scale: float, pre_gate: bool):
    """Pass-2 kernel: recompute each score tile from the pass-1 (l, m) stats
    and stream the NORMALIZED [NP, block_k] weight tile straight to its HBM
    output slot — the full N x M map exists only as the final artifact, never
    as a compute intermediate (and the pre-gate never materializes at all)."""

    def kernel(q_ref, k_ref, mask_ref, l_ref, m_ref, w_ref):
        q = q_ref[0]  # [NP, D]
        k = k_ref[0]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if pre_gate:
            p_gate = jax.lax.dot_general(
                jnp.tanh(q), jnp.tanh(k), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * (p_gate + 1.0) * 0.5
        mask = mask_ref[0, 0]
        s = jnp.where(mask[None, :] > 0, s, NEG)
        l_vec = l_ref[0, 0][:, None]
        m_vec = m_ref[0, 0][:, None]
        l_inv = jnp.where(l_vec == 0.0, 1.0, 1.0 / l_vec)
        w_ref[0] = (jnp.exp(s - m_vec) * l_inv).astype(w_ref.dtype)

    return kernel


def coattention_weights(
    q: jnp.ndarray,
    k: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    pre_gate: bool = False,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Full normalized attention weights [B, N, M] via the two-pass kernel:
    pass 1 runs the fused online-softmax forward for the per-row (l, m)
    stats; pass 2 re-derives each tile and emits it chunked ([N, block_k]
    tiles to HBM). This is the attention-map EXPORT path (reference
    ``need_weights=inference``, mcat.py:97; SURVEY §7.1 'weights-emitting
    path (chunked)') — export semantics at any M without the XLA
    score-materializing fallback. Inference-only (no VJP)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, n, d = q.shape
    m_len = k.shape[1]
    sm_scale = 1.0 / (d**0.5)
    block_k = min(block_k, 1024)
    np_ = max(LANES, _round_up(n, LANES))
    if np_ != n:
        q = jnp.pad(q, ((0, 0), (0, np_ - n), (0, 0)))
    bk = min(block_k, m_len)
    m_pad = _round_up(m_len, bk)
    if m_pad != m_len:
        k = jnp.pad(k, ((0, 0), (0, m_pad - m_len), (0, 0)))
        if key_mask is None:
            key_mask = jnp.concatenate(
                [jnp.ones((b, m_len), bool), jnp.zeros((b, m_pad - m_len), bool)],
                axis=1,
            )
        else:
            key_mask = jnp.pad(key_mask, ((0, 0), (0, m_pad - m_len)))
    if key_mask is None:
        mask_f = jnp.ones((b, 1, m_pad), jnp.float32)
    else:
        mask_f = key_mask.astype(jnp.float32)[:, None, :]

    # pass 1: (l, m) stats from the fused forward (values V are not needed —
    # pass a zero-strided dummy of K's shape)
    _, l, m_stat, _, _ = _coattn_fwd_impl(
        q, k, jnp.zeros_like(k), mask_f, None, pre_gate=pre_gate, block_k=bk,
        interpret=interpret, dropout_rate=0.0, emit_ssq=False,
    )

    kernel = _make_weights_kernel(sm_scale=sm_scale, pre_gate=pre_gate)
    w = pl.pallas_call(
        kernel,
        grid=(b, m_pad // bk),
        in_specs=[
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b_, j: (b_, 0, j)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, bk), lambda b_, j: (b_, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, np_, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, mask_f, l, m_stat)
    return w[:, :n, :m_len]


def attention_with_weights(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    pre_gate: bool = False,
):
    """Kernel-path (out, weights [B, H, N, M]) for need_weights=True export
    shapes: weights via the chunked two-pass emission, output via one einsum
    over the emitted weights (so out and weights are exactly consistent).
    Falls back to the XLA core off-eligible shapes."""
    b, h, n, d = q.shape
    m_len = k.shape[2]
    if not kernel_eligible(n, m_len, d):
        DISPATCH_COUNTS["xla"] += 1
        return attention_core(
            q, k, v, key_mask, pre_gate=pre_gate, dropout_rate=0.0,
            deterministic=True, need_weights=True,
        )
    DISPATCH_COUNTS["kernel"] += 1
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m_len, d)
    mf = None
    if key_mask is not None:
        mf = jnp.repeat(key_mask, h, axis=0) if h > 1 else key_mask
    w = coattention_weights(qf, kf, mf, pre_gate=pre_gate)
    w = w.reshape(b, h, n, m_len)
    out = jnp.einsum("bhnm,bhmd->bhnd", w, v)
    return out.astype(q.dtype), w


# =============================================================================
# Dispatcher used by ops.attention.MultiheadAttention
# =============================================================================


def _xla_fused(q, k, v, key_mask, pre_gate, dropout_rate=0.0, dropout_rng=None,
               need_ssq=False, need_sumw=False):
    out, weights = attention_core(
        q,
        k,
        v,
        key_mask,
        pre_gate=pre_gate,
        dropout_rate=dropout_rate,
        deterministic=dropout_rate <= 0.0,
        dropout_rng=dropout_rng,
        need_weights=need_ssq or need_sumw,
    )
    if not need_ssq and not need_sumw:
        return out
    extras = []
    if need_ssq:
        extras.append(jnp.sum(weights * weights, axis=-1))  # [B, H, N]
    if need_sumw:
        extras.append(jnp.sum(weights, axis=-1))  # [B, H, N]
    return tuple([out] + extras)


def kernel_eligible(n: int, m_len: int, d: int) -> bool:
    """Shape gate for the custom co-attention kernel. Below ~4k keys XLA's
    fused einsums win (measured with hard host syncs; the kernel's fixed
    overhead dominates at small M)."""
    return n <= 256 and m_len >= 4096 and m_len % 256 == 0 and d % 128 == 0


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    pre_gate: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
):
    """Masked (pre-gated) attention without materializing scores in HBM.

    q: [B, H, N, D]; k, v: [B, H, M, D]; key_mask: [B, M] bool or None.
    Returns [B, H, N, D], extended to a tuple by the requested side outputs
    in order: ``need_ssq`` appends ssq [B, H, N], ``need_sumw`` appends the
    per-row sum of the final post-dropout weights [B, H, N] (the lean-V
    bias-through-weights term — ops/attention.py). ``dropout_rate`` applies
    torch-style attention-probability dropout (in-kernel on TPU; XLA
    fallback elsewhere), seeded from ``dropout_rng``.
    """
    b, h, n, d = q.shape
    m_len = k.shape[2]
    dropout_active = dropout_rate > 0.0

    # Few-query path: the custom co-attention kernel (handles pre_gate,
    # dropout, ssq emission). With dropout the kernel pays per-tile PRNG
    # generation; interleaved A/B on v5e (benchmarks/bench_nacagat.py) shows
    # XLA ahead at M=4096 and the kernel ahead from ~8192 up.
    if (
        kernel_eligible(n, m_len, d)
        and (not dropout_active or kernel_dropout_available())
        and (not dropout_active or m_len >= 8192)
    ):
        DISPATCH_COUNTS["kernel"] += 1
        qf = q.reshape(b * h, n, d)
        kf = k.reshape(b * h, m_len, d)
        vf = v.reshape(b * h, m_len, d)
        mf = None
        if key_mask is not None:
            mf = jnp.repeat(key_mask, h, axis=0) if h > 1 else key_mask
        seed = None
        if dropout_active:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        out = coattention(
            qf, kf, vf, mf, pre_gate=pre_gate, dropout_rate=dropout_rate,
            dropout_seed=seed, need_ssq=need_ssq, need_sumw=need_sumw,
        )
        if need_ssq or need_sumw:
            o = out[0].reshape(b, h, n, d)
            return tuple([o] + [e.reshape(b, h, n) for e in out[1:]])
        return out.reshape(b, h, n, d)

    # Long-query self-attention path: library flash kernel (no pre-gate).
    if not pre_gate and not dropout_active and not need_ssq and not need_sumw:
        from multimodal_path_omic_tpu.ops import flash

        if flash.supported(q, k, v):
            DISPATCH_COUNTS["flash"] += 1
            return flash.flash_attention(q, k, v, key_mask)

    DISPATCH_COUNTS["xla"] += 1
    return _xla_fused(
        q, k, v, key_mask, pre_gate,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng, need_ssq=need_ssq,
        need_sumw=need_sumw,
    )


def sharded_eligible(mesh, batch: int) -> bool:
    """Gate for the shard_map-composed dispatch of :func:`fused_attention`
    on a mesh: a pure data-parallel layout (every non-``data`` axis of size
    1 — a sharded patch axis goes through parallel/ring.py instead) whose
    batch splits evenly over the data axis."""
    if mesh is None:
        return False
    shape = dict(mesh.shape)
    data = shape.get("data", 1)
    other = 1
    for name, size in shape.items():
        if name != "data":
            other *= size
    return data > 1 and other == 1 and batch % data == 0


def fused_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    mesh,
    pre_gate: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
):
    """:func:`fused_attention` composed onto a data-parallel mesh.

    GSPMD has no partitioning rule for ``pallas_call``: under a multi-device
    mesh the partitioner all-gathers the sharded operands and runs the kernel
    replicated on every device, undoing the data sharding exactly at the big
    buckets the kernel targets. ``shard_map`` is the composition rule instead
    (same pattern as ops/gather.py::take_rows_sharded): attention is
    batch-independent, so each device runs the full dispatch (custom kernel /
    flash / XLA by local shape) on its local [B/data, ...] shard with zero
    collectives. Dropout keys fold in the device's data-axis index so shards
    draw independent masks. Callers gate on :func:`sharded_eligible`.
    """
    from jax.sharding import PartitionSpec as P

    bspec = P("data", None, None, None)
    dropout_active = dropout_rate > 0.0
    have_mask = key_mask is not None

    def local_fn(*args):
        it = iter(args)
        ql, kl, vl = next(it), next(it), next(it)
        ml = next(it) if have_mask else None
        rngl = next(it) if dropout_active else None
        if rngl is not None:
            rngl = jax.random.fold_in(rngl, jax.lax.axis_index("data"))
        return fused_attention(
            ql, kl, vl, ml, pre_gate=pre_gate, dropout_rate=dropout_rate,
            dropout_rng=rngl, need_ssq=need_ssq, need_sumw=need_sumw,
        )

    in_specs = [bspec, bspec, bspec]
    args = [q, k, v]
    if have_mask:
        in_specs.append(P("data", None))
        args.append(key_mask)
    if dropout_active:
        in_specs.append(P())
        args.append(dropout_rng)
    n_extras = int(need_ssq) + int(need_sumw)
    if n_extras:
        out_specs = tuple([bspec] + [P("data", None, None)] * n_extras)
    else:
        out_specs = bspec
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)


# =============================================================================
# Lean-K dispatch: pre-gated co-attention straight from RAW patch features
# =============================================================================


def leank_eligible(n: int, m_len: int, e: int, f: int) -> bool:
    """Shape gate for the in-kernel-K-projection variant. Same few-query
    envelope as :func:`kernel_eligible`, plus the raw feature width F must
    tile the lanes. The min-M crossover is its own knob
    (``MPO_LEANK_MIN_M``): deleting the [B, M, E] K projection + its
    backward from HBM shifts the kernel-vs-XLA break-even below the plain
    kernel's 4096 (re-measured per round on hardware, docs/performance.md)."""
    min_m = int(os.environ.get("MPO_LEANK_MIN_M", "4096"))
    return (
        n <= 256
        and m_len >= min_m
        and m_len % 256 == 0
        and e % 128 == 0
        and f % 128 == 0
    )


def fused_attention_leank(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    allow_kernel: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
):
    """Pre-gated lean attention from RAW patch features: the K projection
    happens in-kernel (eligible shapes) or as a plain XLA matmul (fallback);
    either way the VALUE side is the raw ``kv`` — the caller reassociates
    the V projection onto the [B, N, F] result (ops/attention.py lean-V).

    q: [B, N, E] projected queries; kv: [B, M, F] raw patch-side input;
    wk: [F, E]; bk: [E]. Returns the raw-value pooling [B, N, F], extended
    to a tuple by ``need_ssq`` then ``need_sumw`` ([B, N] each). On the
    kernel path neither the [B, M, E] k activation nor its backward dk ever
    exist in HBM (the reference materializes both, blocks.py:156,184-187);
    the XLA fallback still materializes k — the pre-gate's tanh pins the
    projection to the patch axis there.
    """
    b, n, e = q.shape
    m_len, f_dim = kv.shape[1], kv.shape[2]
    dropout_active = dropout_rate > 0.0
    if (
        allow_kernel
        and leank_eligible(n, m_len, e, f_dim)
        and (not dropout_active or kernel_dropout_available())
        and (not dropout_active or m_len >= 8192)
    ):
        DISPATCH_COUNTS["kernel"] += 1
        seed = None
        if dropout_active:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        return coattention_fused_k(
            q, kv, wk, bk, key_mask, pre_gate=True,
            dropout_rate=dropout_rate, dropout_seed=seed,
            need_ssq=need_ssq, need_sumw=need_sumw,
        )
    DISPATCH_COUNTS["xla"] += 1
    from jax.ad_checkpoint import checkpoint_name

    # same remat class as the in-projections (ops/attention.py proj): the
    # [B, M, E] activation is recomputed, not stored, under tpu.remat
    k = checkpoint_name(jnp.dot(kv, wk) + bk, "remat_big")
    res = _xla_fused(
        q[:, None], k[:, None], kv[:, None], key_mask, True,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        need_ssq=need_ssq, need_sumw=need_sumw,
    )
    if not need_ssq and not need_sumw:
        return res[:, 0]
    return tuple([res[0][:, 0]] + [x[:, 0] for x in res[1:]])


def fused_attention_leank_sharded(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    mesh,
    allow_kernel: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    need_ssq: bool = False,
    need_sumw: bool = False,
):
    """:func:`fused_attention_leank` composed onto a data-parallel mesh via
    ``shard_map`` (same rationale as :func:`fused_attention_sharded`:
    GSPMD has no pallas partitioning rule). Batch-carrying operands shard on
    ``data``; the projection weights ride replicated. Dropout keys fold in
    the device's data-axis index. Callers gate on :func:`sharded_eligible`."""
    from jax.sharding import PartitionSpec as P

    bspec = P("data", None, None)
    dropout_active = dropout_rate > 0.0
    have_mask = key_mask is not None

    def local_fn(*args):
        it = iter(args)
        ql, kvl, wkl, bkl = next(it), next(it), next(it), next(it)
        ml = next(it) if have_mask else None
        rngl = next(it) if dropout_active else None
        if rngl is not None:
            rngl = jax.random.fold_in(rngl, jax.lax.axis_index("data"))
        return fused_attention_leank(
            ql, kvl, wkl, bkl, ml, allow_kernel=allow_kernel,
            dropout_rate=dropout_rate, dropout_rng=rngl,
            need_ssq=need_ssq, need_sumw=need_sumw,
        )

    in_specs = [bspec, bspec, P(None, None), P(None)]
    args = [q, kv, wk, bk]
    if have_mask:
        in_specs.append(P("data", None))
        args.append(key_mask)
    if dropout_active:
        in_specs.append(P())
        args.append(dropout_rng)
    n_extras = int(need_ssq) + int(need_sumw)
    if n_extras:
        out_specs = tuple([bspec] + [P("data", None)] * n_extras)
    else:
        out_specs = bspec
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )(*args)
