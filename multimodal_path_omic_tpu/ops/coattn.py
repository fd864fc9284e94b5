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
* implements a recompute backward (custom_vjp): dV/dK per KV tile, dQ
  accumulated in VMEM scratch — flash-attention style, plus the gate's
  tanh backward terms.

Dispatch (``fused_attention``): few-query shapes -> this kernel; big
self-attention shapes (M x M, GE-NaCAGaT path) -> the production
``jax.experimental.pallas.ops.tpu.flash_attention`` kernel via ops/flash.py;
anything unsupported -> the XLA einsum path (ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_path_omic_tpu.ops.attention import attention_core

NEG = -0.7 * 3.4e38  # finite mask value (avoids exp(-inf - -inf) NaNs)
DEFAULT_BLOCK_K = 512
LANES = 128


# =============================================================================
# Forward kernel
# =============================================================================


def _fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, m_ref,
    m_scr, l_scr, acc_scr, *, sm_scale: float, pre_gate: bool, n_kv: int
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [NP, D]
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
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    v = v_ref[0]  # [BK, D]
    o_curr = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + o_curr

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        l_fin = l_scr[:, 0:1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        l_ref[0, 0] = l_scr[:, 0]
        m_ref[0, 0] = m_scr[:, 0]


def _coattn_fwd_impl(q, k, v, mask_f, *, pre_gate: bool, block_k: int, interpret: bool):
    b, np_, d = q.shape
    m_len = k.shape[1]
    sm_scale = 1.0 / (d**0.5)
    grid = (b, m_len // block_k)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, pre_gate=pre_gate, n_kv=m_len
    )
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, d), q.dtype),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((np_, LANES), jnp.float32),
            pltpu.VMEM((np_, LANES), jnp.float32),
            pltpu.VMEM((np_, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask_f)
    return o, l, m


# =============================================================================
# Backward kernel (recompute per KV tile)
# =============================================================================


def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, l_ref, m_ref, di_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scr, *, sm_scale: float, pre_gate: bool
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]  # [NP, D]
    l_vec = l_ref[0, 0][:, None]  # [NP, 1]
    m_vec = m_ref[0, 0][:, None]
    di = di_ref[0, 0][:, None]  # [NP, 1] = sum(o * do)

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
    p = jnp.exp(s - m_vec) * l_inv  # normalized weights [NP, BK]

    # dV = P^T dO
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)

    # dP_softmax = dO V^T ; ds = p * (dP - di)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)  # [NP, BK]
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
        dk_ref[0] = (
            sm_scale
            * jax.lax.dot_general(
                da, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + (1.0 - tk * tk)
            * jax.lax.dot_general(
                du, tq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        ).astype(dk_ref.dtype)
    else:
        dq_scr[...] += sm_scale * jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32
        )
        dk_ref[0] = (
            sm_scale
            * jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        ).astype(dk_ref.dtype)

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _coattn_bwd_impl(
    q, k, v, mask_f, do, l, m, di, *, pre_gate: bool, block_k: int, interpret: bool
):
    b, np_, d = q.shape
    m_len = k.shape[1]
    sm_scale = 1.0 / (d**0.5)
    grid = (b, m_len // block_k)
    kernel = functools.partial(_bwd_kernel, sm_scale=sm_scale, pre_gate=pre_gate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, j: (b_, 0, j)),
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, np_), lambda b_, j: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, np_, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, j: (b_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, d), q.dtype),
            jax.ShapeDtypeStruct((b, m_len, d), k.dtype),
            jax.ShapeDtypeStruct((b, m_len, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((np_, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask_f, do, l, m, di)
    return dq, dk, dv


# =============================================================================
# custom_vjp wrapper
# =============================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _coattn(q, k, v, mask_f, pre_gate, block_k, interpret):
    o, _, _ = _coattn_fwd_impl(
        q, k, v, mask_f, pre_gate=pre_gate, block_k=block_k, interpret=interpret
    )
    return o


def _coattn_fwd(q, k, v, mask_f, pre_gate, block_k, interpret):
    o, l, m = _coattn_fwd_impl(
        q, k, v, mask_f, pre_gate=pre_gate, block_k=block_k, interpret=interpret
    )
    return o, (q, k, v, mask_f, o, l, m)


def _coattn_bwd(pre_gate, block_k, interpret, res, do):
    q, k, v, mask_f, o, l, m = res
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, None, :]
    dq, dk, dv = _coattn_bwd_impl(
        q, k, v, mask_f, do, l, m, di,
        pre_gate=pre_gate, block_k=block_k, interpret=interpret,
    )
    return dq, dk, dv, None


_coattn.defvjp(_coattn_fwd, _coattn_bwd)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def coattention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    *,
    pre_gate: bool = False,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused few-query attention. q: [B, N, D]; k, v: [B, M, D];
    key_mask: [B, M] bool. Returns [B, N, D]. Differentiable (custom VJP)."""
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
    out = _coattn(q, k, v, mask_f, pre_gate, bk, interpret)
    return out[:, :n, :]


# =============================================================================
# Dispatcher used by ops.attention.MultiheadAttention
# =============================================================================


def _xla_fused(q, k, v, key_mask, pre_gate):
    out, _ = attention_core(
        q,
        k,
        v,
        key_mask,
        pre_gate=pre_gate,
        dropout_rate=0.0,
        deterministic=True,
        need_weights=False,
    )
    return out


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    pre_gate: bool = False,
) -> jnp.ndarray:
    """Masked (pre-gated) attention without materializing scores in HBM.

    q: [B, H, N, D]; k, v: [B, H, M, D]; key_mask: [B, M] bool or None.
    Returns [B, H, N, D].
    """
    b, h, n, d = q.shape
    m_len = k.shape[2]

    # Few-query path: the custom co-attention kernel (handles pre_gate).
    # Threshold: below ~4k keys XLA's fused einsums win (measured with hard
    # host syncs; the kernel's fixed overhead dominates at small M).
    if n <= 256 and m_len >= 4096 and m_len % 256 == 0 and d % 128 == 0:
        qf = q.reshape(b * h, n, d)
        kf = k.reshape(b * h, m_len, d)
        vf = v.reshape(b * h, m_len, d)
        mf = None
        if key_mask is not None:
            mf = jnp.repeat(key_mask, h, axis=0) if h > 1 else key_mask
        out = coattention(qf, kf, vf, mf, pre_gate=pre_gate)
        return out.reshape(b, h, n, d)

    # Long-query self-attention path: library flash kernel (no pre-gate).
    if not pre_gate:
        from multimodal_path_omic_tpu.ops import flash

        if flash.supported(q, k, v):
            return flash.flash_attention(q, k, v, key_mask)

    return _xla_fused(q, k, v, key_mask, pre_gate)
