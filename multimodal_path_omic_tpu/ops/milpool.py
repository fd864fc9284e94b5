"""Fused masked gated-MIL pooling kernel (Pallas, inference path).

SURVEY §7.1 names ``kernels/milpool.py``; the reference computes
AttentionNetGated over EVERY patch and softmax-pools
(reference: models/blocks.py:13-48, ge_nacagat/ge_nacagat.py:58-63). The
GE model is where this matters: its pool runs over the full patch axis
(M up to 24k), and the XLA path materializes three [B, M, H] branch
intermediates (tanh / sigmoid / product) plus the [B, M] scores in HBM.

This kernel streams M in tiles: both gating matmuls + the score projection
run on the MXU per tile, the raw score tile goes straight to HBM (the GE
export consumes raw scores), and a 1-query online softmax accumulates the
pooled vector — one pass, O(block_m) live intermediates.

TRAINING stays on XLA deliberately: the round-2 trace showed no hot single
op at survival-model shapes (pool length 6), and a backward pass would need
the in-kernel dropout machinery for two dropout sites. This path serves
deterministic eval/serving at GE scale, dispatched from ops/blocks.py's
GatedMILPool when eligible.

Math (identical to the XLA path, fp reduction order aside):
    a = tanh(x @ Wa + ba); g = sigmoid(x @ Wb + bb)
    s = (a * g) @ Wc + bc                      # [M] raw scores (emitted)
    w = softmax(where(mask, s, -1e9))          # masked_softmax semantics
    pooled = w @ x                             # [D]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_path_omic_tpu.ops.layers import NEG_INF

LANES = 128
# Chained on-chip sweep at M=24576 (B=4, D=H=256): 256→1252 µs, 512→1132,
# 1024→1063, 2048→1053, 4096→1044. 2048 takes ~all of the win with half the
# VMEM headroom risk at wider D.
DEFAULT_BLOCK_M = 2048

# Trace-time dispatch counters (test observability, same pattern as
# ops/coattn.py DISPATCH_COUNTS) + a test hook to dispatch the interpreted
# kernel on CPU (structural coverage without a chip).
DISPATCH_COUNTS = {"kernel": 0, "xla": 0}
_FORCE_KERNEL = False


def reference_gated_mil_pool(x, mask, wa, ba, wb, bb, wc, bc):
    """The XLA math the kernel must match (GatedMILPool's einsum branch,
    ops/blocks.py) — ONE definition shared by the parity tests and the
    A/B bench so the reference cannot drift. Returns (pooled [B, D],
    raw scores [B, M])."""
    from multimodal_path_omic_tpu.ops.layers import masked_softmax

    a = jnp.tanh(x @ wa + ba)
    g = jax.nn.sigmoid(x @ wb + bb)
    s = ((a * g) @ wc + bc)[..., 0]
    weights = masked_softmax(
        s[:, None, :], None if mask is None else mask[:, None, :]
    )
    return jnp.einsum("bol,bld->bod", weights, x)[:, 0], s


# Chained on-chip A/B (bench_milpool --chain 20, block_m=2048, B=4, D=H=256):
# M=8192 0.92x, M=12288 0.88x, M=16384 1.06x, M=24576 1.05x vs XLA — XLA's
# own fusion of the gating chain is strong, so the kernel only pays from
# ~16k patches (re-measured twice; an earlier sweep put 8192 at 1.01x, i.e.
# the 8-12k regime is within noise of parity — keep the conservative gate).
MIN_KERNEL_M = 16384


def milpool_eligible(m: int, d: int, h: int) -> bool:
    """Shape gate: tile-aligned patch axis, lane-aligned widths, and enough
    patches that streaming beats XLA's fused einsums (measured crossover
    ~8192, see MIN_KERNEL_M). _FORCE_KERNEL drops the threshold so CPU
    interpret-mode tests can exercise the dispatch at small M."""
    min_m = 256 if _FORCE_KERNEL else MIN_KERNEL_M
    return m >= min_m and m % 256 == 0 and d % 128 == 0 and h % 128 == 0


def _kernel(x_ref, mask_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
            pooled_ref, scores_ref, m_scr, l_scr, acc_scr):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF * 2.0)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[0].astype(jnp.float32)  # [BM, D]
    a = jnp.tanh(
        jax.lax.dot(x, wa_ref[...], preferred_element_type=jnp.float32)
        + ba_ref[0]
    )
    g = jax.nn.sigmoid(
        jax.lax.dot(x, wb_ref[...], preferred_element_type=jnp.float32)
        + bb_ref[0]
    )
    # n_classes=1 score head as a VPU reduce (a 1-wide matmul wastes the MXU)
    s = jnp.sum(a * g * wc_ref[0][None, :], axis=1) + bc_ref[0, 0]  # [BM]
    scores_ref[0, 0] = s.astype(scores_ref.dtype)

    mask = mask_ref[0, 0]  # [BM] f32
    sm = jnp.where(mask > 0, s, NEG_INF)[None, :]  # [1, BM] — 1-query softmax

    m_prev = m_scr[:, 0:1]
    l_prev = l_scr[:, 0:1]
    m_curr = jnp.max(sm, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(sm - m_next)  # [1, BM]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p, x, preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _store():
        l_fin = l_scr[:, 0:1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        pooled_ref[0, 0] = (acc_scr[...] * l_inv)[0].astype(pooled_ref.dtype)


def fused_gated_mil_pool(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    wa: jnp.ndarray,
    ba: jnp.ndarray,
    wb: jnp.ndarray,
    bb: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    *,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, M, D]; mask: [B, M] bool or None; Wa/Wb: [D, H]; ba/bb: [H];
    Wc: [H, 1]; bc: [1]. Returns (pooled [B, D] f32, scores [B, M] f32)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, m, d = x.shape
    h = wa.shape[1]
    block = min(block_m, m)
    while m % block != 0:
        block //= 2
    mask_f = (
        jnp.ones((b, 1, m), jnp.float32)
        if mask is None
        else mask.astype(jnp.float32).reshape(b, 1, m)
    )
    grid = (b, m // block)
    full = lambda b_, j: (0, 0)  # noqa: E731 — weights replicate per program
    pooled, scores = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b_, j: (b_, j, 0)),
            pl.BlockSpec((1, 1, block), lambda b_, j: (b_, 0, j)),
            pl.BlockSpec((d, h), full),
            pl.BlockSpec((1, h), full),
            pl.BlockSpec((d, h), full),
            pl.BlockSpec((1, h), full),
            pl.BlockSpec((1, h), full),
            pl.BlockSpec((1, 1), full),
        ],
        out_specs=[
            # Mosaic constrains the LAST TWO block dims (divisible by (8, 128)
            # or equal to the array dims); a [b, d] pooled output with a
            # 1-bag block violates that, so pooled carries a singleton middle
            # axis — its constrained dims are then (1, d) == the array dims.
            pl.BlockSpec((1, 1, d), lambda b_, j: (b_, 0, 0)),
            pl.BlockSpec((1, 1, block), lambda b_, j: (b_, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x,
        mask_f,
        wa.astype(jnp.float32),
        ba.astype(jnp.float32).reshape(1, h),
        wb.astype(jnp.float32),
        bb.astype(jnp.float32).reshape(1, h),
        wc.astype(jnp.float32).reshape(h)[None, :],
        bc.astype(jnp.float32).reshape(1, 1),
    )
    return pooled[:, 0, :], scores[:, 0, :]
