"""Ring attention: sequence-parallel masked self-attention over the mesh.

For bags beyond one chip's memory (SURVEY.md §5 "long-context" /
§7.2 step 7), the patch axis M is sharded over the ``seq`` mesh axis and K/V
blocks rotate around the ring with ``jax.lax.ppermute`` while each device
computes attention for its local query shard — communication is point-to-point
(neighbor ICI links) and overlaps with the matmuls. The running (m, l, o)
online-softmax statistics make the result exactly equal to unsharded
attention.

This composes with the rest of the framework: queries/outputs stay sharded
exactly as GSPMD lays them out, so a model can call ``ring_self_attention``
in place of its attention core when ``M / n_devices`` is the only thing that
fits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# single source for the finite mask constant (shared with the kernels —
# ops/coattn.py documents the exp(-inf - -inf) NaN-avoidance rationale)
from multimodal_path_omic_tpu.ops.coattn import NEG  # noqa: E402


def _ring_chunk_size(ml: int, target: int = 512) -> int:
    """Largest power-of-two divisor of Ml that is <= target (buckets are
    power-of-two padded, so this is almost always min(512, Ml))."""
    qc = 1
    while qc * 2 <= min(target, ml) and ml % (qc * 2) == 0:
        qc *= 2
    return qc


def _ring_body(q, k, v, mask_f, axis_name: str, q_chunk: int = 512):
    """shard_map body: q/k/v [B, H, Ml, D] local shards; mask_f [B, Ml].

    FLASH-TILED per rotation step (VERDICT r2 #4): the local [Ml x Ml] score
    block is never materialized. Each step scans over query chunks of
    ``q_chunk`` rows, merging (m, l, o) online-softmax statistics — the
    transient is O(q_chunk x Ml) — and each chunk update is wrapped in
    ``jax.checkpoint`` so the BACKWARD pass rematerializes its score chunk
    instead of saving it (autodiff of the plain einsum version stores the
    full probability matrix per step: O(Ml^2) per device, which is exactly
    the quadratic wall the seq axis exists to break — reference anchor: the
    M x M materialization at ge_nacagat.py:49). The ring rotation itself
    stays at the shard_map level (``lax.ppermute`` of K/V/mask around the
    neighbor ICI links); a monolithic pallas ring kernel would bury the
    collective where XLA could no longer overlap it, and the per-step tiled
    matmuls here already land on the MXU via XLA.
    """
    n_dev = jax.lax.psum(1, axis_name)
    b, h, ml, d = q.shape
    scale = 1.0 / (d**0.5)
    qc = _ring_chunk_size(ml, q_chunk)
    n_chunks = ml // qc

    # [chunks, B, H, qc, D] — scan axis leads
    q_sc = q.reshape(b, h, n_chunks, qc, d).transpose(2, 0, 1, 3, 4)
    m_stat = jnp.full((n_chunks, b, h, qc, 1), NEG, jnp.float32)
    l_stat = jnp.zeros((n_chunks, b, h, qc, 1), jnp.float32)
    o_acc = jnp.zeros((n_chunks, b, h, qc, d), jnp.float32)

    k_blk, v_blk, mask_blk = k, v, mask_f
    perm = None

    for step in range(n_dev):

        @jax.checkpoint
        def chunk_update(k_blk, v_blk, mask_blk, xs):
            q_c, m_c, l_c, o_c = xs  # [B, H, qc, *]
            s = jnp.einsum(
                "bhnd,bhmd->bhnm", q_c * scale, k_blk,
                preferred_element_type=jnp.float32,
            )  # [B, H, qc, Ml] — the only score transient
            s = jnp.where(mask_blk[:, None, None, :] > 0, s, NEG)
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_c, m_curr)
            alpha = jnp.exp(m_c - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_c + jnp.sum(p, axis=-1, keepdims=True)
            o_next = alpha * o_c + jnp.einsum(
                "bhnm,bhmd->bhnd", p, v_blk, preferred_element_type=jnp.float32
            )
            return m_next, l_next, o_next

        def scan_body(carry, xs):
            return carry, chunk_update(k_blk, v_blk, mask_blk, xs)

        _, (m_stat, l_stat, o_acc) = jax.lax.scan(
            scan_body, None, (q_sc, m_stat, l_stat, o_acc)
        )

        if step < n_dev - 1:
            if perm is None:
                n = n_dev
                perm = [(i, (i + 1) % n) for i in range(n)]
            # rotate K/V/mask to the next device; XLA overlaps the ppermute
            # with the next iteration's matmuls where possible
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)

    l_safe = jnp.where(l_stat == 0.0, 1.0, l_stat)
    out = (o_acc / l_safe).astype(q.dtype)  # [chunks, B, H, qc, D]
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, ml, d)


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    mesh: Mesh,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """Exact masked self-attention with K/V ring rotation over ``seq_axis``.

    q, k, v: [B, H, M, D] (M divisible by the seq axis size);
    key_mask: [B, M] bool or None. Returns [B, H, M, D].
    """
    b, h, m, d = q.shape
    n_dev = mesh.shape[seq_axis]
    if m % n_dev != 0:
        raise ValueError(f"M={m} not divisible by seq axis {n_dev}")
    if key_mask is None:
        key_mask = jnp.ones((b, m), bool)
    mask_f = key_mask.astype(jnp.float32)

    from jax.experimental.shard_map import shard_map

    spec_qkv = P(None, None, seq_axis, None)
    spec_mask = P(None, seq_axis)
    fn = shard_map(
        functools.partial(_ring_body, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_mask),
        out_specs=spec_qkv,
    )
    return fn(q, k, v, mask_f)


def _cross_body(
    q,
    k,
    v,
    mask_f,
    rng,
    axis_name: str,
    pre_gate: bool = False,
    dropout_rate: float = 0.0,
    need_ssq: bool = False,
):
    """shard_map body for cross-attention: q [B, H, N, D] replicated, k/v
    [B, H, Ml, D] local shards. Local partial softmax stats merged across the
    axis with pmax/psum (the 'reduce-scatter the output' scheme).

    ``dropout_rate``: exact torch attention-probability dropout semantics
    (reference blocks.py:188-192: probabilities dropped AFTER normalization,
    kept ones scaled by 1/(1-p)) — the normalizer l uses the UNdropped sum,
    so the mask can be applied to the unnormalized exponentials shard-locally
    with the per-shard PRNG stream ``fold_in(rng, axis_index)`` (the same
    seeding scheme the fused kernel uses per tile, ops/coattn.py:146).

    ``need_ssq``: also return the per-query sum of squares of the FINAL
    (post-dropout) attention weights [B, H, N] — all the cesar loss's
    ||A||_2 penalty needs (reference loss.py:97-98) — without ever
    materializing the full N x M map on any device.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    if pre_gate:
        # NaCAGaT pre-gate, computed shard-locally (reference blocks.py:185-187)
        gate = (
            jnp.einsum(
                "bhnd,bhmd->bhnm", jnp.tanh(q), jnp.tanh(k),
                preferred_element_type=jnp.float32,
            )
            + 1.0
        ) * 0.5
        s = s * gate
    s = jnp.where(mask_f[:, None, None, :] > 0, s, NEG)

    # softmax is shift-invariant, so the max shift carries no gradient (and
    # pmax has no differentiation rule anyway): cut the tape BEFORE pmax so
    # its input tangent is a symbolic zero
    m_local = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    m_global = jax.lax.pmax(m_local, axis_name)
    p = jnp.exp(s - m_global)
    l_local = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        from multimodal_path_omic_tpu.ops.layers import fast_keep_mask

        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        keep, keep_prob = fast_keep_mask(shard_rng, dropout_rate, p.shape)
        p_used = jnp.where(keep, p / keep_prob, 0.0)
    else:
        p_used = p
    o_local = jnp.einsum(
        "bhnm,bhmd->bhnd", p_used, v, preferred_element_type=jnp.float32
    )
    l_global = jax.lax.psum(l_local, axis_name)
    o_global = jax.lax.psum(o_local, axis_name)
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    out = (o_global / l_safe).astype(q.dtype)
    if not need_ssq:
        return out, jnp.zeros(q.shape[:-1], q.dtype)  # static-shape dummy
    ssq_local = jnp.sum(p_used * p_used, axis=-1, keepdims=True)
    ssq = jax.lax.psum(ssq_local, axis_name) / (l_safe * l_safe)
    return out, ssq[..., 0].astype(q.dtype)


def sequence_parallel_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray],
    mesh: Mesh,
    seq_axis: str = "seq",
    pre_gate: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
    need_ssq: bool = False,
):
    """Exact masked cross-attention with K/V sharded over ``seq_axis`` and the
    (few) queries replicated — the survival models' co-attention over
    mega-bags (N ~ 6 omic queries, M up to many chips' worth of patches).

    No rotation needed: each device attends over its local K/V shard and the
    softmax statistics merge with one pmax + two psums (O(N*D) bytes per
    device, independent of M). Attention-probability dropout (the reference's
    default p=0.25 training config, blocks.py:188-190) runs shard-locally
    with a fold_in(rng, shard) PRNG stream — the seq-parallel path no longer
    disengages when dropout is active.

    q: [B, H, N, D]; k, v: [B, H, M, D] (M divisible by the axis size);
    key_mask: [B, M] bool or None. Returns [B, H, N, D] (replicated), or
    (out, ssq [B, H, N]) with ``need_ssq``.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    n_dev = mesh.shape[seq_axis]
    if m % n_dev != 0:
        raise ValueError(f"M={m} not divisible by seq axis {n_dev}")
    if key_mask is None:
        key_mask = jnp.ones((b, m), bool)
    mask_f = key_mask.astype(jnp.float32)
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 needs dropout_rng")
    rng = dropout_rng if dropout_rng is not None else jax.random.key(0)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        functools.partial(
            _cross_body,
            axis_name=seq_axis,
            pre_gate=pre_gate,
            dropout_rate=dropout_rate,
            need_ssq=need_ssq,
        ),
        mesh=mesh,
        in_specs=(
            P(None, None, None, None),
            P(None, None, seq_axis, None),
            P(None, None, seq_axis, None),
            P(None, seq_axis),
            P(),
        ),
        out_specs=(P(None, None, None, None), P(None, None, None)),
    )
    out, ssq = fn(q, k, v, mask_f, rng)
    if need_ssq:
        return out, ssq
    return out
