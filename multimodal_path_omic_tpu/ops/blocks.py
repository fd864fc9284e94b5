"""Reusable model blocks (reference: models/blocks.py, models/mcat/mcat.py).

Batched + masked re-designs of the reference's building blocks. Attention
primitives live in ops/attention.py; this module holds the MIL scoring head,
the masked MIL pooling, the SNN omic encoders, and the WSI patch encoder.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_path_omic_tpu.ops.layers import (
    AlphaDropout,
    FastDropout,
    TorchLinear,
    masked_softmax,
)


class AttentionNetGated(nn.Module):
    """Gated-attention MIL scoring head (reference: blocks.py:13-48).

    A = W_c(tanh(W_a x) * sigmoid(W_b x)), optional dropout p=0.25 on both
    branches. Input x: [..., L, input_dim]; returns (A [..., L, n_classes], x).
    """

    hidden_dim: int = 256
    n_classes: int = 1
    dropout: bool = True
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        a = jnp.tanh(TorchLinear(self.hidden_dim, dtype=self.dtype, name="attention_a")(x))
        b = jax.nn.sigmoid(
            TorchLinear(self.hidden_dim, dtype=self.dtype, name="attention_b")(x)
        )
        if self.dropout:
            a = FastDropout(self.dropout_rate)(a, deterministic=deterministic)
            b = FastDropout(self.dropout_rate)(b, deterministic=deterministic)
        scores = TorchLinear(self.n_classes, dtype=self.dtype, name="attention_c")(a * b)
        return scores, x


class GatedMILPool(nn.Module):
    """Masked gated-attention MIL pooling + rho head.

    Reference pipeline (mcat.py:105-115): A,h = AttentionNetGated(x);
    h = softmax(A^T) @ h; h = rho(h), where rho = Linear+ReLU+Dropout.
    Batched with an optional token-validity mask (padded bag positions get
    -inf attention scores).

    Documented deviation: the reference HARDCODES p=0.25 inside its MIL
    attention heads — the model-level dropout arg never reaches them
    (reference: blocks.py:34-36; its `dropout_p` bool only toggles). Here the
    model's ``dropout_rate`` is plumbed through, which is identical at the
    default 0.25 (the only value any reference config can produce) and makes
    non-default rates behave as a user would expect.

    Input x: [B, L, D], mask: [B, L] or None. Returns (pooled [B, D],
    attention scores A^T [B, 1, L]).

    ``use_pallas``: deterministic eval/serving over LARGE pools (the GE
    model pools the full patch axis) dispatches the fused streaming kernel
    (ops/milpool.py) — one pass, no [B, L, H] branch intermediates in HBM.
    Training and mesh runs stay on XLA (no backward-dropout kernel needed;
    pallas under GSPMD would silently replicate sharded operands).
    """

    dim: int
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from multimodal_path_omic_tpu.ops import milpool

        head = AttentionNetGated(
            hidden_dim=self.dim,
            n_classes=1,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="attention_head",
        )
        kernel_ok = (
            self.use_pallas
            and self.ring_mesh is None
            and deterministic
            and not self.is_initializing()
            # f32 pools only: the kernel computes the gating chain in f32,
            # which would silently differ from the bf16 XLA branch per bag
            # BUCKET (eligible vs not) under tpu.compute_dtype=bfloat16 —
            # one checkpoint must score identically across buckets
            and self.dtype in (None, jnp.float32)
            and x.dtype == jnp.float32
            and milpool.milpool_eligible(x.shape[1], x.shape[2], self.dim)
            and (jax.devices()[0].platform == "tpu" or milpool._FORCE_KERNEL)
        )
        if kernel_ok:
            v = head.variables["params"]  # created by the init-time XLA path
            milpool.DISPATCH_COUNTS["kernel"] += 1
            pooled, s = milpool.fused_gated_mil_pool(
                x,
                mask,
                v["attention_a"]["kernel"],
                v["attention_a"]["bias"],
                v["attention_b"]["kernel"],
                v["attention_b"]["bias"],
                v["attention_c"]["kernel"],
                v["attention_c"]["bias"],
            )
            a = s[:, None, :].astype(x.dtype)  # [B, 1, L] raw scores
            pooled = pooled.astype(x.dtype)
        else:
            milpool.DISPATCH_COUNTS["xla"] += 1
            scores, h = head(x, deterministic=deterministic)
            a = jnp.swapaxes(scores, -1, -2)  # [B, 1, L]
            weights = masked_softmax(
                a, None if mask is None else mask[:, None, :]
            )
            pooled = jnp.einsum("bol,bld->bod", weights, h)[:, 0, :]  # [B, D]
        pooled = TorchLinear(self.dim, dtype=self.dtype, name="rho")(pooled)
        pooled = jax.nn.relu(pooled)
        pooled = FastDropout(self.dropout_rate)(pooled, deterministic=deterministic)
        return pooled, a


class SNNOmicEncoder(nn.Module):
    """Self-normalizing omic encoder (reference: mcat.py:32-45).

    Two blocks of Linear -> ELU -> AlphaDropout(p). Input [B, omic_size] ->
    [B, dim2].
    """

    dim1: int = 256
    dim2: int = 256
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        x = x.astype(jnp.float32)  # faithful to omic.type(torch.float32), mcat.py:90
        x = jax.nn.elu(TorchLinear(self.dim1, dtype=self.dtype, name="fc1")(x))
        x = AlphaDropout(self.dropout_rate)(x, deterministic=deterministic)
        x = jax.nn.elu(TorchLinear(self.dim2, dtype=self.dtype, name="fc2")(x))
        x = AlphaDropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class WSIEncoder(nn.Module):
    """WSI patch-embedding FC: Linear(1024 -> d) + ReLU + Dropout
    (reference: mcat.py:24-29)."""

    dim: int = 256
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, wsi: jnp.ndarray, deterministic: bool = True,
                 wsi_scale: Optional[jnp.ndarray] = None):
        from jax.ad_checkpoint import checkpoint_name

        # 'remat_big' names the [B, M, d] intermediates for tpu.remat:
        # under the save_anything_except_these_names policy (train/loop.py)
        # the backward recomputes them from wsi (one extra MXU pass) instead
        # of round-tripping ~67 MB/tensor through HBM at B=256. Inert
        # without the policy.
        #
        # ``wsi_scale`` + int8 wsi: tpu.int8_matmul — the projection runs
        # s8 x s8 -> s32 on the MXU (ops/layers.py::w8a8_linear), dequant
        # AFTER the dot; the [B, M, 1024] float activation never exists.
        h = checkpoint_name(
            TorchLinear(self.dim, dtype=self.dtype, name="fc")(wsi, wsi_scale),
            "remat_big",
        )
        h = jax.nn.relu(h)
        h = FastDropout(self.dropout_rate)(h, deterministic=deterministic)
        return checkpoint_name(h, "remat_big")


class OmicEncoderStack(nn.Module):
    """Per-signature SNN encoders producing the omic token bag G
    (reference: mcat.py:32-45, 90-92).

    omics: sequence of [B, size_i] arrays -> [B, N, dim2].

    ``fused`` (default) runs all N encoders as two batched einsums over
    zero-padded stacked kernels instead of 2N small matmuls: inputs are padded
    to the widest signature with zeros, and the padded kernel rows are zeros,
    so the result is exactly equal to the per-encoder path (the extra
    zero-row products contribute nothing). Per-signature torch Linear init
    (U(+-1/sqrt(s_i))) is preserved on each valid kernel block.
    """

    n_signatures: int
    dim1: int = 256
    dim2: int = 256
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    fused: bool = True

    @nn.compact
    def __call__(self, omics: Sequence[jnp.ndarray], deterministic: bool = True):
        assert len(omics) == self.n_signatures
        if not self.fused:
            tokens = [
                SNNOmicEncoder(
                    dim1=self.dim1,
                    dim2=self.dim2,
                    dropout_rate=self.dropout_rate,
                    dtype=self.dtype,
                    name=f"snn_{i}",
                )(omic, deterministic=deterministic)
                for i, omic in enumerate(omics)
            ]
            return jnp.stack(tokens, axis=1)  # [B, N, dim2]

        import math

        n = self.n_signatures
        sizes = tuple(int(o.shape[-1]) for o in omics)
        max_s = max(sizes)

        def fc1_kernel_init(key, shape, dtype=jnp.float32):
            # per-signature torch default U(+-1/sqrt(s_i)) on the valid block,
            # zeros on padded rows (they multiply zero-padded inputs anyway,
            # but zeros keep l1_reg and checkpoints clean)
            keys = jax.random.split(key, n)
            out = jnp.zeros(shape, dtype)
            for i, s in enumerate(sizes):
                k = 1.0 / math.sqrt(s)
                blk = jax.random.uniform(keys[i], (s, self.dim1), dtype, -k, k)
                out = out.at[i, :s].set(blk)
            return out

        def fc1_bias_init(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, n)
            rows = [
                jax.random.uniform(
                    keys[i], (self.dim1,), dtype,
                    -1.0 / math.sqrt(s), 1.0 / math.sqrt(s),
                )
                for i, s in enumerate(sizes)
            ]
            return jnp.stack(rows)

        def fc2_kernel_init(key, shape, dtype=jnp.float32):
            k = 1.0 / math.sqrt(self.dim1)
            return jax.random.uniform(key, shape, dtype, -k, k)

        fc1_kernel = self.param("fc1_kernel", fc1_kernel_init, (n, max_s, self.dim1))
        fc1_bias = self.param("fc1_bias", fc1_bias_init, (n, self.dim1))
        fc2_kernel = self.param("fc2_kernel", fc2_kernel_init, (n, self.dim1, self.dim2))
        fc2_bias = self.param("fc2_bias", fc2_kernel_init, (n, self.dim2))

        x = jnp.stack(
            [
                jnp.pad(o.astype(jnp.float32), ((0, 0), (0, max_s - o.shape[-1])))
                for o in omics
            ],
            axis=1,
        )  # [B, N, max_s]
        h = jnp.einsum(
            "bns,nsd->bnd", x.astype(self.dtype), fc1_kernel.astype(self.dtype)
        ) + fc1_bias.astype(self.dtype)
        h = jax.nn.elu(h)
        h = AlphaDropout(self.dropout_rate)(h, deterministic=deterministic)
        h = jnp.einsum(
            "bnd,nde->bne", h, fc2_kernel.astype(self.dtype)
        ) + fc2_bias.astype(self.dtype)
        h = jax.nn.elu(h)
        h = AlphaDropout(self.dropout_rate)(h, deterministic=deterministic)
        return h  # [B, N, dim2]
