"""Low-level layer utilities with torch-compatible semantics.

These exist so that (a) weights can be transplanted 1:1 from a PyTorch
state_dict for numerics-parity tests, and (b) fresh training starts from the
same init distributions the reference uses (torch nn.Linear default init,
xavier-uniform attention projections, etc.).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

# Large-negative (finite) masking constant: -inf would turn fully-masked
# softmax rows into NaN; padded rows are discarded downstream anyway.
NEG_INF = -1e9


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-k, k), k = 1/sqrt(fan_in).

    flax kernels are [in, out]; fan_in is shape[0].
    """
    k = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)


def make_torch_bias_init(fan_in: int) -> Callable:
    """torch nn.Linear default bias: U(-k, k), k = 1/sqrt(fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        k = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


def normal_fan_in_init(key, shape, dtype=jnp.float32):
    """init_max_weights: N(0, 1/sqrt(fan_in)) (reference: models/utils.py:43-48)."""
    stdv = 1.0 / math.sqrt(shape[0])
    return jax.random.normal(key, shape, dtype) * stdv


def quantize_cols_int8(w: jnp.ndarray):
    """In-graph symmetric per-COLUMN int8 quantization of a [F, E] kernel:
    one scale per output feature (the contraction axis F is reduced, so
    per-column scales factor out of the dot exactly). Mirrors the per-row
    data-side quantizer (data/quant.py::quantize_bag_int8)."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def w8a8_linear(q, row_scale, kernel, bias, dtype):
    """First-layer Linear on int8 activations via the int8 MXU path.

    ``q`` [..., F] int8 per-row-quantized activations with ``row_scale``
    [...] (the device cache's storage format, data/quant.py), ``kernel``
    [F, E] / ``bias`` [E] float params. Forward quantizes the kernel
    per-column in-graph and runs ``s8 x s8 -> s32`` (v5e int8 MACs run at
    ~2x the bf16 rate), dequantizing AFTER the dot:

        y = (q @ qk).f32 * (row_scale x col_scale) + bias

    Backward (custom VJP): the input is DATA — no dX is ever needed — so
    the only grads are dW = dequant(q)ᵀ @ dy (bf16/f32 matmul, exactly the
    dW the float path computes up to the storage quantization error) and
    db = Σ dy. The kernel quantization is straight-through: grads flow as
    if the float kernel had been used (the [F, E] kernel's own int8 error
    is second-order next to the activations' storage quantization, which
    the planted-signal A/B already bounds).
    """
    y, _ = _w8a8_fwd(q, row_scale, kernel, bias, dtype)
    return y


def _w8a8_fwd(q, row_scale, kernel, bias, dtype):
    from jax import lax

    qk, col_scale = quantize_cols_int8(kernel.astype(jnp.float32))
    nd = q.ndim
    acc = lax.dot_general(
        q, qk, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dt = dtype or jnp.float32
    y = acc.astype(jnp.float32) * (
        row_scale[..., None].astype(jnp.float32) * col_scale
    )
    y = y.astype(dt) + bias.astype(dt)
    return y, (q, row_scale)


def _w8a8_bwd(dtype, res, dy):
    import numpy as _np

    q, row_scale = res
    dt = dtype or jnp.float32
    x = q.astype(dt) * row_scale[..., None].astype(dt)
    # collapse every leading axis: dW = Xᵀ @ dY with f32 accumulation
    x2 = x.reshape(-1, x.shape[-1])
    dy2 = dy.reshape(-1, dy.shape[-1])
    from jax import lax

    dk = lax.dot_general(
        x2, dy2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    db = jnp.sum(dy2.astype(jnp.float32), axis=0)
    # integer primals take float0 cotangents; row_scale is data (no grad)
    dq = _np.zeros(_np.shape(q), dtype=jax.dtypes.float0)
    return dq, jnp.zeros_like(row_scale), dk, db


w8a8_linear.defvjp(_w8a8_fwd, _w8a8_bwd)


class TorchLinear(nn.Module):
    """nn.Linear equivalent with torch's default init.

    Weight layout is flax-style [in, out]; transplanting from torch requires a
    transpose of torch's [out, in] weight.

    ``row_scale``: passing int8 ``x`` plus its per-row scales routes through
    ``w8a8_linear`` (int8 MXU compute, dequant after the dot) — the int8
    device cache's bags can feed the first projection without ever
    materializing the dequantized [B, M, F] activation.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, row_scale=None):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_linear_kernel_init,
            (in_features, self.features),
        )
        if row_scale is not None and x.dtype == jnp.int8:
            bias = (
                self.param(
                    "bias",
                    self.bias_init or make_torch_bias_init(in_features),
                    (self.features,),
                )
                if self.use_bias
                else jnp.zeros((self.features,), jnp.float32)
            )
            return w8a8_linear(x, row_scale, kernel, bias, self.dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias",
                self.bias_init or make_torch_bias_init(in_features),
                (self.features,),
            )
            y = y + bias.astype(self.dtype)
        return y


def fast_keep_mask(rng, rate: float, shape):
    """Dropout keep-mask via a uint16 bit threshold: (keep [bool], keep_prob).

    Semantically a ``bernoulli(rng, 1 - rate)`` draw, but generates 16 random
    bits per element instead of a 32-bit float uniform — measured ~3x cheaper
    mask generation on TPU at the [256, 512, 256] training activation shape
    (462 -> 146 us of overhead per masked op; the op is PRNG-bandwidth-bound).
    Same scheme the fused co-attention kernel uses in-kernel
    (ops/coattn.py::_dropout_threshold), here for the XLA-path masks.

    Exact for rates that are multiples of 1/65536 (the reference's hardcoded
    p=0.25 included, /root/reference/models/blocks.py:33); otherwise the
    effective rate is round(rate * 65536) / 65536 (|error| <= 2^-17) and the
    returned keep_prob reflects it so 1/keep_prob scaling stays unbiased.
    """
    thresh = int(round(float(rate) * 65536.0))
    if thresh >= 65536:
        # rate rounds to 1.0: drop everything (flax nn.Dropout zeroes the
        # output at rate=1.0; capping the threshold at 65535 would instead
        # keep ~1/65536 of elements scaled by 65536). keep_prob returns 1.0
        # so callers' 1/keep_prob scaling stays finite on the all-False mask.
        return jnp.zeros(shape, bool), 1.0
    keep = jax.random.bits(rng, shape, jnp.uint16) >= jnp.uint16(thresh)
    return keep, 1.0 - thresh / 65536.0


class FastDropout(nn.Module):
    """Drop-in for ``flax.linen.Dropout`` (inverted dropout, "dropout" rng
    collection) with the uint16-bits keep mask (``fast_keep_mask``).

    A mask-REGENERATING custom-vjp variant (save only the key, re-run the PRNG
    in the backward) was measured a no-op here — identical compiled temp
    memory (343 MiB) and throughput (61.7k vs 62.0k bags/sec at B=256): XLA
    already rematerializes the mask from the cheap rng-bit-generator on its
    own, so the plain form is kept."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep, keep_prob = fast_keep_mask(rng, self.rate, x.shape)
        return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)


class AlphaDropout(nn.Module):
    """SELU-preserving alpha dropout, exact torch semantics.

    torch.nn.AlphaDropout: dropped units are set to alpha' = -scale*alpha of
    SELU (-1.7580993408473766); the output is affinely corrected so mean and
    variance are preserved:
        a = ((1 - p) * (1 + p * alpha'^2)) ** -0.5
        b = -a * alpha' * p
        out = a * (x * keep + alpha' * (1 - keep)) + b
    Used by the reference's SNN omic encoders (mcat.py:38, 42).
    """

    rate: float
    deterministic: Optional[bool] = None

    ALPHA_PRIME = -1.7580993408473766

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep, keep_prob = fast_keep_mask(rng, self.rate, x.shape)
        p = 1.0 - keep_prob  # effective rate; == self.rate for multiples of 1/65536
        a = ((1.0 - p) * (1.0 + p * self.ALPHA_PRIME**2)) ** -0.5
        b = -a * self.ALPHA_PRIME * p
        return a * jnp.where(keep, x, self.ALPHA_PRIME) + b


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1):
    """Softmax with boolean validity mask broadcast over ``scores``.

    mask True = valid. Fully-masked rows yield a uniform distribution over the
    masked entries (finite fill value), never NaN.
    """
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=axis)

