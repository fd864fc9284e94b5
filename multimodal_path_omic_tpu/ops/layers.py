"""Low-level layer utilities with torch-compatible semantics.

These exist so that (a) weights can be transplanted 1:1 from a PyTorch
state_dict for numerics-parity tests, and (b) fresh training starts from the
same init distributions the reference uses (torch nn.Linear default init,
xavier-uniform attention projections, etc.).
"""

from __future__ import annotations

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


class TorchLinear(nn.Module):
    """nn.Linear equivalent with torch's default init.

    Weight layout is flax-style [in, out]; transplanting from torch requires a
    transpose of torch's [out, in] weight.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_linear_kernel_init,
            (in_features, self.features),
        )
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

