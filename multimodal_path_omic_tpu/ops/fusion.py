"""Late-fusion heads (reference: models/fusion.py).

All heads are batched: inputs are ``[B, dim_i]`` vectors (the reference
operates on bare 1-D vectors with batch size 1; its ``cat(dim=0)`` over 1-D
inputs is a feature concat, which here is ``cat(axis=-1)``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_path_omic_tpu.ops.layers import (
    FastDropout,
    TorchLinear,
    normal_fan_in_init,
)


class ConcatFusion(nn.Module):
    """Concat -> Linear-ReLU-Linear-ReLU (reference: fusion.py:7-19)."""

    hidden_size: int = 256
    output_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, *x: jnp.ndarray, deterministic: bool = True):
        # ``deterministic`` accepted (and ignored — no dropout here) so the
        # models can forward train/eval mode to ANY fusion uniformly
        concat = jnp.concatenate(x, axis=-1)
        h = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype, name="fc1")(concat))
        h = jax.nn.relu(TorchLinear(self.output_size, dtype=self.dtype, name="fc2")(h))
        return h


class GatedConcatFusion(nn.Module):
    """Per-input scalar sigmoid gates, then the concat MLP
    (reference: fusion.py:22-41).

    Fidelity note: the reference keeps its gate layers in a plain Python list
    (fusion.py:25-27), so their parameters are invisible to the optimizer and
    never trained. Here the gates are proper registered parameters — the
    documented fix chosen in SURVEY.md §7.1. ``bug_compat`` restores the
    reference behavior: gates are applied at their random init but frozen
    (stop_gradient on the gate params; gradients still flow through the
    inputs, exactly as unregistered-but-requires-grad torch layers behave).
    """

    hidden_size: int = 256
    output_size: int = 256
    dtype: Optional[jnp.dtype] = None
    bug_compat: bool = False

    @nn.compact
    def __call__(self, *x: jnp.ndarray, deterministic: bool = True):
        # ``deterministic`` accepted (and ignored — no dropout here), see
        # ConcatFusion
        gated = []
        for i, item in enumerate(x):
            if self.bug_compat:
                # gate params frozen at their random init; gradients still
                # flow through the data path (the reference's unregistered
                # gates behave exactly like this under its CPU runs)
                from multimodal_path_omic_tpu.ops.layers import (
                    make_torch_bias_init,
                    torch_linear_kernel_init,
                )

                fan_in = item.shape[-1]
                kernel = jax.lax.stop_gradient(
                    self.param(f"gate_{i}_kernel", torch_linear_kernel_init, (fan_in, 1))
                )
                bias = jax.lax.stop_gradient(
                    self.param(f"gate_{i}_bias", make_torch_bias_init(fan_in), (1,))
                )
                g = jax.nn.sigmoid(
                    jnp.dot(item.astype(self.dtype), kernel.astype(self.dtype))
                    + bias.astype(self.dtype)
                )
            else:
                g = jax.nn.sigmoid(
                    TorchLinear(1, dtype=self.dtype, name=f"gate_{i}")(item)
                )
            gated.append(item * g)
        concat = jnp.concatenate(gated, axis=-1)
        h = jax.nn.relu(TorchLinear(self.hidden_size, dtype=self.dtype, name="fc1")(concat))
        h = jax.nn.relu(TorchLinear(self.output_size, dtype=self.dtype, name="fc2")(h))
        return h


class Bilinear(nn.Module):
    """nn.Bilinear equivalent: y_k = x1^T A_k x2 + b_k.

    torch layout is A: [out, in1, in2]; init U(-k, k) with k = 1/sqrt(in1)
    (torch nn.Bilinear.reset_parameters uses weight.size(1) = in1).
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray):
        in1, in2 = x1.shape[-1], x2.shape[-1]
        import math

        k = 1.0 / math.sqrt(in1)

        def bilinear_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

        w = self.param("weight", bilinear_init, (self.features, in1, in2))
        b = self.param("bias", bilinear_init, (self.features,))
        y = jnp.einsum("...i,kij,...j->...k", x1.astype(self.dtype), w.astype(self.dtype), x2.astype(self.dtype))
        return y + b


class BilinearFusion(nn.Module):
    """Gated bilinear Kronecker fusion (reference: fusion.py:44-113).

    Per modality: h_i = ReLU(W x_i); z_i = Bilinear(x_i, x_other);
    o_i = Dropout(ReLU(W(sigmoid(z_i) * h_i))). Then append a ones column to
    each o_i, take the outer (Kronecker) product, flatten, MLP, optional skip
    concat of o1/o2. All Linear weights use init_max_weights
    (N(0, 1/sqrt(fan_in)), fusion.py:79 -> utils.py:43-48).
    """

    hidden_size: int = 32
    output_size: int = 64
    mm_hidden_size: int = 64
    use_skip_connection: bool = True
    use_bilinear: bool = True
    use_gates: bool = True
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    def _linear(self, name, features):
        return TorchLinear(
            features,
            dtype=self.dtype,
            kernel_init=normal_fan_in_init,
            bias_init=nn.initializers.zeros,
            name=name,
        )

    @nn.compact
    def __call__(self, *x: jnp.ndarray, deterministic: bool = True):
        if len(x) != 2:
            raise RuntimeError("Bilinear fusion is possible only on 2 inputs")
        x1, x2 = x
        relu = jax.nn.relu

        if self.use_gates:
            h1 = relu(self._linear("linear_h1", self.hidden_size)(x1))
            if self.use_bilinear:
                z1 = Bilinear(self.hidden_size, dtype=self.dtype, name="linear_z1")(x1, x2)
            else:
                z1 = self._linear("linear_z1", self.hidden_size)(
                    jnp.concatenate([x1, x2], axis=-1)
                )
            o1 = jax.nn.sigmoid(z1) * h1
        else:
            o1 = x1
        o1 = relu(self._linear("linear_o1", self.hidden_size)(o1))
        o1 = FastDropout(self.dropout_rate)(o1, deterministic=deterministic)

        if self.use_gates:
            h2 = relu(self._linear("linear_h2", self.hidden_size)(x2))
            if self.use_bilinear:
                z2 = Bilinear(self.hidden_size, dtype=self.dtype, name="linear_z2")(x2, x1)
            else:
                z2 = self._linear("linear_z2", self.hidden_size)(
                    jnp.concatenate([x2, x1], axis=-1)
                )
            o2 = jax.nn.sigmoid(z2) * h2
        else:
            o2 = x2
        o2 = relu(self._linear("linear_o2", self.hidden_size)(o2))
        o2 = FastDropout(self.dropout_rate)(o2, deterministic=deterministic)

        # Kronecker product with appended ones (fusion.py:100-105)
        ones = jnp.ones(o1.shape[:-1] + (1,), o1.dtype)
        o1p = jnp.concatenate([o1, ones], axis=-1)
        o2p = jnp.concatenate([o2, ones], axis=-1)
        out = jnp.einsum("...i,...j->...ij", o1p, o2p)
        out = out.reshape(out.shape[:-2] + (-1,))

        out = FastDropout(self.dropout_rate)(out, deterministic=deterministic)
        out = relu(self._linear("fc1", self.mm_hidden_size)(out))
        out = FastDropout(self.dropout_rate)(out, deterministic=deterministic)
        if self.use_skip_connection:
            out = jnp.concatenate([out, o1p, o2p], axis=-1)
        out = relu(self._linear("fc2", self.output_size)(out))
        out = FastDropout(self.dropout_rate)(out, deterministic=deterministic)
        return out


def make_fusion(
    kind: str, hidden: int, output: int, dtype=None, name=None, bug_compat: bool = False
) -> nn.Module:
    """Fusion factory mirroring the reference's config dispatch (mcat.py:69-79)."""
    if kind == "concat":
        return ConcatFusion(hidden_size=hidden, output_size=output, dtype=dtype, name=name)
    if kind == "gated_concat":
        return GatedConcatFusion(
            hidden_size=hidden, output_size=output, dtype=dtype, name=name,
            bug_compat=bug_compat,
        )
    if kind == "bilinear":
        return BilinearFusion(output_size=output, dtype=dtype, name=name)
    raise RuntimeError(f"Fusion mechanism {kind} not implemented")
