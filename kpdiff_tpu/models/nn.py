"""Small linen building blocks with torch-compatible initialization.

The reference relies on torch.nn.Linear defaults (kaiming_uniform(a=sqrt 5)
== U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias). Matching
the init keeps training dynamics comparable when re-establishing baselines.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# U(-sqrt(1/fan_in), sqrt(1/fan_in)) — torch Linear default for weight.
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    import jax

    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Dense with torch's default init (bias bound uses fan_in).

    `dtype` is the compute dtype (mixed precision): params stay float32
    masters, inputs/kernel are cast for the matmul.
    """

    features: int
    use_bias: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        cd = jnp.dtype(self.dtype)
        y = x.astype(cd) @ kernel.astype(cd)
        if self.use_bias:
            bias = self.param("bias", lambda k, s: torch_bias_init(k, s, fan_in=fan_in), (self.features,))
            y = y + bias.astype(cd)
        return y


class MLP(nn.Module):
    """Linear/activation chain. acts[i] applied after layer i ('' = none)."""

    features: Sequence[int]
    acts: Sequence[str]  # entries: 'silu', 'sigmoid', 'tanh', ''
    use_bias: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate(self.features):
            x = TorchLinear(feat, use_bias=self.use_bias, dtype=self.dtype, name=f"lin{i}")(x)
            act = self.acts[i]
            if act == "silu":
                x = nn.silu(x)
            elif act == "sigmoid":
                x = nn.sigmoid(x)
            elif act == "tanh":
                x = nn.tanh(x)
            elif act:
                raise ValueError(act)
        return x


class LayerNorm(nn.Module):
    """LayerNorm matching torch defaults (eps 1e-5, affine)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)


def xavier_uniform_scaled(gain: float) -> Callable:
    """xavier_uniform with an extra gain (reference inits coord output layers
    with gain=0.001, dynamics.py:70, receptor_encoder.py:62)."""
    base = variance_scaling(1.0, "fan_avg", "uniform")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * gain

    return init
