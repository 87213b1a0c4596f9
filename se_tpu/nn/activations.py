"""Activations with torch-parity parameterization."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """torch.nn.PReLU: scalar (channels=None) or per-channel slope on the
    last axis; init 0.25."""

    channels: int | None = None
    init: float = 0.25
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = () if self.channels is None else (self.channels,)
        a = self.param(
            "weight",
            lambda key, s: jnp.full(s, self.init, self.param_dtype),
            shape,
        )
        return jnp.where(x >= 0, x, a * x)
