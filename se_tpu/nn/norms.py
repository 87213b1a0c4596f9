"""Normalization layers in NHWC / (B, T, C) layouts, torch-parity semantics.

Cumulative ("causal") layer norms follow CTSNet_new/Step1_network.py:212-287:
running mean/variance over all (channel, freq) entries up to each time step,
computed via cumsum of sums and sums-of-squares. That formulation is
cancellation-prone, so statistics are always accumulated in float32
(ref SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """torch BatchNorm over the last (channel) axis: eps 1e-5, momentum 0.1.

    `use_running_average=True` (decode / eval) consumes copied running stats.
    """

    use_running_average: bool = True
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            name="bn",
        )(x)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the trailing `ndims` axes (eps 1e-5)."""

    ndims: int = 1
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(-self.ndims, 0))
        shape = x.shape[-self.ndims:]
        scale = self.param("scale", nn.initializers.ones, shape, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, shape, self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(x.dtype)


class InstanceNorm2d(nn.Module):
    """torch.nn.InstanceNorm2d on NHWC: per-(sample, channel) stats over (T, F).

    torch default: affine=False, no running stats (instance stats at eval too).
    """

    affine: bool = False
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * scale + bias
        return y.astype(x.dtype)


class InstanceNorm1d(nn.Module):
    """torch.nn.InstanceNorm1d on (B, T, C): per-(sample, channel) stats
    over T (used by the CTSNet/G2Net_VB 'old' norm variants)."""

    affine: bool = True
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * scale + bias
        return y.astype(x.dtype)


def _cumulative_stats(x32: jnp.ndarray, reduce_axes: tuple[int, ...], time_axis: int, eps: float):
    """Cumulative mean/std over `reduce_axes` + all steps up to t along time."""
    n_per_step = 1
    for a in reduce_axes:
        n_per_step *= x32.shape[a]
    step_sum = jnp.sum(x32, axis=reduce_axes, keepdims=True)
    step_pow = jnp.sum(jnp.square(x32), axis=reduce_axes, keepdims=True)
    cum_sum = jnp.cumsum(step_sum, axis=time_axis)
    cum_pow = jnp.cumsum(step_pow, axis=time_axis)
    t_len = x32.shape[time_axis]
    cnt_shape = [1] * x32.ndim
    cnt_shape[time_axis] = t_len
    entry_cnt = (
        jnp.arange(1, t_len + 1, dtype=jnp.float32).reshape(cnt_shape) * n_per_step
    )
    cum_mean = cum_sum / entry_cnt
    cum_var = (cum_pow - 2.0 * cum_mean * cum_sum) / entry_cnt + jnp.square(cum_mean)
    cum_std = jnp.sqrt(cum_var + eps)
    return cum_mean, cum_std


class CumulativeLayerNorm2d(nn.Module):
    """Causal LN on (B, T, F, C): stats over (F, C) cumulative in T."""

    affine: bool = True
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean, std = _cumulative_stats(xf, reduce_axes=(2, 3), time_axis=1, eps=self.eps)
        y = (xf - mean) / std
        if self.affine:
            c = x.shape[-1]
            gain = self.param("gain", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * gain + bias
        return y.astype(x.dtype)


class CumulativeLayerNorm1d(nn.Module):
    """Causal LN on (B, T, C): stats over C cumulative in T."""

    affine: bool = True
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean, std = _cumulative_stats(xf, reduce_axes=(2,), time_axis=1, eps=self.eps)
        y = (xf - mean) / std
        if self.affine:
            c = x.shape[-1]
            gain = self.param("gain", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
            y = y * gain + bias
        return y.astype(x.dtype)


class SeqCausalLayerNorm(nn.Module):
    """DeepXi sequence-causal layer norm with sequence masking
    (ref DeepXi/deepxi/normalisation.py:37-66).

    Running statistics over all (time <= t, feature) entries with the
    reference's exact formulation: mu_t = cumsum_t(sum_f x) / (t*F), and
    sigma_t = cumsum_t(sum_f (x_u - mu_u)^2) / (t*F) — each frame's deviation
    is taken against its *own* running mean before the cumulative sum (a
    documented reference quirk, normalisation.py:57-59). Output is zeroed on
    padded frames (seq mask multiply, :66). eps 1e-12 inside the sqrt
    (tf.nn.batch_normalization variance_epsilon)."""

    centre: bool = True
    scale: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
        b, t, f = x.shape
        xf = x.astype(jnp.float32)
        mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(jnp.float32)
        den = (jnp.arange(1, t + 1, dtype=jnp.float32) * f)[None, :, None]
        mu = jnp.cumsum(jnp.sum(xf, -1), -1)[..., None] / den
        sigma = jnp.cumsum(jnp.sum(jnp.square(xf - mu), -1), -1)[..., None] / den
        y = (xf - mu) * jax.lax.rsqrt(sigma + 1e-12)
        if self.scale:
            y = y * self.param("gamma", nn.initializers.ones, (f,),
                               self.param_dtype)
        if self.centre:
            y = y + self.param("beta", nn.initializers.zeros, (f,),
                               self.param_dtype)
        return (y * mask[..., None]).astype(x.dtype)


class SeqLayerNorm(nn.Module):
    """DeepXi whole-sequence masked layer norm
    (ref normalisation.py:131-149): one mean/variance per utterance over all
    valid (time, feature) entries; output zeroed on padded frames."""

    centre: bool = True
    scale: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
        b, t, f = x.shape
        xf = x.astype(jnp.float32)
        mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(
            jnp.float32)[..., None]
        den = jnp.sum(mask, axis=1, keepdims=True) * f
        mean = jnp.sum(xf * mask, axis=(1, 2), keepdims=True) / den
        var = jnp.sum(jnp.square(xf - mean) * mask, axis=(1, 2),
                      keepdims=True) / den
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-12)
        if self.scale:
            y = y * self.param("gamma", nn.initializers.ones, (f,),
                               self.param_dtype)
        if self.centre:
            y = y + self.param("beta", nn.initializers.zeros, (f,),
                               self.param_dtype)
        return (y * mask).astype(x.dtype)


class FrameLayerNorm(nn.Module):
    """DeepXi frame-wise layer norm (ref normalisation.py:69-98): per-frame
    stats over features, eps 1e-12."""

    centre: bool = True
    scale: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[-1]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-12)
        if self.scale:
            y = y * self.param("gamma", nn.initializers.ones, (f,),
                               self.param_dtype)
        if self.centre:
            y = y + self.param("beta", nn.initializers.zeros, (f,),
                               self.param_dtype)
        return y.astype(x.dtype)


def deepxi_normalisation(norm_type: str, **kwargs) -> nn.Module:
    """Dispatcher mirroring `Normalisation` (ref normalisation.py:15-34)."""
    table = {
        "SeqCausalLayerNorm": SeqCausalLayerNorm,
        "SeqLayerNorm": SeqLayerNorm,
        "FrameLayerNorm": FrameLayerNorm,
    }
    if norm_type == "unnormalised":
        raise ValueError("'unnormalised' needs no module; apply identity")
    if norm_type not in table:
        raise ValueError(f"Normalisation type does not exist: {norm_type}.")
    return table[norm_type](**kwargs)


class ChannelWiseLayerNorm(nn.Module):
    """LayerNorm over the channel axis of (B, T, C) sequences with affine
    params (ref FullSubNet feature.py:396-414; torch transposes to put C
    last — our layout already has it there)."""

    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (y * scale + bias).astype(x.dtype)
