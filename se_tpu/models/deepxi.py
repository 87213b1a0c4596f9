"""DeepXi: hybrid deep a-priori-SNR estimator + statistical gain
(ref: DeepXi/deepxi/model.py:34-711, network/tcn.py:116-225, map.py:15-608,
inp_tgt.py:68-215, sig.py:43-260).

Shipped configuration (ref DeepXi/config_resnet.py:40-66): ResNetV2 with 40
bottleneck residual blocks, d_model=256, d_f=64, k=3, cyclic dilation up to
16, causal padding, unit "ReLU->LN->W+b", sigmoid output; input/target MagXi
(noisy STMS in, mapped instantaneous a-priori SNR out) with the DBNormalCDF
map; enhancement via `y_STMS = x_STMS * gfunc(xi_hat, xi_hat+1, 'mmse-lsa')`.

The STFT front-end is tf.signal-convention (hamming, pad_end) — PRESET_DEEPXI.
xi statistics (per-bin mean/std of instantaneous xi in dB over a training
sample) are computed by `compute_xi_stats` (ref model.py:84-96).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.scipy.special import erf, erfinv

from se_tpu.eval.gains import gfunc
from se_tpu.ops.stft import PRESET_DEEPXI, istft, stft
from se_tpu.models.registry import ModelEntry, register


# ------------------------------------------------------------------ xi maps

def _db(x):
    x = jnp.maximum(x, 1e-12)
    return 10.0 * jnp.log(x) / jnp.log(10.0)


def _db_inverse(x_db):
    return jnp.power(10.0, x_db / 10.0)


@dataclasses.dataclass
class XiMap:
    """Invertible scalar map family (ref DeepXi/deepxi/map.py).

    `map_type` composes prefixes: e.g. "DBNormalCDF" = dB then Gaussian CDF.
    Statistics-dependent maps need `fit(xi_sample)` before use.
    """

    map_type: str
    params: Any = None
    mu: Any = None
    sigma: Any = None
    vmin: Any = None
    vmax: Any = None
    b: Any = None

    def _pre(self, x):
        if "Square" in self.map_type:
            x = jnp.square(x)
        if "DB" in self.map_type:
            x = _db(x)
        return x

    def _post(self, x):
        if "DB" in self.map_type:
            x = _db_inverse(x)
        if "Square" in self.map_type:
            x = jnp.sqrt(x)
        return x

    def _laplace_cdf(self, x, mu, b):
        v = x - mu
        return 0.5 + 0.5 * jnp.sign(v) * (1.0 - jnp.exp(-jnp.abs(v) / b))

    def _laplace_cdf_inverse(self, x_bar, mu, b):
        v = x_bar - 0.5
        return mu - b * jnp.sign(v) * jnp.log(
            jnp.maximum(1.0 - 2.0 * jnp.abs(v), 1e-12)
        )

    def fit(self, xi_sample: np.ndarray) -> None:
        """Per-frequency-bin statistics from a (N, F) training sample."""
        x = np.asarray(self._pre(jnp.asarray(xi_sample)))
        if "NormalCDF" in self.map_type or "Standardise" in self.map_type:
            self.mu = x.mean(axis=0)
            self.sigma = x.std(axis=0)
        elif "MinMaxScaling" in self.map_type:
            self.vmin = x.min(axis=0)
            self.vmax = x.max(axis=0)
        elif "TruncatedLaplaceCDF" in self.map_type:
            mu, lower, upper = self.params
            self.b = np.array([
                (x[:, i][(x[:, i] > mu) & (x[:, i] < upper)] - mu).mean()
                for i in range(x.shape[1])
            ])
        elif "LaplaceCDF" in self.map_type:
            mu = self.params
            self.b = np.array([
                (x[:, i][x[:, i] > mu] - mu).mean() for i in range(x.shape[1])
            ])

    def map(self, x):
        mt = self.map_type
        if "NormalCDF" in mt:
            x = self._pre(x)
            return 0.5 * (1.0 + erf((x - self.mu) / (self.sigma * np.sqrt(2.0))))
        if "TruncatedLaplaceCDF" in mt:
            mu, lower, upper = self.params
            x = self._pre(x)
            lo = self._laplace_cdf(lower, mu, self.b)
            hi = self._laplace_cdf(upper, mu, self.b)
            x_bar = (self._laplace_cdf(x, mu, self.b) - lo) / (hi - lo)
            x_bar = jnp.where(x < lower, jnp.zeros_like(x), x_bar)
            return jnp.where(x > upper, jnp.ones_like(x), x_bar)
        if "LaplaceCDF" in mt:
            x = self._pre(x)
            return self._laplace_cdf(x, self.params, self.b)
        if "UniformCDF" in mt:
            a, b = self.params
            return (x - a) / (b - a)
        if "Standardise" in mt:
            return (self._pre(x) - self.mu) / self.sigma
        if "MinMaxScaling" in mt:
            x = self._pre(x)
            return jnp.clip((x - self.vmin) / (self.vmax - self.vmin), 0.0, 1.0)
        if "Logistic" in mt:
            k, x0 = self.params
            if "DB" in mt:
                x = _db(x)
            return 1.0 / (1.0 + jnp.exp(-k * (x - x0)))
        if "Clip" in mt:
            lo, hi = self.params
            x_bar = jnp.clip(x, lo, hi)
            if "Square" in mt:
                x_bar = jnp.square(x_bar)
            if "DB" in mt:
                x_bar = _db(x_bar)
            return x_bar
        if "Square" in mt:
            x_bar = jnp.square(x)
            return _db(x_bar) if "DB" in mt else x_bar
        if mt == "DB":
            return _db(x)
        if mt == "Linear":
            return x
        raise ValueError(f"invalid map_type {mt!r}")

    def inverse(self, x_bar):
        mt = self.map_type
        if "NormalCDF" in mt:
            # clip away exact 0/1 so erfinv stays finite (sigmoid outputs
            # saturate in float32; the reference inherits inf/NaN here)
            x_bar = jnp.clip(x_bar, 1e-7, 1.0 - 1e-7)
            x = self.mu + self.sigma * np.sqrt(2.0) * erfinv(2.0 * x_bar - 1.0)
            return self._post(x)
        if "TruncatedLaplaceCDF" in mt:
            mu, lower, upper = self.params
            lo = self._laplace_cdf(lower, mu, self.b)
            hi = self._laplace_cdf(upper, mu, self.b)
            x_bar = x_bar * (hi - lo) + lo
            x = self._laplace_cdf_inverse(x_bar, mu, self.b)
            return _db_inverse(x) if "DB" in mt else x
        if "LaplaceCDF" in mt:
            x = self._laplace_cdf_inverse(x_bar, self.params, self.b)
            return _db_inverse(x) if "DB" in mt else x
        if "UniformCDF" in mt:
            a, b = self.params
            return x_bar * (b - a) + a
        if "Standardise" in mt:
            return self._post(x_bar * self.sigma + self.mu)
        if "MinMaxScaling" in mt:
            return self._post(x_bar * (self.vmax - self.vmin) + self.vmin)
        if "Logistic" in mt:
            k, x0 = self.params
            x = x0 - jnp.log(jnp.maximum(1.0 / x_bar - 1.0, 1e-12)) / k
            return _db_inverse(x) if "DB" in mt else x
        if "Clip" in mt:
            x = x_bar
            if "DB" in mt:
                x = _db_inverse(x)
            if "Square" in mt:
                x = jnp.sqrt(x)
            return x
        if "Square" in mt:
            x = _db_inverse(x_bar) if "DB" in mt else x_bar
            return jnp.sqrt(x)
        if mt == "DB":
            return _db_inverse(x_bar)
        if mt == "Linear":
            return x_bar
        raise ValueError(f"invalid map_type {mt!r}")


# ------------------------------------------------------------------ network

class ResNetV2(nn.Module):
    """Causal bottleneck-residual TCN with cyclic dilation
    (ref network/tcn.py:116-225). Input (B, T, n_feat); output (B, T, n_outp).

    Frame-wise LayerNorm (eps 1e-6): first layer scale-only; block units
    have neither scale nor centre.
    """

    n_outp: int = 257
    n_blocks: int = 40
    d_model: int = 256
    d_f: int = 64
    k: int = 3
    max_d_rate: int = 16
    unit_type: str = "ReLU->LN->W+b"
    outp_act: str = "Sigmoid"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model, name="ff_conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=True,
                         name="ff_norm")(h)
        h = nn.relu(h)

        n_rates = int(np.log2(self.max_d_rate)) + 1
        for i in range(self.n_blocks):
            d_rate = int(2 ** (i % n_rates))
            h = self._block(h, d_rate, i)

        out = nn.Dense(self.n_outp, name="out_conv")(h)
        if self.outp_act == "Sigmoid":
            out = nn.sigmoid(out)
        elif self.outp_act == "ReLU":
            out = nn.relu(out)
        return out

    def _unit(self, x, n_filt, k, d_rate, name):
        ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          name=f"{name}_norm")
        if self.unit_type == "LN->ReLU->W+b":
            x = nn.relu(ln(x))
        elif self.unit_type == "ReLU->LN->W+b":
            x = ln(nn.relu(x))
        else:
            raise ValueError(f"invalid unit_type {self.unit_type!r}")
        if k == 1:
            return nn.Dense(n_filt, name=f"{name}_conv")(x)
        from se_tpu.nn.conv import CausalConv1d

        return CausalConv1d(n_filt, k, dilation=d_rate, name=f"{name}_conv")(x)

    def _block(self, x, d_rate, i):
        h = self._unit(x, self.d_f, 1, 1, f"b{i}_1")
        h = self._unit(h, self.d_f, self.k, d_rate, f"b{i}_2")
        h = self._unit(h, self.d_model, 1, 1, f"b{i}_3")
        return x + h


def _outp_act(out, kind: str):
    if kind == "Sigmoid":
        return nn.sigmoid(out)
    if kind == "ReLU":
        return nn.relu(out)
    if kind == "Linear":
        return out
    raise ValueError("Invalid outp_act")


class ResNet(nn.Module):
    """ResNet V1 (ref network/tcn.py:17-114): full-parameter LayerNorms,
    bias-free first conv, cyclic dilation."""

    n_outp: int = 257
    n_blocks: int = 40
    d_model: int = 256
    d_f: int = 64
    k: int = 3
    max_d_rate: int = 16
    outp_act: str = "Sigmoid"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from se_tpu.nn.conv import CausalConv1d

        h = nn.Dense(self.d_model, use_bias=False, name="ff_conv")(x)
        h = nn.relu(nn.LayerNorm(epsilon=1e-6, name="ff_norm")(h))
        n_rates = int(np.log2(self.max_d_rate)) + 1

        def unit(z, n_filt, k, d_rate, name):
            z = nn.relu(nn.LayerNorm(epsilon=1e-6, name=f"{name}_norm")(z))
            if k == 1:
                return nn.Dense(n_filt, use_bias=False, name=f"{name}_conv")(z)
            return CausalConv1d(n_filt, k, dilation=d_rate, use_bias=False,
                                name=f"{name}_conv")(z)

        for i in range(self.n_blocks):
            d_rate = int(2 ** (i % n_rates))
            y = unit(h, self.d_f, 1, 1, f"b{i}_1")
            y = unit(y, self.d_f, self.k, d_rate, f"b{i}_2")
            y = unit(y, self.d_model, 1, 1, f"b{i}_3")
            h = h + y
        out = nn.Dense(self.n_outp, name="out_conv")(h)
        return _outp_act(out, self.outp_act)


class ResNetV3(ResNetV2):
    """ResNetV2 with the amended first layer (ref tcn.py:227-245):
    conv(+bias) -> ReLU -> scale/centre-free LN."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model, name="ff_conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         name="ff_norm")(nn.relu(h))
        n_rates = int(np.log2(self.max_d_rate)) + 1
        for i in range(self.n_blocks):
            d_rate = int(2 ** (i % n_rates))
            h = self._block(h, d_rate, i)
        out = nn.Dense(self.n_outp, name="out_conv")(h)
        return _outp_act(out, self.outp_act)


class MHANet(nn.Module):
    """Causal multi-head attention network (ref network/attention.py:15-176).

    V3 flavor (`learned_pos=True`) adds a learned positional embedding
    (ref attention.py:387-433).

    Zero-padded frames (all features == 0, Keras `Masking(0.0)` semantics)
    are excluded from attention: logits get the additive -1e9 mask and the
    softmax output is multiplied by the pairwise sequence mask
    (ref attention.py:189-207, 209-246), so padded tails cannot leak into
    valid frames.

    V2 flavor (`v2=True`, ref attention.py:278-353) reproduces
    tfa.layers.MultiHeadAttention semantics instead: the query is
    pre-scaled by 1/sqrt(d_k), the merged boolean mask is applied as
    `logits += -10e9 * (1 - mask)` (AttentionMaskV2, attention.py:354-385),
    and — unlike V1 — the softmax output is NOT re-zeroed by the pairwise
    sequence mask, so fully-padded query rows attend uniformly (harmless:
    those frames are dropped downstream). Projections stay bias-free
    (use_projection_bias=False).
    """

    n_outp: int = 257
    d_model: int = 256
    n_blocks: int = 5
    n_heads: int = 8
    causal: bool = True
    outp_act: str = "Sigmoid"
    learned_pos: bool = False
    max_len: int = 2048
    v2: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = nn.Dense(self.d_model, use_bias=False, name="ff_conv")(x)
        h = nn.relu(nn.LayerNorm(epsilon=1e-6, name="ff_norm")(h))
        if self.learned_pos:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (self.max_len, self.d_model))
            h = h + pos[:t][None]

        valid = jnp.any(x != 0, axis=-1)  # (B, T) Masking(0.0) semantics
        seq_pair = valid[:, None, :] & valid[:, :, None]  # (B, T, T)
        mask = seq_pair[:, None]  # (B, 1, T, T)
        if self.causal:
            mask = mask & jnp.tril(jnp.ones((t, t), bool))[None, None]
        seq_f = seq_pair[:, None].astype(x.dtype)

        d_k = self.d_model // self.n_heads
        for i in range(self.n_blocks):
            q = nn.Dense(self.d_model, use_bias=False, name=f"b{i}_q")(h)
            k = nn.Dense(self.d_model, use_bias=False, name=f"b{i}_k")(h)
            v = nn.Dense(self.d_model, use_bias=False, name=f"b{i}_v")(h)

            def split(z):
                return z.reshape(b, t, self.n_heads, d_k).transpose(0, 2, 1, 3)

            logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
            logits = logits / np.sqrt(d_k)
            if self.v2:
                # tfa masking: additive -10e9 on masked pairs, no
                # post-softmax sequence re-zeroing (attention.py:278-353)
                logits = logits - 10e9 * (1.0 - mask.astype(logits.dtype))
                att = nn.softmax(logits, axis=-1)
            else:
                logits = jnp.where(mask, logits, logits - 1e9)
                att = nn.softmax(logits, axis=-1) * seq_f
            ctx = jnp.einsum("bhqk,bhkd->bhqd", att, split(v))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
            ctx = nn.Dense(self.d_model, use_bias=False, name=f"b{i}_o")(ctx)
            h = nn.LayerNorm(epsilon=1e-6, name=f"b{i}_ln1")(h + ctx)
            ffn = nn.Dense(self.d_model * 4, name=f"b{i}_ff1")(h)
            ffn = nn.Dense(self.d_model, name=f"b{i}_ff2")(nn.relu(ffn))
            h = nn.LayerNorm(epsilon=1e-6, name=f"b{i}_ln2")(h + ffn)
        out = nn.Dense(self.n_outp, name="out_conv")(h)
        return _outp_act(out, self.outp_act)


class ResLSTM(nn.Module):
    """Residual LSTM stack (ref network/rnn.py:13-78): Dense(no-bias)+LN+ReLU
    feedforward, per-block LSTM residuals; BiLSTM variant sums directions
    (merge_mode='sum', ref rnn.py:80-101)."""

    n_outp: int = 257
    n_blocks: int = 5
    d_model: int = 512
    outp_act: str = "Sigmoid"
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model, use_bias=False, name="ff")(x)
        h = nn.relu(nn.LayerNorm(epsilon=1e-6, name="ff_norm")(h))
        for i in range(self.n_blocks):
            from se_tpu.nn import LSTM

            y = LSTM(self.d_model, num_layers=1, name=f"lstm{i}")(h)
            if self.bidirectional:
                y = y + LSTM(self.d_model, num_layers=1, name=f"lstm{i}_rev_dir")(
                    jnp.flip(h, axis=1))[:, ::-1]
            h = h + y
        out = nn.Dense(self.n_outp, name="out")(h)
        return _outp_act(out, self.outp_act)


class RDLNet(nn.Module):
    """Residual-dense lattice network (ref DeepXi/deepxi/network/rdlnet.py:13-163).

    The selector imports RDLNet from a `dev` package absent from the reference
    repo (network/selector.py:47-58), but the shipped
    `deepxi/network/rdlnet.py` module is self-contained and is the spec
    implemented here. Each block is a triangular lattice of dilated causal
    conv units: height H=(L-1)//2+1 rows, L columns; row h uses
    n_filt=m_1/2^h, kernel 2(h+1)-1, dilation 2^h. Units are joined by
    weighted residual links (the wider tensor is projected to the narrower
    one with a bias-free 1x1 conv, rdlnet.py:119-135) and channel concats;
    each block's output is concatenated onto its input (DenseNet-style,
    rdlnet.py:47-49).

    Reference quirks handled deliberately:
    - rdlnet.py:99 builds a unit on `inp` with stale (n_filt, k, d_rate)
      whose output is immediately overwritten at :115; in Keras' functional
      API that layer is dangling (unreachable from the model output), so it
      contributes nothing and is omitted.
    - The "scale*LN+center->ReLU->W+b" unit (rdlnet.py:151-156) computes an
      LN of its input but then discards it (`x = ReLU()(inp)` overwrites),
      and the LN is parameter-free (center=False, scale=False) — the
      effective computation ReLU->conv is implemented directly.
    """

    n_outp: int = 257
    n_blocks: int = 3
    length: int = 7
    m_1: int = 64
    padding: str = "causal"
    unit_type: str = "ReLU->LN->W+b"
    outp_act: str = "Sigmoid"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(self.n_blocks):
            h = jnp.concatenate([self._block(h, i), h], axis=-1)
        out = nn.Dense(self.n_outp, name="out_conv")(h)
        return _outp_act(out, self.outp_act)

    def _unit(self, x, n_filt, k, d_rate, name):
        if self.unit_type == "ReLU->LN->W+b":
            x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                             name=f"{name}_norm")(nn.relu(x))
        elif self.unit_type == "scale*LN+center->ReLU->W+b":
            x = nn.relu(x)  # LN output discarded by the reference (see class doc)
        else:
            raise ValueError(f"invalid unit_type {self.unit_type!r}")
        if self.padding == "causal":
            from se_tpu.nn.conv import CausalConv1d

            return CausalConv1d(n_filt, k, dilation=d_rate,
                                name=f"{name}_conv")(x)
        return nn.Conv(n_filt, (k,), kernel_dilation=(d_rate,),
                       padding="SAME", name=f"{name}_conv")(x)

    def _wres(self, x, y, name):
        # Weighted residual: project the wider input down (rdlnet.py:119-135).
        if x.shape[-1] > y.shape[-1]:
            x = nn.Dense(y.shape[-1], use_bias=False, name=f"{name}_proj")(x)
        elif x.shape[-1] < y.shape[-1]:
            y = nn.Dense(x.shape[-1], use_bias=False, name=f"{name}_proj")(y)
        return x + y

    def _block(self, inp, bi):
        height = (self.length - 1) // 2 + 1
        midpoint = (self.length + 1) // 2
        lat = [[None] * self.length for _ in range(height)]
        for l in range(midpoint):
            # Last ascending column iterates rows top-down (rdlnet.py:66-67)
            # so the h+1 concat below sees an already-built neighbour.
            rows = range(height) if l != midpoint - 1 else reversed(range(height))
            for h in rows:
                if h > l:
                    continue
                if l == 0:
                    unit_inp = inp
                elif l == h:
                    unit_inp = lat[h - 1][l - 1]
                else:
                    unit_inp = lat[h][l - 1]
                name = f"b{bi}_h{h}_l{l}"
                u = self._unit(unit_inp, int(self.m_1 / 2**h),
                               2 * (h + 1) - 1, 2**h, name)
                if l == h:
                    out = u
                elif h == 0 and l == 1:
                    out = self._wres(u, inp, name)
                elif h + 1 == l:
                    out = self._wres(u, lat[h - 1][l - 2], name)
                else:
                    out = self._wres(u, lat[h][l - 2], name)
                if l == 0 or h == height - 1 or (h == 0 and l < midpoint - 1):
                    pass
                elif l == midpoint - 1:
                    out = jnp.concatenate([out, lat[h + 1][l]], axis=-1)
                else:
                    out = jnp.concatenate([out, lat[h - 1][l]], axis=-1)
                lat[h][l] = out
        for l in range(midpoint, self.length):
            for h in reversed(range(height)):
                if h >= self.length - l:
                    continue
                name = f"b{bi}_h{h}_l{l}"
                u = self._unit(lat[h][l - 1], int(self.m_1 / 2**h),
                               2 * (h + 1) - 1, 2**h, name)
                out = self._wres(u, lat[h][l - 2], name)
                if l != self.length - h - 1:
                    out = jnp.concatenate([out, lat[h + 1][l]], axis=-1)
                lat[h][l] = out
        return lat[0][self.length - 1]


# --------------------------------------------------------------- MagXi glue

def polar_analysis(x: jnp.ndarray):
    """Waveform -> (STMS, STPS) under the tf.signal convention
    (ref deepxi/sig.py:43-55)."""
    re, im = stft(x, PRESET_DEEPXI)
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    return mag, phase


def polar_synthesis(stms: jnp.ndarray, stps: jnp.ndarray, length=None):
    """(STMS, STPS) -> waveform (ref deepxi/sig.py:57-69)."""
    re = stms * jnp.cos(stps)
    im = stms * jnp.sin(stps)
    return istft(re, im, PRESET_DEEPXI, length=length)


def instantaneous_xi(s_stms, d_stms):
    """|S|^2 / max(|D|^2, 1e-12) (ref sig.py:110-121)."""
    return jnp.square(s_stms) / jnp.maximum(jnp.square(d_stms), 1e-12)


def compute_xi_stats(clean_wavs: Sequence[np.ndarray],
                     noise_wavs: Sequence[np.ndarray],
                     xi_map: XiMap) -> XiMap:
    """Fit a map from per-utterance instantaneous xi (ref model.py:84-96,
    inp_tgt.py:155-166). Waveforms are float arrays at 16 kHz."""
    frames = []
    for s, d in zip(clean_wavs, noise_wavs):
        n = min(len(s), len(d))
        s_stms, _ = polar_analysis(jnp.asarray(s[:n])[None])
        d_stms, _ = polar_analysis(jnp.asarray(d[:n])[None])
        frames.append(np.asarray(instantaneous_xi(s_stms, d_stms))[0])
    xi_map.fit(np.vstack(frames))
    return xi_map


class DeepXi(nn.Module):
    """End-to-end enhancement: STMS -> ResNetV2 -> xi_bar_hat. Use
    `enhance()` for the full waveform pipeline with a fitted map.

    `network_kwargs` carries the reference's typed network flags
    (d_model, n_blocks, d_f, k, max_d_rate, unit_type, outp_act, ...
    — ref args_resnet.py:103-122) through to the selected network, as a
    hashable tuple of (name, value) pairs (modules are jit-static)."""

    network: str = "ResNetV2"
    n_feat: int = 257
    network_kwargs: tuple = ()

    @nn.compact
    def __call__(self, x_stms: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        nets = {
            "ResNet": ResNet,
            "ResNetV2": ResNetV2,
            "ResNetV3": ResNetV3,
            "MHANet": MHANet,
            "MHANetV2": functools.partial(MHANet, v2=True),
            "MHANetV3": functools.partial(MHANet, learned_pos=True),
            "ResLSTM": ResLSTM,
            "ResBiLSTM": functools.partial(ResLSTM, bidirectional=True),
            "RDLNet": RDLNet,
        }
        if self.network not in nets:
            raise ValueError(f"unknown network {self.network!r}")
        return nets[self.network](n_outp=self.n_feat, name="net",
                                  **dict(self.network_kwargs))(x_stms)


def enhance(variables, model: DeepXi, wav: jnp.ndarray, xi_map: XiMap,
            gain: str = "mmse-lsa", length: int | None = None) -> jnp.ndarray:
    """(B, n) noisy waveform -> enhanced waveform
    (ref deepxi/model.py:232-340, inp_tgt.py:194-210)."""
    x_stms, x_stps = polar_analysis(wav)
    xi_bar_hat = model.apply(variables, x_stms)
    xi_hat = xi_map.inverse(xi_bar_hat)
    gamma_hat = xi_hat + 1.0
    y_stms = x_stms * gfunc(xi_hat, gamma_hat, gain)
    return polar_synthesis(y_stms, x_stps, length=length)


register(
    ModelEntry(
        name="deepxi",
        make=DeepXi,
        stft=PRESET_DEEPXI,
        io_kind="hybrid",
        from_reference_state_dict=None,  # reference is TF; no torch weights
        variants=("resnet", "reslstm"),
    )
)
