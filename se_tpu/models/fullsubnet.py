"""FullSubNet full-band/sub-band fusion, cIRM output
(ref: FullSubNet/fullsubnet_net_sa/model.py:9-118).

Full-band 2-layer LSTM(512) over the 257-bin magnitude, per-bin unfold into
31-wide sub-band units (reflect pad + shifted slices — layout-preserving, no
gather), concat with the full-band output, sub-band 2-layer LSTM(384) on a
(B*F, T, 32) fold, 2-channel cIRM. Look-ahead of 2 frames via pad+slice
(ref model.py:79,117). Training-only `drop_band` frequency subsampling lives
in `drop_band()` (ref feature.py:236-264).

Layout: (B, T, F). The sub-band fold maps F onto the batch axis, which keeps
the 128-lane dimension dense for the scan matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from se_tpu.nn import LSTM
from se_tpu.ops.stft import PRESET_512_256
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc

EPS = np.finfo(np.float32).eps  # ref fullsubnet_net_sa/constant.py


class SequenceModel(nn.Module):
    """LSTM stack + Dense + optional activation (ref sequence_model.py:4-84)."""

    hidden: int
    out: int
    num_layers: int = 2
    activation: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = LSTM(self.hidden, num_layers=self.num_layers, name="lstm")(x)
        x = nn.Dense(self.out, name="fc")(x)
        if self.activation == "ReLU":
            x = nn.relu(x)
        elif self.activation == "Tanh":
            x = nn.tanh(x)
        return x


def offline_laplace_norm(x: jnp.ndarray) -> jnp.ndarray:
    """x / (mean over all non-batch dims + 1e-5) (ref base_model.py:197-209)."""
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    return x / (mu + 1e-5)


def cumulative_laplace_norm(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F): divide by causal running mean (ref base_model.py:211-239)."""
    f = x.shape[-1]
    step_sum = jnp.sum(x, axis=-1)  # (B, T)
    cum = jnp.cumsum(step_sum, axis=-1)
    cnt = jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32) * f
    mean = cum / cnt
    return x / (mean[..., None] + EPS)


def unfold_subband(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, T, F) -> (B, T, F, 2n+1) sub-band units via reflect pad + slices
    (ref base_model.py:12-42)."""
    if n < 1:
        return x[..., None]
    xp = jnp.pad(x, ((0, 0), (0, 0), (n, n)), mode="reflect")
    f = x.shape[-1]
    return jnp.stack([xp[..., i : i + f] for i in range(2 * n + 1)], axis=-1)


def drop_band(x: jnp.ndarray, num_groups: int = 2) -> jnp.ndarray:
    """Training-only frequency subsampling (ref feature.py:236-264).

    x: (B, T, F, C) -> (B, T, F // num_groups, C), with batch regrouped the
    way the reference does (group g takes samples g::G and freqs g::G).
    """
    if num_groups <= 1:
        return x
    b, t, f, c = x.shape
    f = f - (f % num_groups)
    x = x[:, :, :f]
    outs = [x[g::num_groups, :, g::num_groups] for g in range(num_groups)]
    return jnp.concatenate(outs, axis=0)


class FullSubNet(nn.Module):
    num_freqs: int = 257
    look_ahead: int = 2
    fb_num_neighbors: int = 0
    sb_num_neighbors: int = 15
    fb_hidden: int = 512
    sb_hidden: int = 384
    num_groups_in_drop_band: int = 2

    @nn.compact
    def __call__(self, noisy_mag: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F) magnitude -> (B, T, F, 2) cIRM."""
        b = noisy_mag.shape[0]
        f = self.num_freqs
        mag = jnp.pad(noisy_mag, ((0, 0), (0, self.look_ahead), (0, 0)))
        t = mag.shape[1]

        fb_in = offline_laplace_norm(mag)
        fb_out = SequenceModel(self.fb_hidden, f, activation="ReLU",
                               name="fb_model")(fb_in)

        fb_unf = unfold_subband(fb_out, self.fb_num_neighbors)
        sb_unf = unfold_subband(mag, self.sb_num_neighbors)
        sb_in = jnp.concatenate([sb_unf, fb_unf], axis=-1)  # (B, T, F, 32)
        sb_in = offline_laplace_norm(sb_in)

        if train and b > 1:
            sb_in = drop_band(sb_in, self.num_groups_in_drop_band)
            b, f = sb_in.shape[0], sb_in.shape[2]

        folded = jnp.swapaxes(sb_in, 1, 2).reshape(b * f, t, sb_in.shape[-1])
        mask = SequenceModel(self.sb_hidden, 2, activation=None,
                             name="sb_model")(folded)
        mask = jnp.swapaxes(mask.reshape(b, f, t, 2), 1, 2)  # (B, T, F, 2)
        return mask[:, self.look_ahead :]


def from_reference_state_dict(sd: dict) -> dict:
    params = {
        "fb_model": {
            "lstm": tc.lstm(sd, "fb_model.sequence_model", 2),
            "fc": tc.dense(sd, "fb_model.fc_output_layer"),
        },
        "sb_model": {
            "lstm": tc.lstm(sd, "sb_model.sequence_model", 2),
            "fc": tc.dense(sd, "sb_model.fc_output_layer"),
        },
    }
    return {"params": params}


register(
    ModelEntry(
        name="fullsubnet",
        make=FullSubNet,
        stft=PRESET_512_256,
        io_kind="cirm",
        from_reference_state_dict=from_reference_state_dict,
    )
)
