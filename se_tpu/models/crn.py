"""CRN conv-recurrent magnitude mapping (ref: CRN/CRN.py:16-117).

5-layer strided conv encoder (1->16->...->256 ch, freq stride 2, causal time
pad) -> 2-layer LSTM(1024) on the flattened (C=256, F=4) bottleneck ->
5-layer transposed-conv decoder with causal trim (Chomp_T) and concat skips
-> Softplus magnitude. Layout here is NHWC (B, T, F, C).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import BatchNorm, Conv2d, ConvTranspose2d, LSTM
from se_tpu.nn.recurrent import lstm_split
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc

_EN_CH = (16, 32, 64, 128, 256)
_DE_CH = (128, 64, 32, 16, 1)


class CRN(nn.Module):
    # frames of exact left-context replay for streaming: 5 causal encoder
    # convs (kt=2) + 5 causal decoder deconvs (kt=2 with Chomp_T)
    replay_frames = 10

    @nn.compact
    def __call__(self, mag: jnp.ndarray, train: bool = False,
                 carry=None, split: int | None = None):
        """carry: optional 2-layer LSTM state for exact streaming decode
        (se_tpu.eval.streaming); `split` checkpoints the carried state after
        that many frames (left-context replay). Returns (out, new_carry)
        when carry is given."""
        x = mag[..., None]  # (B, T, F, 1)
        b, t = x.shape[0], x.shape[1]

        skips = []
        for i, ch in enumerate(_EN_CH):
            x = Conv2d(ch, (2, 3), strides=(1, 2),
                       padding=((1, 0), (0, 0)), name=f"en{i}")(x)
            x = BatchNorm(name=f"en_bn{i}")(x, use_running_average=not train)
            x = nn.elu(x)
            skips.append(x)

        # Bottleneck: (B,T,F=4,C=256) -> flatten as torch's (C outer, F inner)
        h = jnp.swapaxes(x, 2, 3).reshape(b, t, 1024)
        lstm = LSTM(1024, num_layers=2, name="lstm")
        if carry is None:
            h = lstm(h)
            new_carry = None
        else:
            h, new_carry = lstm_split(lstm, h, carry,
                                      t if split is None else split)
        x = jnp.swapaxes(h.reshape(b, t, 256, 4), 2, 3)  # back to (B,T,F,C)

        for i, ch in enumerate(_DE_CH):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ConvTranspose2d(ch, (2, 3), strides=(1, 2), name=f"de{i}")(x)
            x = x[:, :-1]  # Chomp_T(1): drop trailing time step
            if i == 3:  # de4 pads one frequency bin on the left (79 -> 80)
                x = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))
            x = BatchNorm(name=f"de_bn{i}")(x, use_running_average=not train)
            x = nn.elu(x) if i < 4 else nn.softplus(x)
        out = x[..., 0]  # (B, T, F)
        return out if carry is None else (out, new_carry)

    @staticmethod
    def zero_carry(batch: int):
        return LSTM.zero_carry(batch, 1024, 2)


def from_reference_state_dict(sd: dict) -> dict:
    params: dict = {"lstm": tc.lstm(sd, "lstm", 2)}
    stats: dict = {}
    for i in range(5):
        # encoder Sequential: [pad, conv, bn, elu] -> indices 1, 2
        params[f"en{i}"] = tc.conv2d(sd, f"en.en_module.{i}.1")
        params[f"en_bn{i}"] = tc.batchnorm_params(sd, f"en.en_module.{i}.2")
        stats[f"en_bn{i}"] = tc.batchnorm_stats(sd, f"en.en_module.{i}.2")
        # decoder Sequential: [deconv, chomp, bn, act] (de4 has pad at idx 1)
        bn_idx = 3 if i == 3 else 2
        params[f"de{i}"] = tc.conv_transpose2d(sd, f"de.de_module.{i}.0")
        params[f"de_bn{i}"] = tc.batchnorm_params(sd, f"de.de_module.{i}.{bn_idx}")
        stats[f"de_bn{i}"] = tc.batchnorm_stats(sd, f"de.de_module.{i}.{bn_idx}")
    return {"params": params, "batch_stats": stats}


register(
    ModelEntry(
        name="crn",
        make=CRN,
        stft=PRESET_320,
        io_kind="mag_mask",
        from_reference_state_dict=from_reference_state_dict,
    )
)
