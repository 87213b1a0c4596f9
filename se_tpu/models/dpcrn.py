"""DPCRN dual-path CRN with complex ratio mask (ref: DPCRN/DPCRN.py:16-174).

5-layer conv encoder (2->32->32->32->64->128 ch) -> one DPRNN block applied
TWICE with shared weights (ref DPCRN.py:27-28: `self.dprnn(self.dprnn(x))`)
-> deconv decoder -> 2-channel complex mask applied by complex multiply.
Input (B, T, F=161, 2); output enhanced (B, T, F, 2).

The dual-path block is layout-native here: NHWC (B, T, F, C) is exactly the
(B*T, F, C) intra / (B*F, T, C) inter fold the reference builds with permutes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import BatchNorm, Conv2d, ConvTranspose2d, LayerNorm, LSTM
from se_tpu.nn.recurrent import lstm_split
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc

_EN_CH = (32, 32, 32, 64, 128)
_DE_CH = (64, 32, 32, 32, 2)


class DPRNN(nn.Module):
    """Intra-frequency BiLSTM + inter-time LSTM with LayerNorm residuals."""

    channels: int = 128
    bottleneck_f: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, carry=None, split: int | None = None):
        """carry: optional 2-layer inter-LSTM state (batch dim B*F) for
        exact streaming; the intra BiLSTM recurs over frequency only and
        needs no state. Returns (out, new_carry) when given."""
        b, t, f, c = x.shape
        # intra: fold time into batch, recur over frequency
        h = x.reshape(b * t, f, c)
        h = LSTM(c // 2, num_layers=2, bidirectional=True, name="intra_rnn")(h)
        h = nn.Dense(c, name="intra_fc")(h)
        h = h.reshape(b, t, f, c)
        h = LayerNorm(ndims=2, name="ln1")(h)
        intra = h + x

        # inter: fold frequency into batch, recur over time
        h = jnp.swapaxes(intra, 1, 2).reshape(b * f, t, c)
        inter = LSTM(c, num_layers=2, name="inter_rnn")
        if carry is None:
            h = inter(h)
            new_carry = None
        else:
            h, new_carry = lstm_split(inter, h, carry,
                                      t if split is None else split)
        h = nn.Dense(c, name="inter_fc")(h)
        h = jnp.swapaxes(h.reshape(b, f, t, c), 1, 2)
        h = LayerNorm(ndims=2, name="ln2")(h)
        out = h + intra
        return out if carry is None else (out, new_carry)


class DPCRN(nn.Module):
    # 5 causal encoder convs (kt=2) + 5 causal decoder deconvs (Chomp_T)
    replay_frames = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 carry=None, split: int | None = None):
        """carry: optional (first_pass, second_pass) pair of inter-LSTM
        states (shared weights, separate states — the block is applied
        twice) for exact streaming; returns (out, new_carry) when given."""
        inpt = x
        skips = []
        for i, ch in enumerate(_EN_CH):
            x = Conv2d(ch, (2, 3), strides=(1, 2),
                       padding=((1, 0), (0, 0)), name=f"en{i}")(x)
            x = BatchNorm(name=f"en_bn{i}")(x, use_running_average=not train)
            x = nn.PReLU(negative_slope_init=0.25, name=f"en_act{i}")(x)
            skips.append(x)

        dprnn = DPRNN(name="dprnn")
        if carry is None:
            x = dprnn(x)
            x = dprnn(x)  # shared weights, applied twice (ref DPCRN.py:27-28)
            new_carry = None
        else:
            x, nc1 = dprnn(x, carry=carry[0], split=split)
            x, nc2 = dprnn(x, carry=carry[1], split=split)
            new_carry = (nc1, nc2)

        for i, ch in enumerate(_DE_CH):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ConvTranspose2d(ch, (2, 3), strides=(1, 2), name=f"de{i}")(x)
            x = x[:, :-1]  # Chomp_T(1)
            if i == 3:
                x = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))
            if i < 4:
                x = BatchNorm(name=f"de_bn{i}")(x, use_running_average=not train)
                x = nn.PReLU(negative_slope_init=0.25, name=f"de_act{i}")(x)

        mask_r, mask_i = x[..., 0], x[..., 1]
        in_r, in_i = inpt[..., 0], inpt[..., 1]
        enh_r = in_r * mask_r - in_i * mask_i
        enh_i = in_r * mask_i + in_i * mask_r
        est = jnp.stack([enh_r, enh_i], axis=-1)
        return est if carry is None else (est, new_carry)

    @staticmethod
    def zero_carry(batch: int, channels: int = 128, bottleneck_f: int = 4):
        # inter-LSTM batch dim is B*F at the bottleneck
        z = lambda: LSTM.zero_carry(batch * bottleneck_f, channels, 2)
        return (z(), z())


def from_reference_state_dict(sd: dict) -> dict:
    params: dict = {}
    stats: dict = {}
    for i in range(5):
        params[f"en{i}"] = tc.conv2d(sd, f"en.en_module.{i}.1")
        params[f"en_bn{i}"] = tc.batchnorm_params(sd, f"en.en_module.{i}.2")
        stats[f"en_bn{i}"] = tc.batchnorm_stats(sd, f"en.en_module.{i}.2")
        params[f"en_act{i}"] = tc.prelu(sd, f"en.en_module.{i}.3")
    params["dprnn"] = {
        "intra_rnn": tc.lstm(sd, "dprnn.intra_rnn", 2, bidirectional=True),
        "intra_fc": tc.dense(sd, "dprnn.intra_fc"),
        "inter_rnn": tc.lstm(sd, "dprnn.inter_rnn", 2),
        "inter_fc": tc.dense(sd, "dprnn.inter_fc"),
        "ln1": tc.layernorm(sd, "dprnn.ln1"),
        "ln2": tc.layernorm(sd, "dprnn.ln2"),
    }
    for i in range(5):
        params[f"de{i}"] = tc.conv_transpose2d(sd, f"de.de_module.{i}.0")
        if i < 4:
            bn_idx = 3 if i == 3 else 2
            params[f"de_bn{i}"] = tc.batchnorm_params(sd, f"de.de_module.{i}.{bn_idx}")
            stats[f"de_bn{i}"] = tc.batchnorm_stats(sd, f"de.de_module.{i}.{bn_idx}")
            params[f"de_act{i}"] = tc.prelu(sd, f"de.de_module.{i}.{bn_idx + 1}")
    return {"params": params, "batch_stats": stats}


register(
    ModelEntry(
        name="dpcrn",
        make=DPCRN,
        stft=PRESET_320,
        io_kind="complex_mask",
        from_reference_state_dict=from_reference_state_dict,
    )
)
