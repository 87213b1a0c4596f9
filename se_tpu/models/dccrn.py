"""DCCRN deep complex conv-recurrent net, phase-aware masking
(ref: DCCRN/DCCRN_cprs.py:8-259 and DCCRN_SNR/DCCRN.py:9-183; the complex
primitives those files import from the absent `complexnn` module are
reconstructed in se_tpu/nn/complex_ops.py).

Decode configuration (ref DCCRN/dccrn_decode_vb.py:11): use_clstm=True,
rnn_units=256, kernel_num=[32,64,128,256,256,256], masking mode 'E'.

Quirks preserved (SURVEY.md §7.3 item 7): DC bin stripped at input and
zero-re-padded at output; decoder trims time frames asymmetrically —
`[..., 1:]` (DCCRN) vs `[..., :-1]` (DCCRN_SNR, `snr_variant=True`).

Layout: (B, T, F, C) with complex channels as [real-half | imag-half].
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import BatchNorm
from se_tpu.nn.complex_ops import (
    ComplexConv2d,
    ComplexConvTranspose2d,
    NaiveComplexLSTM,
    complex_cat,
    merge_complex,
    split_complex,
)
from se_tpu.nn.recurrent import LSTM
from se_tpu.ops.stft import PRESET_512_128
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc


class DCCRN(nn.Module):
    rnn_layers: int = 2
    rnn_units: int = 256
    fft_len: int = 512
    masking_mode: str = "E"  # 'E' | 'C' | 'R'
    use_clstm: bool = True
    kernel_size: int = 5
    kernel_num: Sequence[int] = (32, 64, 128, 256, 256, 256)
    snr_variant: bool = False  # DCCRN_SNR: decoder crops [..., :-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, T, F=257, 2) noisy (re, im) -> (B, T, F, 2) enhanced."""
        in_re, in_im = x[..., 0], x[..., 1]
        spec_mag = jnp.sqrt(in_re**2 + in_im**2)
        spec_phase = jnp.arctan2(in_im, in_re)

        kn = (2,) + tuple(self.kernel_num)
        # strip DC bin; channels-as-complex: [re | im]
        out = jnp.stack([x[:, :, 1:, 0], x[:, :, 1:, 1]], axis=-1)

        skips = []
        for i in range(len(kn) - 1):
            out = ComplexConv2d(
                kn[i + 1], (2, self.kernel_size), strides=(1, 2),
                padding_tf=((1, 0), (2, 2)), name=f"en{i}",
            )(out)
            out = BatchNorm(name=f"en_bn{i}")(out, use_running_average=not train)
            out = nn.PReLU(negative_slope_init=0.25, name=f"en_act{i}")(out)
            skips.append(out)

        b, t, dims, channels = out.shape
        half = channels // 2
        if self.use_clstm:
            # (B, T, D, C) -> real/imag halves flattened as torch's
            # (C/2 outer, D inner) feature order
            re, im = split_complex(out)
            re = jnp.swapaxes(re, 2, 3).reshape(b, t, half * dims)
            im = jnp.swapaxes(im, 2, 3).reshape(b, t, half * dims)
            for k in range(self.rnn_layers):
                proj = half * dims * 2 if k == self.rnn_layers - 1 else None
                re, im = NaiveComplexLSTM(
                    self.rnn_units, projection_dim=proj, name=f"clstm{k}"
                )(re, im)
            re = jnp.swapaxes(re.reshape(b, t, half, dims), 2, 3)
            im = jnp.swapaxes(im.reshape(b, t, half, dims), 2, 3)
            out = merge_complex(re, im)
        else:
            h = jnp.swapaxes(out, 2, 3).reshape(b, t, channels * dims)
            h = LSTM(self.rnn_units, num_layers=2, name="enhance")(h)
            h = nn.Dense(channels * dims, name="tranform")(h)
            out = jnp.swapaxes(h.reshape(b, t, channels, dims), 2, 3)

        for i in range(len(kn) - 1):
            idx = len(kn) - 1 - i
            out = complex_cat([out, skips[-1 - i]])
            out = ComplexConvTranspose2d(
                kn[idx - 1], (2, self.kernel_size), strides=(1, 2),
                padding=(0, 2), output_padding=(0, 1), name=f"de{i}",
            )(out)
            out = out[:, :-1] if self.snr_variant else out[:, 1:]
            if idx != 1:
                out = BatchNorm(name=f"de_bn{i}")(out, use_running_average=not train)
                out = nn.PReLU(negative_slope_init=0.25, name=f"de_act{i}")(out)

        mask_re = jnp.pad(out[..., 0], ((0, 0), (0, 0), (1, 0)))
        mask_im = jnp.pad(out[..., 1], ((0, 0), (0, 0), (1, 0)))

        if self.masking_mode == "E":
            mask_mag = jnp.sqrt(mask_re**2 + mask_im**2)
            real_phase = mask_re / (mask_mag + 1e-8)
            imag_phase = mask_im / (mask_mag + 1e-8)
            mask_phase = jnp.arctan2(imag_phase, real_phase)
            est_mag = jnp.tanh(mask_mag) * spec_mag
            est_phase = spec_phase + mask_phase
            real = est_mag * jnp.cos(est_phase)
            imag = est_mag * jnp.sin(est_phase)
        elif self.masking_mode == "C":
            real = in_re * mask_re - in_im * mask_im
            imag = in_re * mask_im + in_im * mask_re
        elif self.masking_mode == "R":
            real = in_re * mask_re
            imag = in_im * mask_im
        else:
            raise ValueError(f"unknown masking mode {self.masking_mode!r}")
        return jnp.stack([real, imag], axis=-1)


def _complex_conv(sd: dict, prefix: str, transpose: bool = False) -> dict:
    fn = tc.conv_transpose2d if transpose else tc.conv2d
    out = {
        "real_conv": fn(sd, f"{prefix}.real_conv"),
        "imag_conv": fn(sd, f"{prefix}.imag_conv"),
    }
    # reference layout is (C, F, T): conv kernels are (kf, kt); ours (kt, kf)
    for v in out.values():
        v["kernel"] = v["kernel"].transpose(1, 0, 2, 3)
    return out


def from_reference_state_dict(sd: dict, num_layers: int = 6, rnn_layers: int = 2) -> dict:
    params: dict = {}
    stats: dict = {}
    for i in range(num_layers):
        params[f"en{i}"] = _complex_conv(sd, f"encoder.{i}.0")
        params[f"en_bn{i}"] = tc.batchnorm_params(sd, f"encoder.{i}.1")
        stats[f"en_bn{i}"] = tc.batchnorm_stats(sd, f"encoder.{i}.1")
        params[f"en_act{i}"] = tc.prelu(sd, f"encoder.{i}.2")
        params[f"de{i}"] = _complex_conv(sd, f"decoder.{i}.0", transpose=True)
        if i != num_layers - 1:
            params[f"de_bn{i}"] = tc.batchnorm_params(sd, f"decoder.{i}.1")
            stats[f"de_bn{i}"] = tc.batchnorm_stats(sd, f"decoder.{i}.1")
            params[f"de_act{i}"] = tc.prelu(sd, f"decoder.{i}.2")
    for k in range(rnn_layers):
        blk = {
            "real_lstm": tc.lstm(sd, f"enhance.{k}.real_lstm", 1),
            "imag_lstm": tc.lstm(sd, f"enhance.{k}.imag_lstm", 1),
        }
        if f"enhance.{k}.r_trans.weight" in sd:
            blk["r_trans"] = tc.dense(sd, f"enhance.{k}.r_trans")
            blk["i_trans"] = tc.dense(sd, f"enhance.{k}.i_trans")
        params[f"clstm{k}"] = blk
    return {"params": params, "batch_stats": stats}


register(
    ModelEntry(
        name="dccrn",
        make=DCCRN,
        stft=PRESET_512_128,
        io_kind="complex_map",
        from_reference_state_dict=from_reference_state_dict,
        variants=("snr",),
    )
)
