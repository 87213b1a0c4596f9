"""Torch `complexnn` oracle fixture for DCCRN parity tests.

The reference DCCRN imports `complexnn` which is absent from the repo
(DCCRN/DCCRN_cprs.py:4-6). This is a reconstruction of the published DCCRN
complex primitives' semantics, used ONLY as a test oracle so the reference
model file itself can execute; se_tpu's JAX implementation is validated
against the reference forward running on top of this.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class ComplexConv2d(nn.Module):
    """Channels = [real-half | imag-half]; causal pad on T, symmetric on F."""

    def __init__(self, in_channels, out_channels, kernel_size=(1, 1),
                 stride=(1, 1), padding=(0, 0), dilation=1, groups=1,
                 causal=True, complex_axis=1):
        super().__init__()
        self.in_channels = in_channels // 2
        self.out_channels = out_channels // 2
        self.padding = padding
        self.causal = causal
        self.complex_axis = complex_axis
        self.real_conv = nn.Conv2d(self.in_channels, self.out_channels,
                                   kernel_size, stride,
                                   padding=(padding[0], 0),
                                   dilation=dilation, groups=groups)
        self.imag_conv = nn.Conv2d(self.in_channels, self.out_channels,
                                   kernel_size, stride,
                                   padding=(padding[0], 0),
                                   dilation=dilation, groups=groups)

    def forward(self, inputs):
        if self.padding[1] != 0 and self.causal:
            inputs = F.pad(inputs, [self.padding[1], 0, 0, 0])
        else:
            inputs = F.pad(inputs, [self.padding[1], self.padding[1], 0, 0])
        real, imag = torch.chunk(inputs, 2, self.complex_axis)
        real2real = self.real_conv(real)
        imag2imag = self.imag_conv(imag)
        real2imag = self.imag_conv(real)
        imag2real = self.real_conv(imag)
        real = real2real - imag2imag
        imag = real2imag + imag2real
        return torch.cat([real, imag], self.complex_axis)


class ComplexConvTranspose2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=(1, 1),
                 stride=(1, 1), padding=(0, 0), output_padding=(0, 0),
                 groups=1, complex_axis=1):
        super().__init__()
        self.in_channels = in_channels // 2
        self.out_channels = out_channels // 2
        self.complex_axis = complex_axis
        self.real_conv = nn.ConvTranspose2d(self.in_channels, self.out_channels,
                                            kernel_size, stride, padding,
                                            output_padding, groups)
        self.imag_conv = nn.ConvTranspose2d(self.in_channels, self.out_channels,
                                            kernel_size, stride, padding,
                                            output_padding, groups)

    def forward(self, inputs):
        real, imag = torch.chunk(inputs, 2, self.complex_axis)
        real2real = self.real_conv(real)
        imag2imag = self.imag_conv(imag)
        real2imag = self.imag_conv(real)
        imag2real = self.real_conv(imag)
        real = real2real - imag2imag
        imag = real2imag + imag2real
        return torch.cat([real, imag], self.complex_axis)


class NavieComplexLSTM(nn.Module):
    def __init__(self, input_size, hidden_size, projection_dim=None,
                 bidirectional=False, batch_first=False):
        super().__init__()
        self.input_dim = input_size // 2
        self.rnn_units = hidden_size // 2
        self.real_lstm = nn.LSTM(self.input_dim, self.rnn_units, num_layers=1,
                                 bidirectional=bidirectional, batch_first=False)
        self.imag_lstm = nn.LSTM(self.input_dim, self.rnn_units, num_layers=1,
                                 bidirectional=bidirectional, batch_first=False)
        fac = 2 if bidirectional else 1
        if projection_dim is not None:
            self.projection_dim = projection_dim // 2
            self.r_trans = nn.Linear(self.rnn_units * fac, self.projection_dim)
            self.i_trans = nn.Linear(self.rnn_units * fac, self.projection_dim)
        else:
            self.projection_dim = None

    def forward(self, inputs):
        real, imag = inputs
        r2r_out = self.real_lstm(real)[0]
        r2i_out = self.imag_lstm(real)[0]
        i2r_out = self.real_lstm(imag)[0]
        i2i_out = self.imag_lstm(imag)[0]
        real_out = r2r_out - i2i_out
        imag_out = i2r_out + r2i_out
        if self.projection_dim is not None:
            real_out = self.r_trans(real_out)
            imag_out = self.i_trans(imag_out)
        return [real_out, imag_out]

    def flatten_parameters(self):
        self.real_lstm.flatten_parameters()
        self.imag_lstm.flatten_parameters()


def complex_cat(inputs, axis):
    real, imag = [], []
    for data in inputs:
        r, i = torch.chunk(data, 2, axis)
        real.append(r)
        imag.append(i)
    return torch.cat(real + imag, axis)


class ComplexBatchNorm(nn.Module):
    """Unused by the decode configs (use_cbn=False); placeholder."""

    def __init__(self, *args, **kwargs):
        super().__init__()

    def forward(self, x):
        raise NotImplementedError
