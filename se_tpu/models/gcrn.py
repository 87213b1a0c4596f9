"""GCRN gated conv-recurrent complex spectral mapping
(ref: GCRN/GCRN_noncprs.py:86-165).

GLU conv encoder (2->16->...->256 ch, freq stride 2) -> grouped GLSTM
bottleneck (2 groups x 2 layers with LayerNorms and an interleaving shuffle,
ref :5-39) -> two GLU deconv decoders for real/imag -> per-decoder
Dense(161->161) heads. Input/output (B, T, F=161, 2).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from se_tpu.nn import BatchNorm, GluConv2d, GluConvTranspose2d, LayerNorm, LSTM
from se_tpu.nn.recurrent import lstm_split
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc

_EN_CH = (16, 32, 64, 128, 256)


class GLSTM(nn.Module):
    """Grouped LSTM with interleaving shuffle (ref GCRN_noncprs.py:5-39).

    Input (B, T, F, C); flattened per-step features follow torch's
    (C outer, F inner) order for weight parity.
    """

    hidden: int = 1024
    groups: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, carry=None, split: int | None = None):
        """carry: optional [stage1 x groups, stage2 x groups] list of
        single-layer LSTM carries for exact streaming; returns
        (out, new_carry) when given."""
        b, t, f, c = x.shape
        h_t = self.hidden // self.groups
        out = jnp.swapaxes(x, 2, 3).reshape(b, t, c * f)
        if split is None:
            split = t
        new_carry = []

        def run(lstm, h, idx):
            if carry is None:
                return lstm(h)
            y, nc = lstm_split(lstm, h, carry[idx], split)
            new_carry.append(nc)
            return y

        chunks = jnp.split(out, self.groups, axis=-1)
        ys = [
            run(LSTM(h_t, num_layers=1, name=f"lstm1_{i}"), chunks[i], i)
            for i in range(self.groups)
        ]
        # torch: stack(dim=-1) then flatten -> interleave group outputs
        out = jnp.stack(ys, axis=-1).reshape(b, t, self.hidden)
        out = LayerNorm(name="ln1")(out)

        chunks = jnp.split(out, self.groups, axis=-1)
        ys = [
            run(LSTM(h_t, num_layers=1, name=f"lstm2_{i}"), chunks[i],
                self.groups + i)
            for i in range(self.groups)
        ]
        out = jnp.concatenate(ys, axis=-1)
        out = LayerNorm(name="ln2")(out)

        out = out.reshape(b, t, c, f)
        out = jnp.swapaxes(out, 2, 3)
        return out if carry is None else (out, new_carry)


class GCRN(nn.Module):
    # all convs have time kernel 1: streaming needs no conv replay at all
    replay_frames = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 carry=None, split: int | None = None):
        """carry: optional GLSTM state list (4 single-layer LSTM carries)
        for exact streaming decode; returns (out, new_carry) when given."""
        skips = []
        for i, ch in enumerate(_EN_CH):
            x = GluConv2d(ch, (1, 3), strides=(1, 2), name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.elu(x)
            skips.append(x)

        if carry is None:
            out = GLSTM(name="glstm")(x)
            new_carry = None
        else:
            out, new_carry = GLSTM(name="glstm")(x, carry=carry, split=split)
        out = jnp.concatenate([out, skips[4]], axis=-1)

        def decoder(tag: str) -> jnp.ndarray:
            d = out
            for i in range(5):
                ch = (128, 64, 32, 16, 1)[i]
                opad = (0, 1) if i == 3 else (0, 0)
                d = GluConvTranspose2d(
                    ch, (1, 3), strides=(1, 2), output_padding=opad,
                    name=f"convt{i}_{tag}",
                )(d)
                d = BatchNorm(name=f"bnt{i}_{tag}")(d, use_running_average=not train)
                if i < 4:
                    d = nn.elu(jnp.concatenate([d, skips[3 - i]], axis=-1))
                else:
                    d = nn.elu(d)
            # (B, T, F, 1) -> Dense over frequency
            return nn.Dense(161, name=f"fc_{tag}")(d[..., 0])

        real = decoder("1")
        imag = decoder("2")
        est = jnp.stack([real, imag], axis=-1)  # (B, T, F, 2)
        return est if carry is None else (est, new_carry)

    @staticmethod
    def zero_carry(batch: int, hidden: int = 1024, groups: int = 2):
        h_t = hidden // groups
        # one single-layer LSTM carry (list of 1 (h, c) tuple) per group
        # and stage: [stage1 g0, stage1 g1, stage2 g0, stage2 g1]
        return [LSTM.zero_carry(batch, h_t, 1) for _ in range(2 * groups)]


def from_reference_state_dict(sd: dict) -> dict:
    params: dict = {}
    stats: dict = {}
    for i in range(5):
        params[f"conv{i}"] = tc.glu_conv(sd, f"conv{i + 1}")
        params[f"bn{i}"] = tc.batchnorm_params(sd, f"bn{i + 1}")
        stats[f"bn{i}"] = tc.batchnorm_stats(sd, f"bn{i + 1}")
    glstm: dict = {
        "ln1": tc.layernorm(sd, "glstm.ln1"),
        "ln2": tc.layernorm(sd, "glstm.ln2"),
    }
    for i in range(2):
        glstm[f"lstm1_{i}"] = tc.lstm(sd, f"glstm.lstm_list1.{i}", 1)
        glstm[f"lstm2_{i}"] = tc.lstm(sd, f"glstm.lstm_list2.{i}", 1)
    params["glstm"] = glstm
    for tag in ("1", "2"):
        for i in range(5):
            t_i = 5 - i  # conv5_t_1 ... conv1_t_1
            params[f"convt{i}_{tag}"] = tc.glu_conv(
                sd, f"conv{t_i}_t_{tag}", transpose=True
            )
            params[f"bnt{i}_{tag}"] = tc.batchnorm_params(sd, f"bn{t_i}_t_{tag}")
            stats[f"bnt{i}_{tag}"] = tc.batchnorm_stats(sd, f"bn{t_i}_t_{tag}")
        params[f"fc_{tag}"] = tc.dense(sd, f"fc{tag}")
    return {"params": params, "batch_stats": stats}


register(
    ModelEntry(
        name="gcrn",
        make=GCRN,
        stft=PRESET_320,
        io_kind="complex_map",
        from_reference_state_dict=from_reference_state_dict,
    )
)
