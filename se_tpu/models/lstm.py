"""LSTM magnitude-mapping baseline (ref: LSTM/LSTM.py:14-29).

Feature BatchNorm over 161 bins -> LSTM(161->1024) -> 2-layer LSTM(1024)
-> Dense(161) + Softplus. Input (B, T, F) magnitude; output (B, T, F)
estimated magnitude; noisy phase is reused at synthesis
(ref: LSTM/lstm_decode_vb.py:17-64).
"""

from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from se_tpu.nn import BatchNorm, LSTM
from se_tpu.ops.stft import PRESET_320
from se_tpu.models.registry import ModelEntry, register
from se_tpu.utils import torch_compat as tc


class LSTMNet(nn.Module):
    bins: int = 161
    hidden: int = 1024

    @nn.compact
    def __call__(self, mag: jnp.ndarray, train: bool = False, carry=None):
        """carry: optional list of 3 per-layer (h, c) LSTM states for exact
        streaming decode (se_tpu.eval.streaming); when given, returns
        (out, new_carry)."""
        x = BatchNorm(name="bn")(mag, use_running_average=not train)
        lstm1 = LSTM(self.hidden, num_layers=1, name="lstm1")
        lstm2 = LSTM(self.hidden, num_layers=2, name="lstm2")
        if carry is None:
            x = lstm2(lstm1(x))
            new_carry = None
        else:
            x, c1 = lstm1(x, carry=carry[:1])
            x, c2 = lstm2(x, carry=carry[1:])
            new_carry = c1 + c2
        x = nn.Dense(self.bins, name="fc")(x)
        out = nn.softplus(x)
        return out if carry is None else (out, new_carry)

    @staticmethod
    def zero_carry(batch: int, hidden: int = 1024):
        return LSTM.zero_carry(batch, hidden, 3)


def from_reference_state_dict(sd: dict) -> dict:
    """Map LSTM/LSTM.py state_dict (numpy values) to flax variables."""
    params = {
        "bn": tc.batchnorm_params(sd, "bn"),
        "lstm1": tc.lstm(sd, "lstm1", 1),
        "lstm2": tc.lstm(sd, "lstm2", 2),
        "fc": tc.dense(sd, "fc.0"),
    }
    batch_stats = {"bn": tc.batchnorm_stats(sd, "bn")}
    return {"params": params, "batch_stats": batch_stats}


register(
    ModelEntry(
        name="lstm",
        make=LSTMNet,
        stft=PRESET_320,
        io_kind="mag_mask",
        from_reference_state_dict=from_reference_state_dict,
    )
)
