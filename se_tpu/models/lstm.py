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
    def __call__(self, mag: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BatchNorm(name="bn")(mag, use_running_average=not train)
        x = LSTM(self.hidden, num_layers=1, name="lstm1")(x)
        x = LSTM(self.hidden, num_layers=2, name="lstm2")(x)
        x = nn.Dense(self.bins, name="fc")(x)
        return nn.softplus(x)


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
