"""Torch state_dict -> se_tpu parameter converters.

Used by the parity test suite (and by users migrating reference checkpoints):
every model exposes `from_reference_state_dict(sd)` built on these helpers.
`sd` values are plain numpy arrays (tests call `.detach().numpy()` on torch
tensors before handing them over; this module never imports torch).

Layout conventions being converted:
- torch Conv2d weight (O, I/g, kh, kw)          -> HWIO (kh, kw, I/g, O)
- torch ConvTranspose2d weight (I, O/g, kh, kw) -> (kh, kw, I/g, O) unflipped
  (se_tpu.nn.ConvTranspose2d flips spatially at apply time)
- torch Linear weight (O, I)                    -> (I, O)
- torch LSTM weight_ih/hh (4H, in), gate order (i, f, g, o) -> wx/wh
  transposed; bias_ih + bias_hh summed into one bias.
"""

from __future__ import annotations

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_kernel(w: np.ndarray, groups: int = 1) -> np.ndarray:
    # (I, O/g, kh, kw) -> (kh, kw, I/g, O). Grouped: lax grouped conv expects
    # output channels blocked by group; block-diagonal assembly.
    if groups == 1:
        return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
    i, og, kh, kw = w.shape
    ig = i // groups
    out = np.zeros((kh, kw, ig, og * groups), w.dtype)
    for g in range(groups):
        blk = np.transpose(w[g * ig : (g + 1) * ig], (2, 3, 0, 1))
        out[:, :, :, g * og : (g + 1) * og] = blk
    return out


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def dense(sd: dict, prefix: str) -> dict:
    out = {"kernel": linear_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv2d(sd: dict, prefix: str) -> dict:
    out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv_transpose2d(sd: dict, prefix: str, groups: int = 1) -> dict:
    out = {"kernel": conv_transpose_kernel(sd[f"{prefix}.weight"], groups)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def glu_conv(sd: dict, prefix: str, transpose: bool = False) -> dict:
    fn = conv_transpose2d if transpose else conv2d
    return {
        "conv1": fn(sd, f"{prefix}.conv1"),
        "conv2": fn(sd, f"{prefix}.conv2"),
    }


def batchnorm_params(sd: dict, prefix: str) -> dict:
    return {"bn": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def batchnorm_stats(sd: dict, prefix: str) -> dict:
    return {
        "bn": {
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }
    }


def layernorm(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def lstm(sd: dict, prefix: str, num_layers: int, bidirectional: bool = False) -> dict:
    """torch.nn.LSTM(batch_first=True) -> se_tpu.nn.LSTM flat param dict."""
    out = {}
    for layer in range(num_layers):
        for rev in ([False, True] if bidirectional else [False]):
            t_sfx = f"l{layer}" + ("_reverse" if rev else "")
            j_sfx = f"l{layer}" + ("_rev" if rev else "")
            out[f"{j_sfx}_wx"] = linear_kernel(sd[f"{prefix}.weight_ih_{t_sfx}"])
            out[f"{j_sfx}_wh"] = linear_kernel(sd[f"{prefix}.weight_hh_{t_sfx}"])
            out[f"{j_sfx}_b"] = (
                sd[f"{prefix}.bias_ih_{t_sfx}"] + sd[f"{prefix}.bias_hh_{t_sfx}"]
            )
    return out


def prelu(sd: dict, prefix: str) -> dict:
    return {"negative_slope": sd[f"{prefix}.weight"].reshape(())}
