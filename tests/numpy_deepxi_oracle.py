"""Test-only numpy oracles for the DeepXi networks (VERDICT r1 item 5).

TensorFlow is absent from this image, so — like tests/torch_complexnn.py
did for DCCRN's missing complexnn — these re-derive the reference network
math independently in plain numpy from the reference source:

- ResNet/V2/V3: DeepXi/deepxi/network/tcn.py:17-245 (1x1 conv-in + LN +
  ReLU, bottleneck blocks with cyclic dilation 2^(i mod log2(max)+1),
  causal 'causal'-padded Conv1D, unit types "LN->ReLU->W+b" and
  "ReLU->LN->W+b").
- MHANet: DeepXi/deepxi/network/attention.py:15-276 (causal +
  Masking(0.0)-derived attention mask added as -1e9 to logits, softmax
  multiplied by the pairwise sequence mask, post-LN blocks with 4x FFN).

The functions take flax param trees from se_tpu.models.deepxi and run the
forward pass with explicit loops/matmuls — no JAX involved — so agreement
with the flax modules is a genuine two-implementation check.
"""

from __future__ import annotations

import numpy as np


def _ln(x, eps=1e-6, gamma=None, beta=None):
    """Keras LayerNormalization(axis=-1)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (x - mu) / np.sqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out


def _relu(x):
    return np.maximum(x, 0.0)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _dense(x, p):
    out = x @ np.asarray(p["kernel"], np.float64)
    if "bias" in p:
        out = out + np.asarray(p["bias"], np.float64)
    return out


def _causal_conv1d(x, p, dilation):
    """Keras Conv1D(padding='causal', dilation_rate=d): left pad (k-1)*d.
    x (B, T, Cin); kernel (k, Cin, Cout)."""
    kernel = np.asarray(p["kernel"], np.float64)
    k = kernel.shape[0]
    pad = (k - 1) * dilation
    xp = np.pad(x, ((0, 0), (pad, 0), (0, 0)))
    b, t, _ = x.shape
    out = np.zeros((b, t, kernel.shape[2]))
    for tap in range(k):
        seg = xp[:, tap * dilation : tap * dilation + t]
        out += seg @ kernel[tap]
    if "bias" in p:
        out = out + np.asarray(p["bias"], np.float64)
    return out


def _outp_act(out, kind):
    if kind == "Sigmoid":
        return _sigmoid(out)
    if kind == "ReLU":
        return _relu(out)
    return out


def resnet_v2_forward(params, x, n_blocks, max_d_rate, k,
                      unit_type="ReLU->LN->W+b", outp_act="Sigmoid",
                      variant="v2"):
    """tcn.py:116-225 (v2), :17-114 (v1), :227-245 (v3)."""
    x = np.asarray(x, np.float64)

    if variant == "v1":
        h = _relu(_ln(_dense(x, params["ff_conv"]),
                      gamma=np.asarray(params["ff_norm"]["scale"]),
                      beta=np.asarray(params["ff_norm"]["bias"])))
    elif variant == "v2":
        h = _relu(_ln(_dense(x, params["ff_conv"]),
                      gamma=np.asarray(params["ff_norm"]["scale"])))
    elif variant == "v3":
        h = _ln(_relu(_dense(x, params["ff_conv"])))
    else:
        raise ValueError(variant)

    n_rates = int(np.log2(max_d_rate)) + 1

    def unit(z, name, d_rate, kk):
        if variant == "v1":
            z = _relu(_ln(z, gamma=np.asarray(params[f"{name}_norm"]["scale"]),
                          beta=np.asarray(params[f"{name}_norm"]["bias"])))
        elif unit_type == "LN->ReLU->W+b":
            z = _relu(_ln(z))
        else:  # ReLU->LN->W+b
            z = _ln(_relu(z))
        p = params[f"{name}_conv"]
        if kk == 1:
            return _dense(z, p)
        return _causal_conv1d(z, p, d_rate)

    for i in range(n_blocks):
        d_rate = int(2 ** (i % n_rates))
        y = unit(h, f"b{i}_1", 1, 1)
        y = unit(y, f"b{i}_2", d_rate, k)
        y = unit(y, f"b{i}_3", 1, 1)
        h = h + y

    out = _dense(h, params["out_conv"])
    return _outp_act(out, outp_act)


def mhanet_forward(params, x, n_blocks, n_heads, causal=True,
                   outp_act="Sigmoid", learned_pos=False, v2=False):
    """attention.py:15-276 (v2=False) / 278-385 (v2=True). x (B, T, F);
    zero frames are Masking(0.0) padding.

    v2 follows tfa.layers.MultiHeadAttention: query pre-scaled by
    1/sqrt(d_k), boolean AttentionMaskV2 applied as
    logits += -10e9 * (1 - mask), and no post-softmax sequence-mask
    multiply."""
    x = np.asarray(x, np.float64)
    b, t, _ = x.shape
    d_model = np.asarray(params["ff_conv"]["kernel"]).shape[1]
    d_k = d_model // n_heads

    h = _relu(_ln(_dense(x, params["ff_conv"]),
                  gamma=np.asarray(params["ff_norm"]["scale"]),
                  beta=np.asarray(params["ff_norm"]["bias"])))
    if learned_pos:
        pos = np.asarray(params["pos_embedding"], np.float64)
        h = h + pos[:t][None]

    # AttentionMask (attention.py:209-276): Masking(0.0) sequence mask
    # merged with the lower-triangular causal mask; additive -1e9.
    valid = np.any(x != 0, axis=-1)  # (B, T)
    seq_pair = valid[:, None, :] & valid[:, :, None]  # (B, T, T)
    logical = seq_pair.copy()
    if causal:
        logical &= np.tril(np.ones((t, t), bool))[None]
    att_mask = np.where(logical, 0.0, -1e9)[:, None]  # (B,1,T,T)
    seq_f = seq_pair[:, None].astype(np.float64)

    def split(z):
        return z.reshape(b, t, n_heads, d_k).transpose(0, 2, 1, 3)

    for i in range(n_blocks):
        q = split(_dense(h, params[f"b{i}_q"]))
        kk = split(_dense(h, params[f"b{i}_k"]))
        v = split(_dense(h, params[f"b{i}_v"]))
        if v2:
            logits = (q / np.sqrt(d_k)) @ kk.transpose(0, 1, 3, 2)
            logits = logits + (-10e9) * (1.0 - logical[:, None])
        else:
            logits = q @ kk.transpose(0, 1, 3, 2) / np.sqrt(d_k)
            logits = logits + att_mask
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        att = e / e.sum(axis=-1, keepdims=True)
        if not v2:
            att = att * seq_f
        ctx = (att @ v).transpose(0, 2, 1, 3).reshape(b, t, d_model)
        ctx = _dense(ctx, params[f"b{i}_o"])
        h = _ln(h + ctx, gamma=np.asarray(params[f"b{i}_ln1"]["scale"]),
                beta=np.asarray(params[f"b{i}_ln1"]["bias"]))
        ffn = _dense(_relu(_dense(h, params[f"b{i}_ff1"])),
                     params[f"b{i}_ff2"])
        h = _ln(h + ffn, gamma=np.asarray(params[f"b{i}_ln2"]["scale"]),
                beta=np.asarray(params[f"b{i}_ln2"]["bias"]))

    out = _dense(h, params["out_conv"])
    return _outp_act(out, outp_act)
