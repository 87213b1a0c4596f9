"""Recurrent primitives, TPU-first.

The zoo is recurrence-heavy (LSTM-1024x3, GLSTM, DPRNN, FullSubNet's folded
sub-band LSTM — ref SURVEY.md §7.3 item 2). The TPU pattern used here:

- the input projection `x @ Wx + b` for ALL timesteps is one large matmul
  (MXU-friendly, (B*T, in) x (in, 4H));
- only the hidden-state recurrence runs under `lax.scan`, with a single fused
  (B, H) x (H, 4H) matmul per step and fp32 carries;
- gate order is torch's (i, f, g, o) so torch LSTM weights copy over directly
  (weight_ih -> wx.T, weight_hh -> wh.T, bias_ih + bias_hh -> b).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_recurrence(xp: jnp.ndarray, wh: jnp.ndarray, unroll: int = 2,
                     carry=None):
    """xp: (T, B, 4H) precomputed input projections -> ((T, B, H), carry)."""
    t_len, b, four_h = xp.shape
    h_dim = four_h // 4
    if carry is None:
        carry = (jnp.zeros((b, h_dim), jnp.float32),
                 jnp.zeros((b, h_dim), jnp.float32))

    def step(carry, xt):
        h, c = carry
        # keep the recurrent matmul in the weight dtype (bf16 weights ->
        # bf16 MXU) while the carry stays fp32
        gates = xt + jnp.matmul(h.astype(wh.dtype), wh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    carry, ys = jax.lax.scan(step, carry, xp, unroll=unroll)
    return ys, carry


def _lstm_recurrence_chunked(xs: jnp.ndarray, wx, wh, b, chunk: int = 32,
                             unroll: int = 2):
    """Time-chunked recurrence: precompute input projections one chunk at a
    time inside an outer scan, bounding the projection buffer to
    (chunk, B, 4H). Used when a full (T, B, 4H) precompute would blow HBM
    (FullSubNet's folded sub-band LSTM is ~12 GB at batch 32). A naive
    per-step projection doesn't work: XLA loop-invariant code motion hoists
    `xs[t] @ wx` back out of the loop and rematerializes the full tensor."""
    t_len, bsz, in_dim = xs.shape
    h_dim = wh.shape[0]
    t_pad = -(-t_len // chunk) * chunk
    if t_pad != t_len:
        xs = jnp.pad(xs, ((0, t_pad - t_len), (0, 0), (0, 0)))
    xc = xs.reshape(t_pad // chunk, chunk, bsz, in_dim)
    h0 = jnp.zeros((bsz, h_dim), jnp.float32)
    c0 = jnp.zeros((bsz, h_dim), jnp.float32)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h.astype(wh.dtype), wh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def outer(carry, xchunk):
        # the barrier stops XLA loop-invariant code motion from batching
        # this matmul across all chunks (which would rebuild the full
        # (T, B, 4H) tensor this path exists to avoid)
        xchunk = jax.lax.optimization_barrier(xchunk)
        proj = jnp.matmul(xchunk, wx,
                          preferred_element_type=jnp.float32) + b
        return jax.lax.scan(step, carry, proj, unroll=unroll)

    (_, _), ys = jax.lax.scan(outer, (h0, c0), xc)
    ys = ys.reshape(t_pad, bsz, h_dim)
    return ys[:t_len]


# Above this many bytes for the precomputed (B, T, 4H) projection, switch to
# the fused in-scan projection.
_PRECOMPUTE_LIMIT_BYTES = 1 << 30

# Folded-batch threshold for the Pallas fused layer (se_tpu/ops/pallas_lstm):
# below this the scan path's per-step dispatch is already amortized.
_PALLAS_LSTM_MIN_BATCH = 1024


def _use_pallas_lstm(bsz: int) -> bool:
    import jax

    from se_tpu.utils.envflags import env_flag

    if env_flag("SE_TPU_DISABLE_PALLAS_LSTM"):
        return False
    if bsz < _PALLAS_LSTM_MIN_BATCH:
        return False
    d = jax.devices()[0]
    return (d.platform in ("tpu", "axon")
            or "tpu" in getattr(d, "device_kind", "").lower())


def lstm_layer(
    x: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    b: jnp.ndarray,
    reverse: bool = False,
    unroll: int = 2,
    carry=None,
    return_carry: bool = False,
):
    """(B, T, in) -> (B, T, H) single-direction LSTM layer.

    `carry=(h, c)` seeds the recurrence (streaming decode); with
    `return_carry=True` returns `(out, (h, c))` so callers can chain chunks
    exactly. Carries are only meaningful for the forward direction."""
    bsz, t_len, in_dim = x.shape
    four_h = wx.shape[1]
    proj_bytes = bsz * t_len * four_h * 4
    fused = proj_bytes > _PRECOMPUTE_LIMIT_BYTES and carry is None \
        and not return_carry

    if (_use_pallas_lstm(bsz) and t_len >= 16 and carry is None
            and not return_carry):
        from se_tpu.ops.pallas_lstm import pallas_lstm_layer

        ys = pallas_lstm_layer(x, wx, wh, b, reverse=reverse)
        if ys is not None:  # None: batch doesn't divide the active mesh
            return ys

    if fused:
        xs = jnp.swapaxes(x, 0, 1)
        if reverse:
            xs = jnp.flip(xs, axis=0)
        ys = _lstm_recurrence_chunked(xs, wx, wh, b, unroll=unroll)
        out_carry = None
    else:
        xp = jnp.matmul(x, wx, preferred_element_type=jnp.float32) + b
        xp = jnp.swapaxes(xp, 0, 1)  # time-major for scan
        if reverse:
            xp = jnp.flip(xp, axis=0)
        ys, out_carry = _lstm_recurrence(xp, wh, unroll=unroll, carry=carry)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    ys = jnp.swapaxes(ys, 0, 1)
    if return_carry:
        return ys, out_carry
    return ys


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM, torch-weight-compatible.

    Matches torch.nn.LSTM(batch_first=True) semantics: input (B, T, in),
    output (B, T, H * num_directions), zero initial state.
    """

    features: int
    num_layers: int = 1
    bidirectional: bool = False
    param_dtype: Any = jnp.float32
    unroll: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, carry=None):
        """carry: optional list of per-layer (h, c) tuples (uni-directional
        only) for exact chunked/streaming decode; when given, returns
        (out, new_carry)."""
        h = self.features
        directions = (False, True) if self.bidirectional else (False,)
        if carry is not None and self.bidirectional:
            raise ValueError("carry is only supported uni-directionally")
        new_carry = []
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            outs = []
            for rev in directions:
                sfx = f"l{layer}" + ("_rev" if rev else "")
                scale = 1.0 / float(h) ** 0.5  # torch U(-1/sqrt(H), 1/sqrt(H))
                init = nn.initializers.uniform(scale=2.0 * scale)

                def shifted(key, shape, dtype=self.param_dtype, _i=init, _s=scale):
                    return _i(key, shape, dtype) - _s

                wx = self.param(f"{sfx}_wx", shifted, (in_dim, 4 * h))
                wh = self.param(f"{sfx}_wh", shifted, (h, 4 * h))
                b = self.param(f"{sfx}_b", shifted, (4 * h,))
                if carry is not None:
                    out, lc = lstm_layer(x, wx, wh, b, unroll=self.unroll,
                                         carry=carry[layer],
                                         return_carry=True)
                    new_carry.append(lc)
                    outs.append(out)
                else:
                    outs.append(
                        lstm_layer(x, wx, wh, b, reverse=rev,
                                   unroll=self.unroll)
                    )
            x = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        if carry is not None:
            return x, new_carry
        return x

    @staticmethod
    def zero_carry(batch: int, features: int, num_layers: int):
        z = lambda: (jnp.zeros((batch, features), jnp.float32),
                     jnp.zeros((batch, features), jnp.float32))
        return [z() for _ in range(num_layers)]


def lstm_split(lstm: "LSTM", h: jnp.ndarray, carry, split: int):
    """Run `lstm` over h (B, T, D) from `carry`, CHECKPOINTING the state
    after `split` frames while still emitting outputs for every frame.

    Streaming decode with left-context replay (se_tpu.eval.streaming): a
    chunk's window replays R history frames whose outputs are recomputed
    exactly from the checkpointed state; the state to carry forward is the
    one at (window_end - R), i.e. after the first `split` frames.
    """
    t = h.shape[1]
    if split >= t:
        return lstm(h, carry=carry)
    if split <= 0:
        out, _ = lstm(h, carry=carry)
        return out, carry
    o1, c_mid = lstm(h[:, :split], carry=carry)
    o2, _ = lstm(h[:, split:], carry=c_mid)
    return jnp.concatenate([o1, o2], axis=1), c_mid
