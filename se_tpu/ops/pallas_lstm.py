"""Pallas fused LSTM layer for large folded batches (VERDICT r1 item 4).

FullSubNet folds its sub-band LSTM to a (B*257, T, 32) batch
(ref FullSubNet/fullsubnet_net_sa/model.py:106-114). Driving that with a
`lax.scan` pays a per-step dispatch + an HBM round trip for the (T, Bf, 4H)
precomputed projections (12.6 GB at B=32). This kernel runs the WHOLE layer
in one pallas_call:

- grid (batch-tiles, T) with T innermost: Pallas auto-pipelines the x-tile
  DMA against the step compute (double buffering);
- the input projection x@Wx happens IN the kernel, so the 4H-wide gate
  tensor never touches HBM;
- Wx/Wh/b stay resident in VMEM across all steps;
- h/c carries live in VMEM scratch (fp32), reset when a new batch tile
  starts; matmuls run in the weight dtype (bf16 weights -> bf16 MXU) with
  fp32 accumulation, exactly like the scan path in nn/recurrent.py.

Gate order is torch's (i, f, g, o) — same parameters as lstm_layer, so the
kernel is a drop-in for the non-carry path. Numerics match the scan path to
fp32 round-off (tests/test_pallas_lstm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(x_ref, wx_ref, wh_ref, b_ref, y_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h_dim = h_scr.shape[-1]
    xt = x_ref[0]  # (TB, In)
    gates = jnp.dot(xt, wx_ref[:], preferred_element_type=jnp.float32)
    gates += jnp.dot(h_scr[:].astype(wh_ref.dtype), wh_ref[:],
                     preferred_element_type=jnp.float32)
    gates += b_ref[0].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, :h_dim])
    f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
    g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
    o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
    c = f * c_scr[:] + i * g
    h = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def _pallas_lstm_tm(x, wx, wh, b, batch_tile: int, interpret: bool):
    """x: (T, Bf, In) time-major, Bf % batch_tile == 0 -> (T, Bf, H)."""
    t_len, bf, in_dim = x.shape
    h_dim = wh.shape[0]
    nb = bf // batch_tile
    grid = (nb, t_len)
    return pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, batch_tile, in_dim), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, 4 * h_dim), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, 4 * h_dim), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h_dim), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, batch_tile, h_dim),
                               lambda i, t: (t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, bf, h_dim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, h_dim), jnp.float32),
            pltpu.VMEM((batch_tile, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(x, wx, wh, b.reshape(1, -1))


def _scan_forward(x, wx, wh, b):
    """lax.scan reference of the same layer (forward direction); test
    oracle. NOT the differentiation path — it precomputes the full
    (T, B, 4H) projection, the exact HBM blowup the kernel avoids."""
    xp = jnp.matmul(x, wx, preferred_element_type=jnp.float32) + b
    xp = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H)
    h_dim = wh.shape[0]
    bsz = x.shape[0]
    carry = (jnp.zeros((bsz, h_dim), jnp.float32),
             jnp.zeros((bsz, h_dim), jnp.float32))

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h.astype(wh.dtype), wh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, carry, xp)
    return jnp.swapaxes(ys, 0, 1).astype(x.dtype)


def _scan_forward_chunked(x, wx, wh, b, chunk: int = 32):
    """Bounded-memory differentiable reference of the same layer (the
    custom VJP differentiates THIS, VERDICT r2 item 3): the input
    projection happens per chunk inside a CHECKPOINTED outer scan, so
    backward saves only chunk-boundary (h, c) carries — (T/chunk, B, 2H)
    — and recomputes each chunk's (chunk, B, 4H) gates on the fly. The
    full (T, B, 4H) tensor (~12-20 GB for FullSubNet at serving batch)
    is never materialized, forward or backward."""
    bsz, t_len, in_dim = x.shape
    h_dim = wh.shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, In)
    t_pad = -(-t_len // chunk) * chunk
    if t_pad != t_len:
        xs = jnp.pad(xs, ((0, t_pad - t_len), (0, 0), (0, 0)))
    xc = xs.reshape(t_pad // chunk, chunk, bsz, in_dim)
    carry0 = (jnp.zeros((bsz, h_dim), jnp.float32),
              jnp.zeros((bsz, h_dim), jnp.float32))

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h.astype(wh.dtype), wh,
                                preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    @jax.checkpoint
    def outer(carry, xchunk):
        proj = jnp.matmul(xchunk, wx,
                          preferred_element_type=jnp.float32) + b
        return jax.lax.scan(step, carry, proj)

    _, ys = jax.lax.scan(outer, carry0, xc)
    ys = ys.reshape(t_pad, bsz, h_dim)[:t_len]
    return jnp.swapaxes(ys, 0, 1).astype(x.dtype)


def _pallas_forward(x, wx, wh, b, interpret: bool):
    bsz = x.shape[0]
    in_dim = wx.shape[0]
    h_dim = wh.shape[0]
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, In)
    tile = _pick_batch_tile(bsz, in_dim, h_dim)
    if interpret:
        tile = min(tile, max(8, 8 * ((bsz + 7) // 8)))
    pad = (-bsz) % tile
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
    ys = _pallas_lstm_tm(xs, wx, wh, b, batch_tile=tile, interpret=interpret)
    return jnp.swapaxes(ys[:, :bsz], 0, 1)


@functools.lru_cache(maxsize=4)
def _fused(interpret: bool):
    """custom-VJP wrapper: Pallas forward, chunked-recompute backward (the
    kernel defines no transpose rule; training paths differentiate the
    checkpointed chunked scan, which never materializes the (T, B, 4H)
    projection)."""

    @jax.custom_vjp
    def f(x, wx, wh, b):
        return _pallas_forward(x, wx, wh, b, interpret)

    def fwd(x, wx, wh, b):
        return _pallas_forward(x, wx, wh, b, interpret), (x, wx, wh, b)

    def bwd(res, g):
        # SE_TPU_LSTM_BWD_CHUNK sweeps the recompute granularity (round-5
        # FullSubNet train instrumentation): larger chunks = fewer
        # recompute segments but a bigger live (chunk, B, 4H) gate tensor
        import os as _os

        chunk = int(_os.environ.get("SE_TPU_LSTM_BWD_CHUNK", "32"))
        _, vjp = jax.vjp(
            lambda x, wx, wh, b: _scan_forward_chunked(x, wx, wh, b, chunk),
            *res)
        return vjp(g.astype(res[0].dtype))

    f.defvjp(fwd, bwd)
    return f


def _pick_batch_tile(bf: int, in_dim: int, h_dim: int) -> int:
    """Largest tile from a ladder that keeps VMEM modest; Bf is padded up
    to a multiple of the tile."""
    # VMEM per program ~ 2 double-buffered x tiles + weights + h/c + gates
    for tile in (512, 256, 128):
        weights = (in_dim + h_dim) * 4 * h_dim * 4
        per = tile * (2 * in_dim + 4 * h_dim + 3 * h_dim + h_dim) * 4
        if weights + per < 12 * 1024 * 1024:
            return tile
    return 128


def pallas_lstm_layer(x, wx, wh, b, reverse: bool = False,
                      interpret: bool | None = None):
    """(B, T, in) -> (B, T, H) single-direction LSTM layer; drop-in for the
    scan path when no carry is needed. Pads the batch to a tile multiple.

    Under an active mesh the kernel runs per-shard via shard_map over the
    (folded) batch axis — sequences are independent, so this is exact;
    returns None when the batch doesn't divide over the mesh (the caller
    falls back to the scan path)."""
    from se_tpu.parallel.mesh import active_mesh, shard_map_leading

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if reverse:
        x = jnp.flip(x, axis=1)
    fn = _fused(bool(interpret))
    mesh = active_mesh()
    if mesh is not None:
        mapped = shard_map_leading(fn, mesh, x.shape[0], n_mapped=1,
                                   n_replicated=3)
        if mapped is None:
            return None
        ys = mapped(x, wx, wh, b)
    else:
        ys = fn(x, wx, wh, b)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys
