"""Pallas TPU kernel: fused framing + window + DFT.

The jnp STFT path materializes the (B, T, frame_len) frames tensor in HBM
(k-times the waveform bytes for hop = frame_len/k) before the basis matmul.
This kernel DMAs each tile's waveform chunk HBM->VMEM once, builds the
overlapped frames in-register, and feeds the MXU directly — the frames
tensor never exists in HBM.

Grid: (B, T/TILE_T). Each program copies (TILE_T + k - 1, hop) waveform
slots (k = frame_len/hop) and computes the tile's DFT as a sum of k
shifted (TILE_T, hop) x (hop, 2F) matmuls — the overlapped frames tensor
is never materialized anywhere, and no in-kernel reshapes are needed
(Mosaic rejects 1D->2D shape casts on non-128 lane dims).

Falls back to the jnp path when shapes don't fit (frame_len % hop != 0) or
off-TPU; `stft_auto` picks automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from se_tpu.ops.stft import (
    StftConfig,
    _forward_basis,
    num_frames,
    stft as stft_jnp,
)


def _tile_t(cfg: StftConfig, t_frames: int) -> int:
    # a multiple of 8 sublanes that divides the (padded) frame count
    for cand in (128, 64, 32, 16, 8):
        if t_frames % cand == 0:
            return cand
    return 8


def _kernel(x_hbm, basis_ref, out_ref, scratch, sem, *, hop_pad, k,
            tile_t, copy_rows):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # copy_rows is tile_t + k - 1 rounded up to the 8-sublane tiling
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile_t, copy_rows), :], scratch, sem
    )
    dma.start()
    dma.wait()
    # frame i = slots[i : i+k] flattened; fold the flatten into the matmul:
    # out[i] = sum_j slots[i+j] @ basis_block[j] (zero-padded rows make the
    # lane padding a no-op)
    acc = jnp.zeros_like(out_ref[0])
    for j in range(k):
        seg = jax.lax.slice(scratch[:], (j, 0), (j + tile_t, hop_pad))
        acc = acc + jnp.dot(seg, basis_ref[pl.ds(j * hop_pad, hop_pad), :],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("cfg",))
def stft_pallas(x: jnp.ndarray, cfg: StftConfig):
    """(B, n) -> ((B, T, F), (B, T, F)); requires frame_len % hop == 0."""
    if cfg.frame_len % cfg.hop != 0:
        raise ValueError("pallas stft needs frame_len % hop == 0")
    b, n = x.shape
    t_frames = num_frames(n, cfg)
    hop = cfg.hop
    frame_len = cfg.frame_len

    # same padding as the reference conventions (see ops/stft.py)
    if cfg.convention == "center":
        pad = cfg.fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    elif cfg.convention == "pad_end":
        total = (t_frames - 1) * hop + frame_len
        x = jnp.pad(x, ((0, 0), (0, total - n)))

    tile_t = _tile_t(cfg, t_frames)
    t_pad = -(-t_frames // tile_t) * tile_t
    k = frame_len // hop
    copy_rows = -(-(tile_t + k - 1) // 8) * 8  # sublane-aligned DMA slices
    hop_pad = -(-hop // 128) * 128             # lane-aligned slot width
    n_slots = t_pad - tile_t + copy_rows
    if x.shape[-1] < n_slots * hop:
        x = jnp.pad(x, ((0, 0), (0, n_slots * hop - x.shape[-1])))
    x3d = x[:, : n_slots * hop].reshape(b, n_slots, hop)
    if hop_pad != hop:
        x3d = jnp.pad(x3d, ((0, 0), (0, 0), (0, hop_pad - hop)))

    basis_np = _forward_basis(cfg)
    f2 = basis_np.shape[1]
    if hop_pad != hop:  # zero rows matching the slot lane padding
        blocks = basis_np.reshape(k, hop, f2)
        blocks = np.pad(blocks, ((0, 0), (0, hop_pad - hop), (0, 0)))
        basis_np = blocks.reshape(k * hop_pad, f2)
    basis = jnp.asarray(basis_np).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, hop_pad=hop_pad, k=k,
                          tile_t=tile_t, copy_rows=copy_rows),
        grid=(b, t_pad // tile_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # waveform slots stay in HBM
            pl.BlockSpec((k * hop_pad, f2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, f2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, f2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((copy_rows, hop_pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x3d, basis)

    out = out[:, :t_frames]
    f_bins = cfg.bins
    return out[..., :f_bins], out[..., f_bins:]


def on_tpu() -> bool:
    plat = jax.default_backend()
    return plat in ("tpu", "axon")


def stft_auto(x: jnp.ndarray, cfg: StftConfig):
    """Pallas on TPU when it wins, jnp elsewhere.

    Measured on v5e: the fused kernel beats the XLA path when the frames
    tensor blowup k = frame_len/hop >= 3 (e.g. DCCRN 512/128: 1.55 ms ->
    0.90 ms at B=8 x 8 s); at k=2 XLA's reshape+matmul is already optimal.
    """
    eligible = (x.ndim == 2 and cfg.frame_len % cfg.hop == 0
                and cfg.frame_len // cfg.hop >= 3)
    if on_tpu() and eligible:
        return stft_pallas(x, cfg)
    return stft_jnp(x, cfg)
