"""Unified enhancement (decode) driver for the whole zoo.

Replicates each reference `*_decode_vb.py` path (ref SURVEY.md §3.1):
RMS gain c applied pre-STFT and removed post-iSTFT (G2Net inverts the
convention: divides by c on input and multiplies back — ref
G2Net_new/com_decode.py:43-44,88, preserved here), magnitude compression
`**0.5` / decompression `**2` in the compressed regime, noisy-phase reuse
for magnitude models, complex-multiply masking for FullSubNet's cIRM, and
in-graph waveform processing for Uformer.

The spectral core is jitted per (model, padded-length bucket); callers
should bucket utterance lengths (se_tpu.data bucketed padding) to bound
recompiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from se_tpu.models.registry import ModelEntry, get_model
from se_tpu.ops.stft import StftConfig, istft, stft


def _magphase(re, im, eps=0.0):
    mag = jnp.sqrt(re * re + im * im + eps)
    phase = jnp.arctan2(im, re)
    return mag, phase


@functools.partial(jax.jit,
                   static_argnames=("entry", "model", "compressed", "length",
                                    "dtype"))
def _enhance_jit(entry: ModelEntry, model, variables, wav: jnp.ndarray,
                 compressed: bool, length: int, dtype=None):
    """`dtype=jnp.bfloat16` runs the network in bf16 (params + activations;
    norms still accumulate in fp32 internally) with fp32 DSP at the edges."""
    cfg: StftConfig = entry.stft
    kind = entry.io_kind
    if dtype is not None:
        variables = jax.tree.map(
            lambda p: p.astype(dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            variables)

    if kind == "waveform":  # Uformer (ref Uformer/uformer_decode_vb.py:40-62)
        if dtype is not None:
            wav = wav.astype(dtype)
        est, _, _, _ = model.apply(variables, wav, wav)
        est = est.astype(jnp.float32)
        pad = length - est.shape[-1]
        if pad > 0:
            est = jnp.pad(est, ((0, 0), (0, pad)))
        return est[..., :length]

    re, im = stft(wav, cfg)
    mag, phase = _magphase(re, im)
    if compressed:
        mag = jnp.sqrt(mag)

    if dtype is not None:
        mag = mag.astype(dtype)
        phase = phase.astype(jnp.float32)

    if kind == "mag_mask":  # LSTM/CRN (ref LSTM/lstm_decode_vb.py:36-52)
        est = model.apply(variables, mag)
        if compressed:
            est = jnp.square(est)
        est = est.astype(jnp.float32)
        out_re = est * jnp.cos(phase)
        out_im = est * jnp.sin(phase)
    elif kind == "complex_map":
        # GCRN/DPCRN/DCCRN/CTSNet/G2Net/TaylorSENet
        # (ref GCRN/gcrn_decode_vb.py:33-56)
        spec = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        est = model.apply(variables, spec)
        if est.ndim == 5:  # multi-stage (G2Net): take the last stage
            est = est[-1]
        est = est.astype(jnp.float32)
        est_mag, est_phase = _magphase(est[..., 0], est[..., 1])
        if compressed:
            est_mag = jnp.square(est_mag)
        out_re = est_mag * jnp.cos(est_phase)
        out_im = est_mag * jnp.sin(est_phase)
    elif kind == "complex_mask":  # DPCRN applies its mask internally
        spec = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        est = model.apply(variables, spec)
        est = est.astype(jnp.float32)
        est_mag, est_phase = _magphase(est[..., 0], est[..., 1])
        if compressed:
            est_mag = jnp.square(est_mag)
        out_re = est_mag * jnp.cos(est_phase)
        out_im = est_mag * jnp.sin(est_phase)
    elif kind == "cirm":
        # FullSubNet (ref FullSubNet/fullsubnet_sa_decode.py:53-76):
        # compressed complex feature, magnitude into the net, mask applied
        # by complex multiply, then decompression.
        feat_re = (mag.astype(jnp.float32)) * jnp.cos(phase)
        feat_im = (mag.astype(jnp.float32)) * jnp.sin(phase)
        mask = model.apply(variables, mag).astype(jnp.float32)
        m_re, m_im = mask[..., 0], mask[..., 1]
        out_re = m_re * feat_re - m_im * feat_im
        out_im = m_re * feat_im + m_im * feat_re
        if compressed:
            est_mag, est_phase = _magphase(out_re, out_im)
            est_mag = jnp.square(est_mag)
            out_re = est_mag * jnp.cos(est_phase)
            out_im = est_mag * jnp.sin(est_phase)
    else:
        raise ValueError(f"io kind {kind!r} needs a dedicated driver")

    return istft(out_re, out_im, cfg, length=length)


def enhance_waveform(name: str, variables, wav: np.ndarray,
                     compressed: bool = True, model=None, dtype=None,
                     mesh=None, **model_kw) -> np.ndarray:
    """Enhance a batch (B, N) or single (N,) waveform with model `name`.

    Handles the RMS-gain convention per utterance (including G2Net's
    inverted one) and returns float32 numpy of the input shape.

    `mesh`: optional jax.sharding.Mesh — the batch is sharded over its
    'data' axis (padded to a multiple of the axis size, trimmed after)
    with the variables replicated; outputs match the single-device path
    (asserted by __graft_entry__.dryrun_multichip and
    tests/test_trainer.py). The reference has no batched decode at all
    (one utterance per loop step, ref LSTM/lstm_decode_vb.py:32).
    """
    entry = get_model(name)
    if model is None:
        model = entry.make(**model_kw)
    single = wav.ndim == 1
    x = np.atleast_2d(np.asarray(wav, np.float32))
    n = x.shape[-1]

    # per-utterance RMS gain (ref LSTM/lstm_decode_vb.py:35-36)
    energy = np.sum(np.square(x), axis=-1, keepdims=True)
    c = np.sqrt(n / np.maximum(energy, 1e-12)).astype(np.float32)
    inverted = name == "g2net"  # ref G2Net_new/com_decode.py:43-44,88
    x_in = x / c if inverted else x * c

    if mesh is not None:
        from se_tpu.parallel.mesh import (
            activation_mesh, replicate, shard_batch,
        )

        data_par = mesh.shape.get("data", 1)
        pad = (-x_in.shape[0]) % data_par
        xp = np.pad(x_in, ((0, pad), (0, 0))) if pad else x_in
        with activation_mesh(mesh):
            sharded = shard_batch({"wav": jnp.asarray(xp)}, mesh)["wav"]
            repl = replicate(variables, mesh)
            est = _enhance_jit(entry, model, repl, sharded, compressed, n,
                               dtype=dtype)
        est = np.asarray(est)[: x_in.shape[0]]
    else:
        est = np.asarray(
            _enhance_jit(entry, model, variables, jnp.asarray(x_in),
                         compressed, n, dtype=dtype))
    est = est * c if inverted else est / c
    return est[0] if single else est
