"""STFT / iSTFT as MXU-friendly matmul-DFT.

TPU-first design: framing is done with layout-preserving reshapes (when
`win % hop == 0`, the common case across the zoo) or a strided gather, and the
windowed DFT is a single `(B*T, L) @ (L, 2F)` matmul that XLA tiles onto the
MXU. The inverse is the transposed basis matmul followed by a shift-and-add
overlap-add built from reshapes (no scatter).

Three framing conventions are required for parity with the reference zoo
(ref SURVEY.md §7.1):

- ``center``:   librosa.stft / torch.stft with center=True — reflect-pad
  n_fft//2 on both sides, frame length n_fft, window center-padded to n_fft,
  1 + n//hop frames.  (ref: LSTM/lstm_decode.py:41, Uformer/uformer.py:178)
- ``pad_end``:  tf.signal.stft(pad_end=True) — frame length win, zero-pad the
  frame tail to n_fft, ceil(n/hop) frames.  (ref: DeepXi/deepxi/sig.py:43-69)
- ``valid``:    conv1d-DFT framing, frame length win, 1 + (n-win)//hop frames.
  (ref: Uformer/trans.py:538-548, DCCRN/istft.py)

All functions are jittable with static shapes and vmap over leading batch dims.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from se_tpu.ops.windows import get_window

Convention = str  # "center" | "pad_end" | "valid"


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Static STFT configuration (hashable; safe as a jit static arg)."""

    win_length: int
    hop: int
    n_fft: int | None = None
    window: str = "hann"
    convention: Convention = "center"
    periodic: bool = True
    # "ola" = divide by the actual overlap-added window-square envelope
    # (librosa/torch); "periodized" = fold Griffin-Lim eq.-8's periodized
    # inverse window into the basis (DCCRN/istft.py:32-39, tf.signal).
    synthesis_norm: str = "ola"

    @property
    def fft(self) -> int:
        return self.n_fft if self.n_fft is not None else self.win_length

    @property
    def bins(self) -> int:
        return self.fft // 2 + 1

    @property
    def frame_len(self) -> int:
        """Length of the extracted signal frame before the DFT."""
        return self.fft if self.convention == "center" else self.win_length


# Front-end presets used across the reference zoo (ref BASELINE.md Table D).
PRESET_320 = StftConfig(win_length=320, hop=160, n_fft=320)          # LSTM/CRN/GCRN/DPCRN/CTSNet/G2Net/TaylorSENet
PRESET_512_256 = StftConfig(win_length=512, hop=256, n_fft=512)      # FullSubNet
PRESET_512_128 = StftConfig(win_length=512, hop=128, n_fft=512)      # DCCRN
# uformer.py:178 uses torch.hann_window(400) with n_fft=512 (center-padded)
PRESET_UFORMER = StftConfig(win_length=400, hop=160, n_fft=512, window="hann")
PRESET_DEEPXI = StftConfig(
    win_length=512, hop=256, n_fft=512, window="hamming", convention="pad_end"
)


def num_frames(n: int, cfg: StftConfig) -> int:
    if cfg.convention == "center":
        return 1 + n // cfg.hop
    if cfg.convention == "pad_end":
        return -(-n // cfg.hop)
    if cfg.convention == "valid":
        return 1 + (n - cfg.win_length) // cfg.hop
    raise ValueError(f"unknown convention {cfg.convention!r}")


def _padded_window(cfg: StftConfig) -> np.ndarray:
    """Window placed inside the frame (center-padded to n_fft for `center`)."""
    w = get_window(cfg.window, cfg.win_length, cfg.periodic).astype(np.float64)
    if cfg.convention == "center" and cfg.win_length < cfg.fft:
        lpad = (cfg.fft - cfg.win_length) // 2
        w = np.pad(w, (lpad, cfg.fft - cfg.win_length - lpad))
    return w


@functools.lru_cache(maxsize=None)
def _forward_basis(cfg: StftConfig) -> np.ndarray:
    """(frame_len, 2*bins) windowed real-DFT basis: out = frames @ basis.

    Columns [0:F] are the real part, [F:2F] the imaginary part of
    X[f] = sum_l w[l] x[l] exp(-2*pi*i*f*l/N).
    """
    n = cfg.fft
    f_bins = cfg.bins
    w = _padded_window(cfg)
    frame_len = cfg.frame_len
    l_idx = np.arange(frame_len, dtype=np.float64)
    f_idx = np.arange(f_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(l_idx, f_idx) / n
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    basis *= w[:frame_len, None]
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _inverse_basis(cfg: StftConfig) -> np.ndarray:
    """(2*bins, frame_len) basis for windowed irfft: frames = X_ri @ basis.

    x[l] = (1/N) [Re X0 + (-1)^l Re X_{N/2}
                  + 2 sum_{f=1..N/2-1} (Re X_f cos - Im X_f sin)],
    then multiplied by the synthesis window (analysis window for `center`
    and `valid`; tf's periodized inverse window for `pad_end`).
    """
    n = cfg.fft
    f_bins = cfg.bins
    frame_len = cfg.frame_len
    l_idx = np.arange(frame_len, dtype=np.float64)
    f_idx = np.arange(f_bins, dtype=np.float64)
    coef = np.full(f_bins, 2.0)
    coef[0] = 1.0
    if n % 2 == 0:
        coef[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(f_idx, l_idx) / n
    re_rows = coef[:, None] * np.cos(ang) / n
    im_rows = -coef[:, None] * np.sin(ang) / n
    basis = np.concatenate([re_rows, im_rows], axis=0)

    w = _padded_window(cfg)[:frame_len]
    if cfg.convention == "pad_end" or cfg.synthesis_norm == "periodized":
        # tf.signal.inverse_stft_window_fn: w / periodized OLA of w^2
        # (ref: DeepXi/deepxi/sig.py:60-69).
        env = np.zeros(frame_len)
        k_max = frame_len // cfg.hop + 1
        for k in range(-k_max, k_max + 1):
            idx = np.arange(frame_len) + k * cfg.hop
            valid = (idx >= 0) & (idx < frame_len)
            env[valid] += w[idx[valid]] ** 2
        synth = np.where(env > 1e-30, w / env, 0.0)
    else:
        synth = w
    basis *= synth[None, :]
    return basis.astype(np.float32)


def frame_signal(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """(..., n) waveform -> (..., T, frame_len) frames.

    Uses the shift-and-reshape decomposition when `frame_len % hop == 0`
    (layout-preserving, no gather); otherwise a strided gather.
    """
    n = x.shape[-1]
    t_frames = num_frames(n, cfg)
    hop = cfg.hop
    frame_len = cfg.frame_len

    if cfg.convention == "center":
        pad = cfg.fft // 2
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect"
        )
    elif cfg.convention == "pad_end":
        total = (t_frames - 1) * hop + frame_len
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, total - n)])

    needed = (t_frames - 1) * hop + frame_len
    if x.shape[-1] < needed:  # center with n % hop != 0 may fall short
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - x.shape[-1])])

    if frame_len % hop == 0:
        k = frame_len // hop
        # x truncated to (t_frames + k - 1) * hop, viewed as hop-sized slots;
        # frame t = slots[t : t+k] flattened.
        slots = x[..., : (t_frames + k - 1) * hop]
        slots = slots.reshape(*x.shape[:-1], t_frames + k - 1, hop)
        parts = [slots[..., j : j + t_frames, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)

    starts = np.arange(t_frames) * hop
    idx = starts[:, None] + np.arange(frame_len)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("cfg",))
def stft(x: jnp.ndarray, cfg: StftConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., n) waveform -> ((..., T, F) real, (..., T, F) imag)."""
    frames = frame_signal(x, cfg)
    # keep the MXU in the caller's dtype (bf16 inputs -> bf16 x bf16 matmul
    # with fp32 accumulation instead of upcasting the whole frame tensor)
    basis = jnp.asarray(_forward_basis(cfg)).astype(x.dtype)
    out = jnp.matmul(frames, basis, preferred_element_type=jnp.float32)
    # output dtype follows the caller: a bf16 waveform keeps the whole
    # in-graph pipeline (e.g. Uformer) in bf16; fp32 paths are unchanged
    out = out.astype(x.dtype)
    f_bins = cfg.bins
    return out[..., :f_bins], out[..., f_bins:]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(..., T, L) frames -> (..., (T-1)*hop + L) via shift-and-add reshapes."""
    *lead, t_frames, frame_len = frames.shape
    k = -(-frame_len // hop)
    if k * hop != frame_len:
        frames = jnp.pad(
            frames, [(0, 0)] * (frames.ndim - 1) + [(0, k * hop - frame_len)]
        )
    segs = frames.reshape(*lead, t_frames, k, hop)
    n_slots = t_frames + k - 1
    out = jnp.zeros((*lead, n_slots, hop), frames.dtype)
    for j in range(k):
        out = out.at[..., j : j + t_frames, :].add(segs[..., j, :])
    out = out.reshape(*lead, n_slots * hop)
    return out[..., : (t_frames - 1) * hop + frame_len]


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    cfg: StftConfig,
    length: int | None = None,
) -> jnp.ndarray:
    """((..., T, F), (..., T, F)) -> (..., n) waveform.

    `center`/`valid` divide by the actual overlap-added squared-window
    envelope (librosa/torch semantics; ref Uformer/trans.py:376-396);
    `pad_end` folds tf's periodized inverse window into the basis.
    """
    t_frames = re.shape[-2]
    x_ri = jnp.concatenate([re, im], axis=-1)
    ibasis = jnp.asarray(_inverse_basis(cfg)).astype(re.dtype)
    frames = jnp.matmul(x_ri, ibasis, preferred_element_type=jnp.float32)
    out = overlap_add(frames, cfg.hop)

    if cfg.convention in ("center", "valid") and cfg.synthesis_norm == "ola":
        w = jnp.asarray(_padded_window(cfg)[: cfg.frame_len].astype(np.float32))
        wsq = jnp.broadcast_to(w * w, (t_frames, cfg.frame_len))
        env = overlap_add(wsq, cfg.hop)
        out = jnp.where(env > 1e-11, out / jnp.maximum(env, 1e-11), out)

    if cfg.convention == "center":
        trim = cfg.fft // 2
        out = out[..., trim:]
    if length is not None:
        pad = length - out.shape[-1]
        if pad > 0:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
        else:
            out = out[..., :length]
    return out


def stft_magphase(
    x: jnp.ndarray, cfg: StftConfig, eps: float = 1e-12
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Waveform -> (magnitude, cos(phase), sin(phase))."""
    re, im = stft(x, cfg)
    mag = jnp.sqrt(re * re + im * im + eps)
    return mag, re / mag, im / mag


def compress_mag(mag: jnp.ndarray, power: float = 0.5) -> jnp.ndarray:
    """Magnitude compression `mag**power` (ref: LSTM/lstm_decode.py:44)."""
    return jnp.power(jnp.maximum(mag, 0.0), power)


def decompress_mag(mag: jnp.ndarray, power: float = 0.5) -> jnp.ndarray:
    return jnp.power(jnp.maximum(mag, 0.0), 1.0 / power)
