"""Streaming / bounded-memory enhancement.

The reference decodes whole utterances at once (ref LSTM/lstm_decode_vb.py:
17-64); every causal model in the zoo (cumulative-norm variants, uni-LSTM
recurrences — ref SURVEY.md §5 "long-context") can in principle run
streaming. Two TPU-native serving paths:

1. `enhance_windowed` — model-agnostic chunked decode: the utterance is cut
   into fixed-size windows with left/right context, ALL windows run as one
   batched dispatch (no carried state -> windows are independent), and the
   center of each window is kept. One compiled shape regardless of utterance
   length; approximation error is bounded by the models' effective memory
   (LSTM state decay / conv receptive field) versus the context length.

2. `LstmStreamer` — exact low-latency streaming for the LSTM model family:
   carries the 3-layer LSTM state across chunks, maintains the STFT analysis
   history and overlap-add synthesis tail on the host, and reproduces the
   full-utterance decode (librosa center convention, envelope-normalized
   iSTFT) to float tolerance. Algorithmic latency = frame_len + chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from se_tpu.eval.enhance import _enhance_jit, _magphase
from se_tpu.models.registry import get_model
from se_tpu.ops.stft import StftConfig, _forward_basis, _inverse_basis, \
    _padded_window


# --------------------------------------------------------- windowed (zoo-wide)

def enhance_windowed(name: str, variables, wav: np.ndarray,
                     chunk_seconds: float = 4.0, context_seconds: float = 2.0,
                     sr: int = 16000, compressed: bool = True, model=None,
                     dtype=None, max_batch: int = 16, **model_kw) -> np.ndarray:
    """Enhance one (N,) waveform in bounded memory with fixed compiled shapes.

    Windows of `context + chunk + right` samples advance by `chunk`; outputs
    keep the `chunk` center. The right context covers iSTFT edge effects
    (one STFT frame). All windows are independent, so they run batched.
    """
    entry = get_model(name)
    if model is None:
        model = entry.make(**model_kw)
    x = np.asarray(wav, np.float32)
    n = x.shape[-1]
    chunk = int(chunk_seconds * sr)
    left = int(context_seconds * sr)
    right = entry.stft.frame_len

    # per-utterance RMS gain as in the offline driver
    c = np.sqrt(n / np.maximum(np.sum(np.square(x)), 1e-12)).astype(np.float32)
    inverted = name == "g2net"
    x_in = x / c if inverted else x * c

    n_windows = -(-n // chunk)
    total = left + n_windows * chunk + right
    xp = np.zeros(total, np.float32)
    xp[left:left + n] = x_in

    win_len = left + chunk + right
    starts = np.arange(n_windows) * chunk
    windows = np.stack([xp[s:s + win_len] for s in starts])

    outs = []
    for i in range(0, n_windows, max_batch):
        batch = windows[i:i + max_batch]
        pad = max_batch - batch.shape[0]
        if pad > 0:  # keep ONE compiled shape for the tail batch
            batch = np.pad(batch, ((0, pad), (0, 0)))
        est = _enhance_jit(entry, model, variables, jnp.asarray(batch),
                           compressed, win_len, dtype=dtype)
        est = np.asarray(est)[:batch.shape[0] - pad if pad else None]
        outs.append(est[:, left:left + chunk])
    out = np.concatenate(outs, axis=0).reshape(-1)[:n]
    return out * c if inverted else out / c


# ------------------------------------------------------ exact LSTM streaming

@functools.partial(jax.jit, static_argnames=("model", "cfg", "k", "compressed"))
def _lstm_stream_step(model, variables, cfg: StftConfig, samples, carry,
                      k: int, compressed: bool):
    """`samples`: ((k-1)*hop + frame_len,) -> (k, frame_len) synthesis frames
    (pre-OLA, pre-envelope) + new carry."""
    idx = np.arange(k)[:, None] * cfg.hop + np.arange(cfg.frame_len)[None, :]
    frames = samples[idx]
    basis = jnp.asarray(_forward_basis(cfg))
    spec = jnp.matmul(frames, basis, preferred_element_type=jnp.float32)
    f = cfg.bins
    re, im = spec[:, :f], spec[:, f:]
    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)
    if compressed:
        mag = jnp.sqrt(mag)
    est, carry = model.apply(variables, mag[None], carry=carry)
    est = est[0]
    if compressed:
        est = jnp.square(est)
    out_ri = jnp.concatenate([est * jnp.cos(phase), est * jnp.sin(phase)],
                             axis=-1)
    ibasis = jnp.asarray(_inverse_basis(cfg))
    synth = jnp.matmul(out_ri, ibasis, preferred_element_type=jnp.float32)
    return synth, carry


class LstmStreamer:
    """Exact streaming decode for the `lstm` model (mag in, noisy phase out).

    Reproduces `enhance_waveform("lstm", ...)` sample-for-sample (float
    tolerance): librosa-center reflect padding is synthesized at the stream
    head/tail, the overlap-add and squared-window envelope are accumulated
    across chunks, and LSTM state is carried exactly.

    The offline driver's per-utterance RMS gain needs the whole utterance;
    pass `gain` if known (tests), else gain is estimated from the first
    chunk and frozen (documented deviation inherent to streaming).
    """

    def __init__(self, variables, model=None, compressed: bool = True,
                 chunk_frames: int = 16, gain: float | None = None):
        entry = get_model("lstm")
        self.cfg = entry.stft
        self.model = model if model is not None else entry.make()
        self.variables = variables
        self.compressed = compressed
        self.k = chunk_frames
        self.gain = gain
        self.carry = self.model.zero_carry(1)

        cfg = self.cfg
        self._lpad = cfg.fft // 2
        self._pending = np.zeros(0, np.float32)  # gained samples, incl. head pad
        self._started = False
        self._frame_pos = 0       # next frame index to analyze
        self._n_in = 0            # raw samples received
        # OLA accumulators, absolute sample coordinates (incl. head pad)
        self._ola = np.zeros(0, np.float64)
        self._env = np.zeros(0, np.float64)
        self._ola_base = 0        # absolute coordinate of self._ola[0]
        self._emitted = 0         # raw (cropped) samples already returned
        w = _padded_window(cfg)[: cfg.frame_len]
        self._wsq = (w * w).astype(np.float64)
        # ring of the last lpad+1 gained samples (tail reflect at flush)
        self._tail = np.zeros(0, np.float32)

    def _absorb(self, synth: np.ndarray, first_frame: int):
        cfg = self.cfg
        k, flen = synth.shape
        lo = first_frame * cfg.hop
        hi = lo + (k - 1) * cfg.hop + flen
        if hi > self._ola_base + len(self._ola):
            grow = hi - (self._ola_base + len(self._ola))
            self._ola = np.concatenate([self._ola, np.zeros(grow)])
            self._env = np.concatenate([self._env, np.zeros(grow)])
        for j in range(k):
            s = lo + j * cfg.hop - self._ola_base
            self._ola[s:s + flen] += synth[j]
            self._env[s:s + flen] += self._wsq

    def _emit(self, upto_abs: int) -> np.ndarray:
        """Finalize samples in absolute coords [emitted+lpad, upto_abs)."""
        start_abs = self._emitted + self._lpad
        if upto_abs <= start_abs:
            return np.zeros(0, np.float32)
        s = start_abs - self._ola_base
        e = upto_abs - self._ola_base
        seg = self._ola[s:e]
        env = self._env[s:e]
        out = np.where(env > 1e-11, seg / np.maximum(env, 1e-11), seg)
        # drop finalized prefix
        self._ola = self._ola[e:]
        self._env = self._env[e:]
        self._ola_base = upto_abs
        self._emitted += len(out)
        return (out / self.gain).astype(np.float32)

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed raw samples; returns whatever output is finalized."""
        samples = np.asarray(samples, np.float32)
        self._n_in += len(samples)
        if not self._started:
            self._head = np.concatenate([getattr(self, "_head", np.zeros(0, np.float32)), samples])
            if len(self._head) < self._lpad + 1:
                return np.zeros(0, np.float32)
            if self.gain is None:
                e = np.sum(np.square(self._head))
                self.gain = float(np.sqrt(len(self._head) / max(e, 1e-12)))
            head = self._head * self.gain
            # librosa center: reflect-pad fft//2 at the head
            self._pending = np.concatenate(
                [head[1:self._lpad + 1][::-1], head])
            self._tail = head[-(self._lpad + 1):]
            self._started = True
            del self._head
        else:
            gained = samples * self.gain
            self._pending = np.concatenate([self._pending, gained])
            self._tail = np.concatenate(
                [self._tail, gained])[-(self._lpad + 1):]

        cfg = self.cfg
        out = []
        while True:
            # frames [frame_pos, frame_pos+k) need samples up to this abs pos
            need = (self._frame_pos + self.k - 1) * cfg.hop + cfg.frame_len
            have = self._frame_pos * cfg.hop + len(self._pending)
            if have < need:
                break
            lo = self._frame_pos * cfg.hop
            chunk = self._pending[: need - lo]
            synth, self.carry = _lstm_stream_step(
                self.model, self.variables, cfg, jnp.asarray(chunk),
                self.carry, self.k, self.compressed)
            self._absorb(np.asarray(synth, np.float64), self._frame_pos)
            self._frame_pos += self.k
            # samples older than the next frame's start are final
            final_abs = self._frame_pos * cfg.hop
            out.append(self._emit(final_abs))
            drop = self._frame_pos * cfg.hop - lo
            self._pending = self._pending[drop:]
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """Reflect-pad the tail, run remaining frames, return the rest."""
        cfg = self.cfg
        if not self._started:
            # utterance shorter than the head padding: fall back to the
            # offline driver (exact, and the stream never got going)
            from se_tpu.eval.enhance import enhance_waveform
            buf = getattr(self, "_head", np.zeros(0, np.float32))
            if len(buf) == 0:
                return np.zeros(0, np.float32)
            return enhance_waveform("lstm", self.variables, buf,
                                    compressed=self.compressed,
                                    model=self.model)
        # total frames of the full-utterance decode: 1 + n // hop
        n = self._n_in
        total_frames = 1 + n // cfg.hop
        # append the tail reflect padding (librosa center, gained samples):
        # padded[lpad + n + i] = gained x[n - 2 - i]
        t = self._tail
        refl = t[-2 : -2 - self._lpad : -1] if len(t) >= 2 \
            else np.zeros(0, np.float32)
        if len(refl) < self._lpad:
            refl = np.pad(refl, (0, self._lpad - len(refl)))
        self._pending = np.concatenate([self._pending, refl])

        out = []
        while self._frame_pos < total_frames:
            k = min(self.k, total_frames - self._frame_pos)
            lo = self._frame_pos * cfg.hop
            need = (self._frame_pos + k - 1) * cfg.hop + cfg.frame_len
            chunk = self._pending[: need - lo]
            if len(chunk) < need - lo:
                chunk = np.pad(chunk, (0, need - lo - len(chunk)))
            if k != self.k:  # pad to the compiled chunk size
                full = (self._frame_pos + self.k - 1) * cfg.hop + cfg.frame_len
                chunk = np.pad(chunk, (0, full - need))
            synth, self.carry = _lstm_stream_step(
                self.model, self.variables, cfg, jnp.asarray(chunk),
                self.carry, self.k, self.compressed)
            self._absorb(np.asarray(synth[:k], np.float64), self._frame_pos)
            self._frame_pos += k
            drop = self._frame_pos * cfg.hop - lo
            self._pending = self._pending[drop:]
        out.append(self._emit(self._lpad + n))
        return np.concatenate(out) if out else np.zeros(0, np.float32)


# ------------------------------------- exact streaming, conv-recurrent models

@functools.partial(jax.jit, static_argnames=(
    "model", "cfg", "n_frames", "split", "k_out", "compressed", "kind"))
def _causal_stream_step(model, variables, cfg: StftConfig, samples, carry,
                        n_frames: int, split: int, k_out: int,
                        compressed: bool, kind: str):
    """`samples`: ((n_frames-1)*hop + frame_len,) -> (k_out, frame_len)
    synthesis frames for the LAST k_out window positions + the carry
    checkpointed after `split` frames (left-context replay scheme, see
    CausalStreamer)."""
    idx = np.arange(n_frames)[:, None] * cfg.hop + \
        np.arange(cfg.frame_len)[None, :]
    frames = samples[idx]
    basis = jnp.asarray(_forward_basis(cfg))
    spec = jnp.matmul(frames, basis, preferred_element_type=jnp.float32)
    f = cfg.bins
    re, im = spec[:, :f], spec[:, f:]
    mag, phase = _magphase(re, im)
    if compressed:
        mag = jnp.sqrt(mag)

    if kind == "mag_mask":
        est, new_carry = model.apply(variables, mag[None], carry=carry,
                                     split=split)
        est = est[0]
        if compressed:
            est = jnp.square(est)
        out_re = est * jnp.cos(phase)
        out_im = est * jnp.sin(phase)
    else:  # complex_map (gcrn) / complex_mask (dpcrn)
        feats = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)],
                          axis=-1)
        est, new_carry = model.apply(variables, feats[None], carry=carry,
                                     split=split)
        est = est[0]
        est_mag, est_phase = _magphase(est[..., 0], est[..., 1])
        if compressed:
            est_mag = jnp.square(est_mag)
        out_re = est_mag * jnp.cos(est_phase)
        out_im = est_mag * jnp.sin(est_phase)

    out_ri = jnp.concatenate([out_re, out_im], axis=-1)[-k_out:]
    ibasis = jnp.asarray(_inverse_basis(cfg))
    synth = jnp.matmul(out_ri, ibasis, preferred_element_type=jnp.float32)
    return synth, new_carry


class CausalStreamer:
    """Exact streaming decode for the causal conv-recurrent families
    (crn, gcrn, dpcrn — VERDICT r1 item 9), extending LstmStreamer's
    state-carrying pattern with LEFT-CONTEXT REPLAY for the causal convs:

    Each chunk runs the model over [R history frames + k new frames].
    The causal convs' receptive field is R frames (model.replay_frames:
    crn/dpcrn 10, gcrn 0), so conv outputs at the k new positions are
    exact. The time-LSTMs carry state exactly: the model's `split` kwarg
    checkpoints the LSTM state after the first k window frames — which is
    the state at (next chunk's window start) — while replayed frames'
    LSTM outputs are recomputed deterministically from that checkpoint.

    Reproduces the offline enhance_waveform decode to float tolerance;
    algorithmic latency = frame_len + chunk_frames * hop (+ the replay
    compute, which does not add latency). Per-utterance RMS gain is
    estimated from the first chunk unless passed (same deviation as
    LstmStreamer).
    """

    def __init__(self, name: str, variables, model=None,
                 compressed: bool = True, chunk_frames: int = 16,
                 gain: float | None = None):
        entry = get_model(name)
        self.cfg = entry.stft
        self.kind = entry.io_kind
        self.model = model if model is not None else entry.make()
        self.r = int(getattr(self.model, "replay_frames", 0))
        if chunk_frames < self.r:
            raise ValueError(
                f"chunk_frames must be >= replay_frames ({self.r})")
        self.variables = variables
        self.compressed = compressed
        self.k = chunk_frames
        self.gain = gain
        self.carry = self.model.zero_carry(1)
        self.name = name

        cfg = self.cfg
        self._lpad = cfg.fft // 2
        self._pending = np.zeros(0, np.float32)
        self._pend_frame = 0      # frame index of _pending[0]'s frame
        self._started = False
        self._frame_pos = 0       # next NEW frame index to produce
        self._n_in = 0
        self._ola = np.zeros(0, np.float64)
        self._env = np.zeros(0, np.float64)
        self._ola_base = 0
        self._emitted = 0
        w = _padded_window(cfg)[: cfg.frame_len]
        self._wsq = (w * w).astype(np.float64)
        self._tail = np.zeros(0, np.float32)

    # OLA plumbing identical to LstmStreamer
    _absorb = LstmStreamer._absorb
    _emit = LstmStreamer._emit

    def _run_chunk(self, pad_tail: int = 0, k_actual: int | None = None):
        cfg = self.cfg
        first = self._frame_pos == 0
        w_start = 0 if first else self._frame_pos - self.r
        n_frames = self.k if first else self.r + self.k
        split = self.k - self.r if first else self.k
        lo = (w_start - self._pend_frame) * cfg.hop
        need = (n_frames - 1) * cfg.hop + cfg.frame_len
        chunk = self._pending[lo : lo + need]
        if len(chunk) < need:
            chunk = np.pad(chunk, (0, need - len(chunk)))
        synth, self.carry = _causal_stream_step(
            self.model, self.variables, cfg, jnp.asarray(chunk), self.carry,
            n_frames, split, self.k, self.compressed, self.kind)
        k_keep = self.k if k_actual is None else k_actual
        self._absorb(np.asarray(synth[:k_keep], np.float64), self._frame_pos)
        self._frame_pos += k_keep
        # retain replay history: drop pending below (frame_pos - R)
        keep_from = max(0, self._frame_pos - self.r)
        drop = (keep_from - self._pend_frame) * cfg.hop
        if drop > 0:
            self._pending = self._pending[drop:]
            self._pend_frame = keep_from

    def push(self, samples: np.ndarray) -> np.ndarray:
        samples = np.asarray(samples, np.float32)
        self._n_in += len(samples)
        if not self._started:
            self._head = np.concatenate(
                [getattr(self, "_head", np.zeros(0, np.float32)), samples])
            if len(self._head) < self._lpad + 1:
                return np.zeros(0, np.float32)
            if self.gain is None:
                e = np.sum(np.square(self._head))
                self.gain = float(np.sqrt(len(self._head) / max(e, 1e-12)))
            head = self._head * self.gain
            self._pending = np.concatenate(
                [head[1 : self._lpad + 1][::-1], head])
            self._tail = head[-(self._lpad + 1):]
            self._started = True
            del self._head
        else:
            gained = samples * self.gain
            self._pending = np.concatenate([self._pending, gained])
            self._tail = np.concatenate(
                [self._tail, gained])[-(self._lpad + 1):]

        cfg = self.cfg
        out = []
        while True:
            # frames [frame_pos, frame_pos+k) need samples up to:
            need_abs = (self._frame_pos + self.k - 1) * cfg.hop \
                + cfg.frame_len
            have_abs = self._pend_frame * cfg.hop + len(self._pending)
            if have_abs < need_abs:
                break
            self._run_chunk()
            out.append(self._emit(self._frame_pos * cfg.hop))
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        cfg = self.cfg
        if not self._started:
            from se_tpu.eval.enhance import enhance_waveform
            buf = getattr(self, "_head", np.zeros(0, np.float32))
            if len(buf) == 0:
                return np.zeros(0, np.float32)
            return enhance_waveform(self.name, self.variables, buf,
                                    compressed=self.compressed,
                                    model=self.model)
        n = self._n_in
        total_frames = 1 + n // cfg.hop
        t = self._tail
        refl = t[-2 : -2 - self._lpad : -1] if len(t) >= 2 \
            else np.zeros(0, np.float32)
        if len(refl) < self._lpad:
            refl = np.pad(refl, (0, self._lpad - len(refl)))
        self._pending = np.concatenate([self._pending, refl])

        out = []
        while self._frame_pos < total_frames:
            k_actual = min(self.k, total_frames - self._frame_pos)
            self._run_chunk(k_actual=k_actual)
            out.append(self._emit(min(self._frame_pos * cfg.hop,
                                      self._lpad + n)))
        out.append(self._emit(self._lpad + n))
        return np.concatenate(out) if out else np.zeros(0, np.float32)
