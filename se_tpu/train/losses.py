"""Unified masked loss library.

One module parameterized the way the reference's per-model `Backup.py` copies
are (ref SURVEY.md §2.2: LSTM/CRN/DPCRN/GCRN share one variant; DCCRN adds
frame/OLA/stftm + SI-SDR/SNR losses; CTSNet/G2Net add the alpha-blend;
Uformer has its own per-utterance set in Uformer/loss.py).

Conventions: spectra are (B, T, F) magnitudes or (B, T, F, 2) complex pairs;
waveforms are (B, N). `frames` is the per-utterance valid frame count (the
reference's `frame_mask_list`); everything is vectorized — no Python loops
over the batch (the reference's loops are a hot-loop hazard it calls out
itself).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPSILON = 1e-12


def frame_mask(frames: jnp.ndarray, t_max: int) -> jnp.ndarray:
    """(B,) valid frame counts -> (B, t_max) 0/1 mask."""
    t = jnp.arange(t_max)
    return (t[None, :] < frames[:, None]).astype(jnp.float32)


def sample_mask_from_frames(frames: jnp.ndarray, n_max: int, hop: int) -> jnp.ndarray:
    """Waveform-domain mask with the reference's (frames-1)*hop length
    (ref DCCRN/Backup.py:128)."""
    lengths = (frames - 1) * hop
    n = jnp.arange(n_max)
    return (n[None, :] < lengths[:, None]).astype(jnp.float32)


def mag_mse_loss(esti, label, frames):
    """(B,T,F) masked MSE (ref LSTM/Backup.py:67-76)."""
    m = frame_mask(frames, esti.shape[1])[..., None]
    denom = jnp.sum(m) * esti.shape[-1]
    return jnp.sum(jnp.square((esti - label) * m)) / denom


def com_mse_loss(esti, label, frames):
    """(B,T,F,2) masked MSE over both components (ref LSTM/Backup.py:55-65)."""
    m = frame_mask(frames, esti.shape[1])[..., None, None]
    denom = 2.0 * jnp.sum(m) * esti.shape[-2]
    return jnp.sum(jnp.square((esti - label) * m)) / denom


def com_mag_mse_loss(esti, label, frames):
    """0.5*RI-MSE + 0.5*mag-MSE (ref LSTM/Backup.py:79-91)."""
    mag_e = jnp.sqrt(jnp.sum(jnp.square(esti), axis=-1) + 0.0)
    mag_l = jnp.sqrt(jnp.sum(jnp.square(label), axis=-1) + 0.0)
    return 0.5 * (mag_mse_loss(mag_e, mag_l, frames)
                  + com_mse_loss(esti, label, frames))


def mse_com_mag_mse_loss(esti_mag, esti, label_mag, label, frames, alpha=0.2):
    """alpha-blend of mag MSE and com+mag MSE (ref G2Net_new/Backup.py:134-138)."""
    return (alpha * mag_mse_loss(esti_mag, label_mag, frames)
            + (1.0 - alpha) * com_mag_mse_loss(esti, label, frames))


def stagewise_com_mag_mse_loss(stage_estis, label, frames):
    """Mean of com_mag_mse over multi-stage outputs (G2Net/TaylorSENet
    training supervises every stage)."""
    losses = [com_mag_mse_loss(e, label, frames) for e in stage_estis]
    return sum(losses) / len(losses)


def _masked_wave(esti, label, mask):
    return esti * mask, label * mask


def sisdr_loss(esti, label, frames, hop: int, eps: float = EPSILON):
    """Masked SI-SDR on waveforms (ref DCCRN/Backup.py:123-138).

    DCCRN_SNR uses eps=2e-7 (ref DCCRN_SNR/Backup.py:140-147).
    """
    m = sample_mask_from_frames(frames, esti.shape[-1], hop)
    e, l = _masked_wave(esti, label, m)
    s_t = (jnp.sum(e * l, -1, keepdims=True)
           / (jnp.sum(l * l, -1, keepdims=True) + eps)) * l
    e_n = e - s_t
    ratio = jnp.sum(s_t**2, -1) / (jnp.sum(e_n**2, -1)) + eps
    return jnp.mean(-10.0 * jnp.log10(ratio))


def snr_loss(esti, label, frames, hop: int):
    """Masked SNR loss (ref DCCRN/Backup.py:142-156)."""
    m = sample_mask_from_frames(frames, esti.shape[-1], hop)
    e, l = _masked_wave(esti, label, m)
    noise = l - e
    ratio = jnp.sum(l**2, -1) / (jnp.sum(noise**2, -1) + EPSILON) + EPSILON
    return jnp.mean(-10.0 * jnp.log10(ratio))


def fusion_snr_loss(esti, label, lengths):
    """0.5*SI-SNR + 0.5*SV-SNR over masked waveforms
    (ref LSTM/Backup.py:36-52)."""
    n = jnp.arange(esti.shape[-1])
    m = (n[None, :] < lengths[:, None]).astype(jnp.float32)
    e, l = _masked_wave(esti, label, m)
    s_t = l * jnp.sum(e * l, -1, keepdims=True) / (
        jnp.sum(l**2, -1, keepdims=True) + EPSILON)
    e_n = e - s_t
    loss1 = jnp.mean(-10.0 * jnp.log10(
        jnp.sum(s_t**2, -1) / (jnp.sum(e_n**2, -1) + EPSILON) + EPSILON))
    loss2 = jnp.mean(-10.0 * jnp.log10(
        jnp.sum(l**2, -1) / jnp.sum((e - l) ** 2, -1) + EPSILON))
    return 0.5 * (loss1 + loss2)


class StftmLoss:
    """STFT-magnitude-components L1 via DFT matmul
    (ref DCCRN/Backup.py:67-94: valid framing, symmetric hamming, full DFT)."""

    def __init__(self, frame_size: int = 512, frame_shift: int = 256):
        self.frame_size = frame_size
        self.frame_shift = frame_shift
        n = frame_size
        idx = np.arange(n)
        ang = 2.0 * np.pi * np.outer(idx, idx) / n
        w = np.hamming(n)  # symmetric, as the reference
        self.dr = jnp.asarray((np.cos(ang) * w[:, None]).astype(np.float32))
        self.di = jnp.asarray((-np.sin(ang) * w[:, None]).astype(np.float32))

    def _frames(self, x):
        n = x.shape[-1]
        t = (n - self.frame_size) // self.frame_shift + 1
        starts = np.arange(t) * self.frame_shift
        idx = starts[:, None] + np.arange(self.frame_size)[None, :]
        return x[..., idx]

    def __call__(self, esti, label):
        fe, fl = self._frames(esti), self._frames(label)
        er, ei = fe @ self.dr, fe @ self.di
        lr, li = fl @ self.dr, fl @ self.di
        return jnp.mean(jnp.abs(lr - er) + jnp.abs(li - ei))


# ------------------------------------------------- Uformer loss set (loss.py)

def uformer_sisnr_loss(esti, label, eps: float = EPSILON):
    """Per-utterance SI-SNR with GLOBAL mean removal and zero-source skip
    (ref Uformer/loss.py:13-39)."""
    x_zm = esti - jnp.mean(esti, axis=-1, keepdims=True)
    s_zm = label - jnp.mean(label, axis=-1, keepdims=True)
    t = (jnp.sum(x_zm * s_zm, -1, keepdims=True) * s_zm
         / (jnp.sum(s_zm**2, -1, keepdims=True) + eps))
    num = jnp.sqrt(jnp.sum(t**2, -1))
    den = jnp.sqrt(jnp.sum((x_zm - t) ** 2, -1))
    per_utt = -20.0 * jnp.log10(eps + num / (den + eps))
    nonzero = (jnp.mean(label**2, -1) >= 1.2e-8).astype(jnp.float32)
    return jnp.sum(per_utt * nonzero) / jnp.maximum(jnp.sum(nonzero), 1.0)


def uformer_cplx_mse_loss(esti, label):
    """(B,T,F,2); per-utterance sum / F / 2 (ref Uformer/loss.py:42-54)."""
    f = esti.shape[2]
    per = jnp.sum(jnp.square(esti - label), axis=(1, 2, 3)) / f
    return jnp.mean(per) / 2.0


def uformer_mag_mse_loss(esti, label):
    """(B,T,F,2) -> mag MSE (ref Uformer/loss.py:56-63)."""
    eps = EPSILON
    me = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(esti), -1), eps))
    ml = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(label), -1), eps))
    f = esti.shape[2]
    per = jnp.sum(jnp.square(me - ml), axis=(1, 2)) / f
    return jnp.mean(per)


_SUBBAND_W4 = (1.5, 1.2, 0.8, 0.5)


def uformer_cplx_mse_subband_loss(esti, label):
    """4-band weighted complex MSE, DC stripped (ref Uformer/loss.py:65-90)."""
    e = esti[:, :, 1:]
    l = label[:, :, 1:]
    f = e.shape[2]
    eb = jnp.stack(jnp.split(e, 4, axis=2), axis=-1)
    lb = jnp.stack(jnp.split(l, 4, axis=2), axis=-1)
    w = jnp.asarray(_SUBBAND_W4)
    per = jnp.sum(jnp.square(eb - lb), axis=(1, 2, 3)) * w  # (B, 4)
    return jnp.sum(per) / e.shape[0] / f / 2.0


def uformer_mag_mse_subband_loss(esti, label):
    """(ref Uformer/loss.py:92-109)."""
    eps = EPSILON
    me = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(esti), -1), eps))[:, :, 1:]
    ml = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(label), -1), eps))[:, :, 1:]
    f = me.shape[2]
    eb = jnp.stack(jnp.split(me, 4, axis=2), axis=-1)
    lb = jnp.stack(jnp.split(ml, 4, axis=2), axis=-1)
    w = jnp.asarray(_SUBBAND_W4)
    per = jnp.sum(jnp.square(eb - lb), axis=(1, 2)) * w
    # reference divides by output_mag.shape[2] AFTER the chunk+stack, which is
    # the TIME axis there, not F' (ref Uformer/loss.py:109) — quirk preserved.
    del f
    t = me.shape[1]
    return jnp.sum(per) / me.shape[0] / t


def uformer_time_mae_loss(esti, label):
    """(ref Uformer/loss.py:132-137)."""
    return jnp.mean(jnp.sum(jnp.abs(esti - label), axis=-1))


def uformer_bce_loss(output, target):
    """Summed BCE / (B*T) (ref Uformer/loss.py:139-147)."""
    eps = 1e-7
    o = jnp.clip(output, eps, 1.0 - eps)
    bce = -(target * jnp.log(o) + (1.0 - target) * jnp.log(1.0 - o))
    return jnp.sum(bce) / output.shape[0] / output.shape[1]


def uformer_accuracy(output, target):
    """(ref Uformer/loss.py:149-156)."""
    pred = (output > 0.5).astype(jnp.float32)
    err = jnp.sum(jnp.abs(pred - target))
    total = np.prod(output.shape)
    return (total - err) / total
