"""Streaming decode: windowed zoo-wide path and exact LSTM streaming."""

import numpy as np
import jax
import pytest

from se_tpu.eval.enhance import enhance_waveform
from se_tpu.eval.streaming import LstmStreamer, enhance_windowed
from se_tpu.models import get_model
from se_tpu.ops.stft import stft
import jax.numpy as jnp


def _init_spectral(name, rng_key=0):
    entry = get_model(name)
    model = entry.make()
    wav = jnp.zeros((1, 8000), jnp.float32)
    re, im = stft(wav, entry.stft)
    mag = jnp.sqrt(re**2 + im**2)
    feats = mag if entry.io_kind in ("mag_mask", "cirm") else (
        jnp.stack([re, im], axis=-1))
    return model, model.init(jax.random.PRNGKey(rng_key), feats)


def test_lstm_streaming_exact(rng):
    """Chunked stateful streaming == full-utterance decode (float tol)."""
    n = 40000  # 2.5 s, not a hop multiple after the last frame
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    model, variables = _init_spectral("lstm")

    full = enhance_waveform("lstm", variables, wav, model=model)

    c = float(np.sqrt(n / max(np.sum(wav**2), 1e-12)))
    st = LstmStreamer(variables, model=model, chunk_frames=16, gain=c)
    pieces = [wav[:1000], wav[1000:8777], wav[8777:23456], wav[23456:]]
    outs = [st.push(p) for p in pieces]
    outs.append(st.flush())
    stream = np.concatenate(outs)

    assert stream.shape == full.shape == (n,)
    np.testing.assert_allclose(stream, full, atol=2e-4, rtol=0)
    # and it is genuinely incremental: output arrived before flush
    assert sum(len(o) for o in outs[:-1]) > 0.8 * n


def test_lstm_streaming_self_gain(rng):
    """Without a known gain the stream estimates it from the first chunk;
    output should still be close to the offline decode for stationary
    input (the gain estimate converges)."""
    n = 32000
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    model, variables = _init_spectral("lstm")
    full = enhance_waveform("lstm", variables, wav, model=model)
    st = LstmStreamer(variables, model=model, chunk_frames=8)
    out = np.concatenate([st.push(wav[:16000]), st.push(wav[16000:]),
                          st.flush()])
    err = np.abs(out - full).mean() / (np.abs(full).mean() + 1e-9)
    assert err < 0.05, err


@pytest.mark.parametrize("name", ["gcrn", "dpcrn"])
def test_windowed_streaming_close(rng, name):
    """Windowed decode tracks the full decode for causal models: the LSTM
    state forgotten at window boundaries is re-established by the context."""
    n = 6 * 16000
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    model, variables = _init_spectral(name)
    full = enhance_waveform(name, variables, wav, model=model)
    win = enhance_windowed(name, variables, wav, chunk_seconds=2.0,
                           context_seconds=1.0, model=model)
    assert win.shape == full.shape
    diff = win - full
    snr = 10 * np.log10((np.sum(full**2) + 1e-12) / (np.sum(diff**2) + 1e-12))
    assert snr > 20.0, snr


def test_windowed_handles_ragged_tail(rng):
    """Length not a multiple of the chunk still returns exactly n samples."""
    n = 5 * 16000 + 321
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    model, variables = _init_spectral("gcrn")
    out = enhance_windowed("gcrn", variables, wav, chunk_seconds=2.0,
                           context_seconds=0.5, model=model)
    assert out.shape == (n,)
    assert np.all(np.isfinite(out))


@pytest.mark.parametrize("name", ["crn", "gcrn", "dpcrn"])
def test_causal_streaming_exact(rng, name):
    """CausalStreamer (left-context replay + LSTM state checkpointing)
    reproduces the offline decode to float tolerance (VERDICT r1 item 9)."""
    from se_tpu.eval.streaming import CausalStreamer

    n = 24000  # 1.5 s, not a hop multiple
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    model, variables = _init_spectral(name)

    full = enhance_waveform(name, variables, wav, model=model)

    c = float(np.sqrt(n / max(np.sum(wav**2), 1e-12)))
    st = CausalStreamer(name, variables, model=model, chunk_frames=16,
                        gain=c)
    pieces = [wav[:900], wav[900:7777], wav[7777:15555], wav[15555:]]
    outs = [st.push(p) for p in pieces]
    outs.append(st.flush())
    stream = np.concatenate(outs)

    assert stream.shape == full.shape == (n,)
    np.testing.assert_allclose(stream, full, atol=3e-4, rtol=0)
    assert sum(len(o) for o in outs[:-1]) > 0.7 * n


def test_causal_streamer_rejects_small_chunk(rng):
    from se_tpu.eval.streaming import CausalStreamer

    model, variables = _init_spectral("crn")
    with pytest.raises(ValueError):
        CausalStreamer("crn", variables, model=model, chunk_frames=4)
