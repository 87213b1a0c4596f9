"""CLI end-to-end, config presets, and published param-count parity."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.data import write_wav
from se_tpu.models import get_model
from se_tpu.utils.config import get_preset
from se_tpu.utils.profiling import num_params

# BASELINE.md Table D parameter counts (millions).
PUBLISHED_PARAMS_M = {
    "lstm": 21.82,
    "fullsubnet": 5.64,
    "crn": 17.58,
    "gcrn": 9.77,
    "dpcrn": 0.72,
    "uformer": 3.34,
    "dccrn": 3.67,
    "ctsnet": 4.35,
    # Table D lists 7.39 M for G2Net, but the reference code's shipped decode
    # config (G2Net_new/com_decode.py:23, is_aux=False) builds exactly
    # 5.948137 M params — we match the code, verified against torch.
    "g2net": 5.948,
    "taylorsenet": 5.45,
    "deepxi": 1.95,
}


@pytest.mark.parametrize("name", sorted(PUBLISHED_PARAMS_M))
def test_param_count_matches_published(name, rng):
    entry = get_model(name)
    model = entry.make()
    n = 2000
    wav = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
    if entry.io_kind == "waveform":
        variables = model.init(jax.random.PRNGKey(0), wav, wav)
    elif entry.io_kind == "hybrid":
        x = jnp.zeros((1, 8, 257))
        variables = model.init(jax.random.PRNGKey(0), x)
    else:
        from se_tpu.ops.stft import stft

        re, im = stft(wav, entry.stft)
        mag = jnp.sqrt(re**2 + im**2)
        feats = mag if entry.io_kind in ("mag_mask", "cirm") else (
            jnp.stack([re, im], axis=-1))
        variables = model.init(jax.random.PRNGKey(0), feats)
    got_m = num_params(variables) / 1e6
    want_m = PUBLISHED_PARAMS_M[name]
    assert abs(got_m - want_m) / want_m < 0.03, (name, got_m, want_m)


def test_presets():
    cfg = get_preset("dccrn")
    assert (cfg.win_size, cfg.win_shift, cfg.fft_num) == (512, 128, 512)
    cfg = get_preset("uformer")
    assert (cfg.win_size, cfg.win_shift, cfg.fft_num) == (400, 160, 512)
    assert get_preset("ctsnet_in").norm == "in"
    kw = get_preset("dccrn_snr").resolved_model_kwargs()
    assert kw["snr_variant"] is True


def test_cli_enhance_and_score(tmp_path, rng, capsys):
    from se_tpu.cli import main

    mix_dir = tmp_path / "noisy"
    ref_dir = tmp_path / "clean"
    out_dir = tmp_path / "est"
    os.makedirs(mix_dir)
    os.makedirs(ref_dir)
    for i in range(2):
        clean = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        noise = (rng.standard_normal(8000) * 0.03).astype(np.float32)
        write_wav(str(ref_dir / f"u{i}.wav"), clean, 16000)
        write_wav(str(mix_dir / f"u{i}.wav"), clean + noise, 16000)

    main(["enhance", "--model", "lstm", "--mix-dir", str(mix_dir),
          "--out-dir", str(out_dir)])
    assert sorted(os.listdir(out_dir)) == ["u0.wav", "u1.wav"]

    csv_path = tmp_path / "res" / "results.csv"
    main(["score", "--est-dir", str(out_dir), "--ref-dir", str(ref_dir),
          "--csv", str(csv_path)])
    assert csv_path.is_file()
    assert (tmp_path / "res" / "average.csv").is_file()


def test_cli_stream_both_modes(tmp_path, rng):
    from se_tpu.cli import main
    from se_tpu.data import read_wav, write_wav

    mix_dir = tmp_path / "noisy"
    mix_dir.mkdir()
    n = 12000
    write_wav(str(mix_dir / "u0.wav"),
              (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)

    for mode, model, out in (("exact", "lstm", "e"), ("windowed", "gcrn", "w")):
        out_dir = tmp_path / out
        main(["stream", "--model", model, "--mode", mode,
              "--mix-dir", str(mix_dir), "--out-dir", str(out_dir),
              "--chunk-seconds", "0.4", "--context-seconds", "0.2"])
        est, sr = read_wav(str(out_dir / "u0.wav"))
        assert sr == 16000 and est.shape == (n,)
        assert np.all(np.isfinite(est))


def test_flops_estimate_matches_published_macs(rng):
    """XLA cost-analysis FLOPs for the LSTM forward should be within 2x of
    the published complexity (2.19 G MACs per second of audio, BASELINE.md
    Table D; FLOPs ~= 2 MACs)."""
    import jax
    import jax.numpy as jnp

    from se_tpu.models import get_model
    from se_tpu.utils.profiling import flops_estimate

    entry = get_model("lstm")
    model = entry.make()
    t = 101  # ~1 s at 320/160
    mag = jnp.asarray(rng.standard_normal((1, t, 161)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mag)
    fl = flops_estimate(lambda m: model.apply(variables, m), mag)
    if fl is None:
        pytest.skip("backend exposes no cost analysis")
    # XLA's cost analysis counts one "flop" per MAC for dots: the LSTM
    # measures 1.94e9 vs the published 2.19 G MACs (within 12%)
    published_macs = 2.19e9
    assert 0.7 < fl / published_macs < 1.5, fl


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    from se_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((64, 64))).block_until_ready()
    import os

    found = any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
                for _, _, fs in os.walk(tmp_path) for f in fs)
    assert found
