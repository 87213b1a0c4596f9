"""End-to-end synthetic training demo (VERDICT r1 item 7).

Trains a zoo model from scratch on a synthetic denoising task (harmonic
"voices" + white noise at -2..10 dB SNR), then scores held-out utterances
with SI-SDR and eSTOI — the same protocol as the round-1 DPCRN
demonstration (PERF.md "End-to-end training demonstration").

Run: python examples/train_synthetic_demo.py <model> [epochs] [batch]
e.g. python examples/train_synthetic_demo.py uformer 40 8

SE_TPU_DEMO_NTRAIN=320 scales the training set (round-5 G2Net
negative-transfer discrimination, VERDICT r4 item 6: 4x data at the same
recipe) and SE_TPU_DEMO_LOSS=com_mag_mse overrides the model's default
loss (the control for the stagewise loss wiring).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

FS = 16000
N = 4 * FS  # 4 s utterances
N_TRAIN = int(_os.environ.get("SE_TPU_DEMO_NTRAIN", "80"))
N_TEST = 16


def synth_voice(rng, n=N):
    t = np.arange(n) / FS
    f0 = rng.uniform(90, 220) + rng.uniform(10, 50) * np.sin(
        2 * np.pi * rng.uniform(0.8, 3.0) * t + rng.uniform(0, 6))
    phase = 2 * np.pi * np.cumsum(f0) / FS
    x = sum(np.sin(k * phase + rng.uniform(0, 6)) / k for k in range(1, 9))
    env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                         + rng.uniform(0, 6)), 0, None) ** 2 + 0.05
    x = x * env
    return (0.1 * x / np.sqrt(np.mean(x**2))).astype(np.float32)


def make_set(rng, count):
    clean = np.stack([synth_voice(rng) for _ in range(count)])
    noise = rng.standard_normal(clean.shape).astype(np.float32)
    snr = rng.uniform(-2.0, 10.0, size=(count, 1)).astype(np.float32)
    noise *= (np.sqrt(np.mean(clean**2, axis=1, keepdims=True))
              / np.sqrt(np.mean(noise**2, axis=1, keepdims=True))
              * 10 ** (-snr / 20))
    return clean, (clean + noise).astype(np.float32)


def main():
    from se_tpu.eval.enhance import enhance_waveform
    from se_tpu.eval.metrics import estoi, si_sdr
    from se_tpu.models import get_model
    from se_tpu.ops.stft import num_frames
    from se_tpu.train.trainer import TrainConfig, make_train_step

    name = sys.argv[1] if len(sys.argv) > 1 else "dpcrn"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 8e-4

    rng = np.random.default_rng(0)
    clean_tr, mix_tr = make_set(rng, N_TRAIN)
    clean_te, mix_te = make_set(np.random.default_rng(1), N_TEST)

    loss_name = _os.environ.get("SE_TPU_DEMO_LOSS", "default")
    if name == "dccrn_snr":
        # the SNR-trained DCCRN variant (ref DCCRN_SNR/Backup.py:140-147)
        name = "dccrn"
        cfg = TrainConfig(model="dccrn", loss="fusion_snr",
                          learning_rate=lr,
                          model_kwargs={"snr_variant": True})
    else:
        cfg = TrainConfig(model=name, learning_rate=lr, loss=loss_name)
    model, init_fn, step_fn, eval_fn = make_train_step(cfg)
    frames = num_frames(N, get_model(name).stft)

    def to_batch(mix, clean):
        return {
            "mix": jnp.asarray(mix),
            "clean": jnp.asarray(clean),
            "frames": jnp.full((mix.shape[0],), frames, jnp.int32),
        }

    state = init_fn(jax.random.PRNGKey(0),
                    to_batch(mix_tr[:batch], clean_tr[:batch]))

    order = np.arange(N_TRAIN)
    t0 = time.time()
    first_loss = last_loss = None
    for ep in range(epochs):
        rng.shuffle(order)
        losses = []
        for i in range(0, N_TRAIN - batch + 1, batch):
            idx = order[i : i + batch]
            state, loss = step_fn(state, to_batch(mix_tr[idx],
                                                  clean_tr[idx]))
            losses.append(float(loss))
        mean_loss = float(np.mean(losses))
        if first_loss is None:
            first_loss = mean_loss
        last_loss = mean_loss
        if ep % 5 == 0 or ep == epochs - 1:
            print(f"epoch {ep:3d}  loss {mean_loss:.4f}  "
                  f"({time.time() - t0:.1f}s)", flush=True)

    # held-out evaluation
    variables = {"params": state["params"], **state.get("extra_vars", {})}
    si_noisy, si_enh, es_noisy, es_enh = [], [], [], []
    for i in range(N_TEST):
        est = enhance_waveform(name, variables, mix_te[i], model=model)
        si_noisy.append(si_sdr(mix_te[i], clean_te[i]))
        si_enh.append(si_sdr(est, clean_te[i]))
        es_noisy.append(estoi(mix_te[i], clean_te[i], FS))
        es_enh.append(estoi(est, clean_te[i], FS))

    print(f"\n=== {name} | {epochs} epochs, batch {batch}, lr {lr}, "
          f"ntrain {N_TRAIN}, loss {loss_name} ===")
    print(f"loss: {first_loss:.4f} -> {last_loss:.4f}")
    print(f"SI-SDR: noisy {np.mean(si_noisy):.2f} dB -> "
          f"enhanced {np.mean(si_enh):.2f} dB")
    print(f"eSTOI:  noisy {np.mean(es_noisy):.3f} -> "
          f"enhanced {np.mean(es_enh):.3f}")


if __name__ == "__main__":
    main()
