"""Command-line drivers: enhance / score / train.

`enhance` replicates both reference decode layouts (ref SURVEY.md §2.2
"Decode drivers"):
- VB: flat directory of noisy wavs, resampled to 16 kHz
  (ref LSTM/lstm_decode_vb.py:25-65);
- WSJ: mix/{noise_type}/{seen,unseen}/{snr}/ tree driven by noise-type x
  seen x SNR combinations (ref LSTM/lstm_decode.py:26-36,69-381 — the 24
  sequential argparse blocks become --noise-types/--snrs/--seen flags).

`score` computes SI-SDR/SNR/segSNR/STOI/eSTOI per utterance and writes
per-cell CSVs plus a running average like DeepXi's test() driver
(ref DeepXi/deepxi/model.py:427-460).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

import jax


def _load_variables(args, entry):
    model = entry.make()
    if args.checkpoint:
        from se_tpu.train.checkpoint import restore_checkpoint
        from se_tpu.train.trainer import TrainConfig, make_train_step

        cfg = TrainConfig(model=args.model)
        _, init_fn, _, _ = make_train_step(cfg)
        n = 16000
        batch = {
            "mix": np.zeros((1, n), np.float32),
            "clean": np.zeros((1, n), np.float32),
            "frames": np.full((1,), n // entry.stft.hop + 1, np.int32),
        }
        import jax.numpy as jnp

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state = init_fn(jax.random.PRNGKey(0), jb)
        state, found = restore_checkpoint(args.checkpoint, state,
                                          best=args.best)
        if not found:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        return model, {"params": state["params"], **state["extra_vars"]}
    # random weights (smoke/debug)
    print("[warn] no --checkpoint given; using random init", file=sys.stderr)
    return model, None


def cmd_enhance(args):
    from se_tpu.data import read_wav, resample, write_wav
    from se_tpu.eval.enhance import enhance_waveform
    from se_tpu.models import get_model
    from se_tpu.ops.stft import stft
    import jax.numpy as jnp

    entry = get_model(args.model)
    model, variables = _load_variables(args, entry)

    def subdirs():
        if args.dataset == "vb":
            yield "", args.mix_dir
        else:  # wsj tree
            for noise in args.noise_types:
                for snr in args.snrs:
                    seen = "seen" if args.seen else "unseen"
                    rel = os.path.join(noise, seen, str(snr))
                    yield rel, os.path.join(args.mix_dir, rel)

    count = 0
    for rel, mix_dir in subdirs():
        out_dir = os.path.join(args.out_dir, rel)
        os.makedirs(out_dir, exist_ok=True)
        for fid in sorted(os.listdir(mix_dir)):
            if not fid.endswith(".wav"):
                continue
            wav, sr = read_wav(os.path.join(mix_dir, fid))
            if wav.ndim > 1:
                wav = wav[:, 0]
            wav = resample(wav, sr, args.fs)
            if variables is None:
                re, im = stft(jnp.asarray(wav[None]), entry.stft)
                mag = jnp.sqrt(re**2 + im**2)
                feats = mag if entry.io_kind in ("mag_mask", "cirm") else (
                    jnp.stack([re, im], axis=-1))
                if entry.io_kind == "waveform":
                    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0),
                                                jnp.asarray(wav[None]),
                                                jnp.asarray(wav[None]))
                else:
                    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
                # jit-output → jit-input boundary (se_tpu/utils/layouts.py)
                from se_tpu.utils.layouts import canonicalize_layouts

                vars_ = canonicalize_layouts(vars_)
                variables = vars_
            else:
                vars_ = variables
            est = enhance_waveform(args.model, vars_, wav,
                                   compressed=not args.uncompressed,
                                   model=model)
            write_wav(os.path.join(out_dir, fid), est, args.fs)
            count += 1
            print(f" The {count} utterance has been decoded!")


def cmd_stream(args):
    """Streaming decode of a flat wav directory: `--mode exact` uses the
    state-carrying LstmStreamer (lstm model, frame+chunk latency),
    `--mode windowed` uses the zoo-wide chunked path (bounded memory,
    one compiled shape per window geometry)."""
    from se_tpu.data import read_wav, resample, write_wav
    from se_tpu.eval.streaming import LstmStreamer, enhance_windowed
    from se_tpu.models import get_model

    entry = get_model(args.model)
    model, variables = _load_variables(args, entry)
    os.makedirs(args.out_dir, exist_ok=True)
    count = 0
    for fid in sorted(os.listdir(args.mix_dir)):
        if not fid.endswith(".wav"):
            continue
        wav, sr = read_wav(os.path.join(args.mix_dir, fid))
        if wav.ndim > 1:
            wav = wav[:, 0]
        wav = resample(wav, sr, args.fs)
        if variables is None:
            import jax.numpy as jnp
            from se_tpu.ops.stft import stft

            re, im = stft(jnp.asarray(wav[None]), entry.stft)
            mag = jnp.sqrt(re**2 + im**2)
            feats = mag if entry.io_kind in ("mag_mask", "cirm") else (
                jnp.stack([re, im], axis=-1))
            if entry.io_kind == "waveform":
                variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                                jnp.asarray(wav[None]),
                                                jnp.asarray(wav[None]))
            else:
                variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
            # jit-output → jit-input boundary (se_tpu/utils/layouts.py)
            from se_tpu.utils.layouts import canonicalize_layouts

            variables = canonicalize_layouts(variables)
        if args.mode == "exact":
            if args.model != "lstm":
                raise SystemExit("--mode exact currently supports --model lstm")
            st = LstmStreamer(variables, model=model,
                              compressed=not args.uncompressed,
                              chunk_frames=args.chunk_frames)
            step = max(entry.stft.hop, int(args.push_seconds * args.fs))
            parts = [st.push(wav[i:i + step])
                     for i in range(0, len(wav), step)]
            parts.append(st.flush())
            est = np.concatenate(parts)
        else:
            est = enhance_windowed(
                args.model, variables, wav,
                chunk_seconds=args.chunk_seconds,
                context_seconds=args.context_seconds,
                compressed=not args.uncompressed, model=model)
        write_wav(os.path.join(args.out_dir, fid), est, args.fs)
        count += 1
        print(f" The {count} utterance has been streamed!")


def cmd_score(args):
    from se_tpu.data import read_wav, resample
    from se_tpu.eval import metrics

    rows = []
    for fid in sorted(os.listdir(args.est_dir)):
        if not fid.endswith(".wav"):
            continue
        est, sr_e = read_wav(os.path.join(args.est_dir, fid))
        ref_name = fid if args.dataset == "vb" else fid.split("_")[0] + ".wav"
        ref, sr_r = read_wav(os.path.join(args.ref_dir, ref_name))
        if est.ndim > 1:
            est = est[:, 0]
        if ref.ndim > 1:
            ref = ref[:, 0]
        est = resample(est, sr_e, args.fs)
        ref = resample(ref, sr_r, args.fs)
        n = min(len(est), len(ref))
        est, ref = est[:n].astype(np.float64), ref[:n].astype(np.float64)
        from se_tpu.eval.pesq import pesq as _pesq

        row = {
            "utt": fid,
            "pesq_mos_lqo": _pesq(ref, est, args.fs) if args.fs in (8000, 16000)
            else float("nan"),
            "si_sdr": metrics.si_sdr(est, ref),
            "snr": metrics.snr(est, ref),
            "seg_snr": metrics.seg_snr(est, ref),
            "stoi": metrics.stoi(est, ref, args.fs),
            "estoi": metrics.estoi(est, ref, args.fs),
        }
        if getattr(args, "hasqi", False):
            from se_tpu.eval.hasqi import hasqi_v2, haspi_v1

            row["hasqi"] = hasqi_v2(ref, est, args.fs)
            row["haspi"] = haspi_v1(ref, est, args.fs)
        rows.append(row)
    if not rows:
        raise SystemExit("no wav files scored")
    os.makedirs(os.path.dirname(os.path.abspath(args.csv)), exist_ok=True)
    keys = list(rows[0].keys())
    with open(args.csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    # running average CSV, like DeepXi's average.csv (model.py:446-460)
    avg_path = os.path.join(os.path.dirname(os.path.abspath(args.csv)),
                            "average.csv")
    avg = {k: float(np.mean([r[k] for r in rows])) for k in keys[1:]}
    exists = os.path.isfile(avg_path)
    with open(avg_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["tag"] + keys[1:])
        if not exists:
            w.writeheader()
        w.writerow({"tag": args.tag or args.est_dir, **avg})
    for k, v in avg.items():
        print(f"{k}: {v:.4f}")


def cmd_train(args):
    from se_tpu.data import ManifestDataset
    from se_tpu.parallel import make_mesh
    from se_tpu.train.trainer import TrainConfig, train_epochs
    from se_tpu.utils.config import get_preset

    preset = get_preset(args.preset) if args.preset else None
    model_name = preset.model if preset else args.model
    cfg = TrainConfig(
        model=model_name,
        learning_rate=args.lr if args.lr else (preset.lr if preset else 1e-3),
        compressed=not args.uncompressed,
        remat=getattr(args, "remat", "none"),
        compute_dtype=getattr(args, "compute_dtype", "fp32"),
        model_kwargs=preset.resolved_model_kwargs() if preset else {},
    )
    entry_stft = __import__("se_tpu.models", fromlist=["get_model"]).get_model(
        model_name).stft
    ds = ManifestDataset(
        args.mix_dir, args.clean_dir, args.manifest,
        batch_size=args.batch_size, convention=args.dataset,
        win_size=entry_stft.win_length, win_shift=entry_stft.hop,
    )
    mesh = make_mesh() if args.data_parallel else None
    model, state, history = train_epochs(
        cfg, ds, epochs=args.epochs, mesh=mesh,
        checkpoint_dir=args.checkpoint_dir)
    if history:
        print(f"final loss: {history[-1][1]:.5f}")


def main(argv=None):
    p = argparse.ArgumentParser("se_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("enhance")
    pe.add_argument("--model", required=True)
    pe.add_argument("--mix-dir", dest="mix_dir", required=True)
    pe.add_argument("--out-dir", dest="out_dir", required=True)
    pe.add_argument("--checkpoint", default="")
    pe.add_argument("--best", action="store_true")
    pe.add_argument("--dataset", choices=["vb", "wsj"], default="vb")
    pe.add_argument("--noise-types", nargs="*", default=["babble"])
    pe.add_argument("--snrs", nargs="*", type=int, default=[-5, 0, 5, 10])
    pe.add_argument("--seen", action="store_true")
    pe.add_argument("--uncompressed", action="store_true")
    pe.add_argument("--fs", type=int, default=16000)
    pe.set_defaults(func=cmd_enhance)

    pst = sub.add_parser("stream")
    pst.add_argument("--model", default="lstm")
    pst.add_argument("--mode", choices=["exact", "windowed"],
                     default="windowed")
    pst.add_argument("--mix-dir", dest="mix_dir", required=True)
    pst.add_argument("--out-dir", dest="out_dir", default="./streamed")
    pst.add_argument("--checkpoint", default="")
    pst.add_argument("--best", action="store_true")
    pst.add_argument("--uncompressed", action="store_true")
    pst.add_argument("--fs", type=int, default=16000)
    pst.add_argument("--chunk-seconds", type=float, default=4.0)
    pst.add_argument("--context-seconds", type=float, default=2.0)
    pst.add_argument("--chunk-frames", type=int, default=16)
    pst.add_argument("--push-seconds", type=float, default=0.1)
    pst.set_defaults(func=cmd_stream)

    ps = sub.add_parser("score")
    ps.add_argument("--est-dir", dest="est_dir", required=True)
    ps.add_argument("--ref-dir", dest="ref_dir", required=True)
    ps.add_argument("--csv", default="./results/results.csv")
    ps.add_argument("--dataset", choices=["vb", "wsj"], default="vb")
    ps.add_argument("--tag", default="")
    ps.add_argument("--fs", type=int, default=16000)
    ps.add_argument("--hasqi", action="store_true",
                    help="also compute HASQI v2 / HASPI v1 (slower)")
    ps.set_defaults(func=cmd_score)

    pt = sub.add_parser("train")
    pt.add_argument("--model", default="lstm")
    pt.add_argument("--preset", default="")
    pt.add_argument("--mix-dir", dest="mix_dir", required=True)
    pt.add_argument("--clean-dir", dest="clean_dir", required=True)
    pt.add_argument("--manifest", required=True)
    pt.add_argument("--dataset", choices=["vb", "wsj"], default="vb")
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--epochs", type=int, default=1)
    pt.add_argument("--lr", type=float, default=0.0)
    pt.add_argument("--uncompressed", action="store_true")
    pt.add_argument("--checkpoint-dir", default="./CP_dir")
    pt.add_argument("--data-parallel", action="store_true")
    pt.add_argument("--remat", choices=["none", "dots", "full"],
                    default="none",
                    help="activation rematerialization policy")
    pt.add_argument("--compute-dtype", dest="compute_dtype",
                    choices=["fp32", "bf16"], default="fp32",
                    help="bf16 trains with fp32 master weights")
    pt.set_defaults(func=cmd_train)

    args = p.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
