"""DeepXi train/infer/test driver (ref: DeepXi/deepxi/model.py:34-711).

The reference is the zoo's only complete training loop: generator-backed
batches of (clean, noisy) pairs -> MagXi examples -> BCE with temporal
sample weights; inference predicts mapped xi and synthesizes with a
statistical gain; test scores per-utterance metrics into CSVs.

This driver reuses the framework pieces: DeepXi network (models/deepxi.py),
inp_tgt family (models/deepxi_inp_tgt.py), gains (eval/gains.py), metrics
(eval/metrics.py), wav I/O (data/wav.py).
"""

from __future__ import annotations

import csv
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se_tpu.data.wav import read_wav, resample, write_wav
from se_tpu.eval import metrics
from se_tpu.models.deepxi import DeepXi, XiMap, compute_xi_stats
from se_tpu.models.deepxi_inp_tgt import MagXi, n_frames


def snr_db(s: np.ndarray, d: np.ndarray) -> float:
    """SNR (dB) between speech and noise (ref deepxi/sig.py:358-374)."""
    p_s = float(np.mean(np.square(s)))
    p_d = float(np.mean(np.square(d)))
    return 10.0 * np.log10(p_s / max(p_d, 1e-12))


class Prelim:
    """Toy trainer sanity-checking network + temporal masking
    (ref DeepXi/deepxi/prelim.py:18-98): fit a constant 5-value frame target
    from uniform-random inputs with BCE and per-frame sequence masks. The
    reference prints target vs prediction; here `train()` returns both so
    tests can assert convergence."""

    def __init__(self, n_feat: int, network: str = "ResNet", **net_kwargs):
        from se_tpu.models.deepxi import ResLSTM, ResNet

        if n_feat < 5:
            raise ValueError("More input features are required for this example.")
        self.n_feat = n_feat
        if network == "ResNet":
            kw = dict(n_blocks=40, d_model=256, d_f=64, k=3, max_d_rate=16)
            kw.update(net_kwargs)
            self.net = ResNet(n_outp=n_feat, **kw)
        elif network == "ResLSTM":
            kw = dict(n_blocks=3, d_model=256)
            kw.update(net_kwargs)
            self.net = ResLSTM(n_outp=n_feat, **kw)
        else:
            raise ValueError("Invalid network type.")

    def _target_frame(self) -> np.ndarray:
        y = np.zeros(self.n_feat, np.float32)
        y[:5] = [0.05, 0.99, 0.5, 0.01, 0.75]
        return y

    def train(self, mbatch_size: int = 8, max_epochs: int = 20,
              batch_size: int = 100, max_seq_len: int = 75,
              min_seq_len: int = 45, lr: float = 1e-3, seed: int = 0):
        import math

        import optax

        tx = optax.chain(optax.clip(1.0), optax.adam(lr))
        rng = np.random.default_rng(seed)
        y_frame = self._target_frame()

        @jax.jit
        def step(params, opt_state, x, y, mask):
            def loss_fn(p):
                pred = jnp.clip(self.net.apply({"params": p}, x), 1e-7,
                                1 - 1e-7)
                bce = -(y * jnp.log(pred) + (1 - y) * jnp.log(1 - pred))
                m = mask[..., None]
                return jnp.sum(bce * m) / jnp.maximum(
                    jnp.sum(m) * x.shape[-1], 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = opt_state = None
        x = None
        for _ in range(max_epochs):
            for _ in range(math.ceil(batch_size / mbatch_size)):
                x = rng.random((mbatch_size, max_seq_len, self.n_feat),
                               dtype=np.float32)
                seq_len = rng.integers(min_seq_len, max_seq_len + 1,
                                       mbatch_size)
                mask = (np.arange(max_seq_len)[None] <
                        seq_len[:, None]).astype(np.float32)
                x *= mask[..., None]
                y = np.tile(y_frame, (mbatch_size, max_seq_len, 1)) \
                    * mask[..., None]
                if params is None:
                    from se_tpu.utils.layouts import canonicalize_layouts

                    params = canonicalize_layouts(self.net.init(
                        jax.random.PRNGKey(seed), jnp.asarray(x))["params"])
                    opt_state = tx.init(params)
                params, opt_state, _ = step(params, opt_state,
                                            jnp.asarray(x), jnp.asarray(y),
                                            jnp.asarray(mask))
        pred = self.net.apply({"params": params}, jnp.asarray(x[:1]))
        return y_frame, np.asarray(pred[0, 0])


import dataclasses


@dataclasses.dataclass
class DeepXiArgs:
    """Typed flag surface mirroring the reference's argparse-over-config
    scheme (ref DeepXi/deepxi/args_resnet.py:31-135 / config_resnet.py).

    Only device/path plumbing specific to the TF stack is dropped (--gpu,
    saved_data_path); everything that shapes the model, features, map, or
    run mode is here. `DeepXiDriver.from_args` consumes it.
    """

    # general (args_resnet.py:35-46)
    ver: str = "resnet-1.1c"
    test_epoch: int = 180
    train: bool = False
    infer: bool = False
    test: bool = False
    network_type: str = "ResNetV2"
    inp_tgt_type: str = "MagXi"
    # train (args_resnet.py:48-56)
    mbatch_size: int = 8
    sample_size: int = 1000
    max_epochs: int = 180
    resume_epoch: int = 0
    # inference (args_resnet.py:63-69)
    out_type: str = "y"
    gain: str = "mmse-lsa"
    # paths (args_resnet.py:80-89)
    model_path: str = "./model"
    set_path: str = "./set"
    log_path: str = "./log"
    data_path: str = "./data"
    out_path: str = "./out"
    # features (args_resnet.py:92-98)
    f_s: int = 16000
    T_d: int = 32
    T_s: int = 16
    # network parameters (args_resnet.py:101-122)
    d_model: int = 256
    n_blocks: int = 40
    d_f: int = 64
    k: int = 3
    max_d_rate: int = 16
    causal: bool = True
    unit_type: str = "ReLU->LN->W+b"
    loss_fnc: str = "BinaryCrossentropy"
    outp_act: str = "Sigmoid"
    # map (args_resnet.py:125-127)
    map_type: str = "DBNormalCDF"

    def network_kwargs(self) -> tuple:
        if self.network_type.startswith("ResNet"):
            return (("d_model", self.d_model), ("n_blocks", self.n_blocks),
                    ("d_f", self.d_f), ("k", self.k),
                    ("max_d_rate", self.max_d_rate),
                    ("outp_act", self.outp_act)) + (
                (("unit_type", self.unit_type),)
                if self.network_type != "ResNet" else ())
        if self.network_type.startswith("MHANet"):
            return (("d_model", self.d_model), ("n_blocks", self.n_blocks),
                    ("causal", self.causal), ("outp_act", self.outp_act))
        return (("d_model", self.d_model), ("n_blocks", self.n_blocks),
                ("outp_act", self.outp_act))


class DeepXiDriver:
    """Minimal-state driver; `ver` names the stats artifact like the
    reference's data/<ver>_inp_tgt.p (ref model.py:84-96)."""

    def __init__(self, network: str = "ResNetV2", map_type: str = "DBNormalCDF",
                 gain: str = "mmse-lsa", data_path: str = "./data",
                 ver: str = "resnet-1.1c", network_kwargs: tuple = (),
                 inp_tgt_type: str = "MagXi"):
        self.model = DeepXi(network=network, network_kwargs=network_kwargs)
        self.gain = gain
        self.data_path = data_path
        self.ver = ver
        self.xi_map = XiMap(map_type)
        if inp_tgt_type == "MagXi":
            self.inp_tgt = MagXi(self.xi_map)
        else:
            from se_tpu.models.deepxi_inp_tgt import inp_tgt_selector

            self.inp_tgt = inp_tgt_selector(inp_tgt_type, xi=self.xi_map)
        self.variables = None

    @classmethod
    def from_args(cls, args: "DeepXiArgs") -> "DeepXiDriver":
        return cls(network=args.network_type, map_type=args.map_type,
                   gain=args.gain, data_path=args.data_path, ver=args.ver,
                   network_kwargs=args.network_kwargs(),
                   inp_tgt_type=args.inp_tgt_type)

    # ----------------------------------------------------------- statistics
    def stats_path(self) -> str:
        return os.path.join(self.data_path, f"{self.ver}_inp_tgt.p")

    def sample_stats(self, clean_wavs, noise_wavs, save: bool = True):
        """Fit per-bin xi statistics from a training sample
        (ref model.py:462-520 sample())."""
        compute_xi_stats(clean_wavs, noise_wavs, self.xi_map)
        if save:
            os.makedirs(self.data_path, exist_ok=True)
            with open(self.stats_path(), "wb") as f:
                pickle.dump({"mu": self.xi_map.mu, "sigma": self.xi_map.sigma}, f)

    def load_stats(self) -> bool:
        if not os.path.isfile(self.stats_path()):
            return False
        with open(self.stats_path(), "rb") as f:
            d = pickle.load(f)
        self.xi_map.mu, self.xi_map.sigma = d["mu"], d["sigma"]
        return True

    # ------------------------------------------------------------- training
    def train(self, pairs, epochs: int = 1, lr: float = 1e-3,
              clip_value: float = 1.0, log_every: int = 10):
        """`pairs` yields (clean, noisy) float waveform batches (B, N) with
        equal padded length; loss is BCE with temporal sample weights
        masking padded frames (ref model.py:203-230)."""
        tx = optax.chain(optax.clip(clip_value), optax.adam(lr))
        opt_state = None
        history = []

        @jax.jit
        def step(variables, opt_state, s, x, frames):
            def loss_fn(params):
                obs, target = self.inp_tgt.example(s, x)
                pred = self.model.apply({"params": params}, obs)
                eps = 1e-7
                p = jnp.clip(pred, eps, 1 - eps)
                bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
                t = obs.shape[1]
                mask = (jnp.arange(t)[None, :] < frames[:, None]).astype(
                    jnp.float32)[..., None]
                return jnp.sum(bce * mask) / jnp.maximum(
                    jnp.sum(mask) * obs.shape[-1], 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params}, opt_state, loss

        i = 0
        for _ in range(epochs):
            for clean, noisy in pairs:
                s = jnp.asarray(clean)
                x = jnp.asarray(noisy)
                frames = jnp.asarray(
                    [n_frames(len(c)) for c in clean], jnp.int32)
                if self.variables is None:
                    obs, _ = self.inp_tgt.example(s[:1], x[:1])
                    self.variables = jax.jit(self.model.init)(
                        jax.random.PRNGKey(0), obs)
                    # jit-output → jit-input boundary
                    # (se_tpu/utils/layouts.py)
                    from se_tpu.utils.layouts import canonicalize_layouts

                    self.variables = canonicalize_layouts(self.variables)
                    opt_state = tx.init(self.variables["params"])
                self.variables, opt_state, loss = step(
                    self.variables, opt_state, s, x, frames)
                if i % log_every == 0:
                    history.append((i, float(loss)))
                i += 1
        return history

    # ------------------------------------------------- training self-checks
    def eval_example(self, clean, noisy, frames, out_dir: str = ".") -> list:
        """Dump one minibatch of examples and verify mixing SNRs
        (ref model.py:182-201 `eval_example`): saves the observation/target/
        mask arrays to .mat files and returns the actual per-utterance SNR
        (dB) of the pairs, computed with `snr_db` on d = x - s (the live
        add_noise path, ref sig.py:245-301, reduces to this subtraction for
        pre-mixed pairs)."""
        from scipy.io import savemat

        s = jnp.asarray(clean)
        x = jnp.asarray(noisy)
        obs, target = self.inp_tgt.example(s, x)
        t = obs.shape[1]
        mask = (np.arange(t)[None, :] < np.asarray(frames)[:, None]).astype(
            np.float32)
        os.makedirs(out_dir, exist_ok=True)
        savemat(os.path.join(out_dir, "inp_batch.mat"),
                {"inp_batch": np.asarray(obs)})
        savemat(os.path.join(out_dir, "tgt_batch.mat"),
                {"tgt_batch": np.asarray(target)})
        savemat(os.path.join(out_dir, "seq_mask_batch.mat"),
                {"seq_mask_batch": mask})
        d = np.asarray(x) - np.asarray(s)
        return [float(snr_db(np.asarray(s[i]), d[i])) for i in range(len(s))]

    # ------------------------------------------------------------ inference
    def infer_dir(self, mix_dir: str, out_dir: str, fs: int = 16000):
        """Enhance every wav in mix_dir (ref model.py:232-340 infer())."""
        from se_tpu.models.deepxi import enhance

        os.makedirs(out_dir, exist_ok=True)
        for fid in sorted(os.listdir(mix_dir)):
            if not fid.endswith(".wav"):
                continue
            wav, sr = read_wav(os.path.join(mix_dir, fid))
            if wav.ndim > 1:
                wav = wav[:, 0]
            wav = resample(wav, sr, fs)
            y = enhance(self.variables, self.model, jnp.asarray(wav[None]),
                        self.xi_map, gain=self.gain, length=len(wav))
            write_wav(os.path.join(out_dir, fid), np.asarray(y)[0], fs)

    # ----------------------------------------------------------------- test
    def test_dir(self, est_dir: str, ref_dir: str, csv_dir: str,
                 fs: int = 16000) -> dict:
        """Score estimates and write per-utterance + average CSVs
        (ref model.py:342-460 test())."""
        rows = []
        for fid in sorted(os.listdir(est_dir)):
            if not fid.endswith(".wav"):
                continue
            est, sr_e = read_wav(os.path.join(est_dir, fid))
            ref, sr_r = read_wav(os.path.join(ref_dir, fid))
            est = resample(est, sr_e, fs).astype(np.float64)
            ref = resample(ref, sr_r, fs).astype(np.float64)
            n = min(len(est), len(ref))
            rows.append({
                "utt": fid,
                "stoi": metrics.stoi(est[:n], ref[:n], fs),
                "estoi": metrics.estoi(est[:n], ref[:n], fs),
                "si_sdr": metrics.si_sdr(est[:n], ref[:n]),
                "seg_snr": metrics.seg_snr(est[:n], ref[:n]),
            })
        os.makedirs(csv_dir, exist_ok=True)
        with open(os.path.join(csv_dir, f"{self.ver}.csv"), "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        avg = {k: float(np.mean([r[k] for r in rows]))
               for k in rows[0] if k != "utt"}
        with open(os.path.join(csv_dir, "average.csv"), "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["ver"] + list(avg.keys()))
            if f.tell() == 0:
                w.writeheader()
            w.writerow({"ver": self.ver, **avg})
        return avg
