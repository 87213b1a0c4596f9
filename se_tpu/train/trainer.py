"""Training loop: feature prep per io-kind, jitted train/eval steps, Adam.

Reference semantics being preserved (SURVEY.md §2.2, §5):
- Adam(1e-3) default (ref LSTM/config.py:13);
- frame-mask-aware losses from se_tpu.train.losses;
- per-model default losses follow each family's training recipe
  (mag MSE for magnitude mappers, complex+mag MSE for complex mappers,
  SI-SDR on waveforms for DCCRN_SNR, stagewise supervision for G2Net,
  the SI-SNR + spectral set for Uformer);
- halving-style `learning_rate_decaying` on validation plateau
  (ref Uformer/misc.py:76-86) via an lr scale carried in the train state.

Multi-chip: pass a Mesh — the step is jitted with the batch sharded over
('data',) and the state replicated; activation constraints inside models
(e.g. Uformer attention) pick up the 'model' axis via
se_tpu.parallel.activation_mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from se_tpu.models.registry import ModelEntry, get_model
from se_tpu.ops.stft import stft
from se_tpu.parallel.mesh import activation_mesh, replicate, shard_batch
from se_tpu.train import losses as L


@dataclasses.dataclass
class TrainConfig:
    model: str
    loss: str = "default"
    learning_rate: float = 1e-3
    compressed: bool = True
    grad_clip: float | None = 5.0
    # Rematerialization for long-utterance training (HBM <-> FLOPs trade):
    # "none" stores all forward activations; "dots" saves only matmul/conv
    # outputs (elementwise chains recompute in backward — cheap on TPU,
    # where they are HBM-bandwidth-bound anyway); "full" recomputes the
    # whole forward.
    remat: str = "none"
    # "bf16" runs the forward/backward in bfloat16 with fp32 master weights
    # (params, Adam state, and the loss reduction stay fp32; the cast
    # happens inside the grad so updates flow to the fp32 masters). bf16
    # has an fp32-sized exponent, so no loss scaling is needed.
    compute_dtype: str = "fp32"
    model_kwargs: dict = dataclasses.field(default_factory=dict)


DEFAULT_LOSSES = {
    "lstm": "mag_mse",
    "crn": "mag_mse",
    "gcrn": "com_mag_mse",
    "dpcrn": "com_mag_mse",
    "fullsubnet": "com_mag_mse",
    "dccrn": "com_mag_mse",
    "ctsnet": "com_mag_mse",
    "g2net": "stagewise_com_mag_mse",
    "taylorsenet": "com_mag_mse",
    "uformer": "uformer",
    "deepxi": "bce",
}


def _prep(entry: ModelEntry, mix, clean, compressed: bool):
    """Waveforms -> (features, labels, aux) per io-kind."""
    cfg = entry.stft
    re, im = stft(mix, cfg)
    lre, lim = stft(clean, cfg)
    mag = jnp.sqrt(re**2 + im**2)
    lmag = jnp.sqrt(lre**2 + lim**2)
    phase = jnp.arctan2(im, re)
    lphase = jnp.arctan2(lim, lre)
    if compressed:
        mag, lmag = jnp.sqrt(mag), jnp.sqrt(lmag)
    spec = jnp.stack([mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
    lspec = jnp.stack([lmag * jnp.cos(lphase), lmag * jnp.sin(lphase)], axis=-1)
    return mag, lmag, spec, lspec


def make_train_step(cfg: TrainConfig, mesh=None):
    """Returns (model, init_fn(rng, batch) -> state, step_fn(state, batch))."""
    entry = get_model(cfg.model)
    model = entry.make(**cfg.model_kwargs)
    loss_name = cfg.loss if cfg.loss != "default" else DEFAULT_LOSSES[cfg.model]

    tx_parts = []
    if cfg.grad_clip:
        tx_parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    tx_parts.append(optax.scale_by_adam())
    tx = optax.chain(*tx_parts)

    bf16 = cfg.compute_dtype == "bf16"
    if cfg.compute_dtype not in ("fp32", "bf16"):
        raise ValueError(f"unknown compute_dtype {cfg.compute_dtype!r}")

    def _cast(tree, dtype):
        return jax.tree.map(
            lambda p: p.astype(dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    def forward_loss(params, extra_vars, rngs, batch, train: bool):
        mix = batch["mix"]
        clean = batch["clean"]
        frames = batch["frames"]
        if bf16:
            # fp32 master weights cast inside the grad: updates accumulate
            # into fp32, compute runs on the MXU in bf16; DSP/losses stay
            # fp32 at the edges (same contract as the bf16 enhance path)
            params = _cast(params, jnp.bfloat16)
            extra_vars = _cast(extra_vars, jnp.bfloat16)
        variables = {"params": params, **extra_vars}
        mutable = [k for k in extra_vars if k == "batch_stats"] if train else []

        def apply(*args, **kw):
            # flax returns (out, vars) whenever `mutable` is passed — even an
            # empty list — so only pass it when there is something to mutate
            if bf16:
                args = _cast(args, jnp.bfloat16)
            if mutable:
                out, new_vars = model.apply(variables, *args, train=train,
                                            rngs=rngs, mutable=mutable, **kw)
            else:
                out, new_vars = model.apply(variables, *args, train=train,
                                            rngs=rngs, **kw), {}
            if bf16:  # losses and running stats stay fp32
                out = _cast(out, jnp.float32)
                new_vars = _cast(dict(new_vars), jnp.float32)
            return out, new_vars

        if entry.io_kind == "waveform":
            (est, src, est_cplx, src_cplx), new_vars = apply(mix, clean)
            loss = (
                L.uformer_sisnr_loss(est, src)
                + L.uformer_cplx_mse_loss(
                    jnp.stack(est_cplx, -1), jnp.stack(src_cplx, -1))
                + L.uformer_mag_mse_loss(
                    jnp.stack(est_cplx, -1), jnp.stack(src_cplx, -1))
            )
            return loss, new_vars

        mag, lmag, spec, lspec = _prep(entry, mix, clean, cfg.compressed)

        if entry.io_kind in ("mag_mask",):
            est, new_vars = apply(mag)
            loss = L.mag_mse_loss(est, lmag, frames)
            return loss, new_vars

        if entry.io_kind == "cirm":
            mask, new_vars = apply(mag)
            if train and mask.shape[2] != spec.shape[2]:
                # FullSubNet's training-only drop_band shrank F and regrouped
                # the batch; apply the identical transform to features/labels
                # (ref fullsubnet_net_sa/model.py:101-104)
                from se_tpu.models.fullsubnet import drop_band

                groups = getattr(model, "num_groups_in_drop_band", 2)
                spec = drop_band(spec, groups)
                lspec = drop_band(lspec, groups)
                frames = jnp.concatenate(
                    [frames[g::groups] for g in range(groups)], axis=0)
            m_re, m_im = mask[..., 0], mask[..., 1]
            est = jnp.stack(
                [m_re * spec[..., 0] - m_im * spec[..., 1],
                 m_re * spec[..., 1] + m_im * spec[..., 0]], axis=-1)
            loss = L.com_mag_mse_loss(est, lspec, frames)
            return loss, new_vars

        # complex_map / complex_mask
        est, new_vars = apply(spec)
        if loss_name == "stagewise_com_mag_mse":
            loss = L.stagewise_com_mag_mse_loss(list(est), lspec, frames)
        elif loss_name == "fusion_snr":
            # DCCRN_SNR recipe: 0.5*SI-SNR + 0.5*SV-SNR on reconstructed
            # waveforms (ref DCCRN_SNR/Backup.py:140-147)
            from se_tpu.ops.stft import istft as _istft

            if est.ndim == 5:
                est = est[-1]
            e_re, e_im = est[..., 0], est[..., 1]
            if cfg.compressed:  # undo the mag**0.5 regime before synthesis
                e_mag = jnp.sqrt(jnp.maximum(e_re**2 + e_im**2, 1e-12))
                e_re, e_im = e_mag * e_re, e_mag * e_im
            n = mix.shape[-1]
            est_wav = _istft(e_re, e_im, entry.stft, length=n)
            lengths = jnp.minimum(frames * entry.stft.hop, n)
            loss = L.fusion_snr_loss(est_wav, clean, lengths)
        else:
            if est.ndim == 5:
                est = est[-1]
            loss = L.com_mag_mse_loss(est, lspec, frames)
        return loss, new_vars

    def init_fn(rng, batch):
        # jit the flax init: un-jitted it dispatches each traced op eagerly,
        # which is pathological over a remote-tunneled device (~27 ms fixed
        # per dispatch; >9 min for Uformer vs ~46 s as one jitted call)
        mix = jnp.asarray(batch["mix"][:1])
        if entry.io_kind == "waveform":
            variables = jax.jit(model.init)(rng, mix, mix)
        else:
            mag, _, spec, _ = _prep(entry, mix, mix, cfg.compressed)
            feats = mag if entry.io_kind in ("mag_mask", "cirm") else spec
            variables = jax.jit(model.init)(rng, feats)
        # jit-output → jit-input boundary: cure the axon provenance
        # poison (150x op storm, see se_tpu/utils/layouts.py)
        from se_tpu.utils.layouts import canonicalize_layouts

        variables = canonicalize_layouts(variables)
        params = variables.pop("params")
        state = {
            "params": params,
            "extra_vars": dict(variables),
            "opt_state": tx.init(params),
            "step": jnp.zeros((), jnp.int32),
            "lr_scale": jnp.ones(()),
            "rng": rng,
        }
        if mesh is not None:
            state = replicate(state, mesh)
        return state

    if cfg.remat == "none":
        train_forward = forward_loss
    elif cfg.remat in ("dots", "full"):
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if cfg.remat == "dots" else None)
        train_forward = jax.checkpoint(
            lambda p, ev, rngs, b: forward_loss(p, ev, rngs, b, train=True),
            policy=policy)
    else:
        raise ValueError(f"unknown remat policy {cfg.remat!r}")

    @jax.jit
    def step_fn(state, batch):
        rng, step_rng = jax.random.split(state["rng"])

        def loss_fn(params):
            if cfg.remat == "none":
                return forward_loss(params, state["extra_vars"],
                                    {"dropout": step_rng}, batch, train=True)
            return train_forward(params, state["extra_vars"],
                                 {"dropout": step_rng}, batch)

        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        lr = -cfg.learning_rate * state["lr_scale"]
        params = jax.tree.map(
            lambda p, u: p + lr * u, state["params"], updates)
        extra = dict(state["extra_vars"])
        extra.update(new_vars)
        new_state = {
            "params": params,
            "extra_vars": extra,
            "opt_state": opt_state,
            "step": state["step"] + 1,
            "lr_scale": state["lr_scale"],
            "rng": rng,
        }
        return new_state, loss

    @jax.jit
    def eval_fn(state, batch):
        loss, _ = forward_loss(state["params"], state["extra_vars"], {},
                               batch, train=False)
        return loss

    return model, init_fn, step_fn, eval_fn


def decay_learning_rate(state, rate: float = 0.5):
    """Reference-style lr decay on validation plateau (Uformer/misc.py:76-86)."""
    state = dict(state)
    state["lr_scale"] = state["lr_scale"] * rate
    return state


def batch_to_jax(batch) -> dict:
    return {
        "mix": jnp.asarray(batch.mix),
        "clean": jnp.asarray(batch.clean),
        "frames": jnp.asarray(batch.frames),
    }


def train_epochs(cfg: TrainConfig, train_ds, cv_ds=None, epochs: int = 1,
                 mesh=None, checkpoint_dir: str | None = None,
                 log_every: int = 50):
    """Simple epoch driver with best-model tracking and lr decay."""
    from se_tpu.train.checkpoint import save_checkpoint

    model, init_fn, step_fn, eval_fn = make_train_step(cfg, mesh=mesh)
    state = None
    best_cv = np.inf
    history = []
    ctx = activation_mesh(mesh) if mesh is not None else _nullcontext()
    with ctx:
        for epoch in range(epochs):
            for batch in train_ds:
                jb = batch_to_jax(batch)
                if mesh is not None:
                    jb = shard_batch(jb, mesh)
                if state is None:
                    state = init_fn(jax.random.PRNGKey(0), jb)
                state, loss = step_fn(state, jb)
                step = int(state["step"])
                if step % log_every == 0:
                    history.append((step, float(loss)))
            if cv_ds is not None:
                cv_losses = [float(eval_fn(state, batch_to_jax(b)))
                             for b in cv_ds]
                cv = float(np.mean(cv_losses)) if cv_losses else np.inf
                if cv < best_cv:
                    best_cv = cv
                    if checkpoint_dir:
                        save_checkpoint(checkpoint_dir, state, epoch,
                                        int(state["step"]), best=True)
                else:
                    state = decay_learning_rate(state)
            if checkpoint_dir:
                save_checkpoint(checkpoint_dir, state, epoch,
                                int(state["step"]))
    if checkpoint_dir and history:
        # training-loss curve to disk (the reference's loss_dir .mat role,
        # ref LSTM/config.py:10)
        import csv as _csv
        import os as _os

        with open(_os.path.join(checkpoint_dir, "loss_curve.csv"), "w",
                  newline="") as f:
            w = _csv.writer(f)
            w.writerow(["step", "train_loss"])
            w.writerows(history)
    return model, state, history


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
