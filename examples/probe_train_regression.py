"""Localize the uformer train-step regression (round 4): times fwd+bwd of
each candidate piece missing from profile_uformer_train.py's region list —
stft/istft round trip, the head math, the loss set, and the full model
apply — at the bench shapes (B=8 x 4 s).

Run: python examples/probe_train_regression.py [piece ...]
Pieces: stft heads loss fwd full (default: stft heads loss fwd)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, N = 8, 64000
SRC_T = 401


def timeit_grad(name, fn, x, iters=8):
    vg = jax.value_and_grad(fn)

    @jax.jit
    def run_n(v):
        def body(_, carry):
            loss, g = vg(carry)
            return jax.tree.map(
                lambda a, da: a + 1e-9 * loss.astype(a.dtype)
                + 0.0 * da.astype(a.dtype), carry, g)
        return jax.lax.fori_loop(0, iters, body, v)

    warm = run_n(x)
    jax.block_until_ready(warm)
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(warm))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms/step (fwd+bwd)", flush=True)
    return dt


def main():
    which = set(sys.argv[1:]) or {"stft", "heads", "loss", "fwd"}
    from se_tpu.ops.stft import PRESET_UFORMER, istft, stft
    from se_tpu.train import losses as L

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.1

    if "stft" in which:
        def loss_stft(w):
            re, im = stft(w, PRESET_UFORMER)
            out = istft(re, im, PRESET_UFORMER, length=N)
            return jnp.sum(out**2) * 1e-6

        timeit_grad("stft+istft fwd+bwd", loss_stft, wav)

    if "heads" in which:
        fm = 257
        grids = tuple(
            jnp.asarray(rng.standard_normal((B, SRC_T, fm - 1, 1)),
                        jnp.float32) * 0.1 for _ in range(3))
        mag_full = jnp.abs(jnp.asarray(
            rng.standard_normal((B, SRC_T, fm)), jnp.float32)) + 0.1
        cos_p = jnp.asarray(rng.standard_normal((B, SRC_T, fm)), jnp.float32)
        sin_p = jnp.sqrt(jnp.maximum(1 - jnp.clip(cos_p, -1, 1) ** 2, 0.0))
        cos_p = jnp.clip(cos_p, -1, 1)
        EPS = float(np.finfo(np.float32).eps)

        def loss_heads(t3):
            dre, dim, dmg = t3
            mag = jax.nn.sigmoid(dmg[..., 0])
            mag = jnp.pad(mag, ((0, 0), (0, 0), (1, 0)))
            mag = mag * mag_full
            mask_re, mask_im = dre[..., 0], dim[..., 0]
            mask_mags = jnp.sqrt(jnp.maximum(mask_re**2 + mask_im**2, EPS))
            real_phase = mask_re / (mask_mags + EPS)
            imag_phase = mask_im / (mask_mags + EPS)
            mask_mags = jnp.tanh(mask_mags + EPS)
            bb = imag_phase + EPS
            inv = jax.lax.rsqrt(real_phase**2 + bb * bb)
            cos_m, sin_m = real_phase * inv, bb * inv
            mask_mags = jnp.pad(mask_mags, ((0, 0), (0, 0), (1, 0)))
            cos_m = jnp.pad(cos_m, ((0, 0), (0, 0), (1, 0)),
                            constant_values=1.0)
            sin_m = jnp.pad(sin_m, ((0, 0), (0, 0), (1, 0)))
            cos_est = cos_p * cos_m - sin_p * sin_m
            sin_est = sin_p * cos_m + cos_p * sin_m
            est_mags = mask_mags * mag_full
            mag_fused = (est_mags + mag) * 0.5
            out_re = mag_fused * cos_est
            out_im = mag_fused * sin_est
            out = istft(out_re, out_im, PRESET_UFORMER, length=N)
            return jnp.sum(out**2) * 1e-6

        timeit_grad("heads+istft fwd+bwd", loss_heads, grids)

    if "loss" in which:
        est = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.1
        src = jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.1
        ec = jnp.asarray(rng.standard_normal((B, SRC_T, 257, 2)),
                         jnp.float32) * 0.1
        sc = jnp.asarray(rng.standard_normal((B, SRC_T, 257, 2)),
                         jnp.float32) * 0.1

        def loss_all(t2):
            e, cplx = t2
            return (L.uformer_sisnr_loss(e, src)
                    + L.uformer_cplx_mse_loss(cplx, sc)
                    + L.uformer_mag_mse_loss(cplx, sc))

        timeit_grad("uformer loss set fwd+bwd", loss_all, (est, ec))

    if which & {"fwd", "full", "pgrad"} or any(w.startswith("pgroup") for w in which):
        from se_tpu.models.uformer import Uformer

        model = Uformer()
        key = jax.random.PRNGKey(0)
        vs = jax.jit(model.init)(key, wav[:1], wav[:1])

        if "fwd" in which:
            def loss_fwd(w):
                (est, src_rt, _, _), _nv = model.apply(
                    vs, w, w, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return jnp.sum(est**2) * 1e-6

            timeit_grad("full model fwd+bwd (no loss)", loss_fwd, wav)

        if "pgrad" in which:
            # differentiate w.r.t. PARAMS (what the real train step does;
            # the other pieces only take input gradients)
            def loss_p(params):
                (est, src_rt, _, _), _nv = model.apply(
                    {**vs, "params": params}, wav, wav, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                return jnp.sum(est**2) * 1e-6

            timeit_grad("full model PARAM grads", loss_p, vs["params"],
                        iters=4)

        if any(w.startswith("pgroup") for w in which):
            # bisect: param grads w.r.t. one top-level module group at a
            # time (others captured as constants). pgroup:PREFIX runs one
            # prefix in its own process (the enc group crashed the remote
            # compiler when run after others)
            sel = [w.split(":", 1)[1] for w in which if ":" in w]
            for pre in (sel or ("enc", "conformer", "dec")):
                sub = {k: v for k, v in vs["params"].items()
                       if k.startswith(pre)}
                rest = {k: v for k, v in vs["params"].items()
                        if not k.startswith(pre)}

                def loss_g(subp, rest=rest):
                    (est, _s, _c1, _c2), _nv = model.apply(
                        {**vs, "params": {**rest, **subp}}, wav, wav,
                        train=True, rngs={"dropout": key},
                        mutable=["batch_stats"])
                    return jnp.sum(est**2) * 1e-6

                timeit_grad(f"PARAM grads [{pre}*]", loss_g, sub, iters=4)

        if "full" in which:
            from se_tpu.train import losses as LL

            def loss_full(w):
                (est, src_rt, est_cplx, src_cplx), _nv = model.apply(
                    vs, w, w, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return (LL.uformer_sisnr_loss(est, src_rt)
                        + LL.uformer_cplx_mse_loss(
                            jnp.stack(est_cplx, -1), jnp.stack(src_cplx, -1))
                        + LL.uformer_mag_mse_loss(
                            jnp.stack(est_cplx, -1), jnp.stack(src_cplx, -1)))

            timeit_grad("full model + loss fwd+bwd", loss_full, wav)


if __name__ == "__main__":
    main()
