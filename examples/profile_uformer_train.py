"""Region profile of the Uformer TRAIN step (forward+backward per region)
at the bench shapes (B=8 x 4 s), fori_loop-chained (cache-safe). Used to
localize the round-3 train-throughput regression (2.9 au-s/s vs round-1's
292 at the same config).

Run: python examples/profile_uformer_train.py [region ...]
Regions: enc conf dec stft full (default: enc conf dec)
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
    """fn(tree) -> scalar; times value_and_grad chained iters times."""
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
    which = set(sys.argv[1:]) or {"enc", "conf", "dec"}
    import flax.linen as nn

    from se_tpu.models.uformer import (
        CConvDec, CConvEnc, ComplexBN, DilatedDualpathConformer, KERNELS,
        RConvDec, RConvEnc, Uformer, fusion,
    )
    from se_tpu.nn import BatchNorm
    from se_tpu.nn.activations import PReLU

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    if "full" in which:
        from se_tpu.train.trainer import TrainConfig, make_train_step
        cfg = TrainConfig(model="uformer")
        model, init_fn, step_fn, _ = make_train_step(cfg)
        jb = {
            "mix": jnp.asarray(rng.standard_normal((B, N)),
                               jnp.float32) * 0.1,
            "clean": jnp.asarray(rng.standard_normal((B, N)),
                                 jnp.float32) * 0.1,
            "frames": jnp.full((B,), SRC_T, jnp.int32),
        }
        state = init_fn(jax.random.PRNGKey(0), jb)

        @jax.jit
        def run_n(st):
            def body(_, s):
                s2, _l = step_fn(s, jb)
                return s2
            return jax.lax.fori_loop(0, 4, body, st)

        st = run_n(state)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        jax.block_until_ready(run_n(st))
        print(f"{'full train step':28s} "
              f"{(time.perf_counter() - t0) / 4 * 1000:8.2f} ms/step",
              flush=True)

    # train-mode submodule wrappers (train=True => BN batch stats,
    # dropout active like the real step; rngs fixed)
    class Enc(nn.Module):
        @nn.compact
        def __call__(self, re, im, mag):
            for i in range(6):
                re, im = CConvEnc(KERNELS[i + 1], name=f"enc{i}")(re, im)
                re, im = ComplexBN(name=f"enc_bn{i}")(re, im, train=True)
                act = PReLU(None, name=f"enc_act{i}")
                re, im = act(re), act(im)
                mag = RConvEnc(KERNELS[i + 1], name=f"enc_real{i}")(mag)
                mag = BatchNorm(name=f"enc_real_bn{i}")(
                    mag, use_running_average=False)
                mag = PReLU(None, name=f"enc_real_act{i}")(mag)
                re, im, mag = fusion(re, im, mag)
            return re, im, mag

    if "enc" in which:
        f0 = 256
        re0 = jnp.asarray(rng.standard_normal((B, SRC_T, f0, 1)),
                          jnp.float32) * 0.1
        enc = Enc()
        vs_e = jax.jit(enc.init)(key, re0, re0, re0)

        def loss_e(t3):
            out, _ = enc.apply(vs_e, *t3, mutable=["batch_stats"])
            return sum(jnp.sum(o**2) for o in out) * 1e-6

        timeit_grad("encoder fwd+bwd", loss_e, (re0, re0, re0))

    cshape = (B, SRC_T, 4, 128)
    re_b = jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1
    im_b = jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1
    mg_b = jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1

    if "conf" in which:
        conf = DilatedDualpathConformer()
        vs_c = jax.jit(conf.init, static_argnames="deterministic")({"params": key, "dropout": key}, re_b, im_b, mg_b,
                         deterministic=False)

        def loss_c(t3):
            out = conf.apply(vs_c, *t3, deterministic=False,
                             rngs={"dropout": key})
            return sum(jnp.sum(o**2) for o in out) * 1e-6

        timeit_grad("conformer fwd+bwd", loss_c, (re_b, im_b, mg_b))

    if "dec" in which:
        class Dec(nn.Module):
            @nn.compact
            def __call__(self, re, im, mag, skips_c, skips_m):
                for i in range(6):
                    skip_re, skip_im = skips_c[-1 - i]
                    re = jnp.concatenate([skip_re, re], axis=-1)
                    im = jnp.concatenate([skip_im, im], axis=-1)
                    re, im = CConvDec(KERNELS[5 - i], name=f"dec{i}")(re, im)
                    mag = jnp.concatenate([skips_m[-1 - i], mag], axis=-1)
                    mag = RConvDec(KERNELS[5 - i], name=f"dec_real{i}")(mag)
                    if i < 5:
                        re, im = ComplexBN(name=f"dec_bn{i}")(re, im,
                                                              train=True)
                        act = PReLU(None, name=f"dec_act{i}")
                        re, im = act(re), act(im)
                        mag = BatchNorm(name=f"dec_real_bn{i}")(
                            mag, use_running_average=False)
                        mag = PReLU(None, name=f"dec_real_act{i}")(mag)
                    re, im, mag = fusion(re, im, mag)
                return re, im, mag

        skips_c, skips_m = [], []
        f = 256
        for i in range(6):
            f = f // 2
            c = KERNELS[i + 1]
            s = jnp.asarray(rng.standard_normal((B, SRC_T, f, c)),
                            jnp.float32) * 0.1
            skips_c.append((s, s))
            skips_m.append(s)
        dec = Dec()
        args = (re_b, im_b, mg_b)
        vs_d = jax.jit(dec.init)(key, *args, skips_c, skips_m)

        def loss_d(t3):
            out, _ = dec.apply(vs_d, *t3, skips_c, skips_m,
                               mutable=["batch_stats"])
            return sum(jnp.sum(o**2) for o in out) * 1e-6

        timeit_grad("decoder fwd+bwd", loss_d, args)


if __name__ == "__main__":
    main()
