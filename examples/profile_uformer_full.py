"""Whole-model Uformer region profile: stft/istft, encoder, conformer,
decoder, heads — each timed standalone at the B=32 x 4 s shapes with
fori_loop chaining (cache-safe, same methodology as bench.py).

Run: python examples/profile_uformer_full.py [region ...]
Regions: full stft enc conf dec heads (default: all but `full` — bench.py
already measures the full model, and each region costs a multi-minute
remote compile through the tunnel).

SE_TPU_PROF_DTYPE=bf16 casts every region's inputs and params to bf16
(the same contract as the bf16 enhance path: params + activations bf16,
norm statistics accumulate fp32 internally) — the round-5 instrument for
locating the bf16 roofline gap (VERDICT r4 item 5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B, N = 32, 64000
SRC_T = 401


def _cost(fn, x):
    """XLA cost analysis (flops, HBM bytes) for one region call — the
    roofline inputs. Returns (gflops, gbytes) or (nan, nan)."""
    try:
        analysis = jax.jit(fn).lower(x).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        fl = float(analysis.get("flops", float("nan")))
        by = float(analysis.get("bytes accessed", float("nan")))
        return fl / 1e9, by / 1e9
    except Exception:  # noqa: BLE001
        return float("nan"), float("nan")


def timeit(name, fn, x, iters=32):
    @jax.jit
    def run_n(v):
        def body(_, carry):
            out = fn(carry)
            # fold a scalar tap of the output back into every input leaf:
            # keeps carry shapes identical to the inputs (region outputs
            # have different shapes) while making each iteration depend on
            # the previous one (cache-safe chaining)
            tap = sum(jnp.sum(o) for o in jax.tree.leaves(out)) * 1e-9
            return jax.tree.map(lambda a: a + tap.astype(a.dtype), carry)
        return jax.lax.fori_loop(0, iters, body, v)

    warm = run_n(x)
    jax.block_until_ready(warm)
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(warm))
    dt = (time.perf_counter() - t0) / iters * 1000
    gf, gb = _cost(fn, x)
    # roofline: achieved rate vs what HBM bandwidth alone would allow
    tfs = gf / dt if dt else float("nan")          # TFLOP/s achieved
    bw = gb / dt * 1000 if dt else float("nan")    # GB/s achieved
    print(f"{name:28s} {dt:8.2f} ms  {gf:8.1f} GF {gb:7.2f} GB"
          f"  {tfs:6.2f} TF/s {bw:7.0f} GB/s", flush=True)
    return dt


DTYPE = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[
    os.environ.get("SE_TPU_PROF_DTYPE", "fp32")]


def _cast(tree):
    return jax.tree.map(
        lambda p: p.astype(DTYPE)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
        else p, tree)


def main():
    which = set(sys.argv[1:]) or {"stft", "enc", "conf", "dec", "heads"}
    import flax.linen as nn

    from se_tpu.models.uformer import (
        CConvDec, CConvEnc, ComplexBN, DilatedDualpathConformer, KERNELS,
        RConvDec, RConvEnc, Uformer, fusion,
    )
    from se_tpu.nn import BatchNorm
    from se_tpu.nn.activations import PReLU
    from se_tpu.ops.stft import PRESET_UFORMER, istft, stft

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    wav = (jnp.asarray(rng.standard_normal((B, N)), jnp.float32) * 0.1
           ).astype(DTYPE)

    total = 0.0
    if "full" in which:
        model = Uformer()
        vs = _cast(jax.jit(model.init)(key, wav[:1], wav[:1]))
        total = timeit("uformer full fwd",
                       lambda w: model.apply(vs, w, w)[0], wav, iters=16)

    # stft + istft
    def stft_istft(w):
        re, im = stft(w, PRESET_UFORMER)
        return istft(re, im, PRESET_UFORMER, length=N)

    t_stft = timeit("stft+istft", jax.jit(stft_istft), wav) \
        if "stft" in which else 0.0

    # encoder (both branches + fusions, 6 levels)
    class Enc(nn.Module):
        @nn.compact
        def __call__(self, re, im, mag):
            for i in range(6):
                re, im = CConvEnc(KERNELS[i + 1], name=f"enc{i}")(re, im)
                re, im = ComplexBN(name=f"enc_bn{i}")(re, im)
                act = PReLU(None, name=f"enc_act{i}")
                re, im = act(re), act(im)
                mag = RConvEnc(KERNELS[i + 1], name=f"enc_real{i}")(mag)
                mag = BatchNorm(name=f"enc_real_bn{i}")(
                    mag, use_running_average=True)
                mag = PReLU(None, name=f"enc_real_act{i}")(mag)
                re, im, mag = fusion(re, im, mag)
            return re, im, mag

    if "enc" not in which:
        t_enc = 0.0
    f0 = 256
    re0 = (jnp.asarray(rng.standard_normal((B, SRC_T, f0, 1)),
                       jnp.float32) * 0.1).astype(DTYPE)
    if "enc" in which:
        enc = Enc()
        vs_e = _cast(jax.jit(enc.init)(key, re0, re0, re0))
        t_enc = timeit("encoder (6 lvls + fusion)",
                       lambda t3: enc.apply(vs_e, *t3), (re0, re0, re0))

    # conformer at bottleneck
    cshape = (B, SRC_T, 4, 128)
    re_b = (jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1
            ).astype(DTYPE)
    im_b = (jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1
            ).astype(DTYPE)
    mg_b = (jnp.asarray(rng.standard_normal(cshape), jnp.float32) * 0.1
            ).astype(DTYPE)
    t_conf = 0.0
    if "conf" in which:
        conf = DilatedDualpathConformer()
        vs_c = _cast(jax.jit(conf.init)(key, re_b, im_b, mg_b))
        t_conf = timeit("conformer", lambda t3: conf.apply(vs_c, *t3),
                        (re_b, im_b, mg_b))

    # decoder (6 levels, skip-concat + transpose convs + BN/PReLU + fusion)
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
                    re, im = ComplexBN(name=f"dec_bn{i}")(re, im)
                    act = PReLU(None, name=f"dec_act{i}")
                    re, im = act(re), act(im)
                    mag = BatchNorm(name=f"dec_real_bn{i}")(
                        mag, use_running_average=True)
                    mag = PReLU(None, name=f"dec_real_act{i}")(mag)
                re, im, mag = fusion(re, im, mag)
            return re, im, mag

    skips_c, skips_m = [], []
    f = 256
    for i in range(6):
        f = f // 2
        c = KERNELS[i + 1]
        s = (jnp.asarray(rng.standard_normal((B, SRC_T, f, c)),
                         jnp.float32) * 0.1).astype(DTYPE)
        skips_c.append((s, s))
        skips_m.append(s)
    t_dec = 0.0
    if "dec" in which:
        dec = Dec()
        args = (re_b, im_b, mg_b, skips_c, skips_m)
        vs_d = _cast(jax.jit(dec.init)(key, *args))
        t_dec = timeit("decoder (6 lvls + fusion)",
                       lambda a: dec.apply(vs_d, *a), args)

    # heads: trig mask application + istft
    fm = 257
    mag_full = (jnp.abs(jnp.asarray(
        rng.standard_normal((B, SRC_T, fm)), jnp.float32)) + 0.1
        ).astype(DTYPE)
    phase = jnp.asarray(
        rng.uniform(-3.1, 3.1, (B, SRC_T, fm)), jnp.float32).astype(DTYPE)
    dec_re = (jnp.asarray(rng.standard_normal((B, SRC_T, fm - 1, 1)),
                          jnp.float32) * 0.1).astype(DTYPE)
    dec_im = (jnp.asarray(rng.standard_normal((B, SRC_T, fm - 1, 1)),
                          jnp.float32) * 0.1).astype(DTYPE)
    dec_mag = (jnp.asarray(rng.standard_normal((B, SRC_T, fm - 1, 1)),
                           jnp.float32) * 0.1).astype(DTYPE)

    EPS = float(np.finfo(np.float32).eps)
    cos_p = jnp.cos(phase)
    sin_p = jnp.sin(phase)

    def heads(t3):
        # mirrors the current trig-free head math (models/uformer.py:721-752)
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
        cos_m = jnp.pad(cos_m, ((0, 0), (0, 0), (1, 0)), constant_values=1.0)
        sin_m = jnp.pad(sin_m, ((0, 0), (0, 0), (1, 0)))
        cos_est = cos_p * cos_m - sin_p * sin_m
        sin_est = sin_p * cos_m + cos_p * sin_m
        est_mags = mask_mags * mag_full
        mag_fused = (est_mags + mag) * 0.5
        out_re = mag_fused * cos_est
        out_im = mag_fused * sin_est
        return istft(out_re, out_im, PRESET_UFORMER, length=N)

    t_heads = timeit("heads (trig+istft)", jax.jit(heads),
                     (dec_re, dec_im, dec_mag)) \
        if "heads" in which else 0.0

    acc = t_stft + t_enc + t_conf + t_dec + t_heads
    print(f"{'sum of regions':28s} {acc:8.2f} ms (full fwd {total:.2f})")


if __name__ == "__main__":
    main()
