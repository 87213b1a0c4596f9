"""Per-component Uformer timing on the live device (ablation profile).

Times each hot component in isolation with fori_loop chaining (cache-safe,
same methodology as bench.py). Run: python examples/profile_uformer.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


B, T, FQ, C = 32, 401, 4, 128  # bottleneck shapes for batch 32 x 4 s


def timeit(name, fn, x, iters=32):
    @jax.jit
    def run_n(v):
        def body(_, carry):
            out = fn(carry)
            return jax.tree.map(
                lambda a, b: a + 1e-6 * b.astype(a.dtype), x, out)
        return jax.lax.fori_loop(0, iters, body, v)

    warm = run_n(x)
    jax.block_until_ready(warm)
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(warm))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:30s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from se_tpu.models.uformer import (
        ComplexAxialAtt, DSConvCplx, DSConvReal, DilatedDualpathConformer,
        RealAxialAtt, Uformer, DILATIONS,
    )

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((B, T, FQ, C)), jnp.float32) * 0.1
    im = jnp.asarray(rng.standard_normal((B, T, FQ, C)), jnp.float32) * 0.1
    mag = jnp.asarray(rng.standard_normal((B, T, FQ, C)), jnp.float32) * 0.1

    key = jax.random.PRNGKey(0)

    # full model for reference
    n = 64000
    wav = jnp.asarray(rng.standard_normal((B, n)), jnp.float32) * 0.1
    model = Uformer()
    vs = jax.jit(model.init)(key, wav[:1], wav[:1])
    timeit("uformer full fwd", lambda w: model.apply(vs, w, w)[0],
           wav, iters=16)

    # DSConv stack (complex + real, all 16 blocks with fusions)
    class Stack:
        def init_and_fn(self):
            import flax.linen as nn

            class S(nn.Module):
                @nn.compact
                def __call__(self, re, im, mag):
                    from se_tpu.models.uformer import fusion
                    nblk = len(DILATIONS)
                    for idx, d in enumerate(DILATIONS):
                        d2 = DILATIONS[nblk - idx - 1]
                        re, im = DSConvCplx(32, d, d2,
                                            name=f"c{idx}")(re, im)
                        mag = DSConvReal(32, d, d2, name=f"r{idx}")(mag)
                        re, im, mag = fusion(re, im, mag)
                    return re, im, mag
            return S()

    stack = Stack().init_and_fn()
    vs_s = stack.init(key, re, im, mag)
    timeit("dsconv stack (16 blocks)",
           lambda t3: stack.apply(vs_s, *t3), (re, im, mag))

    # single cplx + real block pair
    blk_c = DSConvCplx(32, 8, 16)
    vs_c = blk_c.init(key, re, im)
    timeit("dsconv cplx block", lambda t2: blk_c.apply(vs_c, *t2), (re, im))
    blk_r = DSConvReal(32, 8, 16)
    vs_r = blk_r.init(key, mag)
    timeit("dsconv real block", lambda m: blk_r.apply(vs_r, m), mag)

    # axial attentions
    tat = ComplexAxialAtt("t")
    vs_t = tat.init(key, re, im)
    timeit("cplx T-attention", lambda t2: tat.apply(vs_t, *t2), (re, im))
    fat = ComplexAxialAtt("f")
    vs_f = fat.init(key, re, im)
    timeit("cplx F-attention", lambda t2: fat.apply(vs_f, *t2), (re, im))
    rt = RealAxialAtt("t")
    vs_rt = rt.init(key, mag)
    timeit("real T-attention", lambda m: rt.apply(vs_rt, m), mag)

    # whole conformer
    conf = DilatedDualpathConformer()
    vs_cf = conf.init(key, re, im, mag)
    timeit("conformer total", lambda t3: conf.apply(vs_cf, *t3),
           (re, im, mag))


if __name__ == "__main__":
    main()
