"""Leaf-level bisection of the DSConv param-grad slowdown: times grads of
_reference w.r.t. each param leaf individually at small shapes.

Run: python examples/probe_dsconv_leaves.py [leafidx ...]
Leaves: 0 g1, 1 b1, 2 w1, 3 bb1, 4 alpha, 5 wd1, 6 bd1, 7 wd2, 8 bd2,
9 g2, 10 b2, 11 ws, 12 bs (default: 2 4 5 6 9 11 + input baseline)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

NAMES = ["g1", "b1", "w1", "bb1", "alpha", "wd1", "bd1", "wd2", "bd2",
         "g2", "b2", "ws", "bs"]
B, T, F, C, CM = (int(os.environ.get("PB_B", 4)), int(os.environ.get("PB_T", 101)), 4, int(os.environ.get("PB_C", 32)), int(os.environ.get("PB_CM", 64)))


def timeit(name, fn, x, iters=4):
    vg = jax.value_and_grad(fn)

    @jax.jit
    def run_n(v):
        def body(_, carry):
            loss, g = vg(carry)
            return jax.tree.map(
                lambda a, da: a + 1e-9 * loss.astype(a.dtype)
                + 1e-30 * da.astype(a.dtype), carry, g)
        return jax.lax.fori_loop(0, iters, body, v)

    warm = run_n(x)
    jax.block_until_ready(warm)
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(warm))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:24s} {dt:8.2f} ms/step", flush=True)


def main():
    from se_tpu.ops.pallas_dsconv import _reference

    args = [a for a in sys.argv[1:] if "=" not in a]
    kw = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    d1, d2 = int(kw.get("d1", 1)), int(kw.get("d2", 2))
    print(f"dilations d1={d1} d2={d2}", flush=True)
    sel = [int(a) for a in args] or [2, 4, 5, 6, 9, 11]
    rng = np.random.default_rng(0)
    tot = 2 * CM
    x = jnp.asarray(rng.standard_normal((B, T, F, 2 * C)), jnp.float32)
    params = (
        jnp.ones((1, 2 * C)), jnp.zeros((1, 2 * C)),
        jnp.asarray(rng.standard_normal((2 * C, tot)) * 0.1, jnp.float32),
        jnp.zeros((1, tot)), jnp.full((1, 1), 0.25, jnp.float32),
        jnp.asarray(rng.standard_normal((9 * tot, tot)) * 0.1, jnp.float32),
        jnp.zeros((1, tot)),
        jnp.asarray(rng.standard_normal((9 * tot, tot)) * 0.1, jnp.float32),
        jnp.zeros((1, tot)),
        jnp.ones((1, tot)), jnp.zeros((1, tot)),
        jnp.asarray(rng.standard_normal((tot, 2 * C)) * 0.1, jnp.float32),
        jnp.zeros((1, 2 * C)),
    )

    def loss_input(xx):
        return jnp.sum(_reference(xx, params, d1, d2, 2) ** 2) * 1e-6

    timeit("input (baseline)", loss_input, x)

    for i in sel:
        def loss_leaf(p, i=i):
            pp = params[:i] + (p,) + params[i + 1:]
            return jnp.sum(_reference(x, pp, d1, d2, 2) ** 2) * 1e-6

        timeit(f"leaf {i} [{NAMES[i]}]", loss_leaf, params[i])


if __name__ == "__main__" and not os.environ.get("SE_TPU_PROBE_CHAIN") and not os.environ.get("SE_TPU_PROBE_CHAINV") and not os.environ.get("SE_TPU_PROBE_CHAINF"):
    main()


def chain():
    """8-block chain (dilations 1..128 paired reversed), grads w.r.t. ALL
    params of all blocks — reproduces the conformer's dsconv stack without
    flax param assembly."""
    from se_tpu.ops.pallas_dsconv import _reference

    rng = np.random.default_rng(0)
    tot = 2 * CM
    dil = (1, 2, 4, 8, 16, 32, 64, 128)
    x = jnp.asarray(rng.standard_normal((B, T, F, 2 * C)), jnp.float32)

    def mk():
        return (
            jnp.ones((1, 2 * C)), jnp.zeros((1, 2 * C)),
            jnp.asarray(rng.standard_normal((2 * C, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)), jnp.full((1, 1), 0.25, jnp.float32),
            jnp.asarray(rng.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.asarray(rng.standard_normal((9 * tot, tot)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, tot)),
            jnp.ones((1, tot)), jnp.zeros((1, tot)),
            jnp.asarray(rng.standard_normal((tot, 2 * C)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, 2 * C)),
        )

    all_params = [mk() for _ in dil]

    def loss_all(ps):
        y = x
        for p, d in zip(ps, dil):
            y = _reference(y, p, d, dil[len(dil) - 1 - dil.index(d)], 2)
        return jnp.sum(y**2) * 1e-6

    timeit("8-block chain ALL params", loss_all, all_params)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_CHAIN") and not os.environ.get("SE_TPU_PROBE_CHAINF"):
    chain()
    sys.exit(0)


def chain_variants():
    """chain() + one conformer-composition ingredient at a time:
    +dropout (mask between blocks), +assembly (tile/interleave/reshape
    param construction), +fusion (real-branch coupling)."""
    from se_tpu.ops.pallas_dsconv import _reference

    rng = np.random.default_rng(0)
    tot = 2 * CM
    dil = (1, 2, 4, 8, 16, 32, 64, 128)
    x0 = jnp.asarray(rng.standard_normal((B, T, F, 2 * C)), jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def mk_raw():
        # unassembled leaves, flax-style: kr/ki (3,3,CM,CM), per-comp LN
        return dict(
            g1=jnp.ones((C,)), b1=jnp.zeros((C,)),
            w1r=jnp.asarray(rng.standard_normal((1, 1, C, CM)) * 0.1,
                            jnp.float32),
            w1i=jnp.asarray(rng.standard_normal((1, 1, C, CM)) * 0.1,
                            jnp.float32),
            bb1r=jnp.zeros((CM,)), bb1i=jnp.zeros((CM,)),
            alpha=jnp.full((), 0.25, jnp.float32),
            wd1r=jnp.asarray(rng.standard_normal((3, 3, CM, CM)) * 0.1,
                             jnp.float32),
            wd1i=jnp.asarray(rng.standard_normal((3, 3, CM, CM)) * 0.1,
                             jnp.float32),
            bd1r=jnp.zeros((CM,)), bd1i=jnp.zeros((CM,)),
            wd2r=jnp.asarray(rng.standard_normal((3, 3, CM, CM)) * 0.1,
                             jnp.float32),
            wd2i=jnp.asarray(rng.standard_normal((3, 3, CM, CM)) * 0.1,
                             jnp.float32),
            bd2r=jnp.zeros((CM,)), bd2i=jnp.zeros((CM,)),
            g2=jnp.ones((CM,)), b2=jnp.zeros((CM,)),
            wsr=jnp.asarray(rng.standard_normal((1, 1, CM, C)) * 0.1,
                            jnp.float32),
            wsi=jnp.asarray(rng.standard_normal((1, 1, CM, C)) * 0.1,
                            jnp.float32),
            bsr=jnp.zeros((C,)), bsi=jnp.zeros((C,)),
        )

    def inter_k(kr, ki):
        top = jnp.concatenate([kr, ki], axis=-1)
        bot = jnp.concatenate([-ki, kr], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def inter_b(br, bi):
        return jnp.concatenate([br - bi, br + bi])

    def assemble(r):
        t2 = 2 * CM
        return (jnp.tile(r["g1"], 2)[None],
                jnp.tile(r["b1"], 2)[None],
                inter_k(r["w1r"], r["w1i"]).reshape(2 * C, t2),
                inter_b(r["bb1r"], r["bb1i"])[None],
                r["alpha"][None, None],
                inter_k(r["wd1r"], r["wd1i"]).reshape(9 * t2, t2),
                inter_b(r["bd1r"], r["bd1i"])[None],
                inter_k(r["wd2r"], r["wd2i"]).reshape(9 * t2, t2),
                inter_b(r["bd2r"], r["bd2i"])[None],
                jnp.tile(r["g2"], 2)[None], jnp.tile(r["b2"], 2)[None],
                inter_k(r["wsr"], r["wsi"]).reshape(t2, 2 * C),
                inter_b(r["bsr"], r["bsi"])[None])

    raws = [mk_raw() for _ in dil]

    def run_chain(ps_assembled, dropout=False):
        y = x0
        k = key
        for i, (p, d) in enumerate(zip(ps_assembled, dil)):
            ref = _reference(y, p, d, dil[len(dil) - 1 - i], 2)
            if dropout:
                k, sub = jax.random.split(k)
                mask = jax.random.bernoulli(sub, 0.9, ref.shape)
                y = y + jnp.where(mask, (ref - y) / 0.9, 0.0)
            else:
                y = ref
        return jnp.sum(y**2) * 1e-6

    def loss_assembled(rs):
        return run_chain([assemble(r) for r in rs])

    def loss_dropout(rs):
        return run_chain([assemble(r) for r in rs], dropout=True)

    timeit("chain + assembly", loss_assembled, raws)
    timeit("chain + assembly + dropout", loss_dropout, raws)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_CHAINV"):
    chain_variants()
    sys.exit(0)


def chain_fused():
    """The full conformer dsconv stack shape: cplx chain + real chain +
    cross-branch fusion after every stage (the one composition ingredient
    the other chain probes lack)."""
    from se_tpu.ops.pallas_dsconv import _reference

    rng = np.random.default_rng(0)
    tot = 2 * CM
    dil = (1, 2, 4, 8, 16, 32, 64, 128)
    re0 = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    im0 = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    m0 = jnp.asarray(rng.standard_normal((B, T, F, C)), jnp.float32)
    EPSF = float(np.finfo(np.float32).eps)

    def mk(c_in, ncomp):
        t = ncomp * CM
        return (
            jnp.ones((1, ncomp * c_in)), jnp.zeros((1, ncomp * c_in)),
            jnp.asarray(rng.standard_normal((ncomp * c_in, t)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, t)), jnp.full((1, 1), 0.25, jnp.float32),
            jnp.asarray(rng.standard_normal((9 * t, t)) * 0.1, jnp.float32),
            jnp.zeros((1, t)),
            jnp.asarray(rng.standard_normal((9 * t, t)) * 0.1, jnp.float32),
            jnp.zeros((1, t)),
            jnp.ones((1, t)), jnp.zeros((1, t)),
            jnp.asarray(rng.standard_normal((t, ncomp * c_in)) * 0.1,
                        jnp.float32),
            jnp.zeros((1, ncomp * c_in)),
        )

    ps = [(mk(C, 2), mk(C, 1)) for _ in dil]

    def loss(ps):
        re, im, mag = re0, im0, m0
        for i, ((pc, pm), d) in enumerate(zip(ps, dil)):
            d2 = dil[len(dil) - 1 - i]
            x = jnp.concatenate([re, im], axis=-1)
            yc = _reference(x, pc, d, d2, 2)
            re, im = yc[..., :C], yc[..., C:]
            mag = _reference(mag, pm, d, d2, 1)
            cplx_mag = jnp.sqrt(jnp.maximum(re**2 + im**2, EPSF))
            mag_out = mag + jax.nn.sigmoid(cplx_mag)
            s = jax.nn.sigmoid(mag)
            re, im, mag = re + s, im + s, mag_out
        return (jnp.sum(re**2) + jnp.sum(im**2) + jnp.sum(mag**2)) * 1e-6

    timeit("fused cplx+real chain ALL", loss, ps)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_CHAINF"):
    chain_fused()
    sys.exit(0)
