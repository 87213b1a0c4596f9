"""Bisect the conformer param-grad slowdown (round 4): the full-model
probe showed param grads 500x slower than input grads, localized to the
conformer group. This times the conformer ALONE, param-grads restricted
to one submodule group at a time.

Run: python examples/probe_conformer_pgrad.py [group ...] [B=.. T=..]
Groups: all input ff att dsconv ln (default: input all ff att dsconv)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

ARGS = [a for a in sys.argv[1:] if "=" not in a]
KW = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
B = int(KW.get("B", 8))
T = int(KW.get("T", 401))


def timeit_grad(name, fn, x, iters=4):
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
    print(f"{name:32s} {dt:8.2f} ms/step (fwd+bwd)", flush=True)
    return dt


GROUPS = {
    "ff": ("ff1_", "ff2_"),
    "att": ("cplx_tatt", "mag_tatt", "cplx_fatt", "mag_fatt"),
    "dsconv": ("dsconv_",),
    "dsconv0": ("dsconv_cplx0", "dsconv_real0"),
    "dsconv7": ("dsconv_cplx7", "dsconv_real7"),
    "ln": ("ln_",),
}


def main():
    which = set(ARGS) or {"input", "all", "ff", "att", "dsconv"}
    import se_tpu.models.uformer as U
    from se_tpu.models.uformer import DilatedDualpathConformer

    # ablations: bisect the REAL module by surgically removing one
    # composition ingredient (monkeypatch — calls resolve at runtime)
    if "nofusion" in which:
        U.fusion = lambda re, im, mag: (re, im, mag)
        print("ABLATION: fusion -> identity", flush=True)
    if "noatt" in which:
        def _id_cplx(self, re, im, deterministic=True):
            return re, im

        def _id_real(self, x, deterministic=True):
            return x

        U.ComplexAxialAtt.__call__ = _id_cplx
        U.RealAxialAtt.__call__ = _id_real
        print("ABLATION: axial attentions -> identity", flush=True)
    if "noff" in which:
        def _id_ff_cplx(self, re, im, deterministic=True):
            return re, im

        def _id_ff_real(self, x, deterministic=True):
            return x

        U.FFCplx.__call__ = _id_ff_cplx
        U.FFReal.__call__ = _id_ff_real
        print("ABLATION: FF blocks -> identity", flush=True)
    if "nodrop" in which:
        import flax.linen as fnn

        fnn.Dropout.__call__ = lambda self, x, deterministic=None, rng=None: x
        print("ABLATION: flax Dropout -> identity", flush=True)
    if "refatt" in which:
        from se_tpu.ops.pallas_attention import _reference as _att_ref

        U.sdp_attention = lambda q, k, v, s, interpret=None: \
            _att_ref(q, k, v, s)
        print("ABLATION: sdp_attention -> einsum reference (no custom_vjp)",
              flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    shape = (B, T, 4, 128)
    re_b = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.1
    im_b = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.1
    mg_b = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.1

    conf = DilatedDualpathConformer()
    vs = jax.jit(conf.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re_b, im_b, mg_b,
        deterministic=False)
    params = vs["params"]
    print(f"conformer pgrad probe B={B} T={T}; param groups:", flush=True)
    for k in sorted(params):
        print("   ", k, flush=True)

    def apply_with(p):
        out = conf.apply({"params": p}, re_b, im_b, mg_b,
                         deterministic=False, rngs={"dropout": key})
        return sum(jnp.sum(o**2) for o in out) * 1e-6

    if "input" in which:
        def loss_in(t3):
            out = conf.apply(vs, *t3, deterministic=False,
                             rngs={"dropout": key})
            return sum(jnp.sum(o**2) for o in out) * 1e-6

        timeit_grad("input grads (baseline)", loss_in, (re_b, im_b, mg_b))

    if "all" in which:
        timeit_grad("PARAM grads [all]", apply_with, params)

    for g, prefixes in GROUPS.items():
        if g not in which:
            continue
        sub = {k: v for k, v in params.items()
               if any(k.startswith(p) for p in prefixes)}
        rest = {k: v for k, v in params.items()
                if not any(k.startswith(p) for p in prefixes)}
        if not sub:
            print(f"  (group {g}: no params matched)", flush=True)
            continue

        def loss_g(subp, rest=rest):
            return apply_with({**rest, **subp})

        timeit_grad(f"PARAM grads [{g}]", loss_g, sub)


if __name__ == "__main__":
    main()
