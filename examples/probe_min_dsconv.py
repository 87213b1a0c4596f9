"""Minimal flax reproducer hunt for the uformer train regression: a bare
DSConvCplx module (no conformer context), param grads vs input grads.

Run: python examples/probe_min_dsconv.py [B=4 T=25 d1=1 d2=2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

KW = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
B = int(KW.get("B", 4))
T = int(KW.get("T", 25))
D1 = int(KW.get("d1", 1))
D2 = int(KW.get("d2", 2))


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
    print(f"{name:32s} {dt:8.2f} ms/step", flush=True)
    return dt


def main():
    from se_tpu.models.uformer import DSConvCplx

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1

    mod = DSConvCplx(32, D1, D2)
    vs = jax.jit(mod.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re0, im0, deterministic=False)

    def loss_in(t2):
        r, i = mod.apply(vs, *t2, deterministic=False,
                         rngs={"dropout": key})
        return (jnp.sum(r**2) + jnp.sum(i**2)) * 1e-6

    timeit("single DSConvCplx input grads", loss_in, (re0, im0))

    def loss_p(p):
        r, i = mod.apply({"params": p}, re0, im0, deterministic=False,
                         rngs={"dropout": key})
        return (jnp.sum(r**2) + jnp.sum(i**2)) * 1e-6

    timeit("single DSConvCplx PARAM grads", loss_p, vs["params"])


if __name__ == "__main__":
    main()
