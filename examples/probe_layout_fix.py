"""Round-5 probe: which canonicalization actually cures the op-storm?

Variants on the exact round-4 reproducer (DSConvCplx param grads, B=4 T=25):
  raw            — init-produced params, unfixed (r4: ~1069 ms)
  numpy_rt       — host round-trip (r4 fix: ~6.6 ms)
  device_put_fmt — on-device jax.device_put with explicit default Format
  copy           — jnp.copy (on-device copy, no format request)
  donate_rt      — device_put with same sharding only (no format)

Run: python examples/probe_layout_fix.py
"""
from __future__ import annotations

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


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
    from se_tpu.nn.conv import (interleave_complex_bias,
                                interleave_complex_kernel)
    from se_tpu.ops.pallas_dsconv import _reference
    from se_tpu.models.uformer import DSConvCplx

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    B, T = 4, 25
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    mod = DSConvCplx(32, 1, 2)
    vs = jax.jit(mod.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re0, im0, deterministic=True)
    p_nested = vs["params"]

    def assemble(p, ncomp=2):
        def conv_w(sub):
            return (interleave_complex_kernel(sub["real_conv"]["kernel"],
                                              sub["imag_conv"]["kernel"]),
                    interleave_complex_bias(sub["real_conv"]["bias"],
                                            sub["imag_conv"]["bias"]))

        g1, b1 = p["ln1"]["scale"], p["ln1"]["bias"]
        w1, bb1 = conv_w(p["conv1x1"])
        alpha = p["prelu"]["weight"]
        wd1, bd1 = conv_w(p["dconv1"])
        wd2, bd2 = conv_w(p["dconv2"])
        g2, b2 = p["ln2"]["scale"], p["ln2"]["bias"]
        ws, bs = conv_w(p["sconv"])
        c_in = g1.shape[0]
        tot = ncomp * (bd1.shape[0] // 2)
        return (jnp.tile(g1, ncomp)[None], jnp.tile(b1, ncomp)[None],
                w1.reshape(ncomp * c_in, tot), bb1[None],
                alpha[None, None],
                wd1.reshape(9 * tot, tot), bd1[None],
                wd2.reshape(9 * tot, tot), bd2[None],
                jnp.tile(g2, ncomp)[None], jnp.tile(b2, ncomp)[None],
                ws.reshape(tot, ncomp * c_in), bs[None])

    x = jnp.concatenate([re0, im0], axis=-1)
    c = re0.shape[-1]

    def loss_nested(p):
        out = _reference(x, assemble(p), 1, 2, 2)
        return (jnp.sum(out[..., :c]**2) + jnp.sum(out[..., c:]**2)) * 1e-6

    from jax.experimental.layout import Format, Layout
    d = jax.devices()[0]

    def put_fmt(a):
        l = a.format.layout
        return jax.device_put(
            a, Format(Layout(major_to_minor=tuple(l.major_to_minor)),
                      a.sharding))

    variants = {
        "raw": p_nested,
        "numpy_rt": jax.tree.map(lambda a: jnp.asarray(np.array(a)), p_nested),
        "device_put_fmt": jax.tree.map(put_fmt, p_nested),
        "copy": jax.tree.map(jnp.copy, p_nested),
        "device_put_plain": jax.tree.map(
            lambda a: jax.device_put(a, a.sharding), p_nested),
    }
    for name, p in variants.items():
        timeit(name, loss_nested, p)


if __name__ == "__main__":
    main()
