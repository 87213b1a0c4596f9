"""Bisect the minimal DSConvCplx param-grad reproducer (747 ms vs 6.8 ms
input grads): flax variants with one composition ingredient removed each.

Run: python examples/probe_min_variants.py [B=4 T=25]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

KW = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
B = int(KW.get("B", 4))
T = int(KW.get("T", 25))


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
    print(f"{name:40s} {dt:8.2f} ms/step", flush=True)
    return dt


def main():
    from se_tpu.models.uformer import _dsconv_params
    from se_tpu.ops.pallas_dsconv import _reference

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1

    class VA(nn.Module):  # assembly + _reference only
        @nn.compact
        def __call__(self, re, im):
            c_in = re.shape[-1]
            params = _dsconv_params(self, c_in, 32, ncomp=2)
            x = jnp.concatenate([re, im], axis=-1)
            out = _reference(x, params, 1, 2, 2)
            return out[..., :c_in], out[..., c_in:]

    class VB(nn.Module):  # + jax.checkpoint
        @nn.compact
        def __call__(self, re, im):
            c_in = re.shape[-1]
            params = _dsconv_params(self, c_in, 32, ncomp=2)
            x = jnp.concatenate([re, im], axis=-1)
            out = jax.checkpoint(
                lambda x, p: _reference(x, p, 1, 2, 2))(x, params)
            return out[..., :c_in], out[..., c_in:]

    class VC(nn.Module):  # + flax dropout (no checkpoint)
        @nn.compact
        def __call__(self, re, im):
            c_in = re.shape[-1]
            params = _dsconv_params(self, c_in, 32, ncomp=2)
            x = jnp.concatenate([re, im], axis=-1)
            ref = _reference(x, params, 1, 2, 2)
            out = x + nn.Dropout(0.1, deterministic=False)(ref - x)
            return out[..., :c_in], out[..., c_in:]

    for name, cls, rngs in (
        ("VA assembly+_reference", VA, {"params": key}),
        ("VB +checkpoint", VB, {"params": key}),
        ("VC +flax dropout", VC, {"params": key, "dropout": key}),
    ):
        mod = cls()
        vs = jax.jit(mod.init)(rngs, re0, im0)
        apply_rngs = {"dropout": key} if "dropout" in rngs else None

        def loss_p(p, mod=mod, apply_rngs=apply_rngs):
            r, i = mod.apply({"params": p}, re0, im0, rngs=apply_rngs)
            return (jnp.sum(r**2) + jnp.sum(i**2)) * 1e-6

        timeit(f"{name} PARAM grads", loss_p, vs["params"])


if __name__ == "__main__" and not os.environ.get("SE_TPU_PROBE_NOFLAX") and not os.environ.get("SE_TPU_PROBE_NOFLAX2") and not os.environ.get("SE_TPU_PROBE_NOFLAX3"):
    main()


def noflax():
    """Control: VA's EXACT nested param dict + a pure-python mirror of
    _dsconv_params' assembly + _reference — no flax in the differentiated
    graph. If fast, the poison is flax's apply/vjp interaction; if slow,
    the nested-dict assembly graph itself."""
    from se_tpu.nn.conv import (interleave_complex_bias,
                                interleave_complex_kernel)
    from se_tpu.ops.pallas_dsconv import _reference

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1

    from se_tpu.models.uformer import DSConvCplx

    mod = DSConvCplx(32, 1, 2)
    vs = jax.jit(mod.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re0, im0, deterministic=True)
    p = vs["params"]
    print("param tree top keys:", sorted(p.keys()), flush=True)

    def assemble(p, ncomp=2):
        def conv_w(sub):
            kr, br = sub["real_conv"]["kernel"], sub["real_conv"]["bias"]
            ki, bi = sub["imag_conv"]["kernel"], sub["imag_conv"]["bias"]
            return (interleave_complex_kernel(kr, ki),
                    interleave_complex_bias(br, bi))

        g1, b1 = p["ln1"]["scale"], p["ln1"]["bias"]
        w1, bb1 = conv_w(p["conv1x1"])
        alpha = p["prelu"]["weight"]
        wd1, bd1 = conv_w(p["dconv1"])
        wd2, bd2 = conv_w(p["dconv2"])
        g2, b2 = p["ln2"]["scale"], p["ln2"]["bias"]
        ws, bs = conv_w(p["sconv"])
        c_in = g1.shape[0]
        cc = bd1.shape[0] // 2
        tot = ncomp * cc
        return (jnp.tile(g1, ncomp)[None], jnp.tile(b1, ncomp)[None],
                w1.reshape(ncomp * c_in, tot), bb1[None],
                alpha[None, None],
                wd1.reshape(9 * tot, tot), bd1[None],
                wd2.reshape(9 * tot, tot), bd2[None],
                jnp.tile(g2, ncomp)[None], jnp.tile(b2, ncomp)[None],
                ws.reshape(tot, ncomp * c_in), bs[None])

    x = jnp.concatenate([re0, im0], axis=-1)

    def loss_p(p):
        out = _reference(x, assemble(p), 1, 2, 2)
        c = re0.shape[-1]
        return (jnp.sum(out[..., :c]**2) + jnp.sum(out[..., c:]**2)) * 1e-6

    timeit("NOFLAX nested-dict assembly PARAM grads", loss_p, p)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_NOFLAX") and not os.environ.get("SE_TPU_PROBE_NOFLAX2") and not os.environ.get("SE_TPU_PROBE_NOFLAX3"):
    noflax()
    sys.exit(0)


def noflax2():
    """Isolate which noflax() ingredient matters: flat vs nested params,
    flax-init values vs synthetic, 1 vs 8 chained blocks."""
    from se_tpu.nn.conv import (interleave_complex_bias,
                                interleave_complex_kernel)
    from se_tpu.ops.pallas_dsconv import _reference
    from se_tpu.models.uformer import DSConvCplx

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    mod = DSConvCplx(32, 1, 2)
    vs = jax.jit(mod.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re0, im0, deterministic=True)
    p_nested = jax.tree.map(jnp.asarray, vs["params"])

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

    # A: same values, FLAT param dict (underscore-joined keys)
    flat = {}
    def _flatten(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _flatten(v, pre + k + "/")
            else:
                flat[pre + k] = v
    _flatten(p_nested)

    def unflatten(f):
        out = {}
        for k, v in f.items():
            parts = k.split("/")
            d = out
            for q in parts[:-1]:
                d = d.setdefault(q, {})
            d[parts[-1]] = v
        return out

    def loss_flat(f):
        out = _reference(x, assemble(unflatten(f)), 1, 2, 2)
        return (jnp.sum(out[..., :c]**2) + jnp.sum(out[..., c:]**2)) * 1e-6

    timeit("A flat keys, flax values", loss_flat, flat)

    # B: nested structure, synthetic 0.1-gaussian values
    p_syn = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.1,
                              a.dtype), p_nested)

    def loss_nested(p):
        out = _reference(x, assemble(p), 1, 2, 2)
        return (jnp.sum(out[..., :c]**2) + jnp.sum(out[..., c:]**2)) * 1e-6

    timeit("B nested, synthetic values", loss_nested, p_syn)

    # C: nested, flax values, 8 chained applications (shared params)
    def loss_chain8(p):
        y = x
        ap = assemble(p)
        for _ in range(8):
            y = _reference(y, ap, 1, 2, 2)
        return jnp.sum(y**2) * 1e-6

    timeit("C nested, flax values, 8 chained", loss_chain8, p_nested)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_NOFLAX2"):
    noflax2()
    sys.exit(0)


def noflax3():
    """Provenance vs values: (b) flax-init values round-tripped through
    numpy (fresh device arrays, same values); (c) numpy-built arrays with
    the same STRUCTURE as the init (ones/zeros/kaiming) but fresh
    provenance. Fast (b) + fast (c) => provenance (layouts). Slow (c) =>
    the ones/zeros value structure itself."""
    from se_tpu.nn.conv import (interleave_complex_bias,
                                interleave_complex_kernel)
    from se_tpu.ops.pallas_dsconv import _reference
    from se_tpu.models.uformer import DSConvCplx

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
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

    p_roundtrip = jax.tree.map(lambda a: jnp.asarray(np.array(a)), p_nested)
    timeit("b flax values via numpy roundtrip", loss_nested, p_roundtrip)

    def synth_like(path_key, a):
        name = path_key
        if name == "scale":
            return jnp.ones(a.shape, a.dtype)
        if name in ("bias",):
            return jnp.zeros(a.shape, a.dtype)
        if name == "weight":  # prelu scalar
            return jnp.full(a.shape, 0.25, a.dtype)
        fan_in = int(np.prod(a.shape[:-1])) or 1
        bound = 1.0 / np.sqrt(fan_in)
        return jnp.asarray(
            rng.uniform(-bound, bound, a.shape).astype(np.float32))

    def map_with_name(d):
        out = {}
        for k, v in d.items():
            out[k] = map_with_name(v) if isinstance(v, dict) \
                else synth_like(k, v)
        return out

    p_structured = map_with_name(jax.tree.map(np.array, p_nested))
    timeit("c numpy-built ones/zeros/kaiming", loss_nested, p_structured)


if __name__ == "__main__" and os.environ.get("SE_TPU_PROBE_NOFLAX3"):
    noflax3()
    sys.exit(0)
