"""Diagnose TPU compile/run time of the Pallas kernels vs their XLA paths.

Usage: python examples/diag_kernels.py [dsconv|attention|uformer]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def diag_dsconv():
    from se_tpu.ops.pallas_dsconv import _reference, dsconv_block

    b, t, f, c, cm = 32, 400, 4, 64, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)
    params = (
        jnp.ones((1, c)), jnp.zeros((1, c)),                      # g1 b1
        jnp.asarray(rng.standard_normal((c, cm)) * 0.1, jnp.float32),
        jnp.zeros((1, cm)), jnp.full((1, 1), 0.25, jnp.float32),  # bb1 alpha
        jnp.asarray(rng.standard_normal((9 * cm, cm)) * 0.1, jnp.float32),
        jnp.zeros((1, cm)),
        jnp.asarray(rng.standard_normal((9 * cm, cm)) * 0.1, jnp.float32),
        jnp.zeros((1, cm)),
        jnp.ones((1, cm)), jnp.zeros((1, cm)),                    # g2 b2
        jnp.asarray(rng.standard_normal((cm, c)) * 0.1, jnp.float32),
        jnp.zeros((1, c)),
    )
    for d in (1, 3):
        _t(f"dsconv pallas d={d} compile+run",
           lambda d=d: dsconv_block(x, params, d, d, ncomp=2))
        _t(f"dsconv pallas d={d} steady",
           lambda d=d: dsconv_block(x, params, d, d, ncomp=2))
    ref = jax.jit(lambda x: _reference(x, params, 1, 1, 2))
    _t("dsconv xla ref compile+run", lambda: ref(x))
    _t("dsconv xla ref steady", lambda: ref(x))


def diag_attention():
    from se_tpu.ops.pallas_attention import _reference, sdp_attention

    n, h, l, d = 128, 8, 400, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, h, l, d)), jnp.float32)
    _t("attention pallas compile+run",
       lambda: sdp_attention(q, k, v, 0.25))
    _t("attention pallas steady", lambda: sdp_attention(q, k, v, 0.25))
    ref = jax.jit(lambda q, k, v: _reference(q, k, v, 0.25))
    _t("attention xla ref compile+run", lambda: ref(q, k, v))
    _t("attention xla ref steady", lambda: ref(q, k, v))


def diag_uformer():
    from se_tpu.eval.enhance import _enhance_jit
    from se_tpu.models import get_model
    from se_tpu.ops.stft import stft  # noqa: F401

    entry = get_model("uformer")
    model = entry.make()
    n = 4 * 16000
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((32, n)), jnp.float32) * 0.1
    variables = _t("uformer init (jitted)",
                   lambda: jax.jit(model.init)(jax.random.PRNGKey(0),
                                               wav[:1], wav[:1]))
    fn = lambda w: _enhance_jit(entry, model, variables, w, True, n,
                                dtype=None)
    _t("uformer enhance compile+run", lambda: fn(wav))
    _t("uformer enhance steady 1", lambda: fn(wav))
    _t("uformer enhance steady 2", lambda: fn(wav))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "dsconv"
    print("devices:", jax.devices(), flush=True)
    {"dsconv": diag_dsconv, "attention": diag_attention,
     "uformer": diag_uformer}[which]()
