"""On-chip regression test for the jit-boundary canonicalization
(VERDICT r4 item 2): feed RAW jit-init-produced params and CANONICALIZED
params to the same compiled grad step and assert the canonicalized path
is not slower — i.e. `canonicalize_layouts` keeps curing (and never
causes) the axon buffer-provenance op storm (se_tpu/utils/layouts.py).

Run: SE_TPU_TEST_PLATFORM=axon python -m pytest tests/test_tpu_layouts.py -m tpu -q
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform not in ("tpu", "axon"),
        reason="needs a real TPU device (SE_TPU_TEST_PLATFORM=axon)"),
]


def _step_ms(loss_fn, params, iters=4):
    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def run_n(p):
        def body(_, carry):
            loss, g = vg(carry)
            return jax.tree.map(
                lambda a, da: a + 1e-9 * loss.astype(a.dtype)
                + 1e-30 * da.astype(a.dtype), carry, g)
        return jax.lax.fori_loop(0, iters, body, p)

    warm = run_n(params)
    jax.block_until_ready(warm)
    t0 = time.perf_counter()
    jax.block_until_ready(run_n(warm))
    return (time.perf_counter() - t0) / iters * 1e3


def test_canonicalized_params_not_slower_than_raw(rng):
    from se_tpu.models.uformer import DSConvCplx
    from se_tpu.utils.layouts import canonicalize_layouts

    B, T = 4, 25
    re0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    im0 = jnp.asarray(rng.standard_normal((B, T, 4, 128)), jnp.float32) * 0.1
    mod = DSConvCplx(32, 1, 2)
    key = jax.random.PRNGKey(0)
    raw = jax.jit(mod.init, static_argnames="deterministic")(
        {"params": key, "dropout": key}, re0, im0,
        deterministic=True)["params"]
    canon = canonicalize_layouts(raw)

    for a, b in zip(jax.tree_util.tree_leaves(raw),
                    jax.tree_util.tree_leaves(canon)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(p):
        r, i = mod.apply({"params": p}, re0, im0, deterministic=True)
        return (jnp.sum(r**2) + jnp.sum(i**2)) * 1e-6

    t_canon = _step_ms(loss, canon)
    t_raw = _step_ms(loss, raw)
    # round-5 measurement: raw ~1130 ms/step, canonical ~7 ms/step
    # (examples/probe_layout_fix.py). The invariant we pin: canonical
    # must never be meaningfully slower than raw (factor 2 + 5 ms slack
    # absorbs tunnel jitter).
    assert t_canon <= 2.0 * t_raw + 5.0, (t_canon, t_raw)
