"""canonicalize_layouts: the single-sourced jit-boundary cure for the
axon buffer-provenance op-storm (se_tpu/utils/layouts.py; PERF.md
round-4 "150x uformer train regression").

CPU tier: value preservation, structure/sharding preservation,
idempotence, non-array passthrough, sharded (global) arrays on the
8-device virtual mesh. The on-chip perf regression check lives in
tests/test_tpu_layouts.py (-m tpu).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se_tpu.utils.layouts import canonicalize_layouts


def test_values_and_structure_preserved(rng):
    tree = {
        "w": jnp.asarray(rng.standard_normal((7, 1, 5, 33)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((33,)), jnp.bfloat16),
        "nested": {"k": jnp.asarray(rng.standard_normal((3, 3, 1, 16)))},
        "scalar": jnp.float32(2.5),
        "non_array": 7,
        "none": None,
    }
    out = canonicalize_layouts(tree)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(tree)
    assert out["non_array"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        if isinstance(a, jax.Array):
            assert b.dtype == a.dtype and b.shape == a.shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_output_roundtrip_values(rng):
    # the actual boundary shape: outputs of one jit fed onward
    f = jax.jit(lambda k: {"a": jax.random.normal(k, (4, 6, 10)),
                           "b": jnp.zeros((5,))})
    tree = f(jax.random.PRNGKey(0))
    out = canonicalize_layouts(tree)
    np.testing.assert_array_equal(np.asarray(tree["a"]), np.asarray(out["a"]))
    # canonical arrays are accepted by a consuming jit
    g = jax.jit(lambda t: t["a"].sum() + t["b"].sum())
    np.testing.assert_allclose(float(g(out)), float(g(tree)), rtol=1e-6)


def test_idempotent(rng):
    x = jnp.asarray(rng.standard_normal((8, 16)))
    once = canonicalize_layouts(x)
    twice = canonicalize_layouts(once)
    np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_array_preserved():
    # a global array sharded over the virtual mesh must keep its sharding
    # and values — this is the multi-host-safety property (per-shard
    # round-trip; no gather)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("d",))
    sharding = NamedSharding(mesh, P("d", None))
    x = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    xs = jax.device_put(x, sharding)
    out = canonicalize_layouts({"p": xs})["p"]
    assert out.sharding.is_equivalent_to(xs.sharding, xs.ndim)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_jit_output_roundtrip():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("d",))
    sharding = NamedSharding(mesh, P("d"))

    f = jax.jit(lambda: jnp.arange(32, dtype=jnp.float32) * 2.0,
                out_shardings=sharding)
    y = f()
    out = canonicalize_layouts(y)
    assert out.sharding.is_equivalent_to(y.sharding, y.ndim)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(y))
