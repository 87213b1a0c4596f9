"""Canonicalize jit-produced arrays at jit-output → jit-input boundaries.

Round-4 finding (PERF.md "150x uformer train regression"): on the
axon/v5e backend, feeding the outputs of one jitted program (e.g.
`jax.jit(model.init)`) as inputs to a second jitted program can make the
second program degenerate into a shape-independent serialized op storm:
the identical graph+values ran 6.6 ms with host-round-tripped params vs
~1100 ms with init-produced ones (examples/probe_min_variants.py,
re-confirmed round 5 in examples/probe_layout_fix.py).

Round-5 mechanism probes (examples/probe_layout_fix.py, on-chip):

  raw init outputs                 1130 ms/step   (poison)
  host numpy round-trip               6.2 ms/step (cure)
  device_put w/ explicit Format     404   ms/step (NOT a cure)
  jnp.copy (on-device)             1174   ms/step (not a cure)
  device_put to same sharding      1205   ms/step (not a cure)
  per-shard host round-trip           7.0 ms/step (cure, multi-host-safe)

and `a.format` metadata is IDENTICAL between poisoned and cured arrays
(0/642 mismatches vs `client.get_default_layout` over the full uformer
init tree, tiling included) — so the poison is invisible to the layout
API and cannot be detected, only cured. The only cure observed is
re-materializing the buffer from a HOST upload; on-device relayouts and
copies do not help. Hence this module round-trips through the host —
but only through each process's *addressable shards*, so it is safe for
sharded and multi-host (global) arrays: no cross-host gather happens,
and the global array is rebuilt with
`jax.make_array_from_single_device_arrays`.

Apply `canonicalize_layouts` at every jit-output → jit-input boundary:
trainer init, CLI enhance/stream init, checkpoint restore, the DeepXi
driver, bench entry points. Cost is one host copy of the tree (MBs) at
init — noise next to the 150x it prevents. No reference analogue (the
reference is single-GPU torch with no layout/provenance concept at this
boundary); the closest reference boundary is checkpoint reload,
Uformer/misc.py:16-86.
"""

from __future__ import annotations

import numpy as np

import jax


def _roundtrip(a):
    """Re-materialize one jax.Array from host uploads of its shards."""
    if a.is_fully_addressable:
        # single host copy; works for single-device and host-local sharded
        return jax.device_put(np.asarray(a), a.sharding)
    shards = [jax.device_put(np.asarray(s.data), s.device)
              for s in a.addressable_shards]
    if not shards:  # this process holds no data for the array
        return a
    return jax.make_array_from_single_device_arrays(
        a.shape, a.sharding, shards)


def canonicalize_layouts(tree):
    """Host-round-trip every jax.Array leaf of `tree` (see module doc).

    Values are bit-identical; only buffer provenance changes. Non-array
    leaves pass through. Safe under sharding and multi-host: each
    process uploads only its own addressable shards.
    """

    def _canon(a):
        if not isinstance(a, jax.Array):
            return a
        return _roundtrip(a)

    return jax.tree.map(_canon, tree)
