"""Parallelism: device meshes, data/model sharding, activation constraints.

The reference has no distributed machinery at all (SURVEY.md §2.5); this
layer is the TPU-native replacement mandated by BASELINE.json: pjit-style
data parallelism over a ('data',) axis, sequence-parallel sharding of the
Uformer attention folds over a ('model',) axis, collectives compiled by XLA
onto ICI/DCN.
"""

from se_tpu.parallel.mesh import (  # noqa: F401
    activation_mesh,
    make_mesh,
    replicate,
    shard_activation,
    shard_batch,
    shard_map_leading,
)
