"""GSPMD sharding helpers.

The reference expresses TP/EP/CP as explicit collectives inserted by
module code (reference: tensorrt_llm/_torch/distributed/ops.py:646
AllReduce; modules/linear.py TensorParallelMode). On TPU all of that is a
PartitionSpec annotation: each model provides a pspec tree
(model.param_pspecs) and XLA inserts/fuses the collectives over ICI.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_named_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, pspecs, mesh: Mesh):
    """device_put a param tree according to a matching PartitionSpec tree."""
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)
