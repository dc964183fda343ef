"""Device mesh and sharding rules.

The reference's "distributed backend" is disk-mediated array jobs +
periodic model averaging (SURVEY.md §2.13). The TPU-native replacement:
a jax.sharding.Mesh with named axes

  data   — data parallelism (gradients psum over ICI; mathematically
           stronger than the reference's model averaging)
  model  — tensor parallelism over hidden dims of the big matmuls

Sharding rules map parameter pytrees onto the mesh by name; XLA inserts
the all-reduce/all-gather collectives.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# parameter-name patterns -> PartitionSpec for tensor parallelism.
# TDNN-F: 'linear' (bottleneck, 2*dim): shard the wide input dim;
# 'affine' (dim, 2*bottleneck): shard the output dim; Dense kernels
# (in, out): shard out. BatchNorm stats replicated.
_TP_RULES = [
    (re.compile(r"tdnnf\d+/linear$"), P(None, "model")),
    (re.compile(r"tdnnf\d+/affine$"), P("model", None)),
    (re.compile(r"tdnnf\d+/bias$"), P("model")),
    (re.compile(r"(input_affine|affine|output_affine|output_xent_affine)"
                r"/kernel$"), P(None, "model")),
    (re.compile(r"(input_affine|affine|output_affine|output_xent_affine)"
                r"/bias$"), P("model")),
    (re.compile(r"linear/kernel$"), P(None, "model")),
]


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """A pytree of NamedShardings matching `params`."""
    def spec_for(path: str, leaf) -> P:
        if tensor_parallel and mesh.shape.get("model", 1) > 1:
            for pat, spec in _TP_RULES:
                if pat.search(path):
                    # only shard if the dim divides
                    dims = [d for d in spec]
                    ok = True
                    for axis_i, name in enumerate(dims):
                        if name is not None and axis_i < leaf.ndim:
                            if leaf.shape[axis_i] % mesh.shape["model"]:
                                ok = False
                    if ok and leaf.ndim >= len([d for d in dims if True]) - 1:
                        return spec
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = {}

    def path_str(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    leaves, treedef = flat
    out_leaves = []
    for path, leaf in leaves:
        spec = spec_for(path_str(path), leaf)
        if any(s is not None for s in spec):
            # sanity: rank matches
            if len(spec) > leaf.ndim:
                spec = P()
        out_leaves.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
