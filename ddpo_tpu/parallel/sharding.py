"""Parameter partition rules (tensor parallelism) for the model stack.

The reference replicates all parameters on every device (SURVEY.md 2.12,
"FSDP/ZeRO: ABSENT"). Here parameters can be sharded over the mesh's 'tp'
axis with GSPMD: we annotate each parameter with a PartitionSpec and let XLA
insert the collectives. Rules (regex on the flattened param path):

  - attention projections to_q/to_k/to_v (and q/k/v_proj): shard the head
    (output) dim -> heads split across tp, activations all-gathered once.
  - attention output to_out_0 / out_proj: shard the input dim -> partial sums
    reduce-scattered by XLA.
  - MLP fc1 / GEGLU net_0.proj: shard output dim; fc2 / net_2: input dim.
  - convs and norms: replicated (spatial convs are small relative to
    attention/MLP matmuls at SD scale and keep GroupNorm stats local).

With tp=1 (the default and the reference-equivalent configuration) every rule
degenerates to full replication.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, spec builder taking param ndim)
_TP_RULES = [
    # dense kernels (in, out): shard out dim
    (r"(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$", lambda nd: P(None, "tp")),
    (r"(net_0/proj|fc1)/kernel$", lambda nd: P(None, "tp")),
    # dense kernels: shard in dim (row-parallel)
    (r"(to_out_0|out_proj|net_2|fc2)/kernel$", lambda nd: P("tp", None)),
    # biases of column-parallel layers: shard
    (r"(to_q|to_k|to_v|q_proj|k_proj|v_proj|net_0/proj|fc1)/bias$", lambda nd: P("tp")),
]


def unet_partition_rules(path: str, ndim: int) -> P:
    for pattern, spec_fn in _TP_RULES:
        if re.search(pattern, path):
            return spec_fn(ndim)
    return P()  # replicated


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_specs(params) -> Any:
    """PartitionSpec pytree for a param tree via the rules above."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: unet_partition_rules(_path_str(path), x.ndim), params
    )


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params)
    )


def shard_params(mesh: Mesh, params):
    """Place a host-resident param tree onto the mesh per the TP rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def place_train_state(mesh: Mesh, state):
    """Place a full train state onto the mesh: params, grad-accumulation
    buffer, and optimizer moments follow the TP rules (their pytree paths end
    with the same param-path suffixes the rules match on); everything else —
    step counters, schedule state, factored adafactor statistics whose rank
    no longer fits the spec — replicates. With tp=1 every leaf replicates,
    which is the reference-equivalent configuration.
    """

    def place(path, x):
        ndim = getattr(x, "ndim", 0)
        spec = unet_partition_rules(_path_str(path), ndim)
        if len(spec) > ndim:  # factored/reduced leaf (e.g. adafactor v_row)
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)
