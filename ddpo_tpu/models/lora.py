"""LoRA adapters: low-rank finetuning for any Dense kernel in a param tree.

The reference (jannerm/ddpo) trains the full UNet — 860M params, which at
SD scale means ~3.4GB fp32 master weights + 6.8GB Adam moments + a fp32
grad-accumulation buffer before a single activation. LoRA (Hu et al. 2021,
arXiv:2106.09685) freezes the base weights and trains rank-r factors
A (in, r), B (r, out) per targeted kernel; the trainable state for SD-1.4
attention projections at r=8 is 1.59M params (6.1MB fp32). Measured on
v5e at 512px (bench_lora.py, round 4): trainable state 537x smaller,
optimizer+param train state — what checkpoints and dp all-reduces carry —
180x smaller (18.2 vs 3286 MB), total resident weights+state halved
(frozen bf16 base needs no fp32 master), and the step itself 1.25x
FASTER than full finetune (73.7 vs 91.9 ms/(sample,timestep)) because
the 860M-param optimizer update it drops costs more than the rank-8
merge matmuls XLA hoists out of the timestep scan. (DDPO's successor
repo made LoRA its default trainer for exactly these reasons.)

TPU-first design — merge-at-apply, zero model changes:
    merged_kernel = kernel + (A @ B) * (alpha / rank)
computed INSIDE the jitted step. XLA fuses the rank-r matmul + add into
the parameter stream; the cost is r*(in+out) FLOPs per layer per step —
noise next to the model's matmuls. Because the merge happens in the
forward graph, gradients flow to A/B through the merged kernel with no
custom VJP, no module surgery, and the SAME apply/step/sampler code paths
as full finetuning: the TrainState simply holds the small LoRA tree and
the base params ride along frozen.

The LoRA tree mirrors the base tree's nesting with {"a": ..., "b": ...}
leaves at each targeted module, so Orbax checkpointing, tree_map casts,
and NamedSharding placement all work unmodified.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# SD attention projections: per-block cross/self attention q/k/v/out. These
# names are this framework's first-party UNet module names
# (models/layers.py::CrossAttention), which follow the diffusers layout the
# manifest pins.
DEFAULT_TARGETS: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out_0")


def _is_target(name: str, node: Any, targets: Sequence[str]) -> bool:
    return (
        name in targets
        and isinstance(node, dict)
        and "kernel" in node
        and getattr(node["kernel"], "ndim", 0) == 2
    )


def init_lora(
    params: Dict[str, Any],
    rank: int,
    rng: jax.Array,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype: jnp.dtype = jnp.float32,
) -> Dict[str, Any]:
    """Build a LoRA tree for every targeted 2D kernel in ``params``.

    A ~ N(0, 1/rank) (so A@B has unit-ish scale once B trains), B = 0 —
    the merged model is EXACTLY the base model at init, which is what keeps
    the PPO on-policy invariant (ratio==1 at sampling params) intact when a
    LoRA run starts.
    """
    if rank <= 0:
        raise ValueError(f"rank must be positive, got {rank}")
    paths = []

    def collect(node, path):
        for name, child in node.items():
            if _is_target(name, child, targets):
                paths.append(path + (name,))
            elif isinstance(child, dict):
                collect(child, path + (name,))

    collect(params, ())
    if not paths:
        raise ValueError(f"no LoRA targets {targets} found in param tree")

    keys = jax.random.split(rng, len(paths))
    tree: Dict[str, Any] = {}
    for key, path in zip(keys, paths):
        node = params
        for p in path:
            node = node[p]
        d_in, d_out = node["kernel"].shape
        sub = tree
        for p in path[:-1]:
            sub = sub.setdefault(p, {})
        sub[path[-1]] = {
            "a": (jax.random.normal(key, (d_in, rank), dtype) / rank),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return tree


def lora_scale(lora_params: Dict[str, Any], alpha: Optional[float] = None) -> float:
    """alpha/rank; alpha defaults to rank (scale 1.0, the common default)."""
    leaf = lora_params
    while isinstance(leaf, dict) and "a" not in leaf:
        leaf = next(iter(leaf.values()))
    rank = leaf["a"].shape[1]
    return float(alpha if alpha is not None else rank) / float(rank)


def merge_lora(
    params: Dict[str, Any],
    lora_params: Dict[str, Any],
    alpha: Optional[float] = None,
) -> Dict[str, Any]:
    """Return ``params`` with each targeted kernel replaced by
    ``kernel + (A @ B) * (alpha / rank)``, other leaves shared by reference.

    Jit-safe and differentiable wrt both trees; the delta matmul runs in
    the A/B dtype (fp32 master adapters) and casts to the kernel's dtype,
    mirroring how flax casts fp32 master params to the compute dtype at
    use (the matched-kernels property bench_logp.py's dtype study relies
    on).
    """
    scale = lora_scale(lora_params, alpha)

    def walk(p_node: Dict[str, Any], l_node: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(p_node)
        for name, l_child in l_node.items():
            if isinstance(l_child, dict) and "a" in l_child and "b" in l_child:
                target = dict(p_node[name])
                kernel = target["kernel"]
                delta = (l_child["a"] @ l_child["b"]) * scale
                target["kernel"] = kernel + delta.astype(kernel.dtype)
                out[name] = target
            else:
                out[name] = walk(p_node[name], l_child)
        return out

    return walk(params, lora_params)


def n_lora_params(lora_params: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora_params))
