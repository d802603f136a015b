"""LoRA adapters over the functional parameter pytree.

The reference injects PEFT LoRA into the DiT decoder's q/k/v/o/gate/up/down
projections (`acestep/training/trainer.py:327-493`; adapter lifecycle in
`core/generation/handler/lora/`). Here LoRA is a separate pytree mirroring the
decoder structure; `apply_lora` produces an overlay pytree with effective
kernels ``W + (alpha/r)·(A@B)`` — XLA folds this into the consuming matmuls
under jit, so the adapted forward has no Python-level special-casing.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def _walk_paths(tree: Any, path: str = ""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk_paths(v, f"{path}/{k}" if path else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk_paths(v, f"{path}/{i}")
    else:
        yield path, tree


def init_lora_params(
    key,
    base_params: Any,
    *,
    rank: int = 32,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Create LoRA A/B factors for every targeted kernel in `base_params`.

    Returns a flat {path: {"a": (in, r), "b": (r, out)}} dict. A is gaussian,
    B zeros (standard LoRA init ⇒ adapted model starts identical to base).
    """
    lora: Dict[str, Any] = {}
    pattern = re.compile(r"(" + "|".join(targets) + r")/kernel$")
    for path, leaf in _walk_paths(base_params):
        if pattern.search(path) and getattr(leaf, "ndim", 0) == 2:
            key, sub = jax.random.split(key)
            d_in, d_out = leaf.shape
            lora[path] = {
                "a": jax.random.normal(sub, (d_in, rank), dtype) * (1.0 / rank),
                "b": jnp.zeros((rank, d_out), dtype),
            }
    return lora


def _set_path(tree: Any, parts: List[str], value: Any) -> Any:
    head = parts[0]
    if isinstance(tree, dict):
        new = dict(tree)
        new[head] = value if len(parts) == 1 else _set_path(tree[head], parts[1:], value)
        return new
    idx = int(head)
    new_list = list(tree)
    new_list[idx] = value if len(parts) == 1 else _set_path(tree[idx], parts[1:], value)
    return new_list


def apply_lora(base_params: Any, lora: Dict[str, Any], *, alpha: float = 32.0, rank: int = 32, scale: float = 1.0) -> Any:
    """Overlay: kernel ← kernel + scale·(alpha/rank)·A@B (lazily fused by XLA)."""
    s = scale * (alpha / rank)
    out = base_params
    for path, ab in lora.items():
        parts = path.split("/")
        # fetch current kernel
        node: Any = base_params
        for p in parts:
            node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
        delta = (ab["a"] @ ab["b"]).astype(node.dtype) * jnp.asarray(s, node.dtype)
        out = _set_path(out, parts, node + delta)
    return out


def merge_lora(base_params: Any, lora: Dict[str, Any], **kw) -> Any:
    """Materialize merged weights (for export/serving without adapter overhead)."""
    return apply_lora(base_params, lora, **kw)
