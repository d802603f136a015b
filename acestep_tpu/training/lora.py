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


# ---------------------------------------------------------------------------
# LoKr: Kronecker-product adapters (reference LoKRTrainer via LyCORIS,
# `acestep/training/trainer.py:1205-1713`). Delta = scale · (W1 ⊗ W2) with
# W1 (a1, b1) small and W2 (a2, b2) = (in/a1, out/b1); W2 may itself be
# low-rank (W2 = W2a @ W2b) as in LyCORIS' lokr w/ factorization.
# ---------------------------------------------------------------------------


def _kron_factors(dim: int, max_factor: int = 8) -> int:
    """Largest divisor of `dim` that is ≤ max_factor (LyCORIS-style factor pick)."""
    best = 1
    for f in range(2, max_factor + 1):
        if dim % f == 0:
            best = f
    return best


def init_lokr_params(
    key,
    base_params: Any,
    *,
    rank: int = 8,
    factor: int = 8,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """LoKr factors for each targeted kernel: {"w1": (a1, b1), "w2a": (a2, r),
    "w2b": (r, b2)} with a1·a2 = in, b1·b2 = out. w2b zero-init ⇒ identity start."""
    lokr: Dict[str, Any] = {}
    pattern = re.compile(r"(" + "|".join(targets) + r")/kernel$")
    for path, leaf in _walk_paths(base_params):
        if pattern.search(path) and getattr(leaf, "ndim", 0) == 2:
            d_in, d_out = leaf.shape
            a1 = _kron_factors(d_in, factor)
            b1 = _kron_factors(d_out, factor)
            a2, b2 = d_in // a1, d_out // b1
            key, k1, k2 = jax.random.split(key, 3)
            lokr[path] = {
                "w1": jax.random.normal(k1, (a1, b1), dtype) * 0.1,
                "w2a": jax.random.normal(k2, (a2, rank), dtype) * (1.0 / rank),
                "w2b": jnp.zeros((rank, b2), dtype),
            }
    return lokr


def apply_lokr(base_params: Any, lokr: Dict[str, Any], *, scale: float = 1.0) -> Any:
    """Overlay: kernel ← kernel + scale·kron(w1, w2a@w2b)."""
    out = base_params
    for path, fac in lokr.items():
        parts = path.split("/")
        node: Any = base_params
        for p in parts:
            node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
        w2 = fac["w2a"] @ fac["w2b"]  # (a2, b2)
        delta = jnp.kron(fac["w1"], w2).astype(node.dtype) * jnp.asarray(scale, node.dtype)
        out = _set_path(out, parts, node + delta)
    return out
