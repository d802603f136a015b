"""Serving-side LoRA lifecycle: load / unload / toggle / scale.

Role parity with the reference's adapter registry
(`acestep/core/generation/handler/lora_manager.py` + `core/lora/*`,
lifecycle at `lora/lifecycle.py`). TPU twist: the serving decoder uses
scan-stacked layer params, so per-layer LoRA factors are regrouped into
stacked (n_layers/2, in, r)·(n_layers/2, r, out) tensors and the deltas for
ALL layers apply as one batched einsum per target projection.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

_LAYER_RE = re.compile(r"^layers/(\d+)/(.+)$")


def stack_lora_by_parity(lora: Dict[str, Dict[str, jax.Array]], n_layers: int):
    """Per-layer {path: {a, b}} → {("sliding"|"full", subpath): stacked {a, b}}.

    Missing layers get zero factors so the stacked einsum stays dense.
    """
    groups: Dict[Tuple[str, str], Dict[int, Dict[str, jax.Array]]] = {}
    extras: Dict[str, Dict[str, jax.Array]] = {}
    for path, ab in lora.items():
        m = _LAYER_RE.match(path)
        if not m:
            extras[path] = ab
            continue
        idx, sub = int(m.group(1)), m.group(2)
        parity = "sliding" if idx % 2 == 0 else "full"
        groups.setdefault((parity, sub), {})[idx // 2] = ab

    half = n_layers // 2
    stacked: Dict[Tuple[str, str], Dict[str, jax.Array]] = {}
    for (parity, sub), per_layer in groups.items():
        any_ab = next(iter(per_layer.values()))
        a_shape, b_shape = any_ab["a"].shape, any_ab["b"].shape
        a = jnp.stack([
            per_layer[j]["a"] if j in per_layer else jnp.zeros(a_shape, any_ab["a"].dtype)
            for j in range(half)
        ])
        b = jnp.stack([
            per_layer[j]["b"] if j in per_layer else jnp.zeros(b_shape, any_ab["b"].dtype)
            for j in range(half)
        ])
        stacked[(parity, sub)] = {"a": a, "b": b}
    return stacked, extras


def _get_node(tree: Any, parts: List[str]) -> Any:
    node = tree
    for p in parts:
        node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
    return node


def _set_node(tree: Any, parts: List[str], value: Any) -> Any:
    head = parts[0]
    if isinstance(tree, dict):
        new = dict(tree)
        new[head] = value if len(parts) == 1 else _set_node(tree[head], parts[1:], value)
        return new
    idx = int(head)
    new_list = list(tree)
    new_list[idx] = value if len(parts) == 1 else _set_node(tree[idx], parts[1:], value)
    return new_list


def apply_lora_stacked(
    decoder_params: Dict[str, Any],
    lora: Dict[str, Dict[str, jax.Array]],
    *,
    n_layers: int,
    alpha: float,
    rank: int,
    scale: float = 1.0,
) -> Dict[str, Any]:
    """Apply per-layer LoRA factors onto a (possibly stacked) decoder tree."""
    s = scale * (alpha / rank)
    out = decoder_params
    layers = decoder_params["layers"]
    if isinstance(layers, dict):  # stacked serving layout
        stacked, extras = stack_lora_by_parity(lora, n_layers)
        for (parity, sub), ab in stacked.items():
            parts = ["layers", parity] + sub.split("/")
            kern = _get_node(out, parts)
            delta = jnp.einsum(
                "lir,lro->lio", ab["a"].astype(jnp.float32), ab["b"].astype(jnp.float32)
            ).astype(kern.dtype) * jnp.asarray(s, kern.dtype)
            out = _set_node(out, parts, kern + delta)
        items = extras.items()
    else:
        items = lora.items()
    for path, ab in items:
        parts = path.split("/")
        kern = _get_node(out, parts)
        delta = (ab["a"] @ ab["b"]).astype(kern.dtype) * jnp.asarray(s, kern.dtype)
        out = _set_node(out, parts, kern + delta)
    return out


class LoRARegistry:
    """Named adapters with enable/scale state; rebuilds effective params lazily."""

    def __init__(self):
        self._adapters: Dict[str, Dict[str, Any]] = {}
        self._dirty = True
        self._cache: Optional[Dict[str, Any]] = None

    def load(self, name: str, path: str) -> Dict[str, Any]:
        from acestep_tpu.training.trainer import load_adapter

        lora, meta = load_adapter(path)
        self._adapters[name] = {
            "lora": lora, "meta": meta, "enabled": True, "scale": 1.0, "path": path,
        }
        self._dirty = True
        return meta

    def unload(self, name: str) -> bool:
        removed = self._adapters.pop(name, None) is not None
        self._dirty = True
        return removed

    def toggle(self, name: str, enabled: Optional[bool] = None) -> bool:
        a = self._adapters[name]
        a["enabled"] = (not a["enabled"]) if enabled is None else enabled
        self._dirty = True
        return a["enabled"]

    def set_scale(self, name: str, scale: float) -> None:
        self._adapters[name]["scale"] = float(scale)
        self._dirty = True

    def status(self) -> Dict[str, Any]:
        return {
            name: {"enabled": a["enabled"], "scale": a["scale"], "meta": a["meta"], "path": a["path"]}
            for name, a in self._adapters.items()
        }

    def invalidate_cache(self) -> None:
        """Drop the merged-decoder cache AND its base-params pin. Called from
        initialize_service on a weight swap so the old checkpoint's arrays
        (pinned base + merged copy) are freeable immediately, instead of
        surviving until the next effective_decoder call."""
        self._cache = None
        self._cache_base = None

    def effective_decoder(self, base_decoder: Dict[str, Any], n_layers: int) -> Dict[str, Any]:
        """Base decoder with all enabled adapters applied (cached until dirty
        OR the base decoder changes — /v1/reinitialize swaps checkpoints and
        must not keep serving an adapter applied to the OLD weights).

        The cache key is a STRONG reference compared with `is`, not `id()`:
        after a reinitialize frees the old decoder dict, CPython can reuse its
        address for the new one, and an id-keyed cache would silently serve
        the stale merge (adapters applied to the OLD checkpoint's weights)."""
        if (
            not self._dirty
            and self._cache is not None
            and getattr(self, "_cache_base", None) is base_decoder
        ):
            return self._cache
        self._cache_base = base_decoder
        out = base_decoder
        for a in self._adapters.values():
            if not a["enabled"]:
                continue
            meta = a["meta"]
            out = apply_lora_stacked(
                out, a["lora"], n_layers=n_layers,
                alpha=float(meta.get("alpha", 32.0)), rank=int(meta.get("rank", 32)),
                scale=a["scale"],
            )
        self._cache = out
        self._dirty = False
        return out
