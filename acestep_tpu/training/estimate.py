"""Gradient-sensitivity estimation — ranks LoRA-targetable attention modules.

Parity with Side-Step's ``estimate`` mode (reference
`acestep/training_v2/estimate.py:26-261`, CLI `training_v2/cli/args.py:77-`):
run the real flow-matching loss over a few preprocessed batches, accumulate
per-module gradient norms for every decoder attention projection, and return
the top-k ranked by sensitivity — the guide for which modules to adapt.

TPU-native shape: instead of toggling ``requires_grad`` per parameter, the
target projections are split out of the parameter pytree and `jax.grad` runs
ONLY over that sub-tree (one jitted program; the frozen remainder rides in
as an argument — see the note inside). Per-leaf norms reduce ON DEVICE, so
each batch reads back O(#modules) scalars, not the gradient tensors. Works
on both the unstacked (`layers` list) and the scan-stacked
(`layers = {"sliding", "full"}`) parameter layouts — stacked leaves carry a
leading depth axis, so one norm reduction per slice recovers per-layer
sensitivities.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import AceStepConfig
from acestep_tpu.training.lora import _set_path, _walk_paths
from acestep_tpu.training.trainer import (
    LoRAConfig,
    TrainingConfig,
    decoder_flow_matching_loss,
)

ATTN_BLOCKS = ("self_attn", "cross_attn")
ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj")


def _target_leaves(decoder: Dict[str, Any]) -> Dict[str, Any]:
    """All parameters under layers.*.{self,cross}_attn.{q,k,v,o}_proj."""
    out = {}
    for path, leaf in _walk_paths(decoder):
        parts = path.split("/")
        if len(parts) >= 3 and parts[-2] in ATTN_PROJS and parts[-3] in ATTN_BLOCKS:
            if parts[0] == "layers":
                out[path] = leaf
    return out


def _module_names(path: str, n_slices: Optional[int]) -> List[str]:
    """Leaf path → per-layer module names (absolute layer indices)."""
    parts = path.split("/")
    attn, proj = parts[-3], parts[-2]
    if parts[1] in ("sliding", "full"):  # stacked layout: slice j → layer 2j(+1)
        off = 0 if parts[1] == "sliding" else 1
        return [f"layers.{2 * j + off}.{attn}.{proj}" for j in range(n_slices)]
    return [f"layers.{int(parts[1])}.{attn}.{proj}"]


def run_estimation(
    params: Dict[str, Any],
    cfg: AceStepConfig,
    batches: Iterable[Dict[str, np.ndarray]],
    *,
    num_batches: int = 10,
    top_k: int = 16,
    granularity: str = "module",
    cfg_ratio: float = 0.0,
    seed: int = 0,
) -> List[Dict[str, Any]]:
    """Accumulate per-module gradient norms over `num_batches` batches.

    `batches` yields preprocessed-tensor batches (target_latents,
    context_latents, encoder_hidden_states, encoder_attention_mask,
    attention_mask — the `PreprocessedDataset.batches` format).
    Returns ``[{"module": name, "sensitivity": float}, ...]`` descending.
    """
    assert granularity in ("module", "layer")
    decoder = params["decoder"]
    null_emb = params["null_condition_emb"]
    trainable = _target_leaves(decoder)
    if not trainable:
        return []
    lcfg = LoRAConfig()
    tcfg = TrainingConfig(cfg_ratio=cfg_ratio)

    # The frozen remainder is passed as an ARGUMENT — closing over it would
    # bake ~2B parameters into the HLO as constants (giant remote-compile
    # uploads fail on this environment's compile relay). Norms reduce on
    # device so only O(#modules) scalars come back per batch.
    @jax.jit
    def grad_norms_fn(tr: Dict[str, Any], frozen_dec, nemb, batch, key):
        def loss(tr_leaves):
            dec = frozen_dec
            for p, leaf in tr_leaves.items():
                dec = _set_path(dec, p.split("/"), leaf)
            return decoder_flow_matching_loss(
                {}, dec, nemb, cfg, lcfg, tcfg, batch, key
            )

        grads = jax.grad(loss)(tr)
        norms = {}
        for path, g in grads.items():
            if path.split("/")[1] in ("sliding", "full"):  # stacked: per-depth
                norms[path] = jnp.sqrt(
                    jnp.sum(g.astype(jnp.float32).reshape(g.shape[0], -1) ** 2, axis=1)
                )
            else:
                norms[path] = jnp.linalg.norm(g.astype(jnp.float32).reshape(-1))[None]
        return norms

    accum: Dict[str, float] = {}
    key = jax.random.PRNGKey(seed)
    done = 0
    for batch in batches:
        if done >= num_batches:
            break
        key, sub = jax.random.split(key)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        norm_tree = grad_norms_fn(trainable, decoder, null_emb, dev_batch, sub)
        for path, dev_norms in norm_tree.items():
            norms = np.asarray(dev_norms, np.float32)
            parts = path.split("/")
            stacked = parts[1] in ("sliding", "full")
            names = _module_names(path, norms.shape[0] if stacked else None)
            for name, n in zip(names, norms):
                if granularity == "layer":
                    name = ".".join(name.split(".")[:2])  # layers.{i}
                accum[name] = accum.get(name, 0.0) + float(n)
        done += 1

    ranked = sorted(accum.items(), key=lambda kv: kv[1], reverse=True)
    return [{"module": m, "sensitivity": s} for m, s in ranked[:top_k]]
