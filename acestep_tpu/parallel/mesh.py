"""Device mesh + sharding layer — the TPU-native replacement for the
reference's torch.distributed/NCCL plumbing (SURVEY §2.4).

Design: a 2-D ``(dp, tp)`` mesh over ICI. Generation shards batch-8 requests
data-parallel; the optional tensor-parallel axis follows the reference's
declared (but never executed) ``base_model_tp_plan``
(`configuration_acestep_v15.py:134-142`): colwise q/k/v/gate/up, rowwise
o/down. XLA inserts the all-reduces — there is no hand-written collective
here by design; Pallas ring collectives are reserved for kernels that fuse
compute into the transfer.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    *,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Create a (dp, sp, tp) mesh. dp defaults to n_devices // (sp·tp).

    'sp' is the sequence/context axis for long-audio denoise (the DiT runs
    up to 7 500 patched tokens for 600 s songs) — a capability the reference
    has no equivalent of (SURVEY §5 long-context: torch single-GPU only).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"dp({dp}) * sp({sp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Shard array leaves along their leading (batch) axis over 'dp'."""

    def put(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        return jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, tree)


def shard_params_dp(mesh: Mesh, params: Any) -> Any:
    """Fully replicate parameters (pure data parallelism)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), params)


# TP plan mirroring the reference's base_model_tp_plan: colwise shards the
# output features (kernel axis -1), rowwise shards the input features (axis 0).
_TP_COLWISE = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)$")
_TP_ROWWISE = re.compile(r"(o_proj|down_proj)$")


def _tp_spec_for(path: str, ndim: int) -> P:
    """TP spec for a leaf. ndim 3/2 kernels and ndim 2 biases are the
    scan-STACKED serving layout (leading per-layer axis)."""
    parts = path.split("/")
    owner = parts[-2] if len(parts) >= 2 else ""
    leaf = parts[-1]
    if leaf == "kernel" and ndim in (2, 3):
        lead = (None,) * (ndim - 2)
        if _TP_COLWISE.search(owner):
            return P(*lead, None, "tp")
        if _TP_ROWWISE.search(owner):
            return P(*lead, "tp", None)
    if leaf == "bias" and ndim in (1, 2) and _TP_COLWISE.search(owner):
        return P(*((None,) * (ndim - 1)), "tp")
    return P()


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Apply the TP plan to a parameter pytree (dict-of-dicts with 'kernel' leaves)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + "/" + k) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            out = [walk(v, f"{path}/{i}") for i, v in enumerate(tree)]
            return type(tree)(out) if isinstance(tree, tuple) else out
        spec = _tp_spec_for(path, getattr(tree, "ndim", 0))
        return jax.device_put(tree, NamedSharding(mesh, spec))

    return walk(params, "")
