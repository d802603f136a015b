"""Persistent XLA compilation cache for the CLI entry points.

Cold-start compiles of the denoise/decode/LM programs cost 20-40 s each; the
JAX persistent cache replays them across process restarts (serve restarts,
cron jobs, CI). Enabled by the launchers — not at library import — so
embedding applications keep full control. The reference's analogue is
torch.compile + Triton/Inductor cache dirs (api_server.py:1230-1258
TMPDIR/TRITON/INDUCTOR env plumbing).

ACESTEP_COMPILE_CACHE:
  unset  → default dir ~/.cache/acestep_tpu/xla_cache
  "0"    → disabled
  <path> → custom dir
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.expanduser("~/.cache/acestep_tpu/xla_cache")


def enable(path: Optional[str] = None) -> Optional[str]:
    """Turn on the persistent compilation cache; returns the dir or None."""
    env = os.environ.get("ACESTEP_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or env or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Serving programs are few and large — cache everything.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:  # pragma: no cover — never block launch on cache setup
        return None
