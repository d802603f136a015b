"""Checkpoint downloader — HF Hub / ModelScope with source failover.

Role parity with the reference's `acestep/model_downloader.py` (source
selection by reachability probe, per-model ensure/download). In zero-egress
environments every network path fails gracefully and the caller falls back to
a local directory.
"""

from __future__ import annotations

import os
import socket
from typing import List, Optional

MODEL_REPOS = {
    "acestep-v15-turbo": "ACE-Step/ACE-Step-v1.5-turbo",
    "acestep-v15-base": "ACE-Step/ACE-Step-v1.5-base",
    "acestep-v15-sft": "ACE-Step/ACE-Step-v1.5-sft",
    "acestep-5Hz-lm-0.6B": "ACE-Step/acestep-5Hz-lm-0.6B",
    "acestep-5Hz-lm-1.7B": "ACE-Step/acestep-5Hz-lm-1.7B",
    "acestep-5Hz-lm-4B": "ACE-Step/acestep-5Hz-lm-4B",
}

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/acestep_tpu/checkpoints")


def _reachable(host: str, port: int = 443, timeout: float = 3.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def pick_source() -> Optional[str]:
    """'hf' when huggingface.co is reachable, 'modelscope' as fallback, else None."""
    if _reachable("huggingface.co"):
        return "hf"
    if _reachable("www.modelscope.cn"):
        return "modelscope"
    return None


def ensure_model(
    name: str,
    cache_dir: str = DEFAULT_CACHE_DIR,
    *,
    source: Optional[str] = None,
) -> Optional[str]:
    """Return a local directory for `name`, downloading if needed and possible."""
    local = os.path.join(cache_dir, name)
    if os.path.isdir(local) and os.listdir(local):
        return local

    source = source or pick_source()
    if source is None:
        return None
    repo = MODEL_REPOS.get(name, name)
    try:
        if source == "hf":
            from huggingface_hub import snapshot_download  # type: ignore

            return snapshot_download(repo, local_dir=local)
        from modelscope import snapshot_download  # type: ignore

        return snapshot_download(repo, local_dir=local)
    except Exception:
        return None


def ensure_all(names: List[str], cache_dir: str = DEFAULT_CACHE_DIR) -> dict:
    return {n: ensure_model(n, cache_dir) for n in names}
