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


# ---------------------------------------------------------------------------
# Per-component checkpoint verification (ref model_downloader per-model
# ensure + component checks). NOTE: the reference also hash-syncs
# trust_remote_code .py files into checkpoint dirs (model_downloader.py:56-134)
# — deliberately not mirrored: this framework never executes checkpoint-shipped
# code (weights load through converters whose numerics are pinned by the
# golden-parity suite), so there is no remote code to sync.
# ---------------------------------------------------------------------------

# Component → required paths inside a DiT checkpoint dir (globs allowed).
DIT_CHECKPOINT_COMPONENTS = {
    "config": ["config.json"],
    "weights": ["*.safetensors"],
    "silence_latent": ["silence_latent.pt", "silence_latent.npy"],
    "vae": ["vae/config.json", "vae/*.safetensors"],
    "text_encoder": ["Qwen3-Embedding-0.6B/config.json",
                     "Qwen3-Embedding-0.6B/*.safetensors"],
}

LM_CHECKPOINT_COMPONENTS = {
    "config": ["config.json"],
    "weights": ["*.safetensors"],
    "tokenizer": ["tokenizer.json", "tokenizer_config.json"],
}


def verify_checkpoint(path: str, components: Optional[dict] = None) -> dict:
    """Check a checkpoint dir component-by-component.

    Returns {component: bool}; a component passes when every pattern group
    matches at least one file (alternatives within a list are OR-ed per
    pattern, all patterns of distinct meaning AND-ed).
    """
    import glob as _glob

    components = components or DIT_CHECKPOINT_COMPONENTS
    out = {}
    for comp, patterns in components.items():
        # alternatives: any single pattern matching counts for "silence_latent"
        # style alternates; multi-file components list each required pattern
        hits = [bool(_glob.glob(os.path.join(path, p))) for p in patterns]
        out[comp] = all(hits) if comp in ("vae", "text_encoder", "tokenizer") else any(hits)
    return out


def list_available_models(root: Optional[str] = None) -> List[dict]:
    """Checkpoint catalog (ref init_service_catalog.get_available_acestep_v15_models
    :27-40): scan `root` (default ACESTEP_CHECKPOINT_ROOT or ./checkpoints)
    for acestep-* model dirs, with per-component verification status."""
    root = root or os.environ.get("ACESTEP_CHECKPOINT_ROOT", "./checkpoints")
    out: List[dict] = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if not (os.path.isdir(path) and name.startswith("acestep-")):
            continue
        comps = LM_CHECKPOINT_COMPONENTS if "lm" in name.lower() else DIT_CHECKPOINT_COMPONENTS
        status = verify_checkpoint(path, comps)
        out.append({"name": name, "path": path, "components": status,
                    "complete": all(status.values())})
    return out


def ensure_components(
    name: str,
    cache_dir: str = DEFAULT_CACHE_DIR,
    *,
    source: Optional[str] = None,
) -> dict:
    """Per-component ensure: verify an existing dir and (re)download only when
    a component is missing — the per-model ensure/download loop of ref
    `model_downloader.py:210-308` without whole-tree re-fetches."""
    local = os.path.join(cache_dir, name)
    comps = LM_CHECKPOINT_COMPONENTS if "lm" in name.lower() else DIT_CHECKPOINT_COMPONENTS
    status = verify_checkpoint(local, comps) if os.path.isdir(local) else {
        c: False for c in comps
    }
    if all(status.values()):
        return {"path": local, "components": status, "downloaded": False}
    got = ensure_model(name, cache_dir, source=source)
    if got:
        status = verify_checkpoint(got, comps)
    return {"path": got, "components": status, "downloaded": got is not None}
