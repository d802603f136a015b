"""Device-memory-driven runtime configuration.

Replaces the reference's 1.2 kLoC VRAM tier system (`acestep/gpu_config.py`)
with the much simpler TPU memory model (SURVEY §7.1 mapping): read per-device
HBM, derive max duration / batch / LM size / decode chunking. Simulation env
var `ACESTEP_MAX_HBM_GB` mirrors the reference's `MAX_CUDA_VRAM` test hook
(`gpu_config.py:22-25`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RuntimeMemoryConfig:
    hbm_gb: float
    max_duration_s: int
    max_batch_size: int
    lm_size: Optional[str]  # "0.6B" | "1.7B" | "4B" | None
    decode_chunk_frames: int
    allow_thinking: bool


# Approximate resident bf16 footprints (GB): DiT 4.8, VAE 0.25, text-enc 1.2,
# LM 1.2/3.4/8.0 (mirrors the reference's measured table, gpu_config.py:92-106).
_DIT_GB, _VAE_GB, _TEXT_GB = 4.8, 0.25, 1.2
_LM_GB = {"0.6B": 1.2, "1.7B": 3.4, "4B": 8.0}


def detect_hbm_gb() -> float:
    env = os.environ.get("ACESTEP_MAX_HBM_GB")
    if env:
        return float(env)
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return stats["bytes_limit"] / 1024**3
    except Exception:
        pass
    return 16.0  # v5e default


def get_runtime_memory_config(hbm_gb: Optional[float] = None) -> RuntimeMemoryConfig:
    hbm = hbm_gb if hbm_gb is not None else detect_hbm_gb()
    base = _DIT_GB + _VAE_GB + _TEXT_GB
    free = hbm - base

    lm_size: Optional[str] = None
    for size in ("4B", "1.7B", "0.6B"):
        if free - _LM_GB[size] > 4.0:
            lm_size = size
            break

    working = free - (_LM_GB[lm_size] if lm_size else 0.0)
    # Empirical working-set cost ≈ 1.6 MB per latent batch-frame (bf16 denoise
    # activations + tiled-decode chunk), calibrated on v5e-16GB: batch 2×60 s
    # comfortable, batch 8×60 s OOM.
    frames_capacity = int(working * 1024 / 1.6)
    if frames_capacity >= 8 * 3000:
        batch, duration = 8, 600
    elif frames_capacity >= 4 * 3000:
        batch, duration = 4, 600
    elif frames_capacity >= 2 * 3000:
        batch, duration = 2, 600
    elif frames_capacity >= 3000:
        batch, duration = 1, 600
    else:
        batch, duration = 1, 240

    chunk = 2048 if working > 6 else 512
    return RuntimeMemoryConfig(
        hbm_gb=hbm,
        max_duration_s=duration,
        max_batch_size=batch,
        lm_size=lm_size,
        decode_chunk_frames=chunk,
        allow_thinking=lm_size is not None,
    )
