"""ACE-Step 1.5 TPU — a TPU-native (JAX/XLA/Pallas) music-generation framework.

Rebuilds the capabilities of the reference ACE-Step v1.5 stack (LM planner +
flow-matching DiT + Oobleck waveform VAE) with a TPU-first architecture.
See SURVEY.md at the repo root for the reference structural analysis.
"""

from acestep_tpu.config import AceStepConfig, OobleckConfig, Qwen3Config

__version__ = "0.1.0"
__all__ = ["AceStepConfig", "OobleckConfig", "Qwen3Config", "__version__"]
