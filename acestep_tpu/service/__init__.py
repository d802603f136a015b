from acestep_tpu.service.params import GenerationConfig, GenerationParams, GenerationResult
from acestep_tpu.service.inference import generate_music

__all__ = ["GenerationParams", "GenerationConfig", "GenerationResult", "generate_music"]
