from acestep_tpu.lm.constrained import ConstrainedDecoderFSM, StepSpec
from acestep_tpu.lm.handler import LLMHandler

__all__ = ["ConstrainedDecoderFSM", "StepSpec", "LLMHandler"]
