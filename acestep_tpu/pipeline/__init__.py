from acestep_tpu.pipeline.handler import AceStepHandler

__all__ = ["AceStepHandler"]
