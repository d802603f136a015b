from acestep_tpu.ops.basic import linear, mlp_swiglu, rms_norm
from acestep_tpu.ops.rope import apply_rope, rope_cos_sin
from acestep_tpu.ops.attention import attention, make_attention_bias
from acestep_tpu.ops.fsq import (
    fsq_indices_to_codes,
    fsq_codes_to_indices,
    fsq_quantize,
    residual_fsq_decode_indices,
    residual_fsq_forward,
)
from acestep_tpu.ops.packing import pack_sequences

__all__ = [
    "linear",
    "mlp_swiglu",
    "rms_norm",
    "apply_rope",
    "rope_cos_sin",
    "attention",
    "make_attention_bias",
    "fsq_indices_to_codes",
    "fsq_codes_to_indices",
    "fsq_quantize",
    "residual_fsq_decode_indices",
    "residual_fsq_forward",
    "pack_sequences",
]
