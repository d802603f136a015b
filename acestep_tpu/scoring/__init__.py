from acestep_tpu.scoring.lm_score import (
    calculate_reward_score,
    pmi_score,
    pmi_to_normalized_score,
    sequence_log_prob,
)
from acestep_tpu.scoring.alignment import (
    MusicStampsAligner,
    dtw_align,
    format_lrc,
    median_filter,
)

__all__ = [
    "calculate_reward_score",
    "pmi_score",
    "pmi_to_normalized_score",
    "sequence_log_prob",
    "MusicStampsAligner",
    "dtw_align",
    "format_lrc",
    "median_filter",
]
