from acestep_tpu.training.train_step import (
    TrainState,
    create_train_state,
    flow_matching_loss,
    make_train_step,
    sample_discrete_timesteps,
    sample_timesteps,
)
from acestep_tpu.training.lora import (
    apply_lora,
    init_lora_params,
    merge_lora,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "flow_matching_loss",
    "make_train_step",
    "sample_discrete_timesteps",
    "sample_timesteps",
    "apply_lora",
    "init_lora_params",
    "merge_lora",
]
