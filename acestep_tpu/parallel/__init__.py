from acestep_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params_dp,
    shard_params_tp,
)

__all__ = ["make_mesh", "shard_batch", "shard_params_dp", "shard_params_tp"]
