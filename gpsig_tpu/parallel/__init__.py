from .sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    make_train_step,
)
from .gram_parallel import kernel_K_dp  # noqa: F401
