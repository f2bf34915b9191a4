from visreps_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    shard_params_tp,
)
from visreps_tpu.parallel.shard import rdm_sharded, extract_sharded_batch
from visreps_tpu.parallel.feed import (
    put_global_batch,
    process_slice,
    local_batch_size,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_params_tp",
    "rdm_sharded",
    "extract_sharded_batch",
    "put_global_batch",
    "process_slice",
    "local_batch_size",
]
