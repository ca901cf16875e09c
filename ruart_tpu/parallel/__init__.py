from ruart_tpu.parallel.mesh import (
    make_mesh,
    batch_pspec,
    param_pspec,
    shard_batch,
    shard_params,
    replicate,
)
