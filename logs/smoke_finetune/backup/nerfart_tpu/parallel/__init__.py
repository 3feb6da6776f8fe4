from nerfart_tpu.parallel.mesh import (
    make_mesh,
    shard_rays,
    replicate,
    data_parallel_sharding,
)
