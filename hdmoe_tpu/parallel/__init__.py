from hdmoe_tpu.parallel.mesh import make_mesh, MeshConfig
from hdmoe_tpu.parallel.sharding import (
    param_shardings,
    batch_sharding,
    replicated,
    shard_train_state,
    make_sharded_train_devicegen,
    make_sharded_train_step,
)
