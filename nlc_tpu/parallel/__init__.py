from .mesh import (make_mesh, make_data_mesh, data_sharding, replicated_sharding,
                   replicate, shard_batch, host_local_batch, init_distributed,
                   is_primary)
from .consistency import check_replica_consistency
from .tp import (apply_tp_sharding, tp_param_sharding, tp_sharding_summary,
                 fsdp_param_sharding, apply_fsdp_sharding)
