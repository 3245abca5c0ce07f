from .mesh import make_mesh, data_sharding, replicated_sharding, host_local_batch, init_distributed
