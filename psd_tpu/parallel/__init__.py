from .mesh import MeshConfig, create_mesh, batch_sharding, replicated, shard_batch

__all__ = ["MeshConfig", "create_mesh", "batch_sharding", "replicated", "shard_batch"]
