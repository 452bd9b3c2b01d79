from .mesh import make_data_mesh, replicate, shard_batch

__all__ = ["make_data_mesh", "replicate", "shard_batch"]
