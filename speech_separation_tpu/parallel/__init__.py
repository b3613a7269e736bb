from .mesh import make_mesh, get_mesh, shard_batch, replicate_tree, shard_params

__all__ = ["make_mesh", "get_mesh", "shard_batch", "replicate_tree", "shard_params"]
