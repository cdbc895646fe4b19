from .mesh import make_mesh, shard_bundle_by_read, make_sharded_round

__all__ = ["make_mesh", "shard_bundle_by_read", "make_sharded_round"]
