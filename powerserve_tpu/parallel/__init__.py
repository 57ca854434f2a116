from .mesh import make_mesh, shard_kv, shard_params
from .distributed import init_distributed, make_multihost_mesh

__all__ = ["make_mesh", "shard_kv", "shard_params", "init_distributed",
           "make_multihost_mesh"]
