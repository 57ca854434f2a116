from .mesh import make_mesh, shard_kv, shard_params
from .distributed import init_distributed, make_multihost_mesh
from .tp import (
    prepare_params_for_tp,
    shard_kv_tp,
    shard_params_tp,
    tp_decode_scan,
    tp_forward,
    tp_prefill,
)

__all__ = ["make_mesh", "shard_kv", "shard_params", "init_distributed",
           "make_multihost_mesh", "prepare_params_for_tp", "shard_kv_tp",
           "shard_params_tp", "tp_decode_scan", "tp_forward", "tp_prefill"]
