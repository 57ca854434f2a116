from .cache import KVCache

__all__ = ["KVCache"]
from .persist import load_prefix, save_prefix

__all__ += ["load_prefix", "save_prefix"]
