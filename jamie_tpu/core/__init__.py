from .mesh import create_mesh, data_sharding, replicated_sharding, shard_rows
from .dtypes import DTypePolicy, resolve_dtype
from .timing import TimeLogger

__all__ = [
    'create_mesh', 'data_sharding', 'replicated_sharding', 'shard_rows',
    'DTypePolicy', 'resolve_dtype', 'TimeLogger',
]
