from .halo import halo_exchange_axis, pad_axis_sharded
from .solver import local_coords, make_mesh, shard_ops, solve_sharded

__all__ = [
    "halo_exchange_axis",
    "pad_axis_sharded",
    "local_coords",
    "make_mesh",
    "shard_ops",
    "solve_sharded",
]
