from .batch import solve_batch_sharded
from .distributed import (init_distributed, make_global_mesh,
                          make_process_local_array, process_block_slices,
                          sharded_initial_condition)
from .halo import halo_exchange_axis, pad_axis_sharded
from .solver import (local_coords, local_grid, make_mesh, shard_ops,
                     solve_sharded)
from .vector import solve_vector_sharded

__all__ = [
    "solve_batch_sharded",
    "solve_vector_sharded",
    "halo_exchange_axis",
    "pad_axis_sharded",
    "local_coords",
    "local_grid",
    "make_mesh",
    "shard_ops",
    "solve_sharded",
    "init_distributed",
    "make_global_mesh",
    "make_process_local_array",
    "process_block_slices",
    "sharded_initial_condition",
]
