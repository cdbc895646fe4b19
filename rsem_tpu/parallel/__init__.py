from .mesh import make_mesh, shard_bundle_by_read, make_sharded_round
from .fast_sharded import (
    build_fast_data_sharded,
    fast_final_fracs_sharded,
    place_fast_sharded,
    run_fast_em_loop_sharded,
)

__all__ = [
    "make_mesh",
    "shard_bundle_by_read",
    "make_sharded_round",
    "build_fast_data_sharded",
    "fast_final_fracs_sharded",
    "place_fast_sharded",
    "run_fast_em_loop_sharded",
]
