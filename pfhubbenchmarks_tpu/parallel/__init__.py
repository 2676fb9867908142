from pfhubbenchmarks_tpu.parallel.mesh import (
    make_device_mesh as make_device_mesh,
    shard_problem_fns as shard_problem_fns,
    shard_state as shard_state,
    state_sharding as state_sharding,
)
