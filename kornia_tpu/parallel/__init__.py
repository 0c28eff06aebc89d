from .mesh import (
    Mesh,
    NamedSharding,
    P,
    data_sharding,
    local_mesh,
    make_mesh,
    replicated,
    shard_batch,
    use_mesh,
)
