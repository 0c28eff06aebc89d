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
from .dist_ba import distributed_bundle_adjust
from .dist_posegraph import (PartitionedGraph, distributed_pose_graph,
                             partition_pose_graph)
