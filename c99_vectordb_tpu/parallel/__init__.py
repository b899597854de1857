from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_ivf_search_program,
    sharded_kmeans_step,
    sharded_search_2d,
    sharded_search_program,
    ShardedFlatIndex,
    ShardedIVFIndex,
)
