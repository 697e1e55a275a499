from .mesh import (  # noqa: F401
    setup_distributed,
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
