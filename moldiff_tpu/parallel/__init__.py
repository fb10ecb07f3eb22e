from .mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)
from . import multihost
