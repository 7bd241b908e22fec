from kanvit.parallel import pipeline, runtime
from kanvit.parallel.mesh import (
    create_mesh,
    batch_sharding,
    param_shardings,
    shard_state,
    TP_RULES,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "param_shardings",
    "shard_state",
    "TP_RULES",
    "pipeline",
    "runtime",
]
