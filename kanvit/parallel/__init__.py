from kanvit.parallel import runtime
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
    "runtime",
]
