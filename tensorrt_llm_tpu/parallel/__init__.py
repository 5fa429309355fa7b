from ..mapping import CpType, Mapping  # noqa: F401
from .sharding import (make_named_sharding, replicate,  # noqa: F401
                       shard_params)
