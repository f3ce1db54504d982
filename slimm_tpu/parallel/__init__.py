from .mesh import make_mesh  # noqa: F401
from .multihost import MultiHostRunner, initialize, shard_paths  # noqa: F401
from .runner import ShardedRunner  # noqa: F401
