from .sharding import (  # noqa: F401
    make_mesh, shard_scene, ShardedRenderer, render_step_sharded,
)
