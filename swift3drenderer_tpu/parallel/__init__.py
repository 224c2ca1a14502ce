"""Multi-chip SPMD rendering (see parallel/sharding.py for the design)."""

from .sharding import (  # noqa: F401
    Mesh,
    ShardedRenderer,
    make_mesh,
    render_batch_sharded,
    render_scene_sharded,
)
