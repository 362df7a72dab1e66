from raymarchrenderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, render_sharded, ShardConfig,
)
