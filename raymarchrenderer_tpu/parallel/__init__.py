from raymarchrenderer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, render_sharded, train_step_sharded, ShardConfig, auto_shard,
    gather_image,
)
from raymarchrenderer_tpu.parallel import multihost  # noqa: F401
