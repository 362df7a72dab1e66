from raymarchrenderer_tpu.utils.metrics import (  # noqa: F401
    RenderStats, instrumented_sample, MetricsLogger, spectral_path_profile,
)
from raymarchrenderer_tpu.utils.profiling import (  # noqa: F401
    timed_block, trace_to,
)
from raymarchrenderer_tpu.utils.guards import checked_render_sample  # noqa: F401
