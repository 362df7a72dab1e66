from raymarchrenderer_tpu.io.image import (  # noqa: F401
    save_bmp, save_png, save_npy, save_image, timestamp_name,
)
from raymarchrenderer_tpu.io.checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, RenderState,
)
