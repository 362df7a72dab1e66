from raymarchrenderer_tpu.app.cli import main  # noqa: F401
