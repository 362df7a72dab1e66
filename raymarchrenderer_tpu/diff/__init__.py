from raymarchrenderer_tpu.diff.march import march_diff  # noqa: F401
