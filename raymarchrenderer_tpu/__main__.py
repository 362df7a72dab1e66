"""`python -m raymarchrenderer_tpu` — the CLI entry point (app.cli)."""
from raymarchrenderer_tpu.app.cli import main

if __name__ == "__main__":
    main()
