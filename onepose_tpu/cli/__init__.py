"""Command-line interface: `python -m onepose_tpu <command>`."""
