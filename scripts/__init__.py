"""CLI entry points (also exposed as moldiff-* console scripts via
pyproject.toml)."""
