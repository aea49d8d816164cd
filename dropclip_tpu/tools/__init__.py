"""Command-line entry points (reference tools/*.py, scripts/*.py)."""
