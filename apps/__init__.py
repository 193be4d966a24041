"""CLI entry points mirroring the reference's scripts (README.md:30-50);
the real logic lives in apps/cli.py, installed as the `rlmg` console
script (pyproject.toml)."""
