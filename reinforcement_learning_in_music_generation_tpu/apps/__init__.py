"""CLI entry points (one subcommand per reference entry point)."""
